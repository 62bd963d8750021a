"""Round-5 stage attribution for QUANTIZED exact search at scale (VERDICT #3).

21M int4 runs at 130 ms vs a ~56 ms MXU floor; 8.4M int8 at ~93 ms vs ~22 ms
(bench_21m/8m results). Nobody has written down where the time goes. This
probe times ablated slices of the stream pipeline at those exact shapes:

  pass          — the stream pallas pass alone (dequant + matmul + capture)
  pass_noscale  — pass minus the per-block/per-row scale multiply
  pass_castonly — pass minus scale AND nibble logic (&15 / >>4 / -7.5):
                  raw byte planes cast straight to bf16 (int4 only)
  passsel       — pass + hier group selection + candidate ordering
  full          — the shipped exact_topk_mips path (self-hit validated)

so stage cost = difference between consecutive rows (scan-chained windows,
same methodology as probe_r4b / bench.py). Ablated passes compute WRONG
values (probe-only); full rows validate self-hit like the scale benches.

Env: PROBE_PART=int4_21m|int8_8m (default both), PROBE_VARIANTS=csv filter.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r7.py
Appends JSON lines to benchmarks/probe_r7_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

Q = 256
K = 100  # SMOKE overrides below
SCAN_LENS = (4, 12)
REPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r7_results.jsonl")
PARTS = os.environ.get("PROBE_PART", "int4_21m,int8_8m").split(",")
ONLY = (set(os.environ.get("PROBE_VARIANTS", "").split(","))
        if os.environ.get("PROBE_VARIANTS") else None)
# SMOKE=1: tiny corpora, interpret-mode pallas on CPU — validates probe
# mechanics (wiring, monkeypatch, scan harness), not performance
SMOKE = os.environ.get("SMOKE", "0") == "1"


def _ablated_chunk_scores(pe, jnp, jax, mode):
    """Replacement for pallas_exact._chunk_scores with parts removed.
    mode: "noscale" (skip scale multiply) or "castonly" (also skip the
    nibble mask/shift/offset — raw bytes straight to bf16; int4 only)."""
    orig = pe._chunk_scores

    def fn(q, c, s, quant):
        if quant == "int4":
            nb = s.shape[0]
            half = nb // 2
            ci = c.astype(jnp.int32)
            out = None
            for b_i in range(nb):
                col0 = (b_i % half) * pe.LANES
                if mode == "castonly":
                    v = ci[:, col0:col0 + pe.LANES].astype(jnp.bfloat16)
                else:
                    plane = ci if b_i < half else (ci >> 4)
                    nib = (plane[:, col0:col0 + pe.LANES] & 15).astype(
                        jnp.float32)
                    v = (nib - 7.5).astype(jnp.bfloat16)
                qb = q[:, b_i * pe.LANES:(b_i + 1) * pe.LANES].astype(
                    jnp.bfloat16)
                p = jax.lax.dot_general(
                    qb, v, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = p if out is None else out + p
            return out
        if quant == "int8":
            scores = jax.lax.dot_general(
                q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return scores  # scale multiply ablated
        return orig(q, c, s, quant)

    return fn


def run_part(part):
    global Q, K
    if SMOKE:
        Q, K = 16, 10
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kirag_tpu.ops import pallas_exact as pe

    chunk = 1024 if SMOKE else 16384
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        from kirag_tpu.ops.quantized import (quantize_rows_int4,
                                             quantize_rows_int8)

        rng = np.random.default_rng(0)
        n_rows = 4096
        d = 512
        block = rng.standard_normal((n_rows, d), dtype=np.float32)
        block /= np.linalg.norm(block, axis=-1, keepdims=True)
        q_rows = rng.integers(0, n_rows, size=Q)
        queries_h = block[q_rows].copy()
        if part == "int4_21m":
            packed, scales_h = quantize_rows_int4(block)
            quant = "int4"
        else:
            packed, scales_h = quantize_rows_int8(block)
            quant = "int8"
    elif part == "int4_21m":
        from benchmarks.bench_21m_int4 import GRID, N, build_corpus_only
        packed, scales_h, q_rows, queries_h = build_corpus_only()
        pad = (-N) % GRID
        packed = np.pad(packed, ((0, pad), (0, 0)))
        scales_h = np.pad(scales_h, ((0, pad), (0, 0)))
        quant = "int4"
        n_rows = N
    else:
        from kirag_tpu.ops.quantized import quantize_rows_int8

        n_rows = 8_388_608
        d = 1024
        cache = f"/tmp/bench8m_cache_{n_rows}_{d}_{Q}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            packed, scales_h = z["corpus"], z["scales"]
            q_rows, queries_h = z["q_rows"], z["queries"]
        else:
            rng = np.random.default_rng(0)
            packed = np.empty((n_rows, d), dtype=np.int8)
            scales_h = np.empty((n_rows,), dtype=np.float32)
            q_rows = rng.integers(0, n_rows, size=Q)
            queries_h = np.empty((Q, d), dtype=np.float32)
            blk = 1 << 20
            for start in range(0, n_rows, blk):
                block = rng.standard_normal((min(blk, n_rows - start), d),
                                            dtype=np.float32)
                block /= np.linalg.norm(block, axis=-1, keepdims=True)
                (packed[start:start + len(block)],
                 scales_h[start:start + len(block)]) = \
                    quantize_rows_int8(block)
                in_blk = (q_rows >= start) & (q_rows < start + len(block))
                queries_h[in_blk] = block[q_rows[in_blk] - start]
                print(f"  built rows {start + len(block)}/{n_rows}",
                      flush=True)
            np.savez(cache, corpus=packed, scales=scales_h, q_rows=q_rows,
                     queries=queries_h)
        quant = "int8"

    corpus = jax.device_put(packed)
    scales = jax.device_put(scales_h)
    queries = jax.device_put(queries_h.astype(ml_dtypes.bfloat16))
    rows_d = jax.device_put(jnp.asarray(q_rows, dtype=jnp.int32))
    jax.block_until_ready((corpus, scales, queries))
    del packed, scales_h
    print(f"{part}: corpus on device", file=sys.stderr, flush=True)

    n_pad = corpus.shape[0]
    num_chunks = n_pad // chunk
    gpc = chunk // pe.LANES
    groups = n_pad // pe.LANES
    b = pe._capture_budget(K, num_chunks, gpc)

    def stream_pass(qs, c, s):
        valid_arr = jnp.asarray(n_rows, dtype=jnp.int32).reshape(1, 1)
        in_specs = [
            pl.BlockSpec((Q, qs.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((chunk, c.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        s_op, s_spec = pe._scale_operand(s, quant, num_chunks, gpc, chunk)
        in_specs.append(s_spec)
        out_specs = [
            pl.BlockSpec((1, gpc, Q), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Q, b * pe.LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, b, Q), lambda i: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((num_chunks, gpc, Q), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, Q, b * pe.LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, b, Q), jnp.int32),
        ]
        return pl.pallas_call(
            functools.partial(pe._stream_kernel, groups_per_chunk=gpc,
                              chunk_size=chunk, b=b, quant=quant),
            grid=(num_chunks,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            interpret=SMOKE,
            **pe._compiler_params(SMOKE, parallel=True),
        )(qs, c, valid_arr, s_op)

    def make_pass_only():
        def run_one(qs, c, s):
            gmax_out, cand_out, gid_out = stream_pass(qs, c, s)
            return (gmax_out[:, 0, :].sum() + cand_out[:, 0, 0].sum()
                    + gid_out[:, 0, :].sum().astype(jnp.float32))
        return run_one

    def make_pass_sel():
        def run_one(qs, c, s):
            gmax_out, cand_out, gid_out = stream_pass(qs, c, s)
            gmax = gmax_out.reshape(groups, Q).T
            gvals, gsel = pe.hier_topk(gmax, K)
            order = jnp.argsort(gsel, axis=-1)
            gsel = jnp.take_along_axis(gsel, order, axis=-1)
            return (gvals.sum() + gsel.sum().astype(jnp.float32)
                    + cand_out[:, 0, 0].sum()
                    + gid_out[:, 0, :].sum().astype(jnp.float32))
        return run_one

    def make_full(chunk_size=chunk):
        def run_one(qs, c, s):
            return pe.exact_topk_mips(
                qs, c, K, chunk_size=chunk_size, valid_rows=n_rows,
                interpret=SMOKE, select="hier", impl="stream", scales=s)
        return run_one

    def time_config(label, run_one, validate):
        label = f"{part}:{label}"
        if ONLY is not None and label.split(":")[1] not in ONLY:
            return

        # corpus/scales ride as jit ARGS: as closure constants they bloat
        # the HLO by the full corpus bytes (probe_r6 lesson)
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(qs, c, s, rows, iters):
            def body(prev, _):
                p = jax.lax.optimization_barrier(prev)
                delta = (0.0 * p).astype(qs.dtype)
                out = run_one(qs + delta[None, None], c, s)
                if validate:
                    vals, idx = out
                    hits = jnp.sum((idx[:, 0] == rows).astype(jnp.int32))
                    return vals[0, 0], hits
                return out, out
            _, aux = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return aux

        try:
            windows = {}
            for n in SCAN_LENS:
                t0 = time.perf_counter()
                np.asarray(run(queries, corpus, scales, rows_d, iters=n))
                print(f"{label} iters={n} compile+first "
                      f"{time.perf_counter() - t0:.0f}s",
                      file=sys.stderr, flush=True)
                reps = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    aux = np.asarray(run(queries, corpus, scales, rows_d,
                                         iters=n))
                    reps.append(time.perf_counter() - t0)
                    if validate:
                        assert (aux > 0.95 * Q).all(), aux
                windows[n] = min(reps)
            n0, n1 = SCAN_LENS
            per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
            rec = {"label": label, "rows": n_rows, "chunk": chunk, "b": b,
                   "ms_per_batch": round(per_iter * 1e3, 2),
                   "qps": round(Q / per_iter, 1),
                   "loadavg": round(os.getloadavg()[0], 1),
                   "windows_ms": {str(k): round(v * 1e3, 1)
                                  for k, v in windows.items()}}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"label": label, "error": f"{type(e).__name__}: {e}"[:400]}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")

    time_config("full", make_full(), validate=True)
    time_config("pass", make_pass_only(), validate=False)
    time_config("passsel", make_pass_sel(), validate=False)

    import jax as _jax
    orig = pe._chunk_scores
    try:
        pe._chunk_scores = _ablated_chunk_scores(pe, jnp, _jax, "noscale")
        time_config("pass_noscale", make_pass_only(), validate=False)
        if quant == "int4":
            pe._chunk_scores = _ablated_chunk_scores(pe, jnp, _jax,
                                                     "castonly")
            time_config("pass_castonly", make_pass_only(), validate=False)
    finally:
        pe._chunk_scores = orig


def main() -> None:
    for part in PARTS:
        run_part(part)


if __name__ == "__main__":
    main()
