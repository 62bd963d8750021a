"""Round-5 attribution of the capdom tail at 1M x 1024 Q=256 k=100 (VERDICT #1).

The flagship stream+capdom search spends 3.15 of its 7.41 ms/batch above the
4.26 ms scoring pass (bench_select_ab r4/r5). select="merge" (the designed
in-kernel fix) dies in Mosaic lowering, and the Pallas assembly blend loses
to the einsum. This probe splits the surviving tail into stages:

  cappass  — the capdom stream pass alone (kernel + capture + capmax/resid)
  capsel   — + capture-domain top_k + gid order (selection, no assembly)
  capasm   — + one-hot einsum assembly of [Q, k, 128] candidates
  full     — the shipped path (adds _final_select + the ok/cond plumbing)

at chunk 8192 (the shipped default) AND chunk 16384 (half the chunk steps,
half the C*B capture domain — the cheap structural lever left).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r8.py
Env: PROBE_CHUNKS=8192,16384  PROBE_VARIANTS=csv
Appends JSON lines to benchmarks/probe_r8_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

N_CORPUS = 1_000_000
DIM = 1024
Q = 256
K = 100
SCAN_LENS = (8, 32)
REPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r8_results.jsonl")
CHUNKS = tuple(int(x) for x in
               os.environ.get("PROBE_CHUNKS", "8192,16384").split(","))
ONLY = (set(os.environ.get("PROBE_VARIANTS", "").split(","))
        if os.environ.get("PROBE_VARIANTS") else None)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kirag_tpu.ops import pallas_exact as pe

    rng = np.random.default_rng(0)
    corpus_host = rng.standard_normal((N_CORPUS, DIM), dtype=np.float32)
    corpus_host /= np.linalg.norm(corpus_host, axis=-1, keepdims=True)
    query_rows = rng.integers(0, N_CORPUS, size=Q)
    queries_host = corpus_host[query_rows].copy()

    grid_pad = 16384 * 3  # divisible by both probed chunk sizes
    n_pad = -(-N_CORPUS // grid_pad) * grid_pad
    corpus_bf16 = np.zeros((n_pad, DIM), dtype=ml_dtypes.bfloat16)
    corpus_bf16[:N_CORPUS] = corpus_host.astype(ml_dtypes.bfloat16)
    del corpus_host
    corpus = jax.device_put(corpus_bf16)
    queries = jax.device_put(queries_host.astype(ml_dtypes.bfloat16))
    rows_d = jax.device_put(jnp.asarray(query_rows, dtype=jnp.int32))
    corpus.block_until_ready()
    del corpus_bf16
    print("transfer done", file=sys.stderr, flush=True)

    for chunk in CHUNKS:
        num_chunks = n_pad // chunk
        gpc = chunk // pe.LANES
        b = pe._capture_budget(K, num_chunks, gpc)
        cb = num_chunks * b

        def cap_pass(qs, c):
            valid_arr = jnp.asarray(N_CORPUS, dtype=jnp.int32).reshape(1, 1)
            in_specs = [
                pl.BlockSpec((Q, DIM), lambda i: (0, 0)),
                pl.BlockSpec((chunk, DIM), lambda i: (i, 0)),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ]
            out_specs = [
                pl.BlockSpec((1, gpc, Q), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, Q, b * pe.LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, b, Q), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, b, Q), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, Q), lambda i: (i, 0, 0)),
            ]
            out_shape = [
                jax.ShapeDtypeStruct((num_chunks, gpc, Q), jnp.float32),
                jax.ShapeDtypeStruct((num_chunks, Q, b * pe.LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((num_chunks, b, Q), jnp.int32),
                jax.ShapeDtypeStruct((num_chunks, b, Q), jnp.float32),
                jax.ShapeDtypeStruct((num_chunks, 1, Q), jnp.float32),
            ]
            return pl.pallas_call(
                functools.partial(pe._stream_kernel, groups_per_chunk=gpc,
                                  chunk_size=chunk, b=b, quant="none",
                                  capdom=True),
                grid=(num_chunks,),
                in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
                interpret=False,
                **pe._compiler_params(False, parallel=True),
            )(qs, c, valid_arr)

        def select_stage(outs):
            gmax_out, cand_out, gid_out, capmax_out, resid_out = outs
            gids = gid_out.transpose(2, 0, 1).reshape(Q, cb)
            capmax = capmax_out.transpose(2, 0, 1).reshape(Q, cb)
            cvals, cpos = jax.lax.top_k(capmax, K)
            gsel_cap = jnp.take_along_axis(gids, cpos, axis=-1)
            resid = jnp.max(resid_out[:, 0, :], axis=0)
            ok = jnp.all((cvals[:, -1] > resid) | (resid <= pe.FIN_MIN))
            order = jnp.argsort(gsel_cap, axis=-1)
            gsel_cap = jnp.take_along_axis(gsel_cap, order, axis=-1)
            cpos = jnp.take_along_axis(cpos, order, axis=-1)
            return cand_out, cpos, gsel_cap, ok

        def assemble_stage(cand_out, cpos):
            eq = cpos[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (Q, K, cb), 2)
            eq4 = eq.reshape(Q, K, num_chunks, b).astype(jnp.float32)
            cand4 = cand_out.reshape(num_chunks, Q, b, pe.LANES)
            return jnp.einsum("qkcb,cqbl->qkl", eq4, cand4,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)

        def make_cappass():
            def run_one(qs, c):
                outs = cap_pass(qs, c)
                return (outs[0][:, 0, :].sum() + outs[1][:, 0, 0].sum()
                        + outs[2][:, 0, :].sum().astype(jnp.float32)
                        + outs[3][:, 0, :].sum() + outs[4][:, 0, :].sum())
            return run_one

        def make_capsel():
            def run_one(qs, c):
                outs = cap_pass(qs, c)
                cand_out, cpos, gsel_cap, ok = select_stage(outs)
                return (cpos.sum().astype(jnp.float32)
                        + gsel_cap.sum().astype(jnp.float32)
                        + ok.astype(jnp.float32) + cand_out[:, 0, 0].sum())
            return run_one

        def make_capasm():
            def run_one(qs, c):
                outs = cap_pass(qs, c)
                cand_out, cpos, gsel_cap, ok = select_stage(outs)
                cand = assemble_stage(cand_out, cpos)
                return (cand[:, 0, 0].sum() + ok.astype(jnp.float32)
                        + gsel_cap.sum().astype(jnp.float32))
            return run_one

        def make_full():
            def run_one(qs, c):
                return pe.exact_topk_mips(
                    qs, c, K, chunk_size=chunk, valid_rows=N_CORPUS,
                    interpret=False, select="capdom", impl="stream")
            return run_one

        def make_capfin():
            # capasm + _final_select, WITHOUT the lax.cond fallback wrapper:
            # full - capfin isolates what the cond's mere presence costs
            def run_one(qs, c):
                outs = cap_pass(qs, c)
                cand_out, cpos, gsel_cap, ok = select_stage(outs)
                cand = assemble_stage(cand_out, cpos)
                vals, idx = pe._final_select(
                    cand.reshape(Q, K, pe.LANES), gsel_cap, K, N_CORPUS, Q,
                    "hier", False)
                return vals, idx
            return run_one

        def time_config(label, run_one, validate):
            label = f"c{chunk}:{label}"
            if ONLY is not None and label.split(":")[1] not in ONLY:
                return

            # corpus rides as a jit ARG: captured as a closure constant it
            # bloats the HLO by 2 GB (probe_r6 lesson) and chokes compile
            @functools.partial(jax.jit, static_argnames=("iters",))
            def run(qs, c, rows, iters):
                def body(prev, _):
                    p = jax.lax.optimization_barrier(prev)
                    delta = (0.0 * p).astype(qs.dtype)
                    out = run_one(qs + delta[None, None], c)
                    if validate:
                        vals, idx = out
                        hits = jnp.sum((idx[:, 0] == rows).astype(jnp.int32))
                        return vals[0, 0], hits
                    return out, out
                _, aux = jax.lax.scan(body, jnp.float32(0), None,
                                      length=iters)
                return aux

            try:
                windows = {}
                for n in SCAN_LENS:
                    t0 = time.perf_counter()
                    np.asarray(run(queries, corpus, rows_d, iters=n))
                    print(f"{label} iters={n} compile+first "
                          f"{time.perf_counter() - t0:.0f}s",
                          file=sys.stderr, flush=True)
                    reps = []
                    for _ in range(REPS):
                        t0 = time.perf_counter()
                        aux = np.asarray(run(queries, corpus, rows_d,
                                             iters=n))
                        reps.append(time.perf_counter() - t0)
                        if validate:
                            assert (aux > 0.99 * Q).all(), aux
                    windows[n] = min(reps)
                n0, n1 = SCAN_LENS
                per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
                rec = {"label": label, "chunk": chunk, "b": b, "cb": cb,
                       "ms_per_batch": round(per_iter * 1e3, 3),
                       "qps": round(Q / per_iter, 1),
                       "loadavg": round(os.getloadavg()[0], 1),
                       "windows_ms": {str(k): round(v * 1e3, 1)
                                      for k, v in windows.items()}}
            except Exception as e:  # noqa: BLE001 — record and continue
                rec = {"label": label, "chunk": chunk,
                       "error": f"{type(e).__name__}: {e}"[:400]}
            print(json.dumps(rec), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")

        time_config("full", make_full(), validate=True)
        time_config("cappass", make_cappass(), validate=False)
        time_config("capsel", make_capsel(), validate=False)
        time_config("capasm", make_capasm(), validate=False)
        time_config("capfin", make_capfin(), validate=True)


if __name__ == "__main__":
    main()
