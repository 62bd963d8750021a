"""probe_r5: stage attribution for the select="merge" stream kernel.

Times, at the headline config (1M x 1024 bf16, Q=256, k=100, chunk 8192),
each with the scan-pair differencing protocol (two lax.scan lengths x 3
reps, min-diff — cancels the ~8 ms/execute relay latency, see CLAUDE.md):

  v_capdom  : shipped round-4 default end-to-end (the 7.51 ms baseline)
  v_merge   : select="merge" end-to-end (kernel + lost check + cond +
              final_select)
  v_nocond  : merge without the lax.cond (window always served) — isolates
              the check+cond cost
  v_pass    : the merge pallas_call alone (window consumed, no tail) —
              isolates scoring+in-kernel-merge from final_select

Emits one json line per variant to benchmarks/probe_r5_results.jsonl.
SMOKE=1 shrinks shapes for a CPU interpret-mode run (rows are tagged
smoke; numbers are meaningless off-chip).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("SMOKE", "0") == "1"
N_CORPUS = 20_000 if SMOKE else 1_000_000
DIM = 128 if SMOKE else 1024
N_QUERIES = int(os.environ.get("PROBE_QUERIES", 32 if SMOKE else 256))
TOPK = 10 if SMOKE else 100
INTERPRET = SMOKE
LENS = (2, 4) if SMOKE else (8, 32)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r5_results.jsonl")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from jax.experimental import pallas as pl

    from kirag_tpu.ops import pallas_exact as pe

    rng = np.random.default_rng(0)
    corpus_host = rng.standard_normal((N_CORPUS, DIM), dtype=np.float32)
    corpus_host /= np.linalg.norm(corpus_host, axis=-1, keepdims=True)
    query_rows = rng.integers(0, N_CORPUS, size=N_QUERIES)
    queries_host = corpus_host[query_rows].copy()

    chunk = 1024 if SMOKE else 8192
    n_pad = -(-N_CORPUS // chunk) * chunk
    corpus_bf16 = np.zeros((n_pad, DIM), dtype=ml_dtypes.bfloat16)
    corpus_bf16[:N_CORPUS] = corpus_host.astype(ml_dtypes.bfloat16)
    del corpus_host
    corpus = jax.device_put(corpus_bf16)
    queries = jax.device_put(queries_host.astype(ml_dtypes.bfloat16))
    rows_d = jax.device_put(jnp.asarray(query_rows, dtype=jnp.int32))
    corpus.block_until_ready()
    del corpus_bf16
    print("transfer done", file=sys.stderr, flush=True)

    num_chunks = n_pad // chunk
    gpc = chunk // pe.LANES
    groups = n_pad // pe.LANES
    bc = pe._capture_budget(TOPK, num_chunks, gpc)
    br = max(-(-TOPK // 8) * 8, bc)

    def merge_pass(qs, c):
        """The merge pallas_call alone (mirrors _merge_body's specs)."""
        from jax.experimental.pallas import tpu as pltpu

        valid_arr = jnp.asarray(N_CORPUS, dtype=jnp.int32).reshape(1, 1)
        in_specs = [
            pl.BlockSpec((N_QUERIES, DIM), lambda j, i: (j, 0)),
            pl.BlockSpec((chunk, DIM), lambda j, i: (i, 0)),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, gpc, N_QUERIES), lambda j, i: (i, 0, j)),
            pl.BlockSpec((N_QUERIES, br, pe.LANES), lambda j, i: (j, 0, 0)),
            pl.BlockSpec((N_QUERIES, br), lambda j, i: (j, 0)),
            pl.BlockSpec((N_QUERIES, br), lambda j, i: (j, 0)),
            pl.BlockSpec((1, 1, N_QUERIES), lambda j, i: (i, 0, j)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((num_chunks, gpc, N_QUERIES), jnp.float32),
            jax.ShapeDtypeStruct((N_QUERIES, br, pe.LANES), jnp.float32),
            jax.ShapeDtypeStruct((N_QUERIES, br), jnp.float32),
            jax.ShapeDtypeStruct((N_QUERIES, br), jnp.int32),
            jax.ShapeDtypeStruct((num_chunks, 1, N_QUERIES), jnp.float32),
        ]
        return pl.pallas_call(
            functools.partial(pe._merge_kernel, groups_per_chunk=gpc,
                              chunk_size=chunk, bc=bc, br=br,
                              num_chunks=num_chunks, total_groups=groups,
                              quant="none"),
            grid=(1, num_chunks),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            interpret=INTERPRET,
            **pe._compiler_params(INTERPRET),
        )(qs, c, valid_arr)

    def v_pass(qs, c):
        gmax_out, win, wkey, wgid, lost = merge_pass(qs, c)
        # consume the window without the tail; vals row 0 carries wkey so
        # the scan body keeps a real data dependency
        fake_idx = wgid[:, :TOPK] * pe.LANES
        return wkey[:, :TOPK], fake_idx

    def v_merge(qs, c):
        return pe.exact_topk_mips(qs, c, TOPK, chunk_size=chunk,
                                  valid_rows=N_CORPUS, interpret=INTERPRET,
                                  select="merge", impl="stream")

    def v_capdom(qs, c):
        return pe.exact_topk_mips(qs, c, TOPK, chunk_size=chunk,
                                  valid_rows=N_CORPUS, interpret=INTERPRET,
                                  select="capdom", impl="stream")

    def run_pair(call, check=True):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(qs, c, rows, iters):
            def body(prev_vals, _):
                prev = jax.lax.optimization_barrier(prev_vals)
                delta = (0.0 * prev[:, :1]).astype(qs.dtype)
                vals, idx = call(qs + delta, c)
                hits = jnp.sum((idx[:, 0] == rows).astype(jnp.int32))
                return vals.astype(jnp.float32), hits

            init = jnp.zeros((N_QUERIES, TOPK), dtype=jnp.float32)
            return jax.lax.scan(body, init, None, length=iters)

        windows = {}
        for n in LENS:
            out = run(queries, corpus, rows_d, iters=n)
            jax.tree.map(np.asarray, out)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                vals, hits = run(queries, corpus, rows_d, iters=n)
                hits_h = np.asarray(hits)
                vals_h = np.asarray(vals)
                reps.append(time.perf_counter() - t0)
                if check:
                    assert (hits_h > 0.99 * N_QUERIES).all(), hits_h
                assert np.isfinite(vals_h).all()
            windows[n] = min(reps)
        n0, n1 = LENS
        per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
        return {"ms": round(per_iter * 1e3, 3),
                "qps": round(N_QUERIES / per_iter, 1),
                "window_ms": {str(n): round(w * 1e3, 1)
                              for n, w in windows.items()}}

    variants = [("v_capdom", lambda: run_pair(v_capdom)),
                ("v_merge", lambda: run_pair(v_merge)),
                ("v_nocond", None),  # filled below (needs the assert flag)
                ("v_pass", lambda: run_pair(v_pass, check=False))]

    def run_nocond():
        jax.clear_caches()
        pe._STREAM_ASSERT_CAPTURE = True
        try:
            return run_pair(v_merge)
        finally:
            pe._STREAM_ASSERT_CAPTURE = False
            jax.clear_caches()

    variants[2] = ("v_nocond", run_nocond)

    # PROBE_VARIANTS=v_pass,v_merge runs a subset in the given order — the
    # r4 on-chip lesson: the full-merge program's first compile can exceed a
    # job window, so the kernel-only variant must be runnable first/alone
    sel = os.environ.get("PROBE_VARIANTS")
    if sel:
        by_name = dict(variants)
        variants = [(n.strip(), by_name[n.strip()])
                    for n in sel.split(",") if n.strip() in by_name]

    for name, fn in variants:
        print(f"--- {name}", file=sys.stderr, flush=True)
        try:
            rec = {"probe": name, "n": N_CORPUS, "dim": DIM,
                   "n_queries": N_QUERIES, "k": TOPK, "chunk": chunk,
                   "bc": bc, "br": br, **fn()}
        except Exception as e:  # noqa: BLE001 - record and continue
            rec = {"probe": name, "error": str(e).split("\n")[0][:300]}
        if SMOKE:
            rec["smoke"] = True
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
