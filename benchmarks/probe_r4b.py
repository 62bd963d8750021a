"""Round-4 stage attribution for impl="stream" at 1M x 1024, Q=256, k=100.

Times progressively larger slices of the stream pipeline with the scan-chain
methodology so each stage's marginal cost is the difference between
consecutive configs:

  pass       — the fused pallas pass alone (matmul + gmax + top-B capture)
  passsel    — + global group selection (hier_topk over [Q, 7813] gmax)
  nofb       — full pipeline with _STREAM_ASSERT_CAPTURE (no membership
               check, no lax.cond/fallback branch in the program)
  full       — the shipped stream path
  fullflat   — full with select="flat" (lax.top_k instead of hier)

Appends JSON lines to benchmarks/probe_r4b_results.jsonl.
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
N_QUERIES = 256
TOPK = 100
SCAN_LENS = (8, 32)
REPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4b_results.jsonl")


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

    chunk = 8192
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
    b = pe._capture_budget(TOPK, num_chunks, gpc)

    def stream_pass(qs, c):
        valid_arr = jnp.asarray(N_CORPUS, dtype=jnp.int32).reshape(1, 1)
        from jax.experimental.pallas import tpu as pltpu
        in_specs = [
            pl.BlockSpec((N_QUERIES, DIM), lambda i: (0, 0)),
            pl.BlockSpec((chunk, DIM), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, gpc, N_QUERIES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, N_QUERIES, b * pe.LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, b, N_QUERIES), lambda i: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((num_chunks, gpc, N_QUERIES), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, N_QUERIES, b * pe.LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, b, N_QUERIES), jnp.int32),
        ]
        return pl.pallas_call(
            functools.partial(pe._stream_kernel, groups_per_chunk=gpc,
                              chunk_size=chunk, b=b, quant="none"),
            grid=(num_chunks,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            interpret=False,
            **pe._compiler_params(False, parallel=True),
        )(qs, c, valid_arr)

    def make_pass_only():
        def run_one(qs, c):
            gmax_out, cand_out, gid_out = stream_pass(qs, c)
            # checksum keeps every output live without fetching them
            return (gmax_out[:, 0, :].sum() + cand_out[:, 0, 0].sum()
                    + gid_out[:, 0, :].sum().astype(jnp.float32))
        return run_one

    def make_pass_sel():
        def run_one(qs, c):
            gmax_out, cand_out, gid_out = stream_pass(qs, c)
            gmax = gmax_out.reshape(groups, N_QUERIES).T
            gvals, gsel = pe.hier_topk(gmax, TOPK)
            return (gvals.sum() + gsel.sum().astype(jnp.float32)
                    + cand_out[:, 0, 0].sum()
                    + gid_out[:, 0, :].sum().astype(jnp.float32))
        return run_one

    def make_full(select="hier"):
        def run_one(qs, c):
            vals, idx = pe.exact_topk_mips(
                qs, c, TOPK, chunk_size=chunk, valid_rows=N_CORPUS,
                interpret=False, select=select, impl="stream")
            return vals, idx
        return run_one

    def time_config(label, run_one, validate):
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
                    aux = np.asarray(run(queries, corpus, rows_d, iters=n))
                    reps.append(time.perf_counter() - t0)
                    if validate:
                        assert (aux > 0.99 * N_QUERIES).all(), aux
                windows[n] = min(reps)
            n0, n1 = SCAN_LENS
            per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
            rec = {"label": label, "chunk": chunk, "b": b,
                   "ms_per_batch": round(per_iter * 1e3, 3),
                   "windows_ms": {str(k): round(v * 1e3, 1)
                                  for k, v in windows.items()}}
        except Exception as e:  # noqa: BLE001
            rec = {"label": label, "error": f"{type(e).__name__}: {e}"[:400]}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")

    time_config("pass", make_pass_only(), validate=False)
    time_config("passsel", make_pass_sel(), validate=False)
    pe._STREAM_ASSERT_CAPTURE = True
    time_config("nofb", make_full(), validate=True)
    pe._STREAM_ASSERT_CAPTURE = False
    jax.clear_caches()
    time_config("full", make_full(), validate=True)
    time_config("fullflat", make_full(select="flat"), validate=True)


if __name__ == "__main__":
    main()
