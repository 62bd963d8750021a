"""Round-4 on-chip A/B: impl="stream" vs the round-3 "single" kernel.

One process = one corpus transfer through the tunnel; every config reuses
the same device-resident 1M x 1024 bf16 chunk-grid-padded corpus. Timing is
the scan-chain pair methodology from bench.py / docs/DESIGN.md §0c (two scan
lengths x reps, min, difference — cancels the ~8 ms/execute relay latency),
with per-iteration self-retrieval hit validation fetched inside the window.

Appends one JSON line per config to benchmarks/probe_r4_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

N_CORPUS = int(os.environ.get("PROBE_CORPUS", 1_000_000))
DIM = 1024
N_QUERIES = 256
TOPK = 100
SCAN_LENS = (8, 32)
REPS = int(os.environ.get("PROBE_REPS", 3))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_r4_results.jsonl")

CONFIGS = [
    # (label, impl, chunk)
    ("stream_c16384", "stream", 16384),
    ("stream_c8192", "stream", 8192),
    ("single_c16384", "single", 16384),
]


def main() -> None:
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    rng = np.random.default_rng(0)
    corpus_host = rng.standard_normal((N_CORPUS, DIM), dtype=np.float32)
    corpus_host /= np.linalg.norm(corpus_host, axis=-1, keepdims=True)
    query_rows = rng.integers(0, N_CORPUS, size=N_QUERIES)
    queries_host = corpus_host[query_rows].copy()

    # pre-pad to the largest probed chunk grid (16384 | 8192 both divide it)
    n_pad = -(-N_CORPUS // 16384) * 16384
    corpus_bf16 = np.zeros((n_pad, DIM), dtype=ml_dtypes.bfloat16)
    corpus_bf16[:N_CORPUS] = corpus_host.astype(ml_dtypes.bfloat16)
    del corpus_host

    t0 = time.perf_counter()
    corpus = jax.device_put(corpus_bf16)
    queries = jax.device_put(queries_host.astype(ml_dtypes.bfloat16))
    rows_d = jax.device_put(jnp.asarray(query_rows, dtype=jnp.int32))
    corpus.block_until_ready()
    del corpus_bf16
    print(f"transfer done in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    for label, impl, chunk in CONFIGS:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(qs, c, rows, iters, impl=impl, chunk=chunk):
            def body(prev_vals, _):
                prev = jax.lax.optimization_barrier(prev_vals)
                delta = (0.0 * prev[:, :1]).astype(qs.dtype)
                vals, idx = exact_topk_mips(
                    qs + delta, c, TOPK, chunk_size=chunk,
                    valid_rows=N_CORPUS, interpret=False, select="hier",
                    impl=impl)
                hits = jnp.sum((idx[:, 0] == rows).astype(jnp.int32))
                return vals, hits

            init = jnp.zeros((N_QUERIES, TOPK), dtype=jnp.float32)
            return jax.lax.scan(body, init, None, length=iters)

        try:
            windows = {}
            for n in SCAN_LENS:
                t0 = time.perf_counter()
                out = run(queries, corpus, rows_d, iters=n)
                jax.tree.map(np.asarray, out)
                compile_s = time.perf_counter() - t0
                print(f"{label} iters={n} compile+first {compile_s:.0f}s",
                      file=sys.stderr, flush=True)
                reps = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    vals, hits = run(queries, corpus, rows_d, iters=n)
                    hits_h = np.asarray(hits)
                    vals_h = np.asarray(vals)
                    reps.append(time.perf_counter() - t0)
                    assert (hits_h > 0.99 * N_QUERIES).all(), hits_h
                    assert np.isfinite(vals_h).all()
                windows[n] = min(reps)
            n0, n1 = SCAN_LENS
            per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
            rec = {"label": label, "impl": impl, "chunk": chunk,
                   "rows": N_CORPUS, "dim": DIM, "q": N_QUERIES, "k": TOPK,
                   "ms_per_batch": round(per_iter * 1e3, 3),
                   "qps": round(N_QUERIES / per_iter, 1),
                   "windows_ms": {str(k): round(v * 1e3, 1)
                                  for k, v in windows.items()}}
        except Exception as e:  # noqa: BLE001 — log and continue the A/B
            rec = {"label": label, "impl": impl, "chunk": chunk,
                   "error": f"{type(e).__name__}: {e}"[:500]}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
