"""Codebook-PQ recall/qps at 1M x 1024 on one chip (VERDICT r4 #8 "done").

Measures the quant="pq4" exact-kernel path (ops/pq.py strided-subspace PQ,
15-select level-table decode in VMEM) at three memory points:

  m=512 -> 256 B/row (16x vs f32),  m=256 -> 128 B/row (32x),
  m=128 ->  64 B/row (64x)

against scalar int4 (512 B/row + scales, 8x) and the f32 host oracle on a
PLANTED corpus (bench_21m_int4's graded clusters: random gaussian corpora
have no retrievable structure at 1M rows, so recall must be read on
e5/DPR-shaped score margins instead).

Reported per point: train_s (device k-means), encode_s, qps (scan-chained
windows — per-dispatch timing would bill ~8 ms relay latency per batch),
recall@10/@100 vs the f32 oracle, self-hit (informational: at 32x+ the
reconstruction noise can legitimately displace the query's own row below
its alpha=0.94 planted neighbor).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_pq_1m.py
Env: BENCH_MS=512,256,128  SMOKE=1 (tiny, CPU interpret)
Appends JSON lines to benchmarks/bench_pq_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("SMOKE", "0") == "1"
N = 65_536 if SMOKE else 1_000_000
D = 256 if SMOKE else 1024
Q = 32 if SMOKE else 256
K_TOP = 20 if SMOKE else 100
MS = tuple(int(x) for x in os.environ.get(
    "BENCH_MS", "128" if SMOKE else "512,256,128").split(","))
CHUNK = 2048 if SMOKE else 8192
SCAN_LENS = (2, 6) if SMOKE else (8, 32)
REPS = 2 if SMOKE else 3
TRAIN_SAMPLE = 8192 if SMOKE else 131_072
OUT = "benchmarks/bench_pq_results.jsonl"


def main() -> None:
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.bench_21m_int4 import _plant_alphas, _plant_block
    from kirag_tpu.ops.pallas_exact import exact_topk_mips
    from kirag_tpu.ops.pq import encode_pq, pq_level_table, train_pq

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    q_rows = np.arange(Q, dtype=np.int64) * (N // Q) + 3
    queries = corpus[q_rows].copy()
    _plant_block(corpus, 0, queries, q_rows, _plant_alphas())
    print("corpus planted", file=sys.stderr, flush=True)

    # f32 oracle (blockwise BLAS)
    oracle = np.empty((Q, K_TOP), np.int64)
    blk = 1 << 18
    top_s = np.full((Q, 128), -np.inf, np.float32)
    top_i = np.zeros((Q, 128), np.int64)
    from benchmarks.bench_21m_int4 import _finalize, _merge_top
    for start in range(0, N, blk):
        s = queries @ corpus[start:start + blk].T
        top_s, top_i = _merge_top(top_s, top_i, s, start)
    oracle = _finalize(top_s, top_i, K_TOP)
    o100 = [set(r.tolist()) for r in oracle]
    o10 = [set(r[:10].tolist()) for r in oracle]
    print("oracle done", file=sys.stderr, flush=True)

    queries_d = jax.device_put(queries.astype(ml_dtypes.bfloat16))
    oracle10_d = jax.device_put(jnp.asarray(oracle[:, :10], jnp.int32))

    def run_point(m):
        t0 = time.perf_counter()
        sample = corpus[rng.choice(N, TRAIN_SAMPLE, replace=False)]
        codebooks = train_pq(sample, m, iters=25)
        train_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        codes = np.empty((N, m // 2), np.uint8)
        eb = 1 << 18
        for start in range(0, N, eb):
            codes[start:start + eb] = encode_pq(corpus[start:start + eb],
                                                codebooks)
        encode_s = time.perf_counter() - t0
        table = pq_level_table(codebooks)

        pad = (-N) % CHUNK
        codes_p = np.pad(codes, ((0, pad), (0, 0)))
        codes_d = jax.device_put(codes_p)
        table_d = jax.device_put(table)

        def search(qs, cd=None, td=None):
            return exact_topk_mips(qs, codes_d if cd is None else cd,
                                   K_TOP, chunk_size=CHUNK,
                                   valid_rows=N, interpret=SMOKE,
                                   scales=table_d if td is None else td,
                                   quant="pq4", select="hier", impl="stream")

        # scan-chained windows; per-iteration device-side sanity = overlap
        # of the top-100 with the f32 oracle's top-10 (planted margins make
        # a broken kernel collapse this to ~0)
        # codes/table/oracle ride as jit ARGS, not closure constants
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(qs, cd, td, o10, iters):
            def body(prev, _):
                p = jax.lax.optimization_barrier(prev)
                delta = (0.0 * p).astype(qs.dtype)
                vals, idx = search(qs + delta[None, None], cd, td)
                hit = jnp.sum((idx[:, None, :] == o10[:, :, None])
                              .any(-1).astype(jnp.int32))
                return vals[0, 0], hit
            _, aux = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return aux

        windows = {}
        for n in SCAN_LENS:
            t0 = time.perf_counter()
            aux = np.asarray(run(queries_d, codes_d, table_d, oracle10_d,
                                 iters=n))
            print(f"m={m} iters={n} compile+first "
                  f"{time.perf_counter() - t0:.0f}s",
                  file=sys.stderr, flush=True)
            floor = 0.3 * Q * 10
            assert (aux > floor).all(), (m, aux, floor)
            reps = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                aux = np.asarray(run(queries_d, codes_d, table_d,
                                     oracle10_d, iters=n))
                reps.append(time.perf_counter() - t0)
                assert (aux > floor).all(), (m, aux, floor)
            windows[n] = min(reps)
        n0, n1 = SCAN_LENS
        per_iter = (windows[n1] - windows[n0]) / (n1 - n0)

        vals, idx = jax.tree.map(np.asarray, search(queries_d))
        r100 = float(np.mean([len(set(a.tolist()) & b) / K_TOP
                              for a, b in zip(idx, o100)]))
        r10 = float(np.mean([len(set(a[:10].tolist()) & b) / 10
                             for a, b in zip(idx, o10)]))
        self_hit = float(np.mean(idx[:, 0] == q_rows))
        rec = {"bench": f"pq4_m{m}_1m", "rows": N, "dim": D, "m": m,
               "bytes_per_row": m // 2,
               "compression_vs_f32": round(4 * D / (m / 2), 1),
               "train_s": round(train_s, 1), "encode_s": round(encode_s, 1),
               "ms_per_batch": round(per_iter * 1e3, 2),
               "qps": round(Q / per_iter, 1),
               "recall_at10_vs_f32": round(r10, 4),
               "recall_at100_vs_f32": round(r100, 4),
               "self_hit": round(self_hit, 3),
               "loadavg": round(os.getloadavg()[0], 1),
               "windows_ms": {str(k): round(v * 1e3, 1)
                              for k, v in windows.items()}}
        print(json.dumps(rec), flush=True)
        if not SMOKE or os.environ.get("SMOKE_WRITE"):
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")

    for m in MS:
        if not SMOKE and m % 256 != 0:
            # on-TPU pq4 packs m/2 uint8 columns, which Mosaic window
            # slicing needs lane-aligned (128): m=128 (64x compression) is
            # structurally out with the strided packing — 32x (m=256) is
            # the measured compression floor (r5; the ValueError from
            # exact_topk_mips is the same constraint, surfaced earlier)
            print(json.dumps({"bench": f"pq4_m{m}_1m", "skipped":
                              "m % 256 != 0: packed columns below the "
                              "128-lane Mosaic window"}), flush=True)
            continue
        run_point(m)


if __name__ == "__main__":
    main()
