"""Benchmark: exact MIPS retrieval throughput on one TPU chip vs CPU flat search.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is queries/sec for exact top-100 inner-product search over
a 1M x 1024 corpus (the per-chip unit of the 21M-passage DPR workload; the
corpus scales across chips by row-sharding). ``vs_baseline`` is the speedup
over a CPU flat exact search (torch matmul + topk — the stand-in for the
reference's faiss.IndexFlatIP, `retriever/index.py:36-53`), PINNED in
benchmarks/cpu_baseline.json so the denominator is identical across rounds.

Timing is CHAINED (docs/DESIGN.md §0): each iteration's input is perturbed by
a zero delta derived from the previous output, so the device serializes all
iterations and no relay layer can dedup them; the final output is fetched
inside the window and EVERY timed output is validated after. The round-2
methodology fetched every iteration inside the window, which billed ~100ms of
relay link latency per iteration to the kernel (BENCH_r02 5.8k qps vs 9.6k
chained for the identical program — VERDICT r2 weak #1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_CORPUS = int(os.environ.get("BENCH_CORPUS", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 1024))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 256))
TOPK = int(os.environ.get("BENCH_TOPK", 100))
ITERS = int(os.environ.get("BENCH_ITERS", 8))
# kernel knobs (defaults = the on-chip A/B winner, benchmarks/probe_r3_results.jsonl)
CHUNK = int(os.environ.get("BENCH_CHUNK", 8192))
SELECT = os.environ.get("BENCH_SELECT", "hier")
IMPL = os.environ.get("BENCH_IMPL", "single")

BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "cpu_baseline.json")


def tpu_qps() -> float:
    import jax
    import ml_dtypes

    from kirag_tpu.ops.pallas_exact import exact_topk_mips

    rng = np.random.default_rng(0)
    # float32 generation directly (randn makes float64: 8GB + 20x slower)
    corpus_host = rng.standard_normal((N_CORPUS, DIM), dtype=np.float32)
    corpus_host /= np.linalg.norm(corpus_host, axis=-1, keepdims=True)
    query_rows = rng.integers(0, N_CORPUS, size=N_QUERIES)
    queries_host = corpus_host[query_rows].copy()

    # cast to bf16 on host (half the bytes over the transfer link)
    corpus = jax.device_put(corpus_host.astype(ml_dtypes.bfloat16))
    queries = jax.device_put(queries_host.astype(ml_dtypes.bfloat16))
    corpus.block_until_ready()
    del corpus_host

    def run(q):
        # the product exact path: single-read fused Pallas kernel (one corpus
        # read; scores materialized, candidates gathered from them) +
        # hierarchical two-level selection
        return exact_topk_mips(q, corpus, TOPK, chunk_size=CHUNK,
                               interpret=False, select=SELECT, impl=IMPL)

    def validate(idx_host):
        # queries sampled from the corpus must retrieve themselves top-1
        # (bf16 rounding can flip the odd near-tie, hence 0.99 not 1.0)
        hit = float(np.mean(idx_host[:, 0] == query_rows))
        assert hit > 0.99, f"self-retrieval hit rate {hit}"

    # warm the compile AND the chained step's eager delta ops (their first
    # use costs a multi-second remote compile that must not land in iter 1)
    out = run(queries)
    jax.block_until_ready(out)
    validate(np.asarray(out[1]))
    delta = (0.0 * out[0][:, :1]).astype(queries.dtype)
    out = run(queries + delta)
    jax.block_until_ready(out)
    np.asarray(out[1])

    t0 = time.perf_counter()
    outs = []
    prev = out
    for _ in range(ITERS):
        delta = (0.0 * prev[0][:, :1]).astype(queries.dtype)
        o = run(queries + delta)
        outs.append(o)
        prev = o
    final_idx = np.asarray(outs[-1][1])  # fetch INSIDE the window: the relay
    dt = (time.perf_counter() - t0) / ITERS   # does not reliably block otherwise
    validate(final_idx)
    for v, i in outs[:-1]:
        validate(np.asarray(i))  # every timed output must be real + correct
    return N_QUERIES / dt


def cpu_baseline_qps() -> float:
    """The pinned CPU flat-search baseline (measured once, round 3). Falls
    back to re-measuring only if the sidecar is missing."""
    try:
        with open(BASELINE_PATH) as f:
            return float(json.load(f)["cpu_qps"])
    except (OSError, KeyError, ValueError) as e:
        print(f"pinned baseline unavailable ({e}); re-measuring", file=sys.stderr)
    import torch

    rows = min(250_000, N_CORPUS)
    rng = np.random.RandomState(1)
    corpus = torch.from_numpy(rng.randn(rows, DIM).astype(np.float32))
    queries = torch.from_numpy(rng.randn(N_QUERIES, DIM).astype(np.float32))
    torch.topk(queries[:8] @ corpus.T[:, :1024], k=min(TOPK, 1024), dim=1)
    t0 = time.perf_counter()
    scores = queries @ corpus.T
    torch.topk(scores, k=TOPK, dim=1)
    dt = (time.perf_counter() - t0) * (N_CORPUS / rows)
    return N_QUERIES / dt


def main() -> None:
    qps = tpu_qps()
    try:
        baseline = cpu_baseline_qps()
    except Exception as e:  # torch missing etc.
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        baseline = None
    vs = (qps / baseline) if baseline else 1.0
    print(json.dumps({
        "metric": f"exact_mips_qps_top{TOPK}_{N_CORPUS // 1000}k_x{DIM}",
        "value": round(qps, 2),
        "unit": "queries/sec/chip",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
