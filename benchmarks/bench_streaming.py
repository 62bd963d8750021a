"""Beyond-HBM streaming search benchmark (VERDICT r3 item 3).

Measures `TPUIndexer(max_device_rows=...)`'s streaming mode — the
single-chip answer for corpora larger than HBM (`index/indexer.py`,
`_streaming_search`) — at 8.4M x 1024 rows with int8 block compression:
8.6 GiB of corpus re-copied host->HBM per search batch.

On this rig the host->device path is a remote tunnel (CLAUDE.md: corpus
transfers run 8-45 min for ~10 GiB), so the measured qps is dominated by
tunnel bandwidth rather than the PCIe link a production host would have.
The record therefore carries BOTH the measured number and a projection at
PCIe-gen4-x16-class H2D (16 GiB/s) computed from the measured device-compute
residual, so the artifact stays honest about what was measured on which
hardware path.

Validation: every query is a corpus row; top-1 must be the row itself
(int8 has ~0.39% worst-case per-dot error, far under planted self-margins).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_streaming.py
Appends JSON lines to benchmarks/bench_streaming_results.jsonl.
Env knobs (smoke): BENCH_ROWS, BENCH_DEV_ROWS, BENCH_QUERIES.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N = int(os.environ.get("BENCH_ROWS", 8_388_608))
D = 1024
Q = int(os.environ.get("BENCH_QUERIES", 256))
K = 100
DEV_ROWS = int(os.environ.get("BENCH_DEV_ROWS", 2_097_152))
BLOCK = 1 << 20
OUT = "benchmarks/bench_streaming_results.jsonl"


def main() -> None:
    import jax

    from kirag_tpu.index import TPUIndexer

    rng = np.random.default_rng(0)
    q_rows = np.sort(rng.choice(N, size=Q, replace=False))
    queries = np.empty((Q, D), dtype=np.float32)

    indexer = TPUIndexer(vector_sz=D, compression="int8",
                         max_device_rows=DEV_ROWS, pallas_chunk_size=8192,
                         exact_impl="auto")
    t0 = time.perf_counter()
    for start in range(0, N, BLOCK):
        stop = min(start + BLOCK, N)
        block = rng.standard_normal((stop - start, D), dtype=np.float32)
        block /= np.linalg.norm(block, axis=-1, keepdims=True)
        in_blk = (q_rows >= start) & (q_rows < stop)
        queries[in_blk] = block[q_rows[in_blk] - start]
        indexer.index_data(np.arange(start, stop), block)
        print(f"  indexed rows {stop}/{N}", flush=True)
    print(f"host corpus built in {time.perf_counter() - t0:.0f}s", flush=True)
    assert indexer._use_streaming(), "bench must exercise the streaming path"

    t0 = time.perf_counter()
    indexer._prepare_stream_blocks()
    prep_s = time.perf_counter() - t0
    streamed = sum(b["corpus"].nbytes + b.get("scales", np.empty(0)).nbytes
                   for b in indexer._stream_blocks)
    print(f"stream blocks prepared in {prep_s:.0f}s "
          f"({streamed / 2**30:.2f} GiB/search)", flush=True)

    def one_search():
        t0 = time.perf_counter()
        res = indexer.search_knn(queries, K, index_batch_size=Q)
        return time.perf_counter() - t0, res

    warm_s, res = one_search()  # includes per-block-shape compiles
    self_hit = float(np.mean([r[0][0] == str(qr)
                              for r, qr in zip(res, q_rows)]))
    print(f"warm search {warm_s:.1f}s self_hit={self_hit}", flush=True)
    steady_s, res2 = one_search()
    self_hit2 = float(np.mean([r[0][0] == str(qr)
                               for r, qr in zip(res2, q_rows)]))
    assert self_hit2 >= 0.99, self_hit2

    gib = streamed / 2**30
    h2d_gibps = gib / steady_s  # upper bound: compute overlaps the copies
    # device-compute residual from the resident 8.4M int8 measurement
    # (bench_8m_results: 2746 qps -> Q/2746 s per batch); the rest is H2D.
    compute_s = Q / 2746.0
    pcie_s = compute_s + gib / 16.0
    rec = {"bench": "streaming_int8", "rows": N, "dev_rows": DEV_ROWS,
           "queries": Q, "k": K,
           "warm_s": round(warm_s, 1), "steady_s": round(steady_s, 1),
           "qps": round(Q / steady_s, 2), "self_hit": self_hit2,
           "streamed_gib_per_search": round(gib, 2),
           "h2d_gibps_achieved": round(h2d_gibps, 3),
           "projected_qps_at_pcie16": round(Q / pcie_s, 1),
           "note": "h2d over remote tunnel on this rig; projection uses "
                   "measured resident-compute residual + 16 GiB/s H2D"}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
