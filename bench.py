"""Benchmark: exact MIPS retrieval throughput on one TPU chip vs CPU flat search.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is queries/sec for exact top-100 inner-product search over
a 1M x 1024 corpus (the per-chip unit of the 21M-passage DPR workload; the
corpus scales across chips by row-sharding). ``vs_baseline`` is the speedup
over a CPU flat exact search (torch matmul + topk — the stand-in for the
reference's faiss.IndexFlatIP, `retriever/index.py:36-53`), PINNED in
benchmarks/cpu_baseline.json so the denominator is identical across rounds.

Timing is SCAN-CHAINED (docs/DESIGN.md §0, round-3 revision): one jit program
runs N chained search iterations via `lax.scan` — each iteration's queries
are perturbed by a zero delta from the previous iteration's values (true
device-side data dependency: no relay layer can dedup or reorder), with a
device-computed self-retrieval hit count per iteration. Two scan lengths are
timed and DIFFERENCED, which cancels the constant dispatch+fetch cost of a
window exactly. Rationale: the round-2 methodology fetched every iteration
inside the window (billing ~100ms of link latency per iteration: BENCH_r02
5.8k qps vs 9.6k chained for the identical program), and even one-dispatch-
per-iteration chaining bills ~8ms of per-execute relay latency per iteration
(probe_r3: micro top_k costs vs single-dispatch chained costs). Validation:
per-iteration hit counts for every timed iteration + the final iteration's
full values, all fetched inside the windows.
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
SCAN_LENS = (int(os.environ.get("BENCH_ITERS_LO", 8)),
             int(os.environ.get("BENCH_ITERS_HI", 32)))
# kernel knobs (defaults = the on-chip A/B winner per impl: stream@8192
# measured 7.59 ms vs single@16384's 8.77 ms, probe_r4b — stream reads the
# corpus once and keeps scores in VMEM, so smaller chunks win there while
# single amortized its HBM score stream with bigger ones; select=capdom
# measured 7.51 ms vs hier's 7.72 with the query-tiled grid, r4 on-chip)
IMPL = os.environ.get("BENCH_IMPL", "stream")
CHUNK = int(os.environ.get("BENCH_CHUNK", 8192 if IMPL == "stream" else 16384))
SELECT = os.environ.get("BENCH_SELECT",
                        "capdom" if IMPL == "stream" else "hier")
# "flag" = the product search_knn path (r5): no in-program lax.cond fallback;
# the exactness flag is fetched with the results and asserted after each
# window (a False flag would make the host re-dispatch the checked program —
# never observed on non-adversarial corpora; the cond's presence alone
# measured ~0.7 ms/batch, probe_r8 capfin vs full)
ON_MISS = os.environ.get("BENCH_ONMISS", "flag")

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

    # pre-pad to the kernel's chunk grid ONCE on host (what TPUIndexer does
    # at to_device): otherwise the jit body pads the corpus itself — a 2 GB
    # read+write of the whole matrix inside every timed call. Build the
    # padded buffer directly in bf16 (half the transfer bytes, and no second
    # full f32 copy: at 8M rows that transient would be another 32 GB RSS)
    n_pad = -(-N_CORPUS // CHUNK) * CHUNK
    corpus_bf16 = np.zeros((n_pad, DIM), dtype=ml_dtypes.bfloat16)
    corpus_bf16[:N_CORPUS] = corpus_host.astype(ml_dtypes.bfloat16)
    del corpus_host

    corpus = jax.device_put(corpus_bf16)
    queries = jax.device_put(queries_host.astype(ml_dtypes.bfloat16))
    corpus.block_until_ready()
    del corpus_bf16

    import functools

    import jax.numpy as jnp

    rows_d = jax.device_put(jnp.asarray(query_rows, dtype=jnp.int32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(qs, c, rows, iters):
        def body(prev_vals, _):
            # chain: zero delta derived from the previous iteration's values
            # behind an optimization barrier — robust by construction against
            # any future x*0 folding (a simplifier change could otherwise
            # decouple iterations silently; ADVICE r3)
            prev = jax.lax.optimization_barrier(prev_vals)
            delta = (0.0 * prev[:, :1]).astype(qs.dtype)
            out = exact_topk_mips(qs + delta, c, TOPK, chunk_size=CHUNK,
                                  valid_rows=N_CORPUS,
                                  interpret=False, select=SELECT,
                                  impl=IMPL, on_miss=ON_MISS)
            vals, idx = out[:2]
            ok = out[2] if ON_MISS == "flag" else jnp.asarray(True)
            hits = jnp.sum((idx[:, 0] == rows).astype(jnp.int32))
            return vals, (hits, ok)

        init = jnp.zeros((N_QUERIES, TOPK), dtype=jnp.float32)
        last_vals, (hits, oks) = jax.lax.scan(body, init, None, length=iters)
        return last_vals, hits, oks

    def measure_windows():
        windows = {}
        for n in SCAN_LENS:
            out = run(queries, corpus, rows_d, iters=n)  # warm/compile
            jax.tree.map(np.asarray, out)
            reps = []
            for _ in range(int(os.environ.get("BENCH_REPS", 3))):
                t0 = time.perf_counter()
                vals, hits, oks = run(queries, corpus, rows_d, iters=n)
                hits_h = np.asarray(hits)            # fetched inside window
                vals_h = np.asarray(vals)
                oks_h = np.asarray(oks)
                reps.append(time.perf_counter() - t0)
                # every timed iteration: queries sampled from the corpus must
                # retrieve themselves top-1 (bf16 rounding can flip the odd
                # near-tie, hence 0.99 not 1.0)
                assert (hits_h > 0.99 * N_QUERIES).all(), hits_h
                assert np.isfinite(vals_h).all()
                # flag mode: every timed iteration's capture must be exact
                # (a miss would require the checked re-dispatch the product
                # path performs — that run would not be this benchmark)
                assert oks_h.all(), "capture miss inside timed window"
            # min over repetitions: the differencing assumes the dispatch+
            # fetch constant is CONSTANT — a relay hiccup inside one window
            # otherwise gets billed to the kernel (+150ms observed once)
            windows[n] = min(reps)
        return windows

    n0, n1 = SCAN_LENS
    for attempt in range(int(os.environ.get("BENCH_ATTEMPTS", 3))):
        windows = measure_windows()
        per_iter = (windows[n1] - windows[n0]) / (n1 - n0)
        print(f"windows: {n0}-iter {windows[n0]*1e3:.1f}ms, "
              f"{n1}-iter {windows[n1]*1e3:.1f}ms -> "
              f"{per_iter*1e3:.2f}ms/iter", file=sys.stderr)
        if per_iter > 0:
            return N_QUERIES / per_iter
        # A short window slower than a long one means another process held
        # the (single-tenant) chip or the relay mid-window — the differencing
        # assumption is void, not the kernel (observed r4: -37 ms/iter while
        # a decode bench + a 21M index build shared the chip). Re-measure.
        print("non-positive window diff (chip/relay contention?); retrying",
              file=sys.stderr)
    raise RuntimeError(
        f"window differencing failed {attempt + 1} times: {windows}; "
        "is another process using the chip?")


def cpu_baseline_qps() -> float:
    """The pinned CPU flat-search baseline (measured once, round 3). Used
    only when its recorded config matches the current one (BENCH_* overrides
    would otherwise silently divide by the wrong denominator — ADVICE r3);
    re-measures on mismatch or a missing sidecar."""
    try:
        with open(BASELINE_PATH) as f:
            side = json.load(f)
        recorded = (side.get("scaled_to_rows"), side.get("dim", DIM),
                    side.get("n_queries"), side.get("topk"))
        if recorded == (N_CORPUS, DIM, N_QUERIES, TOPK):
            return float(side["cpu_qps"])
        print(f"pinned baseline is for config {recorded}, current is "
              f"{(N_CORPUS, DIM, N_QUERIES, TOPK)}; re-measuring",
              file=sys.stderr)
    except (OSError, KeyError, ValueError) as e:
        print(f"pinned baseline unavailable ({e}); re-measuring", file=sys.stderr)
    import torch

    rows = min(250_000, N_CORPUS)
    rng = np.random.default_rng(1)
    corpus = torch.from_numpy(rng.standard_normal((rows, DIM),
                                                  dtype=np.float32))
    queries = torch.from_numpy(rng.standard_normal((N_QUERIES, DIM),
                                                   dtype=np.float32))
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
