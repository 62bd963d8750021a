"""Single-chip 8M-row int8 exact + approx MIPS benchmark (VERDICT r1 item 2).

The DPR north star is 21M passages (BASELINE.md); one v5e chip holds ~15M
int8 rows. This measures the largest power-of-two-ish corpus that fits
comfortably next to the search working set: 8M x 1024 int8 (8.2 GB HBM +
32 MB scales).

Timing is CHAINED (docs/DESIGN.md §0): iterations are serialized on device
via a zero delta from the previous output; the final output is fetched
inside the window and every timed output is validated (self-retrieval).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_8m_int8.py
Appends JSON lines to benchmarks/bench_8m_results.jsonl.
"""

from __future__ import annotations

import json
import time

import numpy as np

N = 8_388_608  # 8M, divisible by every chunk grid in play
D = 1024
Q = 256
K = 100
BLOCK = 1 << 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kirag_tpu.ops.quantized import quantize_rows_int8

    import os

    cache = f"/tmp/bench8m_cache_{N}_{D}_{Q}.npz"
    rng = np.random.default_rng(0)
    if os.path.exists(cache):
        z = np.load(cache, mmap_mode=None)
        corpus_i8, scales = z["corpus"], z["scales"]
        q_rows, queries_f32 = z["q_rows"], z["queries"]
        print(f"host int8 corpus loaded from cache ({cache})", flush=True)
    else:
        # build int8 + scales blockwise: never hold the f32 corpus (32GB)
        # at once (~25 min single-core; cached for reruns)
        corpus_i8 = np.empty((N, D), dtype=np.int8)
        scales = np.empty((N,), dtype=np.float32)
        q_rows = rng.integers(0, N, size=Q)
        queries_f32 = np.empty((Q, D), dtype=np.float32)
        for start in range(0, N, BLOCK):
            block = rng.standard_normal((min(BLOCK, N - start), D),
                                        dtype=np.float32)
            block /= np.linalg.norm(block, axis=-1, keepdims=True)
            (corpus_i8[start:start + len(block)],
             scales[start:start + len(block)]) = quantize_rows_int8(block)
            in_blk = (q_rows >= start) & (q_rows < start + len(block))
            queries_f32[in_blk] = block[q_rows[in_blk] - start]
            print(f"  built rows {start + len(block)}/{N}", flush=True)
        np.savez(cache, corpus=corpus_i8, scales=scales, q_rows=q_rows,
                 queries=queries_f32)
    print(f"host int8 corpus ready: {corpus_i8.nbytes / 2**30:.1f} GiB", flush=True)

    import ml_dtypes

    c = jax.device_put(corpus_i8)
    s = jax.device_put(scales)
    q = jax.device_put(queries_f32.astype(ml_dtypes.bfloat16))
    jax.block_until_ready((c, s, q))
    print("corpus on device", flush=True)

    def timed(name, fn, iters=5):
        """Chained relay-proof timing (docs/DESIGN.md §0): each iteration's
        queries are perturbed by a zero delta from the previous output, the
        final output is fetched inside the window, all outputs validated."""
        t0 = time.perf_counter()
        out = fn(q)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        delta = (0.0 * out[0][:, :1]).astype(q.dtype)
        out = fn(q + delta)  # warm the chained step's eager delta ops
        jax.block_until_ready(out)
        np.asarray(out[1])
        t0 = time.perf_counter()
        outs, prev = [], out
        for _ in range(iters):
            delta = (0.0 * prev[0][:, :1]).astype(q.dtype)
            o = fn(q + delta)
            outs.append(o)
            prev = o
        final_idx = np.asarray(outs[-1][1])
        dt = (time.perf_counter() - t0) / iters
        hits = [float(np.mean(final_idx[:, 0] == q_rows))]
        for o in outs[:-1]:
            hits.append(float(np.mean(np.asarray(o[1])[:, 0] == q_rows)))
        rec = {"bench": name, "rows": N, "ms": round(dt * 1e3, 2),
               "qps": round(Q / dt, 1), "self_hit": min(hits),
               "compile_s": round(compile_s, 1)}
        print(json.dumps(rec), flush=True)
        with open("benchmarks/bench_8m_results.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        assert min(hits) > 0.97, f"{name}: invalid timed output {hits}"

    from kirag_tpu.ops.pallas_exact import exact_topk_mips
    from kirag_tpu.ops.pallas_mips import approx_topk_mips

    jobs = {
        # 8.2 GB int8 corpus + [256, 8M] f32 scores (8.6 GB) exceed HBM, so
        # the product auto path picks the corpus-read-twice kernel here; hier
        # selection replaces the wide sorts (65k groups at 8M rows)
        "twopass16k": ("exact_twopass_hier_c16k_int8_8m",
                       lambda qq: exact_topk_mips(
                           qq, c, K, chunk_size=16384, scales=s,
                           interpret=False, select="hier", impl="auto")),
        "twopass8k": ("exact_twopass_hier_int8_8m",
                      lambda qq: exact_topk_mips(
                          qq, c, K, chunk_size=8192, scales=s,
                          interpret=False, select="hier", impl="auto")),
        # the round-4 stream kernel (scores never leave VMEM) at this scale:
        # probe_r7 attribution showed it ~2x the twopass rows above
        "stream16k": ("exact_stream_capdom_c16k_int8_8m",
                      lambda qq: exact_topk_mips(
                          qq, c, K, chunk_size=16384, scales=s,
                          interpret=False, select="capdom", impl="stream")),
        "stream32k": ("exact_stream_capdom_c32k_int8_8m",
                      lambda qq: exact_topk_mips(
                          qq, c, K, chunk_size=32768, scales=s,
                          interpret=False, select="capdom", impl="stream")),
        "approx16k": ("approx_pallas_c16k_int8_8m",
                      lambda qq: approx_topk_mips(
                          qq, c, K, chunk_size=16384, scales=s,
                          interpret=False)),
        "approx8k": ("approx_pallas_int8_8m",
                     lambda qq: approx_topk_mips(
                         qq, c, K, chunk_size=8192, scales=s,
                         interpret=False))}
    selected = os.environ.get(
        "BENCH_JOBS", "twopass16k,twopass8k,approx16k,approx8k").split(",")
    for key in selected:
        name, fn = jobs[key.strip()]
        timed(name, fn)


if __name__ == "__main__":
    main()
