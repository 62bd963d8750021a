"""Price the prefix-KV path against plain prefill at serving geometry.

The r5 lever run showed the constructor stage SLOWER with prefix caching on
(37.7 s vs 21.5 s of r4, bench_kirag_batched_results.jsonl) while int8 KV
sped up the prefix-free KG stage. This isolates the program economics:

  plain    — greedy_decode over the full [B, t_prompt] prompt
  prefixed — greedy_decode_prefixed with match_len=M cached slots
             (the pool seeded once, outside the timed window)

at TinyLlama-1.1B int8 geometry, B=16 (the wide batched-loop constructor
batch), decode 32 tokens. Window-differenced over two decode lengths so the
per-call dispatch constant cancels. The prefixed call should save
~(M/t_prompt) of the prefill FLOPs; if it measures SLOWER, the pool slot
gather + the longer decode window (pb + t_suf vs t_prompt) ate the win.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_prefix_micro.py
Env: SMOKE=1, BENCH_KV_BITS=8, BENCH_B, BENCH_PROMPT, BENCH_MATCH
Appends JSON lines to benchmarks/bench_prefix_results.jsonl.
"""

from __future__ import annotations

import gc
import json
import os
import time

import numpy as np

SMOKE = os.environ.get("SMOKE", "0") == "1"
B = int(os.environ.get("BENCH_B", 4 if SMOKE else 16))
PROMPT = int(os.environ.get("BENCH_PROMPT", 96 if SMOKE else 1792))
MATCH = int(os.environ.get("BENCH_MATCH", 64 if SMOKE else 1536))
NEW = 8 if SMOKE else 32
KV_BITS = int(os.environ.get("BENCH_KV_BITS", 0)) or None
POOL_TOKENS = 128 if SMOKE else 2048
REPS = 2 if SMOKE else 3
OUT = "benchmarks/bench_prefix_results.jsonl"


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kirag_tpu.models.llm import (
        LlamaConfig, alloc_prefix_pool, greedy_decode, greedy_decode_prefixed,
        init_llama_params, quantize_llama_params, write_prefix_pool)

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        cfg = LlamaConfig(vocab_size=512, hidden_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, intermediate_size=256,
                          max_position_embeddings=4096)
        dtype = jnp.float32
    else:
        cfg = LlamaConfig(vocab_size=32000, hidden_size=2048,
                          intermediate_size=5632, num_hidden_layers=22,
                          num_attention_heads=32, num_key_value_heads=4,
                          max_position_embeddings=4096)
        dtype = jnp.bfloat16
    if KV_BITS:
        import dataclasses
        cfg = dataclasses.replace(cfg, kv_quant_bits=KV_BITS)

    params = init_llama_params(jax.random.key(3), cfg)
    params = quantize_llama_params(
        jax.tree.map(np.asarray, params), bits=8)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(B, PROMPT)).astype(np.int32)
    mask = np.ones((B, PROMPT), np.int32)

    # pool seeded with each row's first MATCH tokens (outside timed windows)
    pool = alloc_prefix_pool(cfg, B, POOL_TOKENS, dtype)
    seeded = np.zeros((B, POOL_TOKENS), np.int32)
    seeded[:, :MATCH] = ids[:, :MATCH]
    smask = np.zeros((B, POOL_TOKENS), np.int32)
    smask[:, :MATCH] = 1
    for r in range(B):
        pool = write_prefix_pool(params, pool, jnp.asarray(r),
                                 jnp.asarray(seeded[r:r + 1]),
                                 jnp.asarray(smask[r:r + 1]), cfg, dtype)
    jax.block_until_ready(pool)

    suffix = ids[:, MATCH:]
    sufmask = np.ones_like(suffix)
    slot_idx = jnp.arange(B, dtype=jnp.int32)
    match_len = jnp.full((B,), MATCH, jnp.int32)

    def run_plain(n):
        o, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                             cfg, n, dtype, eos_token_id=-1,
                             return_logits=False)
        return o

    def run_prefixed(n):
        o, _ = greedy_decode_prefixed(
            params, pool, slot_idx, match_len, jnp.asarray(suffix),
            jnp.asarray(sufmask), cfg, n, dtype, eos_token_id=-1,
            return_logits=False)
        return o

    def window(fn, n):
        out = fn(n)                      # compile + warm
        np.asarray(out)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(n)
            final = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
            assert final.shape == (B, n) and (final >= 0).all()
        return best

    for label, fn in (("plain", run_plain), ("prefixed", run_prefixed)):
        w_lo, w_hi = window(fn, NEW), window(fn, 2 * NEW)
        per_step = (w_hi - w_lo) / NEW
        # prefill+dispatch constant = whole-call cost minus the decode steps
        call_const = w_lo - per_step * NEW
        rec = {"bench": "prefix_micro", "mode": label, "batch": B,
               "prompt": PROMPT, "match": MATCH if label == "prefixed" else 0,
               "pool_tokens": POOL_TOKENS if label == "prefixed" else 0,
               "kv_bits": KV_BITS or 0, "new": NEW,
               "ms_per_step": round(per_step * 1e3, 2),
               "prefill_plus_dispatch_ms": round(call_const * 1e3, 1),
               "call_ms_at_new": round(w_lo * 1e3, 1),
               "loadavg": round(os.getloadavg()[0], 1)}
        print(json.dumps(rec), flush=True)
        if not SMOKE:
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
        gc.collect()


if __name__ == "__main__":
    main()
