"""Speculative-decode economics on chip: what a draft buys per target pass.

Zero-egress rig note: random-init weights have noise-level logit margins,
so any measured ACCEPTANCE here is meaningless for real checkpoints (an
int4 copy of a trained model agrees per-step at ~0.9+; of a random one,
far less). What IS measurable with random weights — and what actually
determines the speedup — is the mechanics:

  step_ms    : target single-token decode step (the greedy baseline unit)
  verify_ms  : target gamma-token verify pass (one weight read, gamma rows)
  draft_ms   : draft single-token step

Greedy emits 1 token per step_ms. Speculation emits (a+1) tokens per
(gamma * draft_ms + verify_ms) at per-step acceptance giving a accepted
drafts/round; the report derives the speedup curve at a = 0 .. gamma-1
and prints the measured worst-case end-to-end floor (adversarial random
draft, a ~= 0) as a sanity check of the harness overhead.

Rows append to benchmarks/bench_spec_results.jsonl. SMOKE=1 runs tiny
shapes on CPU (numbers meaningless; exercises the harness).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("SMOKE", "0") == "1"
GAMMA = int(os.environ.get("BENCH_GAMMA", 4))
NEW_TOKENS = 16 if SMOKE else int(os.environ.get("BENCH_NEW_TOKENS", 128))
BATCH = int(os.environ.get("BENCH_BATCH", 4))
PROMPT = 32 if SMOKE else 128
REPS = 2 if SMOKE else 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bench_spec_results.jsonl")


def geometry(name):
    from kirag_tpu.models.llm import LlamaConfig

    if SMOKE:
        return {
            "target": LlamaConfig(vocab_size=256, hidden_size=128,
                                  num_hidden_layers=2, num_attention_heads=4,
                                  num_key_value_heads=2, intermediate_size=256,
                                  max_position_embeddings=256,
                                  rope_theta=10000.0),
            "draft": LlamaConfig(vocab_size=256, hidden_size=64,
                                 num_hidden_layers=1, num_attention_heads=2,
                                 num_key_value_heads=1, intermediate_size=128,
                                 max_position_embeddings=256,
                                 rope_theta=10000.0),
        }[name]
    return {
        # TinyLlama-1.1B geometry (the KiRAG constructor-scale target)
        "target": LlamaConfig(vocab_size=32000, hidden_size=2048,
                              num_hidden_layers=22, num_attention_heads=32,
                              num_key_value_heads=4, intermediate_size=5632,
                              max_position_embeddings=2048,
                              rope_theta=10000.0),
        # ~160M draft: same vocab, quarter width, 12 layers
        "draft": LlamaConfig(vocab_size=32000, hidden_size=768,
                             num_hidden_layers=12, num_attention_heads=12,
                             num_key_value_heads=4, intermediate_size=2048,
                             max_position_embeddings=2048,
                             rope_theta=10000.0),
    }[name]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kirag_tpu.models.llm import greedy_decode, init_llama_params
    from kirag_tpu.models.speculative import speculative_decode

    t_cfg, d_cfg = geometry("target"), geometry("draft")
    dtype = jnp.float32 if SMOKE else jnp.bfloat16
    t_params = init_llama_params(jax.random.PRNGKey(0), t_cfg)
    d_params = init_llama_params(jax.random.PRNGKey(7), d_cfg)
    if not SMOKE:
        t_params = jax.tree.map(lambda x: x.astype(dtype)
                                if x.dtype == jnp.float32 else x, t_params)
        d_params = jax.tree.map(lambda x: x.astype(dtype)
                                if x.dtype == jnp.float32 else x, d_params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, t_cfg.vocab_size,
                                   size=(BATCH, PROMPT)).astype(np.int32))
    mask = jnp.ones_like(ids)

    def timed(label, fn, tokens_out):
        out = fn()                        # compile + warm
        jax.tree.map(np.asarray, out)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn()
            jax.tree.map(np.asarray, out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:.1f} ms "
              f"({BATCH*tokens_out/best:.1f} tok/s)", file=sys.stderr,
              flush=True)
        return best

    # end-to-end: greedy baseline and worst-case speculative
    g_s = timed("greedy", lambda: greedy_decode(
        t_params, ids, mask, t_cfg, NEW_TOKENS, dtype,
        return_logits=False)[0], NEW_TOKENS)
    s_s = timed("spec(adversarial draft)", lambda: speculative_decode(
        t_params, t_cfg, d_params, d_cfg, ids, mask, NEW_TOKENS,
        gamma=GAMMA, compute_dtype=dtype, return_logits=False)[0],
        NEW_TOKENS)

    # mechanics: amortize per-unit costs out of two end-to-end lengths
    # (same program shape family; differencing cancels prefill/dispatch)
    n2 = NEW_TOKENS * 2
    g2_s = timed("greedy 2x tokens", lambda: greedy_decode(
        t_params, ids, mask, t_cfg, n2, dtype, return_logits=False)[0], n2)
    step_ms = (g2_s - g_s) / NEW_TOKENS * 1e3

    d2_s = timed("draft-only greedy 2x", lambda: greedy_decode(
        d_params, ids, mask, d_cfg, n2, dtype, return_logits=False)[0], n2)
    d1_s = timed("draft-only greedy 1x", lambda: greedy_decode(
        d_params, ids, mask, d_cfg, NEW_TOKENS, dtype,
        return_logits=False)[0], NEW_TOKENS)
    draft_ms = (d2_s - d1_s) / NEW_TOKENS * 1e3

    # spec with adversarial draft emits ~1 token/round (a ~= 0): a round is
    # gamma draft steps + one verify pass
    round_ms = (s_s * 1e3) / NEW_TOKENS
    verify_ms = max(round_ms - GAMMA * draft_ms, 0.0)

    curve = {}
    for a in range(GAMMA):
        spec_per_tok = (GAMMA * draft_ms + verify_ms) / (a + 1)
        curve[f"a={a}"] = round(step_ms / spec_per_tok, 3)

    rec = {
        "bench": "spec_decode_mechanics",
        "geometry": "smoke" if SMOKE else "1.1b+160m",
        "batch": BATCH, "gamma": GAMMA, "new_tokens": NEW_TOKENS,
        "greedy_tok_s": round(BATCH * NEW_TOKENS / g_s, 1),
        "spec_worstcase_tok_s": round(BATCH * NEW_TOKENS / s_s, 1),
        "target_step_ms": round(step_ms, 3),
        "draft_step_ms": round(draft_ms, 3),
        "verify_pass_ms": round(verify_ms, 3),
        "speedup_vs_accept": curve,
        "platform": "cpu-smoke" if SMOKE else "tpu",
    }
    if SMOKE:
        rec["smoke"] = True
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
