"""Aligner contrastive-training throughput on one TPU chip (VERDICT r2 #6).

e5-large geometry (24L/1024h), the reference trainer's batch geometry
(`trainer/aligner_trainer.py` + `train_aligner.py` defaults: query len 256,
doc len 64, 1 positive + 3 negatives per query), bf16 compute, AdamW — the
same jitted update the product `AlignerTrainer` runs (loss =
`training.in_batch_contrastive_loss`, optimizer = `make_optimizer`).

Timing: training steps are chained BY CONSTRUCTION (step t+1 consumes step
t's params), so a K-step device loop with one final fetch is relay-proof
(docs/DESIGN.md §0) and measures pure device step time. Host-side data
loading is benchmarked separately (native TSV loader) and overlaps in
production.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_train.py
Appends JSON lines to benchmarks/bench_train_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

SMOKE = os.environ.get("SMOKE", "0") == "1"
B_QUERIES = 4 if SMOKE else 32
DOCS_PER_QUERY = 4          # 1 positive + 3 negatives (reference sampling)
Q_LEN, D_LEN = (32, 16) if SMOKE else (256, 64)
STEPS = 3 if SMOKE else 20
# MFU A/B knobs (VERDICT r3 #8): remat mode and QKV fusion
REMAT = os.environ.get("BENCH_REMAT", "full")      # full | dots | none
FUSED_QKV = os.environ.get("BENCH_FUSED_QKV", "1") == "1"
# VERDICT r4 #4: query+doc packing into one forward (4 docs per 256-token
# row via segment ids; see training.aligner._embed_packed)
PACKED = os.environ.get("BENCH_PACKED", "0") == "1"


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from kirag_tpu.models import BertConfig, init_bert_params
    from kirag_tpu.training import TrainerConfig, in_batch_contrastive_loss
    from kirag_tpu.training.trainer import make_optimizer

    if SMOKE:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    config = (BertConfig(vocab_size=30522, hidden_size=64, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=128,
                         max_position_embeddings=512)
              if SMOKE else
              BertConfig(vocab_size=30522, hidden_size=1024,
                         num_hidden_layers=24, num_attention_heads=16,
                         intermediate_size=4096, max_position_embeddings=512,
                         fused_qkv=FUSED_QKV))
    params = init_bert_params(jax.random.PRNGKey(0), config)

    tcfg = TrainerConfig(learning_rate=2e-5, weight_decay=0.01,
                         max_grad_norm=1.0)
    opt = make_optimizer(tcfg, total_steps=10_000)
    opt_state = opt.init(params)

    rng = np.random.RandomState(0)
    n_docs = B_QUERIES * DOCS_PER_QUERY
    batch = {
        "query_args": {
            "input_ids": jnp.asarray(
                rng.randint(1, 30000, size=(B_QUERIES, Q_LEN)), jnp.int32),
            "attention_mask": jnp.ones((B_QUERIES, Q_LEN), jnp.int32)},
        "doc_args": {
            "input_ids": jnp.asarray(
                rng.randint(1, 30000, size=(n_docs, D_LEN)), jnp.int32),
            "attention_mask": jnp.ones((n_docs, D_LEN), jnp.int32)},
        "positive_doc_indices": jnp.arange(B_QUERIES, dtype=jnp.int32)
        * DOCS_PER_QUERY,
    }

    import functools

    # donate params+opt_state: without it two full copies (~11 GB at
    # e5-large f32 + AdamW) coexist and the step OOMs at runtime
    @functools.partial(jax.jit, static_argnames=("k",),
                       donate_argnums=(0, 1))
    def k_steps(params, opt_state, batch, k):
        """K chained update steps on device (lax.scan; params thread through)."""
        def one(carry, _):
            p, s = carry

            def loss_fn(p):
                # remat: e5-large fwd activations for b32xq256 + b128xd64
                # OOM 16GB HBM without it (measured 17.8G); "dots" saves
                # matmul outputs and recomputes only elementwise pieces
                remat = (False if SMOKE or REMAT == "none"
                         else ("dots" if REMAT == "dots" else True))
                return in_batch_contrastive_loss(
                    p, batch, config, "e5", 0.01, compute_dtype=jnp.bfloat16,
                    remat=remat, packed=PACKED)

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), None, length=k)
        return params, opt_state, losses

    # warm/compile with the SAME static k as the timed run (one program)
    p1, s1, losses = k_steps(params, opt_state, batch, STEPS)
    l_host = np.asarray(losses)
    assert np.isfinite(l_host).all(), l_host

    t0 = time.perf_counter()
    p2, s2, losses = k_steps(p1, s1, batch, STEPS)
    l_host = np.asarray(losses)  # fetch inside the window (relay-proof)
    dt = time.perf_counter() - t0
    assert np.isfinite(l_host).all() and l_host[-1] != l_host[0]

    steps_per_sec = STEPS / dt

    # -- FLOP attribution (VERDICT r3 #8) ---------------------------------
    # Matmul params per layer: QKV 3h^2 + attn-out h^2 + FFN 2hi; plus the
    # pooler-free head (none here). Embedding lookups are gathers (no MXU
    # FLOPs). Per-token matmul FLOPs: fwd 2P, bwd 4P; full remat re-runs
    # the fwd (+2P), "dots" recomputes only elementwise (matmul outputs are
    # saved) so ~0 extra MXU FLOPs. Attention score/value matmuls add
    # fwd 4*t*h FLOPs/token/layer (2 matmuls of 2*t*h), x3 with backward,
    # +fwd again under full remat.
    h, L = config.hidden_size, config.num_hidden_layers
    i = config.intermediate_size
    p_mat = L * (4 * h * h + 2 * h * i)
    q_tok = B_QUERIES * Q_LEN
    d_tok = B_QUERIES * DOCS_PER_QUERY * D_LEN
    fwd_mult, extra = (3, 1) if REMAT == "full" else (3, 0)
    lin_flops = 2 * p_mat * (q_tok + d_tok) * (fwd_mult + extra)
    attn_flops = sum(
        4 * t * h * L * n_tok * (fwd_mult + extra)
        for t, n_tok in ((Q_LEN, q_tok), (D_LEN, d_tok)))
    flops = lin_flops + attn_flops
    peak_tfs = 197.0  # v5e bf16 MXU peak
    achieved_tfs = flops * steps_per_sec / 1e12
    rec = {"bench": "aligner_train_e5large",
           "flops_per_step_tf": round(flops / 1e12, 3),
           "achieved_tfs": round(achieved_tfs, 1),
           "mfu": round(achieved_tfs / peak_tfs, 3),
           "b_queries": B_QUERIES, "docs_per_query": DOCS_PER_QUERY,
           "remat": REMAT, "fused_qkv": FUSED_QKV, "packed": PACKED,
           "q_len": Q_LEN, "d_len": D_LEN, "compute": "bf16",
           "steps": STEPS, "ms_per_step": round(dt / STEPS * 1e3, 1),
           "steps_per_sec": round(steps_per_sec, 3),
           "queries_per_sec": round(steps_per_sec * B_QUERIES, 1),
           "loss_first_last": [round(float(l_host[0]), 4),
                               round(float(l_host[-1]), 4)]}
    print(json.dumps(rec), flush=True)
    with open("benchmarks/bench_train_results.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
