"""Encoder attention A/B on TPU: XLA einsum-softmax vs fused flash kernel.

e5-large geometry (24L, h1024, 16 heads), b128 x s256 bf16 — the corpus
embedding workload (21M passages at 603 p/s takes ~9.7h/chip; attention score
HBM traffic is the main non-matmul cost). Validates flash vs XLA embeddings
(cosine > 0.999) before timing; timing is chained (see probe_r2._time_chained).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_encoder_flash.py
Appends JSON lines to benchmarks/bench_encoder_results.jsonl.
"""

from __future__ import annotations

import json
import time

import numpy as np

B, S = 128, 256


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kirag_tpu.models import BertConfig, init_bert_params
    from kirag_tpu.models.encoders import Encoder

    config = BertConfig(vocab_size=32128, hidden_size=1024, num_hidden_layers=24,
                        num_attention_heads=16, intermediate_size=4096,
                        max_position_embeddings=512)
    params = init_bert_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16)
                          if x.ndim >= 2 else x, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 32000, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), dtype=np.int32)
    mask[:, 200:] = 0  # realistic padding tail
    ids[mask == 0] = 0
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)

    encoders = {impl: Encoder(params, config, "e5", compute_dtype=jnp.bfloat16,
                              attention_impl=impl)
                for impl in ("xla", "flash")}

    # parity first: flash must reproduce the XLA embeddings
    emb = {impl: np.asarray(enc(ids_d, mask_d)).astype(np.float32)
           for impl, enc in encoders.items()}
    cos = float(np.mean(np.sum(emb["xla"] * emb["flash"], axis=-1)))
    print(f"flash-vs-xla mean cosine: {cos:.6f}", flush=True)
    assert cos > 0.999, f"flash attention diverges from XLA path: {cos}"

    for impl, enc in encoders.items():
        out = enc(ids_d, mask_d)
        jax.block_until_ready(out)
        iters = 8
        t0 = time.perf_counter()
        prev = out
        outs = []
        for _ in range(iters):
            # chain via a zero perturbation of the mask-independent path:
            # re-embed with ids XOR 0*prev (forces sequential execution)
            delta = (0 * prev[:, :1].astype(jnp.int32)).astype(jnp.int32)
            o = enc(ids_d + delta[:, :1], mask_d)
            outs.append(o)
            prev = o
        final = np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(final).all()
        rec = {"bench": f"encoder_{impl}", "b": B, "s": S,
               "ms": round(dt * 1e3, 2), "passages_per_s": round(B / dt, 1)}
        print(json.dumps(rec), flush=True)
        with open("benchmarks/bench_encoder_results.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
