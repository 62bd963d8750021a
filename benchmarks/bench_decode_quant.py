"""Weight-only int8 vs int4 decode throughput at Llama-3-8B geometry (1 chip).

Decode is weight-bandwidth-bound: every generated token reads all projection
weights once. int8 halves the bytes of bf16 (round 1: 138 tok/s at b2, 73% of
the HBM ceiling); block-64 int4 halves them again — this measures how much of
that survives the unpack/dequant arithmetic.

Random-init weights (quality is irrelevant to bandwidth), built host-side
kernel-by-kernel so the f32 originals never exceed one projection at a time.
Timing is chained on the token ids (each step consumes the previous output);
outputs validated finite + in-vocab.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_decode_quant.py \
    [--bits 4 8] [--batch 2] [--new 64]
Appends JSON lines to benchmarks/bench_decode_results.jsonl.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import time

import numpy as np


def build_quantized_params(config, bits: int, int4_codebook: str = "linear"):
    """Host-side random-init + quantize, one projection at a time."""
    import jax.numpy as jnp

    from kirag_tpu.models.llm import (_quantize_kernel_int4,
                                      _quantize_kernel_int8,
                                      _quantize_kernel_nf4)
    import ml_dtypes

    quantize = ((_quantize_kernel_nf4 if int4_codebook == "nf4"
                 else _quantize_kernel_int4)
                if bits == 4 else _quantize_kernel_int8)
    rng = np.random.default_rng(0)
    h, i = config.hidden_size, config.intermediate_size
    kv = config.num_key_value_heads * config.head_dim

    def qlin(in_dim, out_dim):
        k = (rng.standard_normal((in_dim, out_dim), dtype=np.float32)
             * (0.4 / np.sqrt(in_dim)))
        out = {name: jnp.asarray(v) for name, v in quantize(k).items()}
        del k
        gc.collect()
        return out

    params = {
        "embed_tokens": jnp.asarray(
            rng.standard_normal((config.vocab_size, h), dtype=np.float32)
            .astype(ml_dtypes.bfloat16) * 0.02),
        "norm": {"scale": jnp.ones((h,), jnp.float32)},
        "layers": [],
        "lm_head": qlin(h, config.vocab_size),
    }
    for _ in range(config.num_hidden_layers):
        params["layers"].append({
            "input_layernorm": {"scale": jnp.ones((h,), jnp.float32)},
            "post_attention_layernorm": {"scale": jnp.ones((h,), jnp.float32)},
            "q_proj": qlin(h, h),
            "k_proj": qlin(h, kv),
            "v_proj": qlin(h, kv),
            "o_proj": qlin(h, h),
            "gate_proj": qlin(h, i),
            "up_proj": qlin(h, i),
            "down_proj": qlin(i, h),
        })
    return params


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bits", type=int, nargs="*", default=[8, 4])
    p.add_argument("--geometry", choices=["8b", "1.1b", "smoke"], default="8b")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--new", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--int4_impl", choices=["parity", "blockdot", "pallas"],
                   default="pallas",
                   help="int4 matmul formulation (probe_r6: XLA forms "
                   "materialize the blockwise dequant; pallas dequantizes "
                   "in VMEM — the 4-bit bandwidth roofline)")
    p.add_argument("--prompt", type=int, default=64,
                   help="prompt length: the KV-cache read per step scales "
                   "with batch*(prompt+new), so long prompts + big batches "
                   "are where --kv_bits 8 pays")
    p.add_argument("--kv_bits", type=int, default=None, choices=[8],
                   help="int8 KV cache (LlamaConfig.kv_quant_bits)")
    p.add_argument("--int4_codebook", choices=["linear", "nf4"],
                   default="linear",
                   help="4-bit dequant grid: linear nibbles or the NF4 "
                   "16-entry codebook (select-tree lookup in the kernels)")
    args = p.parse_args()

    import jax

    if args.geometry == "smoke":
        # keep smoke runs OFF the single-tenant chip (the host sitecustomize
        # pins the platform, so the env var alone is ignored — CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kirag_tpu.models.llm import LlamaConfig, greedy_decode

    if args.geometry == "8b":
        config = LlamaConfig(vocab_size=128256, hidden_size=4096,
                             num_hidden_layers=32, num_attention_heads=32,
                             num_key_value_heads=8, intermediate_size=14336,
                             max_position_embeddings=8192, rope_theta=500000.0)
    else:  # TinyLlama-1.1B geometry (the KiRAG loop's decode workhorse)
        config = LlamaConfig(vocab_size=32000, hidden_size=2048,
                             num_hidden_layers=22, num_attention_heads=32,
                             num_key_value_heads=4, intermediate_size=5632,
                             max_position_embeddings=2048, rope_theta=10000.0)
    if args.geometry == "smoke":  # CPU harness check; numbers meaningless
        config = LlamaConfig(vocab_size=256, hidden_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, intermediate_size=128,
                             max_position_embeddings=512, rope_theta=10000.0)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, config.vocab_size,
                       size=(args.batch, args.prompt)).astype(np.int32)
    mask = np.ones_like(ids)

    import dataclasses

    for bits in args.bits:
        cfg = (dataclasses.replace(config, int4_impl=args.int4_impl)
               if bits == 4 else config)
        if args.kv_bits:
            cfg = dataclasses.replace(cfg, kv_quant_bits=args.kv_bits)
        t0 = time.perf_counter()
        params = build_quantized_params(config, bits, args.int4_codebook)
        params = jax.device_put(params)
        jax.block_until_ready(params)
        print(f"int{bits} params on device in {time.perf_counter()-t0:.0f}s",
              flush=True)

        # smoke (CPU) computes in f32: the XLA:CPU dot thunk lacks
        # bf16 x bf16 -> f32 kernels for some fused layouts (int4 weights +
        # int8 KV hit one); the chip path is always bf16
        compute = jnp.float32 if args.geometry == "smoke" else jnp.bfloat16

        def run(i, new):
            return greedy_decode(params, jnp.asarray(i), jnp.asarray(mask),
                                 cfg, new, compute_dtype=compute,
                                 return_logits=False)

        def window(new):
            """Min wall time of a chained decode call at ``new`` tokens."""
            out = run(ids, new)                           # warm/compile
            jax.block_until_ready(out)
            best, prev = np.inf, out
            for _ in range(args.iters):
                t0 = time.perf_counter()
                # chain on the previous output: real sequential execution
                o = run(ids + 0 * np.asarray(prev[0])[:, :1].astype(np.int32),
                        new)
                final = np.asarray(o[0])                  # fetch inside window
                best = min(best, time.perf_counter() - t0)
                prev = o
                assert final.shape[1] == new and (final >= 0).all() \
                    and (final < config.vocab_size).all()
            return best

        # difference two decode lengths: the per-call dispatch+fetch constant
        # (relay round trips — ~100ms healthy, unbounded when the host is
        # loaded: a concurrent pytest once inflated per-step 70x) cancels,
        # leaving pure per-step device time (same methodology as bench.py)
        lo, hi = args.new, 2 * args.new
        w_lo, w_hi = window(lo), window(hi)
        per_step = (w_hi - w_lo) / (hi - lo)
        if per_step <= 0:
            print(f"non-positive window diff ({w_lo:.3f}s vs {w_hi:.3f}s): "
                  "host/relay contention — rerun on an idle host", flush=True)
            continue
        toks = args.batch / per_step
        rec = {"bench": f"decode_{args.geometry}_int{bits}", "batch": args.batch,
               "new_tokens": args.new, "ms_per_step": round(per_step * 1e3, 2),
               "tok_per_s": round(toks, 1),
               "call_overhead_ms": round((w_lo - per_step * lo) * 1e3, 0),
               "loadavg": round(os.getloadavg()[0], 1)}
        if bits == 4:
            rec["int4_impl"] = args.int4_impl
            rec["int4_codebook"] = args.int4_codebook
        # always recorded (ADVICE r4): implicit defaults in old rows rot when
        # the argparse default moves; kv_bits=0 means full-precision KV
        rec["kv_bits"] = args.kv_bits or 0
        rec["prompt"] = args.prompt
        print(json.dumps(rec), flush=True)
        if args.geometry != "smoke":     # smoke checks the harness only
            with open("benchmarks/bench_decode_results.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
        del params
        gc.collect()


if __name__ == "__main__":
    main()
