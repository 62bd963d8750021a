"""Llama-family decoder-only LM in functional JAX with KV-cache greedy decode.

The TPU generation backend behind :class:`kirag_tpu.generation.Generator` —
replacing the reference's `transformers` ``model.generate`` harness
(`generator/generator.py:171-235`, `utils/pipeline_utils.py:26-77`). Supports
the same model families the reference loads (Llama-2/3/3.1, Qwen2/2.5,
Mistral — all Llama-architecture: RMSNorm, RoPE, GQA, SwiGLU; Qwen2 adds
QKV biases, handled by optional bias terms).

TPU-first decode design:
- prefill + the whole greedy loop run as ONE jitted program per
  (prompt-bucket, max_new_tokens) shape: `lax.scan` over decode steps with a
  preallocated KV cache — no per-token host round-trip (stop-words are checked
  segment-wise by the Generator harness above).
- per-step logits are scanned out (the contract the KiRAG TripleSelector's
  option-probability beam needs).
- tensor parallelism via :func:`llama_param_shardings` (Megatron layout over
  the mesh ``model`` axis), same declarative scheme as the BERT encoder.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    intermediate_size: int = 14336
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # True for Qwen2 QKV
    # int4 dense-matmul formulation: "parity" (XLA nibble-parity split,
    # TP/GSPMD-safe), "blockdot" (XLA batched block dots + f32 scale on the
    # partial products, TP/GSPMD-safe), "pallas" (ops/pallas_qmm in-VMEM
    # dequant — HBM reads packed bytes only; single-device, TPU only: a
    # pallas_call is opaque to the GSPMD partitioner, so sharding params
    # would force a full kernel all-gather). load_llama picks "pallas" on
    # single-device TPU; JaxLlamaBackend.shard_params flips it back.
    int4_impl: str = "parity"
    # KV-cache quantization: None (cache in compute dtype) or 8. Slots are
    # stored int8 with a per-token, per-kv-head f32 scale. Both scales
    # commute with their attention contractions — K's moves onto the (small)
    # logits tensor, V's folds into the probs — so the cache is read as raw
    # int8 by the MXU with no materialized dequant: KV HBM traffic and
    # residency halve vs bf16. This is the capacity lever for the batched
    # KiRAG decode regime (b32 x 4k ctx at 8B geometry needs 17 GB of bf16
    # KV — more than the chip; int8 fits it beside int4 weights). The
    # reference has no analogue (HF generate caches fp16,
    # `generator/generator.py:171-235`). Not composable with speculative
    # decoding, whose bit-identity proof needs window-fed and cache-fed
    # logits to agree exactly (JaxLlamaBackend enforces).
    kv_quant_bits: Optional[int] = None
    # Gemma-2 extensions (model_type == "gemma2"):
    model_type: str = "llama"
    head_dim_override: Optional[int] = None      # gemma2 sets head_dim explicitly
    query_pre_attn_scalar: Optional[float] = None
    attn_logit_softcapping: Optional[float] = None
    final_logit_softcapping: Optional[float] = None
    sliding_window: Optional[int] = None          # applied on every other layer
    hidden_activation: str = "silu"               # gemma2: gelu_pytorch_tanh

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden_size // self.num_attention_heads

    @property
    def is_gemma2(self) -> bool:
        return self.model_type == "gemma2"


Params = Dict[str, Any]


def config_from_hf(hf_config) -> LlamaConfig:
    get = hf_config.get if isinstance(hf_config, dict) else lambda k, d=None: getattr(hf_config, k, d)
    model_type = str(get("model_type", "llama"))
    is_gemma2 = model_type == "gemma2"
    return LlamaConfig(
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        num_hidden_layers=get("num_hidden_layers"),
        num_attention_heads=get("num_attention_heads"),
        num_key_value_heads=get("num_key_value_heads") or get("num_attention_heads"),
        intermediate_size=get("intermediate_size"),
        max_position_embeddings=get("max_position_embeddings", 8192),
        rms_norm_eps=get("rms_norm_eps", 1e-5 if not is_gemma2 else 1e-6),
        rope_theta=get("rope_theta", 10000.0),
        tie_word_embeddings=bool(get("tie_word_embeddings", is_gemma2)),
        attention_bias=bool(get("attention_bias", False)) or "qwen" in model_type,
        model_type="gemma2" if is_gemma2 else "llama",
        head_dim_override=get("head_dim") if is_gemma2 else None,
        query_pre_attn_scalar=get("query_pre_attn_scalar") if is_gemma2 else None,
        attn_logit_softcapping=get("attn_logit_softcapping") if is_gemma2 else None,
        final_logit_softcapping=get("final_logit_softcapping") if is_gemma2 else None,
        sliding_window=get("sliding_window") if is_gemma2 else None,
        hidden_activation=("gelu_pytorch_tanh" if is_gemma2
                           else str(get("hidden_act", "silu"))),
    )


def _lin(key, in_dim, out_dim, bias=False, std=0.02):
    p = {"kernel": jax.random.normal(key, (in_dim, out_dim)) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def init_llama_params(key: jax.Array, config: LlamaConfig) -> Params:
    h, i = config.hidden_size, config.intermediate_size
    kv_dim = config.num_key_value_heads * config.head_dim
    keys = jax.random.split(key, 3 + 7 * config.num_hidden_layers)
    params: Params = {
        "embed_tokens": jax.random.normal(keys[0], (config.vocab_size, h)) * 0.02,
        "norm": {"scale": jnp.ones((h,))},
        "layers": [],
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": jax.random.normal(keys[1], (h, config.vocab_size)) * 0.02}
    b = config.attention_bias
    for l in range(config.num_hidden_layers):
        k = keys[3 + 7 * l: 10 + 7 * l]
        params["layers"].append({
            "input_layernorm": {"scale": jnp.ones((h,))},
            "post_attention_layernorm": {"scale": jnp.ones((h,))},
            "q_proj": _lin(k[0], h, h, bias=b),
            "k_proj": _lin(k[1], h, kv_dim, bias=b),
            "v_proj": _lin(k[2], h, kv_dim, bias=b),
            "o_proj": _lin(k[3], h, h),
            "gate_proj": _lin(k[4], h, i),
            "up_proj": _lin(k[5], h, i),
            "down_proj": _lin(k[6], i, h),
        })
    return params


def llama_param_shardings(config: LlamaConfig, model_axis: str = "model") -> Params:
    col = {"kernel": P(None, model_axis)}
    col_b = {"kernel": P(None, model_axis), "bias": P(model_axis)}
    row = {"kernel": P(model_axis, None)}
    ln = {"scale": P()}
    qkv = col_b if config.attention_bias else col
    layer = {
        "input_layernorm": ln, "post_attention_layernorm": ln,
        "q_proj": qkv, "k_proj": qkv, "v_proj": qkv, "o_proj": row,
        "gate_proj": col, "up_proj": col, "down_proj": row,
    }
    specs: Params = {
        "embed_tokens": P(),
        "norm": ln,
        "layers": [layer] * config.num_hidden_layers,
    }
    if not config.tie_word_embeddings:
        specs["lm_head"] = {"kernel": P(None, model_axis)}
    return specs


def llama_param_shardings_like(params: Params, config: LlamaConfig,
                               model_axis: str = "model") -> Params:
    """Megatron PartitionSpecs matching the STRUCTURE of ``params`` — handles
    quantized trees (kernel_q/kernel_scale, kernel_q4/kernel_scale4) whose
    leaf names differ from the float layout that
    :func:`llama_param_shardings` describes.

    Quantized leaves shard with the dim they scale: column-parallel kernels
    shard scales over the output channel; row-parallel int4 trees shard both
    the packed rows and the per-block scales over the (packed) input dim.
    """
    base = llama_param_shardings(config, model_axis)

    def expand(p, spec_group):
        if "kernel" in p:
            out = dict(spec_group)
            for extra in p:
                out.setdefault(extra, P())
            return out
        kernel_spec = spec_group["kernel"]
        in_spec, out_spec = kernel_spec[0], kernel_spec[1]
        out = {}
        if "kernel_q" in p:       # int8: [in, out] + per-out scales
            out["kernel_q"] = kernel_spec
            out["kernel_scale"] = P(out_spec)
        if "kernel_q4" in p:      # int4: packed [in/2, out] + [in/64, out]
            out["kernel_q4"] = kernel_spec
            # block scales replicate on the input dim (they are kernel/32
            # bytes; [in/64] rarely divides small meshes) and follow the
            # kernel on the output dim
            out["kernel_scale4"] = P(None, out_spec)
            if "kernel_cb4" in p:  # NF4 16-entry codebook: replicate
                out["kernel_cb4"] = P()
        if "bias" in p:
            out["bias"] = spec_group.get("bias", P(out_spec))
        return out

    proj_names = ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj", "lm_head")

    def walk(p, s):
        if isinstance(p, dict):
            out = {}
            for k in p:
                if k not in s:  # e.g. gemma2 sandwich norms: replicate
                    out[k] = jax.tree.map(lambda _: P(), p[k])
                elif k in proj_names and isinstance(p[k], dict):
                    out[k] = expand(p[k], s[k])
                else:
                    out[k] = walk(p[k], s[k])
            return out
        if isinstance(p, list):
            return [walk(pi, si) for pi, si in zip(p, s)]
        return s

    return walk(params, base)


def _rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float,
              plus_one: bool = False) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    w = scale.astype(jnp.float32)
    if plus_one:  # gemma2 parameterizes the scale as (1 + w)
        w = 1.0 + w
    return (out * w).astype(x.dtype)


INT4_BLOCK = 64  # input rows per int4 quantization block (NF4 uses 64 too)

# The bitsandbytes NF4 codebook (the reference's 4-bit weight format,
# `utils/pipeline_utils.py:55-77`): the 16 quantiles of a standard normal,
# normalized to [-1, 1]. Stored per-kernel as "kernel_cb4" so checkpoints are
# self-describing and any 16-entry codebook rides the same dequant.
NF4_CODEBOOK = np.array(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0], dtype=np.float32)


def _unpack_int4(packed: jnp.ndarray, dtype) -> jnp.ndarray:
    """[in/2, out] uint8 (two signed nibbles per byte, low = even row) ->
    [in, out] values in ``dtype``. Sign recovery via arithmetic shifts."""
    p = packed.astype(jnp.int8)
    lo = jnp.left_shift(p, 4) >> 4      # low nibble, sign-extended
    hi = p >> 4                          # high nibble (arithmetic shift)
    half, out = p.shape
    q = jnp.stack([lo, hi], axis=1).reshape(2 * half, out)
    return q.astype(dtype)


def _dense(x, p, int4_impl: str = "parity"):
    if "kernel_q4" in p:
        # weight-only int4: two signed nibbles per byte with per-
        # (64-input-row block, output channel) scales — the TPU-native
        # analogue of the reference's NF4 4-bit loading
        # (`utils/pipeline_utils.py:6-24`): same 4x memory saving and block
        # size; a linear grid instead of the NF4 codebook (a 16-way gather
        # per element would stall the VPU; blockwise scaling recovers most
        # of the quality). Never re-interleave the unpacked rows into one
        # [in, out] kernel: that stack+reshape is a relayout XLA cannot fuse
        # into the matmul operand — it materialized the full kernel through
        # several intermediates every decode step, measured 16x SLOWER than
        # int8 (27.6 vs 1.69 ms/step, 1.1B b4, r4 chip A/B). Three
        # interleave-free formulations below, selected by ``int4_impl``
        # (LlamaConfig.int4_impl documents the trade-offs).
        half, out_dim = p["kernel_q4"].shape
        in_pad = 2 * half
        # NF4 (reference `utils/pipeline_utils.py:55-77`): nibbles are
        # UNSIGNED indices into the 16-entry "kernel_cb4" codebook; dequant
        # is a lookup instead of a sign-extend. Zero-padded kernel rows
        # quantize to index 7 (cb[7] == 0.0), so padding stays exact.
        cb = p.get("kernel_cb4")
        if x.shape[-1] != in_pad:  # kernel rows were padded to the block grid
            pad = [(0, 0)] * (x.ndim - 1) + [(0, in_pad - x.shape[-1])]
            x = jnp.pad(x, pad)  # zero activations x zero pad rows == exact
        if int4_impl == "pallas":
            # in-VMEM dequant: HBM reads the packed bytes only — the only
            # formulation at the 4-bit bandwidth roofline (XLA materializes
            # the blockwise dequant; probe_r6). Single-device TPU only.
            # DECODE-shaped calls only: the kernel contracts in K=32 scale
            # sub-blocks, which is bandwidth-optimal when activations are a
            # handful of rows but starves the MXU at prefill (batch x seq
            # rows, compute-bound) — there the parity matmul with its full-
            # depth contraction wins. Shapes are static under jit, so this
            # is a trace-time branch, and prefill/decode compile separately
            # anyway (different t_new).
            rows = 1
            for d in x.shape[:-1]:
                rows *= d
            from kirag_tpu.ops import pallas_qmm

            if rows <= 32 and pallas_qmm.supported(half, out_dim):
                return pallas_qmm.int4_matmul(
                    x, p["kernel_q4"], p["kernel_scale4"], codebook=cb
                ) + (p["bias"].astype(x.dtype) if "bias" in p else 0.0)
            int4_impl = "parity" if rows > 32 else "blockdot"
        if cb is not None:
            # codebook lookup in f32, rounded to compute dtype AFTER —
            # matches the Pallas kernel's in-VMEM select-tree numerics
            pk = p["kernel_q4"]                       # uint8 [in/2, out]
            cb32 = cb.astype(jnp.float32)
            lo = jnp.take(cb32, (pk & 0xF).astype(jnp.int32)).astype(x.dtype)
            hi = jnp.take(cb32, (pk >> 4).astype(jnp.int32)).astype(x.dtype)
        else:
            pk = p["kernel_q4"].astype(jnp.int8)      # [in/2, out]
            lo = (jnp.left_shift(pk, 4) >> 4).astype(x.dtype)  # rows 0,2,4,…
            hi = (pk >> 4).astype(x.dtype)                     # rows 1,3,5,…
        scale = p["kernel_scale4"]                    # [in_pad/64, out]
        nb = scale.shape[0]
        sub = half // nb                              # 32 packed rows/block
        if int4_impl == "blockdot":
            # nb batched dots on RAW nibbles; the block scale lands on the
            # [nb, B, out] f32 partial products — never on the big operand
            # (the exact-search kernel's int4 trick, ops/pallas_exact
            # _matmul_scores, in XLA form)
            lo3 = lo.reshape(nb, sub, out_dim)
            hi3 = hi.reshape(nb, sub, out_dim)
            lead = x.shape[:-1]
            xf = x.reshape(-1, in_pad)
            xe = xf[:, 0::2].reshape(-1, nb, sub)
            xo = xf[:, 1::2].reshape(-1, nb, sub)
            dn = (((2,), (1,)), ((1,), (0,)))         # batch over nb
            part = jax.lax.dot_general(xe, lo3, dn,
                                       preferred_element_type=jnp.float32)
            part = part + jax.lax.dot_general(xo, hi3, dn,
                                              preferred_element_type=jnp.float32)
            sc = scale.astype(jnp.float32)
            out = jnp.sum(part * sc[:, None, :], axis=0).astype(x.dtype)
            out = out.reshape(*lead, out_dim)
        else:
            # "parity": y = x_even @ deq(lo) + x_odd @ deq(hi) — each operand
            # is convert(shift(int8)) * blockscale; only the (tiny)
            # activations get strided slices. Packed row i holds original
            # rows 2i (low nibble) and 2i+1 (high), so block 64 of original
            # rows == block 32 of packed rows, and a TP row-shard stays
            # self-contained.
            s = scale.astype(x.dtype)
            deq_lo = (lo.reshape(nb, sub, out_dim) * s[:, None, :]
                      ).reshape(half, out_dim)
            deq_hi = (hi.reshape(nb, sub, out_dim) * s[:, None, :]
                      ).reshape(half, out_dim)
            out = (jnp.dot(x[..., 0::2], deq_lo,
                           preferred_element_type=x.dtype)
                   + jnp.dot(x[..., 1::2], deq_hi,
                             preferred_element_type=x.dtype))
    elif "kernel_q" in p:
        # weight-only int8: kernel stored as int8 with per-output-channel
        # scales; dequant fuses into the matmul read (half the HBM bytes of
        # bf16 — decode is weight-bandwidth-bound, so ~2x decode throughput)
        kernel = p["kernel_q"].astype(x.dtype) * p["kernel_scale"].astype(x.dtype)[None, :]
        out = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    else:
        out = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _quantize_kernel_int8(kernel: np.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric int8 of a [in, out] kernel (shared by the
    post-hoc quantizer and the host-side quantizing loader)."""
    k = np.asarray(kernel, dtype=np.float32)
    absmax = np.abs(k).max(axis=0)
    scale = np.where(absmax == 0, 1.0, absmax / 127.0).astype(np.float32)
    q = np.clip(np.rint(k / scale[None, :]), -127, 127).astype(np.int8)
    return {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(scale)}


def _quantize_kernel_int4(kernel: np.ndarray,
                          block: int = INT4_BLOCK) -> Dict[str, jnp.ndarray]:
    """Blockwise symmetric int4 of a [in, out] kernel: one f32 scale per
    (64-input-row block, output channel), two nibbles packed per byte along
    the input dim. 4x the memory saving of bf16 (vs int8's 2x) — the match
    for the reference's NF4 block-64 scheme minus the nonlinear codebook."""
    k = np.asarray(kernel, dtype=np.float32)
    in_dim, out_dim = k.shape
    in_pad = -(-in_dim // block) * block
    if in_pad != in_dim:
        k = np.concatenate([k, np.zeros((in_pad - in_dim, out_dim), np.float32)])
    nb = in_pad // block
    blocks = k.reshape(nb, block, out_dim)
    absmax = np.abs(blocks).max(axis=1)                        # [nb, out]
    scale = np.where(absmax == 0, 1.0, absmax / 7.0).astype(np.float32)
    q = np.clip(np.rint(blocks / scale[:, None, :]), -7, 7).astype(np.int8)
    q = q.reshape(in_pad, out_dim)
    packed = ((q[0::2] & 0x0F) | (q[1::2] << 4)).astype(np.uint8)
    return {"kernel_q4": jnp.asarray(packed),
            "kernel_scale4": jnp.asarray(scale)}


def _quantize_kernel_nf4(kernel: np.ndarray,
                         block: int = INT4_BLOCK,
                         codebook: np.ndarray = NF4_CODEBOOK
                         ) -> Dict[str, jnp.ndarray]:
    """Blockwise NF4 of a [in, out] kernel — the reference's bitsandbytes
    format (`utils/pipeline_utils.py:55-77`): per (64-input-row block, output
    channel) absmax scale, values snapped to the nearest of the 16 normal-
    quantile codebook entries, packed two unsigned indices per byte (low
    nibble = even row). Same memory point as the linear int4 grid; lower
    quantization MSE on normally-distributed weights because the levels
    concentrate where the mass is."""
    import ml_dtypes

    # snap the codebook to bf16-representable values (lossless for the
    # linear grid's integers; ~2^-9 relative for NF4): the MXU computes in
    # bf16, so quantizing against the snapped values makes the XLA take()
    # path and the Pallas in-VMEM select tree dequantize bit-identically
    cb = (np.asarray(codebook, dtype=np.float32)
          .astype(ml_dtypes.bfloat16).astype(np.float32))
    assert cb.shape == (16,) and np.all(np.diff(cb) > 0)
    k = np.asarray(kernel, dtype=np.float32)
    in_dim, out_dim = k.shape
    in_pad = -(-in_dim // block) * block
    if in_pad != in_dim:
        k = np.concatenate([k, np.zeros((in_pad - in_dim, out_dim),
                                        np.float32)])
    nb = in_pad // block
    blocks = k.reshape(nb, block, out_dim)
    absmax = np.abs(blocks).max(axis=1)                        # [nb, out]
    scale = np.where(absmax == 0, 1.0, absmax).astype(np.float32)
    normed = blocks / scale[:, None, :]                        # in [-1, 1]
    mids = (cb[1:] + cb[:-1]) / 2.0
    idx = np.searchsorted(mids, normed).astype(np.uint8)       # nearest entry
    idx = idx.reshape(in_pad, out_dim)
    packed = (idx[0::2] | (idx[1::2] << 4)).astype(np.uint8)
    return {"kernel_q4": jnp.asarray(packed),
            "kernel_scale4": jnp.asarray(scale),
            "kernel_cb4": jnp.asarray(cb)}


def quantize_llama_params(params: Params, bits: int = 8,
                          int4_codebook: str = "nf4") -> Params:
    """Weight-only quantization of every projection kernel.

    The TPU analogue of the reference's 4-bit NF4 loading
    (`utils/pipeline_utils.py:6-24`): q/k/v/o/gate/up/down (+ lm_head)
    kernels become int8 (per-output-channel scales) or 4-bit (block-64
    scales, two nibbles per byte); embeddings and norms stay as-is.
    ``bits=4`` defaults to the NF4 codebook (the reference's format);
    ``int4_codebook="linear"`` keeps the symmetric integer grid.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if int4_codebook not in ("nf4", "linear"):
        raise ValueError(f"int4_codebook must be nf4|linear, got {int4_codebook}")
    quantize = (_quantize_kernel_nf4 if int4_codebook == "nf4"
                else _quantize_kernel_int4) if bits == 4 else _quantize_kernel_int8

    def quant_lin(p):
        if "kernel" not in p:
            return p
        out = quantize(np.asarray(p["kernel"]))
        if "bias" in p:
            out["bias"] = p["bias"]
        return out

    out: Params = {
        "embed_tokens": params["embed_tokens"],
        "norm": params["norm"],
        "layers": [],
    }
    if "lm_head" in params:
        out["lm_head"] = quant_lin(params["lm_head"])
    proj_names = ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj")
    for layer in params["layers"]:
        new_layer = {name: (quant_lin(p) if name in proj_names else p)
                     for name, p in layer.items()}
        out["layers"].append(new_layer)
    return out


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF 'half-rotation' layout. x: [B, T, H, D]."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, D/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate([xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1).astype(x.dtype)


def _kv_quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over the head dim: [..., hd] -> (int8 [..., hd],
    f32 scale [...]). Worst-case per-slot relative error ~0.4% (1/255),
    far below attention-softmax sensitivity at these head dims."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    q = jnp.round(xf / jnp.maximum(scale, 1e-12)[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _cache_alloc(bsz: int, t_cache: int, nkv: int, hd: int, dtype,
                 kv_bits: Optional[int]):
    """Zeroed KV cache for one layer: a plain [B, T, nkv, hd] array, or the
    quantized form {"q": int8 [B, T, nkv, hd], "s": f32 [B, T, nkv]}."""
    if kv_bits == 8:
        return {"q": jnp.zeros((bsz, t_cache, nkv, hd), jnp.int8),
                "s": jnp.zeros((bsz, t_cache, nkv), jnp.float32)}
    if kv_bits is not None:
        raise ValueError(f"kv_quant_bits must be None or 8, got {kv_bits}")
    return jnp.zeros((bsz, t_cache, nkv, hd), dtype)


def _cache_write(cache, new: jnp.ndarray, *idx):
    """Write compute-dtype K/V rows into a (possibly quantized) cache at
    ``idx`` — leading batch/token axes only, which the scale shares."""
    if isinstance(cache, dict):
        q, s = _kv_quantize(new)
        return {"q": cache["q"].at[idx].set(q), "s": cache["s"].at[idx].set(s)}
    return cache.at[idx].set(new.astype(cache.dtype))


def _attention_block(x, layer_p, config: LlamaConfig, positions, k_cache, v_cache,
                     cache_mask, new_mask, cache_positions=None, sliding=False):
    """Attend new tokens (x) against cache+self. Returns (out, new_k, new_v).

    k_cache/v_cache: [B, T_cache, n_kv, hd]; ``cache_mask`` [B, T_cache] marks
    written cache slots, ``new_mask`` [B, T_new] marks valid (non-pad) new
    tokens. New tokens attend cache slots per cache_mask and each other
    causally AND per new_mask. The new tokens' K/V are returned for the caller
    to write into the cache.
    """
    bsz, t_new, _ = x.shape
    nh, nkv, hd = config.num_attention_heads, config.num_key_value_heads, config.head_dim
    q = _dense(x, layer_p["q_proj"], config.int4_impl).reshape(bsz, t_new, nh, hd)
    k = _dense(x, layer_p["k_proj"], config.int4_impl).reshape(bsz, t_new, nkv, hd)
    v = _dense(x, layer_p["v_proj"], config.int4_impl).reshape(bsz, t_new, nkv, hd)
    q = _rope(q, positions, config.rope_theta)
    k = _rope(k, positions, config.rope_theta)

    group = nh // nkv
    quant = isinstance(k_cache, dict)
    if quant:
        # int8 cache: score cache and new slots separately. The MXU reads
        # the RAW int8 keys (the convert fuses into the dot operand); the
        # per-slot K scale lands on the small logits tensor AFTER the
        # contraction, so the dequantized cache never materializes. GQA is
        # expressed by splitting the head axis (nkv, group) instead of
        # repeating the cache ``group`` times.
        t_cache = k_cache["q"].shape[1]
        q5 = q.reshape(bsz, t_new, nkv, group, hd)
        lg_c = jnp.einsum("bqngd,bknd->bngqk", q5,
                          k_cache["q"].astype(x.dtype),
                          preferred_element_type=jnp.float32)
        lg_c = lg_c * k_cache["s"].transpose(0, 2, 1)[:, :, None, None, :]
        lg_n = jnp.einsum("bqngd,bknd->bngqk", q5, k,
                          preferred_element_type=jnp.float32)
        # (nkv, group) merge order matches jnp.repeat's head layout: kv head
        # n serves query heads [n*group, (n+1)*group)
        logits = jnp.concatenate([lg_c, lg_n], axis=-1).reshape(
            bsz, nh, t_new, t_cache + t_new)
    else:
        t_cache = k_cache.shape[1]
        keys = jnp.concatenate([k_cache, k], axis=1).astype(x.dtype)
        values = jnp.concatenate([v_cache, v], axis=1).astype(x.dtype)
        # GQA by splitting the query head axis (nkv, group) — the former
        # jnp.repeat(cache, group) materialized a group-times-bigger cache
        # copy in HBM EVERY step (measured r5: 34.8 -> ~5 ms/step at
        # b16 x 2k, 1.1B group=8). Same contraction per element, so decode
        # streams stay bitwise identical; (nkv, group) -> nh merge order
        # matches jnp.repeat's head layout (kv head n serves query heads
        # [n*group, (n+1)*group)).
        q5 = q.reshape(bsz, t_new, nkv, group, hd)
        logits = jnp.einsum("bqngd,bknd->bngqk", q5, keys,
                            preferred_element_type=jnp.float32).reshape(
                                bsz, nh, t_new, t_cache + t_new)

    scale = config.query_pre_attn_scalar if config.query_pre_attn_scalar else hd
    logits = logits / np.sqrt(scale)
    if config.attn_logit_softcapping:
        cap = config.attn_logit_softcapping
        logits = cap * jnp.tanh(logits / cap)

    # validity: cache slots per cache_mask; new tokens causal AND non-pad
    cache_valid = jnp.broadcast_to(
        cache_mask.astype(bool)[:, None, None, :], (bsz, 1, t_new, t_cache))
    causal = jnp.tril(jnp.ones((t_new, t_new), dtype=bool))[None, None]
    new_valid = causal & new_mask.astype(bool)[:, None, None, :]
    new_valid = jnp.broadcast_to(new_valid, (bsz, 1, t_new, t_new))
    valid = jnp.concatenate([cache_valid, new_valid], axis=-1)
    if sliding and config.sliding_window:
        # gemma2 alternating local attention: key position must be within the
        # window of the query position
        if cache_positions is None:
            cache_positions = jnp.zeros((bsz, t_cache), dtype=positions.dtype)
        key_pos = jnp.concatenate([cache_positions, positions], axis=1)  # [B, T_total]
        delta = positions[:, :, None] - key_pos[:, None, :]  # [B, T_new, T_total]
        valid = valid & (delta < config.sliding_window)[:, None, :, :]
    logits = jnp.where(valid, logits, jnp.finfo(jnp.float32).min)
    if quant:
        # fold the per-slot V scale into the (small) probs tensor — the MXU
        # then reads the raw int8 values directly
        probs = jax.nn.softmax(logits, axis=-1)
        p5 = probs.reshape(bsz, nkv, group, t_new, t_cache + t_new)
        pc = (p5[..., :t_cache]
              * v_cache["s"].transpose(0, 2, 1)[:, :, None, None, :])
        ctx = jnp.einsum("bngqk,bknd->bqngd", pc.astype(x.dtype),
                         v_cache["q"].astype(x.dtype),
                         preferred_element_type=jnp.float32)
        ctx = ctx + jnp.einsum("bngqk,bknd->bqngd",
                               p5[..., t_cache:].astype(x.dtype), v,
                               preferred_element_type=jnp.float32)
        ctx = ctx.astype(x.dtype).reshape(bsz, t_new, nh * hd)
    else:
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        p5 = probs.reshape(bsz, nkv, group, t_new, t_cache + t_new)
        ctx = jnp.einsum("bngqk,bknd->bqngd", p5,
                         values).reshape(bsz, t_new, nh * hd)
    return _dense(ctx, layer_p["o_proj"], config.int4_impl), k, v


def llama_block_forward(params: Params, input_ids, positions, config: LlamaConfig,
                        k_caches, v_caches, cache_mask, new_mask=None,
                        compute_dtype=jnp.float32, cache_positions=None):
    """Forward ``t_new`` tokens given per-layer caches; returns
    (logits [B, t_new, V], new_ks, new_vs). Handles both the llama family
    (pre-norm, SwiGLU) and gemma2 (sandwich norms, GeGLU, softcapping,
    alternating sliding-window attention)."""
    g2 = config.is_gemma2
    x = jnp.take(params["embed_tokens"], input_ids, axis=0).astype(compute_dtype)
    if g2:  # gemma scales embeddings by sqrt(hidden)
        x = x * jnp.asarray(np.sqrt(config.hidden_size), dtype=compute_dtype)
    if new_mask is None:
        new_mask = jnp.ones(input_ids.shape, dtype=jnp.int32)
    eps = config.rms_norm_eps
    new_ks, new_vs = [], []
    for li, layer_p in enumerate(params["layers"]):
        # gemma2 applies the sliding window on even layers (HF: not bool(li % 2))
        sliding = g2 and config.sliding_window is not None and li % 2 == 0
        h = _rms_norm(x, layer_p["input_layernorm"]["scale"], eps, plus_one=g2)
        attn, nk, nv = _attention_block(h, layer_p, config, positions,
                                        k_caches[li], v_caches[li], cache_mask, new_mask,
                                        cache_positions=cache_positions, sliding=sliding)
        new_ks.append(nk)
        new_vs.append(nv)
        if g2:
            attn = _rms_norm(attn, layer_p["post_attention_layernorm"]["scale"], eps,
                             plus_one=True)
            x = x + attn
            h = _rms_norm(x, layer_p["pre_feedforward_layernorm"]["scale"], eps,
                          plus_one=True)
        else:
            x = x + attn
            h = _rms_norm(x, layer_p["post_attention_layernorm"]["scale"], eps)
        gate = _dense(h, layer_p["gate_proj"], config.int4_impl)
        up = _dense(h, layer_p["up_proj"], config.int4_impl)
        if config.hidden_activation == "gelu_pytorch_tanh":
            act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
        else:
            act = jax.nn.silu(gate.astype(jnp.float32))
        mlp = _dense(act.astype(x.dtype) * up, layer_p["down_proj"], config.int4_impl)
        if g2:
            mlp = _rms_norm(mlp, layer_p["post_feedforward_layernorm"]["scale"], eps,
                            plus_one=True)
        x = x + mlp
    x = _rms_norm(x, params["norm"]["scale"], eps, plus_one=g2)
    if config.tie_word_embeddings:
        logits = jnp.einsum("bth,vh->btv", x.astype(jnp.float32),
                            params["embed_tokens"].astype(jnp.float32))
    else:
        logits = _dense(x, params["lm_head"], config.int4_impl).astype(jnp.float32)
    if config.final_logit_softcapping:
        cap = config.final_logit_softcapping
        logits = cap * jnp.tanh(logits / cap)
    return logits, new_ks, new_vs


def _prefill_state(params, input_ids, attention_mask, config, total_new_tokens,
                   compute_dtype, eos_token_id):
    """Run the prompt, preallocate caches with room for ``total_new_tokens``,
    and return (first_token, first_logits, decode-state dict).

    The state is a device-resident pytree; ``pending`` is the latest generated
    token, already counted in the output but not yet fed/cached — the next
    decode step feeds it. ``write_at`` is where its K/V will be written.
    """
    bsz, t_prompt = input_ids.shape
    nkv, hd, nl = config.num_key_value_heads, config.head_dim, config.num_hidden_layers
    t_cache = t_prompt + total_new_tokens

    # positions: left padding -> clip(cumsum(mask)-1, 0)
    positions = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, 0)

    kv_bits = config.kv_quant_bits
    empty_k = [_cache_alloc(bsz, 0, nkv, hd, compute_dtype, kv_bits)
               for _ in range(nl)]
    empty_mask = jnp.zeros((bsz, 0), dtype=jnp.int32)
    empty_pos = jnp.zeros((bsz, 0), dtype=positions.dtype)
    logits, new_ks, new_vs = llama_block_forward(
        params, input_ids, positions, config, empty_k, empty_k, empty_mask,
        new_mask=attention_mask, compute_dtype=compute_dtype,
        cache_positions=empty_pos)

    # preallocate caches to t_cache and write the prompt K/V at the front
    def alloc(new):
        cache = _cache_alloc(bsz, t_cache, nkv, hd, compute_dtype, kv_bits)
        return _cache_write(cache, new, slice(None), slice(0, t_prompt))

    next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    done0 = (jnp.full((bsz,), False) if eos_token_id is None
             else next_token == eos_token_id)
    state = {
        "k": [alloc(k) for k in new_ks],
        "v": [alloc(v) for v in new_vs],
        "cache_mask": jnp.pad(attention_mask, ((0, 0), (0, total_new_tokens))),
        "cache_pos": jnp.pad(positions, ((0, 0), (0, total_new_tokens))),
        "pending": next_token,
        "pos": positions[:, -1] + 1,
        "done": done0,
        "write_at": jnp.asarray(t_prompt, dtype=jnp.int32),
    }
    return next_token, logits[:, -1], state


def _decode_step(params, state, config, compute_dtype, eos_token_id):
    """Feed the pending token, write its K/V at ``write_at``, greedy-pick the
    next. Returns (logits [B, V] of the fed token, new state)."""
    token, pos = state["pending"], state["pos"]
    lg, nk, nv = llama_block_forward(
        params, token[:, None], pos[:, None], config, state["k"], state["v"],
        state["cache_mask"], compute_dtype=compute_dtype,
        cache_positions=state["cache_pos"])
    # the new token attends to itself via the concat slot inside
    # _attention_block; write its K/V into the cache for FUTURE steps
    w = state["write_at"]
    new_token = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
    done = state["done"]
    if eos_token_id is not None:
        new_token = jnp.where(done, eos_token_id, new_token)
        done = done | (new_token == eos_token_id)
    new_state = {
        "k": [_cache_write(k, nk_[:, 0], slice(None), w)
              for k, nk_ in zip(state["k"], nk)],
        "v": [_cache_write(v, nv_[:, 0], slice(None), w)
              for v, nv_ in zip(state["v"], nv)],
        "cache_mask": state["cache_mask"].at[:, w].set(1),
        "cache_pos": state["cache_pos"].at[:, w].set(pos),
        "pending": new_token,
        "pos": pos + 1,
        "done": done,
        "write_at": w + 1,
    }
    return lg[:, -1], new_state


@functools.partial(jax.jit, static_argnames=("config", "max_new_tokens", "compute_dtype",
                                             "eos_token_id", "return_logits"))
def greedy_decode(params: Params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                  config: LlamaConfig, max_new_tokens: int, compute_dtype=jnp.float32,
                  eos_token_id: Optional[int] = None, return_logits: bool = True
                  ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Prefill + greedy scan decode, one fused program. Left-padded inputs.

    Returns (generated ids [B, max_new], per-step logits [B, max_new, V]).
    With ``return_logits=False`` the logits are None and the [B, G, V] f32
    buffer (~B*G*V*4 bytes — 262MB/row at Llama-3 vocab and G=512) is never
    materialized; only the TripleSelector's option-probability beam needs
    logits, the KiRAG constructor loop does not.
    Rows that emit ``eos_token_id`` keep emitting it for the remaining steps
    (so decoded text is clean after the stop), matching HF generate's
    pad-after-finish semantics.
    """
    next_token, first_logits, state = _prefill_state(
        params, input_ids, attention_mask, config, max_new_tokens,
        compute_dtype, eos_token_id)

    if max_new_tokens == 1:
        return next_token[:, None], (first_logits[:, None] if return_logits else None)

    def step(state, _):
        token = state["pending"]
        lg, new_state = _decode_step(params, state, config, compute_dtype, eos_token_id)
        return new_state, ((token, lg) if return_logits else token)

    state, ys = jax.lax.scan(step, state,
                             jnp.arange(max_new_tokens - 1, dtype=jnp.int32))
    # fed tokens: [G-1, B] == generated[0..G-2]; pending == generated[G-1]
    last_token = state["pending"]
    if return_logits:
        tokens, step_logits = ys
        gen_logits = jnp.concatenate(
            [first_logits[:, None], step_logits.transpose(1, 0, 2)], axis=1)
    else:
        tokens, gen_logits = ys, None
    gen_ids = jnp.concatenate([tokens.transpose(1, 0), last_token[:, None]], axis=1)
    return gen_ids, gen_logits


@functools.partial(jax.jit, static_argnames=("config", "total_new_tokens",
                                             "compute_dtype", "eos_token_id"))
def prefill_decode(params: Params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                   config: LlamaConfig, total_new_tokens: int,
                   compute_dtype=jnp.float32, eos_token_id: Optional[int] = None):
    """Prefill once, emit the FIRST generated token, return a resumable state.

    The KV-cache-resumable half of segmented decoding: the reference stops
    per-token for free on GPU (`generator/stop_word_criteria.py:7-59`); on TPU
    the harness checks stop-words every N tokens and resumes from this state
    via :func:`resume_decode` — one prefill total instead of O(segments)
    re-prefills of a growing context. The state stays on device between calls.
    """
    next_token, first_logits, state = _prefill_state(
        params, input_ids, attention_mask, config, total_new_tokens,
        compute_dtype, eos_token_id)
    return next_token[:, None], first_logits[:, None], state


@functools.partial(jax.jit, static_argnames=("config", "n_steps", "compute_dtype",
                                             "eos_token_id", "return_logits"))
def resume_decode(params: Params, state, config: LlamaConfig, n_steps: int,
                  compute_dtype=jnp.float32, eos_token_id: Optional[int] = None,
                  return_logits: bool = True):
    """Continue greedy decoding ``n_steps`` tokens from a prefill/resume state.

    Returns (ids [B, n_steps], logits [B, n_steps, V] | None, new_state).
    Output token t is produced by feeding state["pending"]; its logits row is
    the distribution that CHOSE it — concatenating prefill + resume outputs
    reproduces :func:`greedy_decode` exactly (tests pin this).
    """

    def step(state, _):
        lg, new_state = _decode_step(params, state, config, compute_dtype, eos_token_id)
        tok = new_state["pending"]
        return new_state, ((tok, lg) if return_logits else tok)

    state, ys = jax.lax.scan(step, state, jnp.arange(n_steps, dtype=jnp.int32))
    if return_logits:
        tokens, step_logits = ys
        return tokens.transpose(1, 0), step_logits.transpose(1, 0, 2), state
    return ys.transpose(1, 0), None, state


# -----------------------------------------------------------------------------
# Prefix KV caching: reuse the K/V of a shared prompt prefix across calls
# -----------------------------------------------------------------------------
#
# The KiRAG constructor re-renders (instruction + ranked examplars + question)
# at the head of EVERY turn's prompt — 5 turns x beams per question — and the
# measured constructor stage is prefill-bound (benchmarks/
# bench_kirag_batched_results.jsonl). The reference re-prefills that prefix
# every call (`generator/generator.py:171-235`); here a device-resident pool
# caches each group's prefix K/V once and later calls prefill only the
# suffix. Design constraints on this rig: eager dispatches cost ~8 ms each
# through the relay, so the pool is a FIXED-SHAPE [G, PB, ...] pytree — one
# jitted write per new group, one in-program gather per decode — and zero
# per-call eager ops. Matching is by longest common TOKEN prefix against the
# cached ids (host-side numpy), so divergent tails (turn-1 triples cached
# beyond the stable region) are simply never attended: correctness by
# construction, no text-level split contract needed.


def alloc_prefix_pool(config: LlamaConfig, n_groups: int, prefix_len: int,
                      compute_dtype=jnp.bfloat16):
    """Zeroed per-layer prefix K/V pools: [n_groups, prefix_len, nkv, hd]
    (cache format — quantized when config.kv_quant_bits is set)."""
    nkv, hd, nl = (config.num_key_value_heads, config.head_dim,
                   config.num_hidden_layers)
    kv = config.kv_quant_bits
    return {
        "k": [_cache_alloc(n_groups, prefix_len, nkv, hd, compute_dtype, kv)
              for _ in range(nl)],
        "v": [_cache_alloc(n_groups, prefix_len, nkv, hd, compute_dtype, kv)
              for _ in range(nl)],
    }


@functools.partial(jax.jit, static_argnames=("config", "compute_dtype"),
                   donate_argnames=("pool",))
def write_prefix_pool(params: Params, pool, slot, prefix_ids, prefix_mask,
                      config: LlamaConfig, compute_dtype=jnp.bfloat16):
    """Prefill one RIGHT-padded prefix ([1, PB] ids + mask) and write its
    K/V into pool slot ``slot``. Returns the updated pool (donated in)."""
    positions = jnp.clip(jnp.cumsum(prefix_mask, axis=1) - 1, 0)
    bsz = prefix_ids.shape[0]
    nkv, hd, nl = (config.num_key_value_heads, config.head_dim,
                   config.num_hidden_layers)
    kv = config.kv_quant_bits
    empty = [_cache_alloc(bsz, 0, nkv, hd, compute_dtype, kv)
             for _ in range(nl)]
    empty_mask = jnp.zeros((bsz, 0), dtype=jnp.int32)
    empty_pos = jnp.zeros((bsz, 0), dtype=positions.dtype)
    _, ks, vs = llama_block_forward(
        params, prefix_ids, positions, config, empty, empty, empty_mask,
        new_mask=prefix_mask, compute_dtype=compute_dtype,
        cache_positions=empty_pos)
    return {
        "k": [_cache_write(p, k[0], slot) for p, k in zip(pool["k"], ks)],
        "v": [_cache_write(p, v[0], slot) for p, v in zip(pool["v"], vs)],
    }


def _gather_slots(pool_layer, slot_idx):
    if isinstance(pool_layer, dict):
        return {"q": pool_layer["q"][slot_idx], "s": pool_layer["s"][slot_idx]}
    return pool_layer[slot_idx]


def _prefixed_prefill_state(params, pool, slot_idx, match_len, suffix_ids,
                            suffix_mask, config, total_new_tokens,
                            compute_dtype, eos_token_id,
                            prefix_window: Optional[int] = None):
    """Prefill LEFT-padded suffixes against per-row cached prefixes.

    slot_idx [B] selects each row's pool slot; match_len [B] is how many
    cached slots are valid for that row (its longest common token prefix
    with the cached ids — slots past it hold another call's tail and are
    masked out of attention entirely).

    ``prefix_window`` (static, <= pool width, must be >= every match_len)
    truncates the gathered prefix K/V to its first ``prefix_window`` slots.
    Without it, the decode cache spans the FULL pool width even when the
    match is short — at pool 2048 / prompt ~1.2k that inflated every decode
    step's KV read ~25% and made the prefixed path LOSE to plain prefill
    (bench_kirag_batched r5 lever run). Callers pass a bucketed
    max(match_len) so the program count stays bounded."""
    bsz, t_suf = suffix_ids.shape
    pb = (pool["k"][0]["q"] if isinstance(pool["k"][0], dict)
          else pool["k"][0]).shape[1]
    if prefix_window is not None:
        pb = min(pb, prefix_window)
    nkv, hd, nl = (config.num_key_value_heads, config.head_dim,
                   config.num_hidden_layers)
    t_cache = pb + t_suf + total_new_tokens

    def _window(e):
        if isinstance(e, dict):
            return {"q": e["q"][:, :pb], "s": e["s"][:, :pb]}
        return e[:, :pb]

    pk = [_window(_gather_slots(p, slot_idx)) for p in pool["k"]]
    pv = [_window(_gather_slots(p, slot_idx)) for p in pool["v"]]
    prefix_mask = (jnp.arange(pb)[None, :]
                   < match_len[:, None]).astype(jnp.int32)
    prefix_pos = jnp.broadcast_to(jnp.arange(pb, dtype=jnp.int32)[None, :],
                                  (bsz, pb))
    positions = (match_len[:, None]
                 + jnp.clip(jnp.cumsum(suffix_mask, axis=1) - 1, 0))
    logits, new_ks, new_vs = llama_block_forward(
        params, suffix_ids, positions, config, pk, pv, prefix_mask,
        new_mask=suffix_mask, compute_dtype=compute_dtype,
        cache_positions=prefix_pos)

    def alloc(prefix_entry, new):
        cache = _cache_alloc(bsz, t_cache, nkv, hd, compute_dtype,
                             config.kv_quant_bits)
        if isinstance(cache, dict):
            cache = {"q": cache["q"].at[:, :pb].set(prefix_entry["q"]),
                     "s": cache["s"].at[:, :pb].set(prefix_entry["s"])}
        else:
            cache = cache.at[:, :pb].set(prefix_entry)
        return _cache_write(cache, new, slice(None), slice(pb, pb + t_suf))

    next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    done0 = (jnp.full((bsz,), False) if eos_token_id is None
             else next_token == eos_token_id)
    state = {
        "k": [alloc(p, k) for p, k in zip(pk, new_ks)],
        "v": [alloc(p, v) for p, v in zip(pv, new_vs)],
        "cache_mask": jnp.concatenate(
            [prefix_mask, suffix_mask,
             jnp.zeros((bsz, total_new_tokens), jnp.int32)], axis=1),
        "cache_pos": jnp.concatenate(
            [prefix_pos, positions,
             jnp.zeros((bsz, total_new_tokens), positions.dtype)], axis=1),
        "pending": next_token,
        "pos": positions[:, -1] + 1,
        "done": done0,
        "write_at": jnp.asarray(pb + t_suf, dtype=jnp.int32),
    }
    return next_token, logits[:, -1], state


@functools.partial(jax.jit, static_argnames=("config", "max_new_tokens",
                                             "compute_dtype", "eos_token_id",
                                             "return_logits",
                                             "prefix_window"))
def greedy_decode_prefixed(params: Params, pool, slot_idx, match_len,
                           suffix_ids, suffix_mask, config: LlamaConfig,
                           max_new_tokens: int, compute_dtype=jnp.float32,
                           eos_token_id: Optional[int] = None,
                           return_logits: bool = True,
                           prefix_window: Optional[int] = None):
    """greedy_decode against per-row cached prefixes — one fused program.
    Same output contract as :func:`greedy_decode` on the equivalent full
    prompts (ids match; logits agree to reduction-order rounding).
    ``prefix_window``: see :func:`_prefixed_prefill_state`."""
    next_token, first_logits, state = _prefixed_prefill_state(
        params, pool, slot_idx, match_len, suffix_ids, suffix_mask, config,
        max_new_tokens, compute_dtype, eos_token_id,
        prefix_window=prefix_window)
    if max_new_tokens == 1:
        return next_token[:, None], (first_logits[:, None]
                                     if return_logits else None)

    def step(state, _):
        token = state["pending"]
        lg, new_state = _decode_step(params, state, config, compute_dtype,
                                     eos_token_id)
        return new_state, ((token, lg) if return_logits else token)

    state, ys = jax.lax.scan(step, state,
                             jnp.arange(max_new_tokens - 1, dtype=jnp.int32))
    last_token = state["pending"]
    if return_logits:
        tokens, step_logits = ys
        gen_logits = jnp.concatenate(
            [first_logits[:, None], step_logits.transpose(1, 0, 2)], axis=1)
    else:
        tokens, gen_logits = ys, None
    gen_ids = jnp.concatenate([tokens.transpose(1, 0), last_token[:, None]],
                              axis=1)
    return gen_ids, gen_logits


# -----------------------------------------------------------------------------
# The Backend protocol implementation used by kirag_tpu.generation.Generator
# -----------------------------------------------------------------------------

class JaxLlamaBackend:
    """Token-level greedy backend with shape-bucketed jit programs.

    ``draft_params``/``draft_config`` (optional) switch decoding to greedy
    SPECULATIVE mode (:mod:`kirag_tpu.models.speculative`): the draft
    proposes ``spec_gamma - 1`` tokens per round, the target verifies them
    in one forward, and the emitted stream is bit-identical to plain
    greedy. Both models must share the tokenizer/vocab. Logits-returning
    segmented decode falls back to the plain path (the speculative resume
    carries no logits buffer); `greedy()` supports logits either way.
    """

    def __init__(self, params: Params, config: LlamaConfig, eos_token_id: int,
                 compute_dtype=jnp.bfloat16, prompt_buckets=(128, 256, 512, 1024, 2048, 4096),
                 draft_params: Optional[Params] = None,
                 draft_config: Optional[LlamaConfig] = None,
                 spec_gamma: int = 4,
                 prefix_cache_groups: int = 0,
                 prefix_cache_tokens: int = 2048):
        self.params = params
        self.config = config
        self.eos_token_id = eos_token_id
        self.compute_dtype = compute_dtype
        self.prompt_buckets = prompt_buckets
        # prefix KV cache (see alloc_prefix_pool): 0 groups = disabled.
        # Memory: groups * tokens * 2 * nkv * hd * layers * (1-2 B/elt) —
        # 16 x 2048 at TinyLlama-1.1B geometry is ~740 MB bf16, ~370 MB with
        # kv_quant_bits=8. Pool is allocated lazily on first prefixed call.
        self.prefix_cache_groups = prefix_cache_groups
        self.prefix_cache_tokens = prefix_cache_tokens
        self._prefix_pool = None
        self._prefix_meta = {}      # group -> {"slot": int, "ids": np[P]}
        self._prefix_lru = []       # groups, least-recently-used first
        if draft_params is not None:
            assert draft_config is not None
            assert draft_config.vocab_size == config.vocab_size, \
                "draft and target must share the tokenizer/vocab"
            if config.kv_quant_bits or draft_config.kv_quant_bits:
                # bit-identity of the speculative stream relies on the
                # target's window-fed logits equalling its cache-fed logits
                # exactly; a quantized cache rounds the cached slots but not
                # the in-window ones, so the two genuinely diverge
                raise ValueError(
                    "speculative decoding requires a full-precision KV "
                    "cache (kv_quant_bits=None)")
        self.draft_params = draft_params
        self.draft_config = draft_config
        self.spec_gamma = spec_gamma
        # acceptance accounting (speculative mode): spec_acc_hist[a] counts
        # (row, round) pairs that accepted exactly ``a`` draft tokens,
        # summed over every call since construction. One tiny device fetch
        # per CALL (not per token). ``draft_script_fn``, if set, is called
        # with (input_ids, attention_mask) per generate call and may return
        # a [B, W] int32 proposal-override script (controllable-agreement
        # benchmarking; see models.speculative._spec_round) or None.
        self.spec_acc_hist = np.zeros((spec_gamma,), np.int64)
        self.draft_script_fn = None

    def _bucket(self, t: int) -> int:
        for b in self.prompt_buckets:
            if b >= t:
                return b
        return self.prompt_buckets[-1]

    def _bucket_inputs(self, input_ids: np.ndarray, attention_mask: np.ndarray):
        t = input_ids.shape[1]
        bucket = self._bucket(t)
        if bucket > t:  # extend LEFT padding to the bucket
            pad = bucket - t
            input_ids = np.pad(input_ids, ((0, 0), (pad, 0)))
            attention_mask = np.pad(attention_mask, ((0, 0), (pad, 0)))
        elif bucket < t:  # prompt longer than the largest bucket: truncate left
            input_ids = input_ids[:, -bucket:]
            attention_mask = attention_mask[:, -bucket:]
        return input_ids, attention_mask

    # -- prefix KV cache ------------------------------------------------------

    @property
    def supports_prefix_cache(self) -> bool:
        # speculative mode verifies against window-fed logits; reusing cached
        # prefix K/V there is untested — plain greedy only for now
        return self.prefix_cache_groups > 0 and self.draft_params is None

    def _prefix_slot(self, group, row_ids: np.ndarray) -> dict:
        """Slot metadata for ``group``, creating (or LRU-evicting into) a
        pool slot seeded with ``row_ids[:prefix_cache_tokens]`` if new."""
        meta = self._prefix_meta.get(group)
        if meta is None:
            if len(self._prefix_meta) >= self.prefix_cache_groups:
                evict = self._prefix_lru.pop(0)
                meta = self._prefix_meta.pop(evict)
                slot = meta["slot"]
            else:
                slot = len(self._prefix_meta)
            ids = np.asarray(row_ids[: self.prefix_cache_tokens],
                             dtype=np.int32)
            pb = self.prefix_cache_tokens
            padded = np.zeros((1, pb), np.int32)
            padded[0, : len(ids)] = ids               # RIGHT padding
            mask = np.zeros((1, pb), np.int32)
            mask[0, : len(ids)] = 1
            if self._prefix_pool is None:
                self._prefix_pool = alloc_prefix_pool(
                    self.config, self.prefix_cache_groups, pb,
                    self.compute_dtype)
            self._prefix_pool = write_prefix_pool(
                self.params, self._prefix_pool, jnp.asarray(slot),
                jnp.asarray(padded), jnp.asarray(mask), self.config,
                self.compute_dtype)
            meta = {"slot": slot, "ids": ids}
            self._prefix_meta[group] = meta
        if group in self._prefix_lru:
            self._prefix_lru.remove(group)
        self._prefix_lru.append(group)
        return meta

    def _greedy_prefixed(self, input_ids: np.ndarray,
                         attention_mask: np.ndarray, prefix_groups,
                         max_new_tokens: int, return_logits: bool):
        """Per-row longest-common-prefix reuse against the group's cached
        ids; rows keep >=1 suffix token so the prefill emits logits."""
        rows = [ids[m.astype(bool)] for ids, m in
                zip(np.asarray(input_ids), np.asarray(attention_mask))]
        slots, matches, suffixes = [], [], []
        for row, group in zip(rows, prefix_groups):
            meta = self._prefix_slot(group, row)
            cached = meta["ids"]
            n = min(len(row) - 1, len(cached))
            m = int(np.argmin(row[:n] == cached[:n])) \
                if not (row[:n] == cached[:n]).all() else n
            if m < 16:   # not worth a prefixed program
                m = 0
            slots.append(meta["slot"])
            matches.append(m)
            suffixes.append(row[m:])
        t_suf = self._bucket(max(len(s) for s in suffixes))
        suf_ids = np.zeros((len(rows), t_suf), np.int32)
        suf_mask = np.zeros((len(rows), t_suf), np.int32)
        for r, s in enumerate(suffixes):
            s = s[-t_suf:]                            # truncate left if huge
            suf_ids[r, t_suf - len(s):] = s           # LEFT padding
            suf_mask[r, t_suf - len(s):] = 1
        # bucketed prefix window (256-multiples): the decode cache then
        # spans ~the true prompt instead of the full pool width — without
        # this the extra KV read per decode step ate the prefill savings
        pw = min(self.prefix_cache_tokens,
                 max(256, -(-max(matches) // 256) * 256))
        ids, logits = greedy_decode_prefixed(
            self.params, self._prefix_pool, jnp.asarray(slots, jnp.int32),
            jnp.asarray(matches, jnp.int32), jnp.asarray(suf_ids),
            jnp.asarray(suf_mask), self.config, max_new_tokens,
            self.compute_dtype, eos_token_id=self.eos_token_id,
            return_logits=return_logits, prefix_window=pw)
        return np.asarray(ids), (np.asarray(logits) if return_logits
                                 else None)

    def greedy(self, input_ids: np.ndarray, attention_mask: np.ndarray,
               max_new_tokens: int, return_logits: bool = True,
               prefix_groups=None) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        if prefix_groups is not None and self.supports_prefix_cache:
            return self._greedy_prefixed(input_ids, attention_mask,
                                         prefix_groups, max_new_tokens,
                                         return_logits)
        input_ids, attention_mask = self._bucket_inputs(input_ids, attention_mask)
        if self.draft_params is not None:
            from kirag_tpu.models.speculative import speculative_decode

            script = (self.draft_script_fn(input_ids, attention_mask)
                      if self.draft_script_fn is not None else None)
            ids, logits, hist = speculative_decode(
                self.params, self.config, self.draft_params,
                self.draft_config, jnp.asarray(input_ids),
                jnp.asarray(attention_mask), max_new_tokens,
                gamma=self.spec_gamma, compute_dtype=self.compute_dtype,
                eos_token_id=self.eos_token_id, return_logits=return_logits,
                draft_script=(None if script is None else jnp.asarray(script)),
                return_stats=True)
            self.spec_acc_hist += np.asarray(hist)
        else:
            ids, logits = greedy_decode(
                self.params, jnp.asarray(input_ids), jnp.asarray(attention_mask),
                self.config, max_new_tokens, self.compute_dtype,
                eos_token_id=self.eos_token_id, return_logits=return_logits)
        return np.asarray(ids), (np.asarray(logits) if return_logits else None)

    # -- KV-cache-resumable segmented decode ----------------------------------

    def greedy_start(self, input_ids: np.ndarray, attention_mask: np.ndarray,
                     total_new_tokens: int, return_logits: bool = True):
        """Prefill + first token; reserves cache room for ``total_new_tokens``.
        Returns (ids [B,1], logits [B,1,V]|None, device-resident state)."""
        input_ids, attention_mask = self._bucket_inputs(input_ids, attention_mask)
        if self.draft_params is not None and not return_logits:
            from kirag_tpu.models.speculative import speculative_start

            script = (self.draft_script_fn(input_ids, attention_mask)
                      if self.draft_script_fn is not None else None)
            ids, st = speculative_start(
                self.params, self.config, self.draft_params,
                self.draft_config, jnp.asarray(input_ids),
                jnp.asarray(attention_mask), total_new_tokens,
                gamma=self.spec_gamma, compute_dtype=self.compute_dtype,
                eos_token_id=self.eos_token_id)
            # host-side total + script + last-seen hist ride with the state
            # (total is a static arg of resume; the in-state hist is
            # cumulative so resumes accumulate DELTAS against hist_prev —
            # zeros after start: rounds only run in resume)
            return np.asarray(ids), None, (
                st, total_new_tokens, script,
                np.zeros((self.spec_gamma,), np.int64))
        ids, logits, state = prefill_decode(
            self.params, jnp.asarray(input_ids), jnp.asarray(attention_mask),
            self.config, total_new_tokens, self.compute_dtype,
            eos_token_id=self.eos_token_id)
        return np.asarray(ids), (np.asarray(logits) if return_logits else None), state

    def greedy_resume(self, state, n_steps: int, return_logits: bool = True):
        """Decode ``n_steps`` more tokens from a greedy_start/resume state —
        no re-prefill; the KV cache never leaves the device."""
        if isinstance(state, tuple) and isinstance(state[0], dict) \
                and "served" in state[0]:
            from kirag_tpu.models.speculative import speculative_resume

            st, total, script, hist_prev = state
            ids, st = speculative_resume(
                self.params, self.config, self.draft_params,
                self.draft_config, st, n_steps, total,
                gamma=self.spec_gamma, compute_dtype=self.compute_dtype,
                eos_token_id=self.eos_token_id,
                draft_script=(None if script is None
                              else jnp.asarray(script)))
            hist = np.asarray(st["acc_hist"])
            self.spec_acc_hist += hist - hist_prev
            return np.asarray(ids), None, (st, total, script, hist)
        ids, logits, state = resume_decode(
            self.params, state, self.config, n_steps, self.compute_dtype,
            eos_token_id=self.eos_token_id, return_logits=return_logits)
        return np.asarray(ids), (np.asarray(logits) if return_logits else None), state

    def shard_params(self, mesh, model_axis: str = "model"):
        from jax.sharding import NamedSharding

        # structure-matching specs: works for float AND quantized (int8/int4)
        # trees, and for gemma2's sandwich norms
        if self.config.int4_impl == "pallas":
            # a pallas_call is opaque to the GSPMD partitioner: sharded
            # params would be all-gathered around it — use the TP-safe
            # XLA formulation instead (retraces: config is a static arg)
            self.config = dataclasses.replace(self.config, int4_impl="parity")
        specs = llama_param_shardings_like(self.params, self.config, model_axis)
        self.params = jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), self.params, specs)
        if self.draft_params is not None:
            dspecs = llama_param_shardings_like(self.draft_params,
                                                self.draft_config, model_axis)
            self.draft_params = jax.tree.map(
                lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
                self.draft_params, dspecs)
        return self


# -----------------------------------------------------------------------------
# HF checkpoint conversion
# -----------------------------------------------------------------------------

def convert_hf_llama_state_dict(state_dict: Dict[str, np.ndarray], config: LlamaConfig,
                                int8_weights: bool = False,
                                quant_bits: Optional[int] = None,
                                int4_codebook: str = "nf4") -> Params:
    """Map an HF llama state_dict to our pytree. With ``int8_weights`` (or
    ``quant_bits`` in {4, 8}), projection kernels are quantized ON HOST before
    device placement — full precision weights never touch HBM (an 8B model
    fits one v5e chip at int8, ~4.5GB at int4). ``quant_bits=4`` defaults to
    the NF4 codebook (the reference's bitsandbytes format,
    `utils/pipeline_utils.py:55-77`); ``int4_codebook="linear"`` keeps the
    symmetric integer grid."""
    if int8_weights and quant_bits is None:
        quant_bits = 8
    sd = {k.removeprefix("model."): np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        kernel = sd[f"{prefix}.weight"].T
        if quant_bits == 4:
            p = (_quantize_kernel_nf4(kernel) if int4_codebook == "nf4"
                 else _quantize_kernel_int4(kernel))
        elif quant_bits == 8:
            p = _quantize_kernel_int8(kernel)
        else:
            p = {"kernel": jnp.asarray(kernel)}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    params: Params = {
        "embed_tokens": jnp.asarray(sd["embed_tokens.weight"]),
        "norm": {"scale": jnp.asarray(sd["norm.weight"])},
        "layers": [],
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = lin("lm_head")
    for l in range(config.num_hidden_layers):
        pre = f"layers.{l}"
        layer = {
            "input_layernorm": {"scale": jnp.asarray(sd[f"{pre}.input_layernorm.weight"])},
            "post_attention_layernorm": {
                "scale": jnp.asarray(sd[f"{pre}.post_attention_layernorm.weight"])},
            "q_proj": lin(f"{pre}.self_attn.q_proj"),
            "k_proj": lin(f"{pre}.self_attn.k_proj"),
            "v_proj": lin(f"{pre}.self_attn.v_proj"),
            "o_proj": lin(f"{pre}.self_attn.o_proj"),
            "gate_proj": lin(f"{pre}.mlp.gate_proj"),
            "up_proj": lin(f"{pre}.mlp.up_proj"),
            "down_proj": lin(f"{pre}.mlp.down_proj"),
        }
        # gemma2 sandwich norms
        for extra in ("pre_feedforward_layernorm", "post_feedforward_layernorm"):
            if f"{pre}.{extra}.weight" in sd:
                layer[extra] = {"scale": jnp.asarray(sd[f"{pre}.{extra}.weight"])}
        params["layers"].append(layer)
    return params


def load_llama(model_name_or_path: str, compute_dtype=jnp.bfloat16,
               int8_weights: bool = False,
               quant_bits: Optional[int] = None,
               kv_quant_bits: Optional[int] = None,
               int4_codebook: str = "nf4") -> Tuple[Params, LlamaConfig]:
    """Load a Llama-architecture causal LM from a local HF checkpoint dir.

    ``int8_weights`` (== ``quant_bits=8``) quantizes projections on host
    during conversion, so an 8B model fits a single 16GB chip (full precision
    never reaches HBM); ``quant_bits=4`` packs block-64 4-bit — NF4 codebook
    by default, exactly the reference's bitsandbytes format
    (`utils/pipeline_utils.py:55-77`); ``int4_codebook="linear"`` keeps the
    symmetric grid. ``kv_quant_bits=8`` additionally stores the decode KV
    cache int8 (see :attr:`LlamaConfig.kv_quant_bits`).
    """
    if not os.path.isdir(model_name_or_path):
        raise FileNotFoundError(
            f"{model_name_or_path} is not a local directory. This environment has no "
            "network egress; download checkpoints out-of-band and pass the local path.")
    with open(os.path.join(model_name_or_path, "config.json")) as f:
        hf_config = json.load(f)
    config = config_from_hf(hf_config)

    state_dict: Dict[str, np.ndarray] = {}
    st_index = os.path.join(model_name_or_path, "model.safetensors.index.json")
    st_single = os.path.join(model_name_or_path, "model.safetensors")
    bin_path = os.path.join(model_name_or_path, "pytorch_model.bin")
    if os.path.exists(st_index):
        from safetensors.numpy import load_file

        with open(st_index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            state_dict.update(load_file(os.path.join(model_name_or_path, shard)))
    elif os.path.exists(st_single):
        from safetensors.numpy import load_file

        state_dict = load_file(st_single)
    elif os.path.exists(bin_path):
        import torch

        state_dict = {k: v.to(torch.float32).numpy()
                      for k, v in torch.load(bin_path, map_location="cpu",
                                             weights_only=True).items()}
    else:
        raise FileNotFoundError(f"no safetensors/bin weights under {model_name_or_path}")
    params = convert_hf_llama_state_dict(state_dict, config,
                                         int8_weights=int8_weights,
                                         quant_bits=quant_bits,
                                         int4_codebook=int4_codebook)
    # cast 2-D float tensors (the big ones) to compute_dtype; int4/int8
    # kernels stay packed and small 1-D leaves (norms, biases, quant scales)
    # stay f32 — as do the 2-D blockwise int4 scales
    def _cast(path, x):
        key = getattr(path[-1], "key", None)
        if key == "kernel_scale4":
            return x
        if jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 2:
            return jnp.asarray(x, dtype=compute_dtype)
        return x

    params = jax.tree_util.tree_map_with_path(_cast, params)
    if quant_bits == 4:
        # pick the int4 matmul formulation: the pallas in-VMEM dequant is the
        # only one at the 4-bit bandwidth roofline (probe_r6), but a
        # pallas_call is opaque to GSPMD — single-device TPU only.
        # shard_params flips to the TP-safe XLA formulation.
        impl = os.environ.get("KIRAG_INT4_IMPL")
        if impl is None:
            impl = ("pallas" if jax.default_backend() == "tpu"
                    and jax.device_count() == 1 else "parity")
        config = dataclasses.replace(config, int4_impl=impl)
    if kv_quant_bits is not None:
        config = dataclasses.replace(config, kv_quant_bits=kv_quant_bits)
    return params, config
