"""BERT-family encoder as a pure functional JAX model.

One implementation backs all bi-encoders of the reference
(`retriever/encoders.py`): E5 (masked mean pool + L2 norm), BGE (CLS pool +
L2 norm) and Contriever (mean pool) differ only in the pooling head, applied
in :mod:`kirag_tpu.models.encoders`.

Design notes (TPU-first):
- Parameters are a nested dict pytree of jnp arrays; the forward is a single
  jit-compiled function with static config, so the whole encoder fuses into
  large MXU matmuls under XLA.
- Tensor parallelism: :func:`param_shardings` returns a matching pytree of
  `PartitionSpec`s that shard QKV/MLP weights over the mesh ``model`` axis;
  activations stay replicated over ``model`` and sharded over ``data``
  (batch). XLA inserts the all-reduces after the attention-output and
  MLP-output projections.
- bf16-friendly: compute dtype is a function argument; LayerNorm statistics
  and the attention softmax accumulate in f32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # one [h, 3h] QKV matmul instead of three [h, h]: bit-identical per
    # output column (each column's dot accumulates independently), larger
    # MXU tiles, one kernel launch. Off switch kept for A/B timing.
    fused_qkv: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


Params = Dict[str, Any]


def _linear_init(key, in_dim, out_dim, std=0.02):
    kernel = jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32) * std
    return {"kernel": kernel, "bias": jnp.zeros((out_dim,), dtype=jnp.float32)}


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_bert_params(key: jax.Array, config: BertConfig) -> Params:
    """Random-init parameters with the same structure as an HF BertModel."""
    keys = jax.random.split(key, 6 + 6 * config.num_hidden_layers)
    h, i = config.hidden_size, config.intermediate_size
    params: Params = {
        "embeddings": {
            "word_embeddings": jax.random.normal(keys[0], (config.vocab_size, h)) * 0.02,
            "position_embeddings": jax.random.normal(keys[1], (config.max_position_embeddings, h)) * 0.02,
            "token_type_embeddings": jax.random.normal(keys[2], (config.type_vocab_size, h)) * 0.02,
            "layer_norm": _ln_init(h),
        },
        "layers": [],
        "pooler": _linear_init(keys[3], h, h),
    }
    for l in range(config.num_hidden_layers):
        k = keys[6 + 6 * l: 12 + 6 * l]
        params["layers"].append(
            {
                "attention": {
                    "query": _linear_init(k[0], h, h),
                    "key": _linear_init(k[1], h, h),
                    "value": _linear_init(k[2], h, h),
                    "output": _linear_init(k[3], h, h),
                    "output_layer_norm": _ln_init(h),
                },
                "mlp": {
                    "intermediate": _linear_init(k[4], h, i),
                    "output": _linear_init(k[5], i, h),
                    "output_layer_norm": _ln_init(h),
                },
            }
        )
    return params


def param_shardings(config: BertConfig, data_axis: str = "data", model_axis: str = "model") -> Params:
    """PartitionSpec pytree for tensor-parallel encoder weights.

    QKV kernels shard their output (head) dim; the attention output projection
    and MLP down-projection shard their input dim, so each device holds a head
    slice and XLA reduces partial sums after the projections (Megatron layout
    expressed declaratively).
    """
    col = {"kernel": P(None, model_axis), "bias": P(model_axis)}
    row = {"kernel": P(model_axis, None), "bias": P()}
    ln = {"scale": P(), "bias": P()}
    layer = {
        "attention": {
            "query": col, "key": col, "value": col,
            "output": row, "output_layer_norm": ln,
        },
        "mlp": {"intermediate": col, "output": row, "output_layer_norm": ln},
    }
    return {
        "embeddings": {
            "word_embeddings": P(),
            "position_embeddings": P(),
            "token_type_embeddings": P(),
            "layer_norm": ln,
        },
        "layers": [layer] * config.num_hidden_layers,
        "pooler": {"kernel": P(), "bias": P()},
    }


def _layer_norm(x: jnp.ndarray, p: Params, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    return jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=x.dtype) + p["bias"].astype(x.dtype)


def _qkv(x: jnp.ndarray, p: Params, config: BertConfig):
    """Project to (q, k, v). ``config.fused_qkv`` concatenates the three
    kernels into one [h, 3h] matmul — bit-identical to three separate
    projections (every output column accumulates independently of its
    neighbors), but one launch with 3x-wider MXU tiles. The per-call concat
    copies 24 x 6 MB of weights at e5-large — noise against the ~10 TFLOP
    forward. Under tensor parallelism all three kernels are column-sharded
    over ``model`` identically, so the concat stays column-sharded."""
    if not config.fused_qkv:
        return (_dense(x, p["query"]), _dense(x, p["key"]),
                _dense(x, p["value"]))
    kern = jnp.concatenate(
        [p["query"]["kernel"], p["key"]["kernel"], p["value"]["kernel"]],
        axis=1).astype(x.dtype)
    bias = jnp.concatenate(
        [p["query"]["bias"], p["key"]["bias"], p["value"]["bias"]]
    ).astype(x.dtype)
    qkv = jnp.dot(x, kern, preferred_element_type=x.dtype) + bias
    return tuple(jnp.split(qkv, 3, axis=-1))


def _attention(x: jnp.ndarray, mask_bias: jnp.ndarray, p: Params, config: BertConfig) -> jnp.ndarray:
    b, t, h = x.shape
    nh, hd = config.num_attention_heads, config.head_dim
    q, k, v = _qkv(x, p, config)
    q = q.reshape(b, t, nh, hd)
    k = k.reshape(b, t, nh, hd)
    v = v.reshape(b, t, nh, hd)
    # [b, nh, t, t] logits, f32 softmax accumulation
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd) + mask_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, t, h)
    return _dense(ctx, p["output"])


def _flash_attention(x: jnp.ndarray, attention_mask: jnp.ndarray, p: Params,
                     config: BertConfig) -> jnp.ndarray:
    """Fused Pallas flash attention (TPU): never materializes the [b, nh, t, t]
    score tensor to HBM (~268MB/layer at b128 x s256 x 16h in the XLA path).

    Padding is expressed as segment ids (pad=0, real=1): pad QUERIES attend
    among themselves instead of over real keys as in the additive-bias path —
    an intentional difference, as pad rows never reach the pooling heads
    (masked mean / CLS-at-0)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, t, h = x.shape
    nh, hd = config.num_attention_heads, config.head_dim
    q, k, v = _qkv(x, p, config)
    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    seg = attention_mask.astype(jnp.int32)
    # largest block that divides t (BlockSizes requires it): t=640/768/896
    # pass the auto gate (t % 128 == 0) but are not divisible by 512
    blk = next((c for c in (512, 384, 256, 128) if t % c == 0), min(t, 512))
    sizes = fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
    ctx = fa.flash_attention(
        q, k, v, segment_ids=fa.SegmentIds(q=seg, kv=seg),
        sm_scale=1.0 / math.sqrt(hd), block_sizes=sizes)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, h)
    return _dense(ctx, p["output"])


def _resolve_attention_impl(impl: str, t: int, config: BertConfig) -> str:
    """auto -> flash on TPU: validated on-chip round 3 (cosine 0.999999 vs
    the XLA oracle, 1.71x faster at e5-large b128 x s256 — 544.5 vs 318.1
    passages/s, benchmarks/bench_encoder_results.jsonl)."""
    if impl != "auto":
        return impl
    if (jax.default_backend() == "tpu" and t % 128 == 0
            and config.head_dim % 64 == 0):
        return "flash"
    return "xla"


def bert_encode(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    config: BertConfig,
    token_type_ids: Optional[jnp.ndarray] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    attention_impl: str = "auto",
    position_ids: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run the transformer stack; returns last_hidden_state [B, T, H].

    ``attention_impl``: "xla" (einsum softmax, the parity oracle), "flash"
    (fused Pallas kernel, TPU only), or "auto" (flash on TPU when the
    sequence is lane-aligned, else xla).

    ``position_ids`` / ``segment_ids`` support SEQUENCE PACKING (several
    short documents sharing one row, the aligner's packed forward): positions
    restart per packed document, and attention is confined to same-segment
    tokens (segment 0 = padding; pads attend among themselves — they never
    reach the pooling heads). The flash path passes segments to the kernel's
    native SegmentIds; the XLA path builds the equivalent block-diagonal
    bias.
    """
    b, t = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    emb_p = params["embeddings"]
    positions = jnp.arange(t)[None, :] if position_ids is None else position_ids
    x = (
        jnp.take(emb_p["word_embeddings"], input_ids, axis=0)
        + jnp.take(emb_p["position_embeddings"], positions, axis=0)
        + jnp.take(emb_p["token_type_embeddings"], token_type_ids, axis=0)
    )
    x = _layer_norm(x, emb_p["layer_norm"], config.layer_norm_eps).astype(compute_dtype)

    impl = _resolve_attention_impl(attention_impl, t, config)
    # additive attention bias like HF: large negative where masked
    neg = jnp.finfo(jnp.float32).min
    if segment_ids is None:
        mask_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg
        seg = attention_mask
    else:
        seg = segment_ids
        same = (seg[:, None, :, None] == seg[:, None, None, :])
        mask_bias = jnp.where(same, 0.0, neg)

    for layer_p in params["layers"]:
        if impl == "flash":
            attn_out = _flash_attention(x, seg, layer_p["attention"], config)
        else:
            attn_out = _attention(x, mask_bias, layer_p["attention"], config)
        x = _layer_norm(x + attn_out, layer_p["attention"]["output_layer_norm"], config.layer_norm_eps)
        mlp_p = layer_p["mlp"]
        inter = jax.nn.gelu(_dense(x, mlp_p["intermediate"]).astype(jnp.float32), approximate=False)
        mlp_out = _dense(inter.astype(x.dtype), mlp_p["output"])
        x = _layer_norm(x + mlp_out, mlp_p["output_layer_norm"], config.layer_norm_eps)
    return x


# ---------------------------------------------------------------------------
# HF torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_hf_state_dict(state_dict: Dict[str, np.ndarray], config: BertConfig) -> Params:
    """Map an HF ``BertModel`` state_dict (numpy arrays) to our param pytree.

    Accepts keys with or without a leading ``bert.`` prefix. torch Linear
    weights are [out, in] and are transposed to JAX's [in, out].
    """
    sd = {k.removeprefix("bert."): np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        return {
            "kernel": jnp.asarray(sd[f"{prefix}.weight"].T),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    def ln(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]), "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    params: Params = {
        "embeddings": {
            "word_embeddings": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
            "position_embeddings": jnp.asarray(sd["embeddings.position_embeddings.weight"]),
            "token_type_embeddings": jnp.asarray(sd["embeddings.token_type_embeddings.weight"]),
            "layer_norm": ln("embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for l in range(config.num_hidden_layers):
        pre = f"encoder.layer.{l}"
        params["layers"].append(
            {
                "attention": {
                    "query": lin(f"{pre}.attention.self.query"),
                    "key": lin(f"{pre}.attention.self.key"),
                    "value": lin(f"{pre}.attention.self.value"),
                    "output": lin(f"{pre}.attention.output.dense"),
                    "output_layer_norm": ln(f"{pre}.attention.output.LayerNorm"),
                },
                "mlp": {
                    "intermediate": lin(f"{pre}.intermediate.dense"),
                    "output": lin(f"{pre}.output.dense"),
                    "output_layer_norm": ln(f"{pre}.output.LayerNorm"),
                },
            }
        )
    if "pooler.dense.weight" in sd:
        params["pooler"] = lin("pooler.dense")
    else:
        params["pooler"] = _linear_init(jax.random.key(0), config.hidden_size, config.hidden_size)
    return params


def config_from_hf(hf_config) -> BertConfig:
    """Build a :class:`BertConfig` from a transformers BertConfig object/dict."""
    get = hf_config.get if isinstance(hf_config, dict) else lambda k, d=None: getattr(hf_config, k, d)
    return BertConfig(
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        num_hidden_layers=get("num_hidden_layers"),
        num_attention_heads=get("num_attention_heads"),
        intermediate_size=get("intermediate_size"),
        max_position_embeddings=get("max_position_embeddings"),
        type_vocab_size=get("type_vocab_size", 2),
        layer_norm_eps=get("layer_norm_eps", 1e-12),
        pad_token_id=get("pad_token_id", 0) or 0,
    )
