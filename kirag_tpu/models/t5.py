"""T5 encoder-decoder LM in functional JAX with greedy decoding.

Completes the generator family matrix of the reference, whose `Generator`
also accepts ``T5ForConditionalGeneration`` (`generator/generator.py:26,75`).
Architecture: shared embeddings, T5LayerNorm (RMS, no mean subtraction),
relative-position-bucket attention bias (held by layer 0, shared across
layers; bidirectional in the encoder, causal in the decoder), optional gated
activations, NO 1/sqrt(d) attention scaling, and tied lm_head scaled by
d_model^-0.5.

Exact greedy parity vs torch is enforced in tests (tiny random models).
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


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # or "gated-gelu"
    decoder_start_token_id: int = 0
    tie_word_embeddings: bool = True

    @property
    def is_gated(self) -> bool:
        return self.feed_forward_proj.startswith("gated")


Params = Dict[str, Any]


def config_from_hf(hf_config) -> T5Config:
    get = hf_config.get if isinstance(hf_config, dict) else lambda k, d=None: getattr(hf_config, k, d)
    return T5Config(
        vocab_size=get("vocab_size"),
        d_model=get("d_model"),
        d_kv=get("d_kv"),
        d_ff=get("d_ff"),
        num_layers=get("num_layers"),
        num_decoder_layers=get("num_decoder_layers") or get("num_layers"),
        num_heads=get("num_heads"),
        relative_attention_num_buckets=get("relative_attention_num_buckets", 32),
        relative_attention_max_distance=get("relative_attention_max_distance", 128),
        layer_norm_epsilon=get("layer_norm_epsilon", 1e-6),
        feed_forward_proj=get("feed_forward_proj", "relu"),
        decoder_start_token_id=get("decoder_start_token_id", 0),
        tie_word_embeddings=bool(get("tie_word_embeddings", True)),
    )


def _t5_norm(x, scale, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(x.dtype)


def _dense(x, kernel):
    return jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=x.dtype)


def _relative_position_bucket(relative_position, bidirectional: bool,
                              num_buckets: int, max_distance: int):
    """HF T5's bucketing (t5 modeling `_relative_position_bucket`)."""
    rp = relative_position
    if bidirectional:
        num_buckets //= 2
        bucket = jnp.where(rp > 0, num_buckets, 0)
        rp = jnp.abs(rp)
    else:
        bucket = jnp.zeros_like(rp)
        rp = -jnp.minimum(rp, 0)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    log_ratio = jnp.log(rp.astype(jnp.float32) / max_exact + 1e-9) / np.log(
        max_distance / max_exact)
    large = max_exact + (log_ratio * (num_buckets - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return bucket + jnp.where(is_small, rp, large)


def _position_bias(bias_embedding, q_pos, k_pos, bidirectional, config: T5Config):
    """bias_embedding: [num_buckets, num_heads]; returns [1, H, Tq, Tk]."""
    rel = k_pos[None, :] - q_pos[:, None]  # memory - query
    buckets = _relative_position_bucket(
        rel, bidirectional, config.relative_attention_num_buckets,
        config.relative_attention_max_distance)
    bias = jnp.take(bias_embedding, buckets, axis=0)  # [Tq, Tk, H]
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def _attention(x, kv, p, config: T5Config, bias, mask):
    """T5 attention: no 1/sqrt(d) scaling; additive position bias.

    x: [B, Tq, D] queries; kv: [B, Tk, D] keys/values source;
    bias: [1orB, H, Tq, Tk] or None; mask: [B, 1, Tq, Tk] bool.
    """
    b, tq, _ = x.shape
    tk = kv.shape[1]
    h, dkv = config.num_heads, config.d_kv
    q = _dense(x, p["q"]).reshape(b, tq, h, dkv)
    k = _dense(kv, p["k"]).reshape(b, tk, h, dkv)
    v = _dense(kv, p["v"]).reshape(b, tk, h, dkv)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, tq, h * dkv)
    return _dense(ctx, p["o"])


def _ff(x, p, config: T5Config):
    if config.is_gated:
        act = jax.nn.gelu(_dense(x, p["wi_0"]).astype(jnp.float32), approximate=True)
        inner = act.astype(x.dtype) * _dense(x, p["wi_1"])
    else:
        inner = jax.nn.relu(_dense(x, p["wi"]))
    return _dense(inner, p["wo"])


def t5_encode(params: Params, input_ids, attention_mask, config: T5Config,
              compute_dtype=jnp.float32):
    """Returns encoder hidden states [B, T, D]."""
    b, t = input_ids.shape
    x = jnp.take(params["shared"], input_ids, axis=0).astype(compute_dtype)
    pos = jnp.arange(t)
    bias = _position_bias(params["encoder"]["rel_bias"], pos, pos, True, config)
    mask = attention_mask.astype(bool)[:, None, None, :]
    for layer in params["encoder"]["layers"]:
        h = _t5_norm(x, layer["ln0"], config.layer_norm_epsilon)
        x = x + _attention(h, h, layer["attn"], config, bias, mask)
        h = _t5_norm(x, layer["ln1"], config.layer_norm_epsilon)
        x = x + _ff(h, layer["ff"], config)
    return _t5_norm(x, params["encoder"]["final_ln"], config.layer_norm_epsilon)


def t5_decode_step(params: Params, decoder_ids, enc_hidden, enc_mask,
                   config: T5Config, compute_dtype=jnp.float32):
    """Full (non-incremental) decoder forward over ``decoder_ids``; returns
    logits [B, T_dec, V]. Simple and exact; the decode loop below re-runs it
    per step (T5 readers in this pipeline generate <= 64 tokens)."""
    b, t = decoder_ids.shape
    x = jnp.take(params["shared"], decoder_ids, axis=0).astype(compute_dtype)
    pos = jnp.arange(t)
    self_bias = _position_bias(params["decoder"]["rel_bias"], pos, pos, False, config)
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]
    enc_valid = enc_mask.astype(bool)[:, None, None, :]
    for layer in params["decoder"]["layers"]:
        h = _t5_norm(x, layer["ln0"], config.layer_norm_epsilon)
        x = x + _attention(h, h, layer["self_attn"], config, self_bias, causal)
        h = _t5_norm(x, layer["ln1"], config.layer_norm_epsilon)
        x = x + _attention(h, enc_hidden, layer["cross_attn"], config, None, enc_valid)
        h = _t5_norm(x, layer["ln2"], config.layer_norm_epsilon)
        x = x + _ff(h, layer["ff"], config)
    x = _t5_norm(x, params["decoder"]["final_ln"], config.layer_norm_epsilon)
    if config.tie_word_embeddings:
        x = x * (config.d_model ** -0.5)
        logits = jnp.einsum("btd,vd->btv", x.astype(jnp.float32),
                            params["shared"].astype(jnp.float32))
    else:
        logits = _dense(x, params["lm_head"]).astype(jnp.float32)
    return logits


@functools.partial(jax.jit, static_argnames=("config", "max_new_tokens", "compute_dtype",
                                             "eos_token_id"))
def t5_greedy_decode(params: Params, input_ids, attention_mask, config: T5Config,
                     max_new_tokens: int, compute_dtype=jnp.float32,
                     eos_token_id: Optional[int] = None):
    """Greedy seq2seq decode. Returns (gen ids [B, max_new], logits [B, max_new, V])."""
    b = input_ids.shape[0]
    enc_hidden = t5_encode(params, input_ids, attention_mask, config, compute_dtype)

    dec = jnp.full((b, max_new_tokens + 1), config.decoder_start_token_id, jnp.int32)
    done0 = jnp.full((b,), False)

    def step(carry, t):
        dec_ids, done = carry
        logits = t5_decode_step(params, dec_ids, enc_hidden,
                                attention_mask, config, compute_dtype)
        step_logits = jax.lax.dynamic_slice_in_dim(logits, t, 1, axis=1)[:, 0]
        token = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        if eos_token_id is not None:
            token = jnp.where(done, eos_token_id, token)
            done = done | (token == eos_token_id)
        dec_ids = dec_ids.at[:, t + 1].set(token)
        return (dec_ids, done), (token, step_logits)

    (dec, _), (tokens, logits) = jax.lax.scan(
        step, (dec, done0), jnp.arange(max_new_tokens, dtype=jnp.int32))
    return tokens.transpose(1, 0), logits.transpose(1, 0, 2)


# -----------------------------------------------------------------------------
# HF conversion + Backend
# -----------------------------------------------------------------------------

def convert_hf_t5_state_dict(state_dict: Dict[str, np.ndarray], config: T5Config) -> Params:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def w(name):
        return jnp.asarray(sd[name].T)  # torch [out,in] -> [in,out]

    def block(prefix, decoder: bool):
        layers = []
        n = config.num_decoder_layers if decoder else config.num_layers
        for i in range(n):
            p = f"{prefix}.block.{i}.layer"
            attn = {
                "q": w(f"{p}.0.SelfAttention.q.weight"),
                "k": w(f"{p}.0.SelfAttention.k.weight"),
                "v": w(f"{p}.0.SelfAttention.v.weight"),
                "o": w(f"{p}.0.SelfAttention.o.weight"),
            }
            layer = {"ln0": jnp.asarray(sd[f"{p}.0.layer_norm.weight"])}
            if decoder:
                layer["self_attn"] = attn
                layer["cross_attn"] = {
                    "q": w(f"{p}.1.EncDecAttention.q.weight"),
                    "k": w(f"{p}.1.EncDecAttention.k.weight"),
                    "v": w(f"{p}.1.EncDecAttention.v.weight"),
                    "o": w(f"{p}.1.EncDecAttention.o.weight"),
                }
                layer["ln1"] = jnp.asarray(sd[f"{p}.1.layer_norm.weight"])
                ff_idx, layer["ln2"] = 2, jnp.asarray(sd[f"{p}.2.layer_norm.weight"])
            else:
                layer["attn"] = attn
                ff_idx, layer["ln1"] = 1, jnp.asarray(sd[f"{p}.1.layer_norm.weight"])
            ffp = f"{p}.{ff_idx}.DenseReluDense"
            if config.is_gated:
                layer["ff"] = {"wi_0": w(f"{ffp}.wi_0.weight"),
                               "wi_1": w(f"{ffp}.wi_1.weight"),
                               "wo": w(f"{ffp}.wo.weight")}
            else:
                layer["ff"] = {"wi": w(f"{ffp}.wi.weight"), "wo": w(f"{ffp}.wo.weight")}
            layers.append(layer)
        return {
            "layers": layers,
            "rel_bias": jnp.asarray(
                sd[f"{prefix}.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"]),
            "final_ln": jnp.asarray(sd[f"{prefix}.final_layer_norm.weight"]),
        }

    params: Params = {
        "shared": jnp.asarray(sd["shared.weight"]),
        "encoder": block("encoder", decoder=False),
        "decoder": block("decoder", decoder=True),
    }
    if not config.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(sd["lm_head.weight"].T)
    return params


def load_t5(model_name_or_path: str, compute_dtype=jnp.bfloat16) -> Tuple[Params, T5Config]:
    if not os.path.isdir(model_name_or_path):
        raise FileNotFoundError(
            f"{model_name_or_path} is not a local directory (no network egress).")
    with open(os.path.join(model_name_or_path, "config.json")) as f:
        config = config_from_hf(json.load(f))
    st = os.path.join(model_name_or_path, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        state_dict = load_file(st)
    else:
        import torch

        state_dict = {k: v.to(torch.float32).numpy() for k, v in torch.load(
            os.path.join(model_name_or_path, "pytorch_model.bin"),
            map_location="cpu", weights_only=True).items()}
    params = convert_hf_t5_state_dict(state_dict, config)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, dtype=compute_dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 2 else x, params)
    return params, config


class JaxT5Backend:
    """Encoder-decoder Backend for kirag_tpu.generation.Generator.

    The reference tokenizes encoder-decoder prompts as plain text (right
    padding; `generator/generator.py:272-279`), so Generators using this
    backend should be constructed with ``is_chat=False``.
    """

    is_encoder_decoder = True

    def __init__(self, params: Params, config: T5Config, eos_token_id: int,
                 compute_dtype=jnp.bfloat16, prompt_buckets=(64, 128, 256, 512, 1024)):
        self.params = params
        self.config = config
        self.eos_token_id = eos_token_id
        self.compute_dtype = compute_dtype
        self.prompt_buckets = prompt_buckets

    def greedy(self, input_ids: np.ndarray, attention_mask: np.ndarray,
               max_new_tokens: int, return_logits: bool = True
               ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        t = input_ids.shape[1]
        bucket = next((b for b in self.prompt_buckets if b >= t), self.prompt_buckets[-1])
        if bucket > t:  # encoder input: extend RIGHT padding (mask handles it)
            input_ids = np.pad(input_ids, ((0, 0), (0, bucket - t)))
            attention_mask = np.pad(attention_mask, ((0, 0), (0, bucket - t)))
        elif bucket < t:
            input_ids = input_ids[:, :bucket]
            attention_mask = attention_mask[:, :bucket]
        ids, logits = t5_greedy_decode(
            self.params, jnp.asarray(input_ids.astype(np.int32)),
            jnp.asarray(attention_mask.astype(np.int32)), self.config,
            max_new_tokens, self.compute_dtype, eos_token_id=self.eos_token_id)
        return np.asarray(ids), (np.asarray(logits) if return_logits else None)
