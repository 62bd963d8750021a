"""Pooling + normalization primitives for bi-encoders.

These are the TPU equivalents of the reference's pooling heads
(`retriever/encoders.py:56-118`): masked mean pooling + L2 norm (E5),
CLS pooling + L2 norm (BGE), masked mean pooling without norm (Contriever).
They are plain jnp functions so XLA fuses them into the encoder's final
matmuls; no host round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean_pool(last_hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid tokens. ``last_hidden``: [..., T, H]; mask: [..., T]."""
    mask = attention_mask.astype(last_hidden.dtype)[..., None]
    summed = jnp.sum(last_hidden * mask, axis=-2)
    counts = jnp.sum(mask, axis=-2)
    counts = jnp.where(counts == 0, 1.0, counts)
    return summed / counts


def cls_pool(last_hidden: jnp.ndarray, attention_mask: jnp.ndarray = None) -> jnp.ndarray:
    """First-token (CLS) pooling. ``last_hidden``: [..., T, H]."""
    return last_hidden[..., 0, :]


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)
