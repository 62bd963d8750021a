"""Bi-encoder wrappers: one BERT stack, pluggable pooling heads.

Mirrors the encoder surface of the reference (`retriever/encoders.py:61-118`):

==========  =======================  ==========================
name        pooling                  reference
==========  =======================  ==========================
e5          masked mean + L2 norm    `E5Encoder`      :61-77
bge         CLS + L2 norm            `BGEEncoder`     :100-118
contriever  masked mean (no norm)    `ContrieverEncoder` :80-97
==========  =======================  ==========================

The whole embed step (transformer + pooling + norm) is ONE jitted program, so
pooling fuses into the final layer's matmuls and embeddings never leave the
device unless explicitly pulled.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kirag_tpu.models.bert import (
    BertConfig,
    Params,
    bert_encode,
    config_from_hf,
    convert_hf_state_dict,
    init_bert_params,
)
from kirag_tpu.ops.pooling import cls_pool, l2_normalize, masked_mean_pool

PoolingFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

ENCODER_POOLING: Dict[str, Dict] = {
    "e5": {"pool": masked_mean_pool, "normalize": True},
    "bge": {"pool": cls_pool, "normalize": True},
    "contriever": {"pool": masked_mean_pool, "normalize": False},
}

# retriever-name aliases used by the reference CLI (`retriever/retrievers.py:20`)
RETRIEVER_NAME_TO_ENCODER = {
    "E5Retriever": "e5",
    "BGERetriever": "bge",
    "ContrieverRetriever": "contriever",
}


@functools.partial(jax.jit, static_argnames=("config", "pooling", "normalize",
                                             "compute_dtype", "attention_impl"))
def _embed(params: Params, input_ids, attention_mask, *, config: BertConfig,
           pooling: str, normalize: bool, compute_dtype,
           attention_impl: str = "auto") -> jnp.ndarray:
    hidden = bert_encode(params, input_ids, attention_mask, config,
                         compute_dtype=compute_dtype,
                         attention_impl=attention_impl)
    pool = ENCODER_POOLING[pooling]["pool"]
    pooled = pool(hidden.astype(jnp.float32), attention_mask)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


class Encoder:
    """A jit-compiled bi-encoder: (input_ids, attention_mask) -> embeddings.

    The TPU replacement for `BaseRetriever.query/doc` (`retriever/retrievers.py:
    112-122`): embeddings are produced fully on device, in one program.
    """

    def __init__(self, params: Params, config: BertConfig, encoder_type: str = "e5",
                 compute_dtype=jnp.float32, normalize: Optional[bool] = None,
                 attention_impl: str = "auto"):
        if encoder_type not in ENCODER_POOLING:
            raise KeyError(
                f"{encoder_type} is not implemented! Available encoders: {list(ENCODER_POOLING)}")
        self.params = params
        self.config = config
        self.encoder_type = encoder_type
        self.compute_dtype = compute_dtype
        self.normalize = ENCODER_POOLING[encoder_type]["normalize"] if normalize is None else normalize
        self.attention_impl = attention_impl

    @property
    def embedding_size(self) -> int:
        return self.config.hidden_size

    def __call__(self, input_ids, attention_mask) -> jnp.ndarray:
        return _embed(
            self.params,
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            config=self.config,
            pooling=self.encoder_type,
            normalize=self.normalize,
            compute_dtype=self.compute_dtype,
            attention_impl=self.attention_impl,
        )

    def shard_params(self, mesh, model_axis: str = "model"):
        """Move parameters onto the mesh with tensor-parallel shardings."""
        from jax.sharding import NamedSharding

        from kirag_tpu.models.bert import param_shardings

        specs = param_shardings(self.config, model_axis=model_axis)
        self.params = jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), self.params, specs,
            is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape"),
        )
        return self

    # -- persistence --------------------------------------------------------

    def save(self, save_dir: str) -> None:
        """Save config + params as an npz (HF-independent, mesh-agnostic)."""
        os.makedirs(save_dir, exist_ok=True)
        flat = {}
        leaves_with_path = jax.tree_util.tree_flatten_with_path(self.params)[0]
        for path, leaf in leaves_with_path:
            key = "/".join(_path_str(p) for p in path)
            flat[key] = np.asarray(leaf)
        np.savez(os.path.join(save_dir, "params.npz"), **flat)
        meta = {
            "encoder_type": self.encoder_type,
            "config": self.config.__dict__,
        }
        with open(os.path.join(save_dir, "encoder_config.json"), "w") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, save_dir: str, compute_dtype=jnp.float32) -> "Encoder":
        with open(os.path.join(save_dir, "encoder_config.json")) as f:
            meta = json.load(f)
        config = BertConfig(**meta["config"])
        template = jax.eval_shape(lambda: init_bert_params(jax.random.key(0), config))
        flat = np.load(os.path.join(save_dir, "params.npz"))
        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for path, _ in leaves_with_path:
            key = "/".join(_path_str(p) for p in path)
            leaves.append(jnp.asarray(flat[key]))
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        return cls(params, config, meta["encoder_type"], compute_dtype=compute_dtype)


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def load_encoder(model_name_or_path: str, encoder_type: str = "e5",
                 compute_dtype=jnp.float32) -> Encoder:
    """Load an encoder from an HF-format local checkpoint directory or our npz.

    Resolution order:
      1. our own npz format (``encoder_config.json`` present),
      2. HF directory: ``config.json`` + ``model.safetensors`` or
         ``pytorch_model.bin`` (weights converted tensor-by-tensor).
    """
    if not os.path.isdir(model_name_or_path):
        # resolve registry aliases / HF repo names against $KIRAG_MODEL_DIR
        from kirag_tpu.models.registry import resolve_model_path

        model_name_or_path = resolve_model_path(model_name_or_path)

    if os.path.exists(os.path.join(model_name_or_path, "encoder_config.json")):
        return Encoder.load(model_name_or_path, compute_dtype=compute_dtype)

    with open(os.path.join(model_name_or_path, "config.json")) as f:
        hf_config = json.load(f)
    config = config_from_hf(hf_config)

    st_path = os.path.join(model_name_or_path, "model.safetensors")
    bin_path = os.path.join(model_name_or_path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        state_dict = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        state_dict = {
            k: v.to(torch.float32).numpy() for k, v in torch.load(bin_path, map_location="cpu", weights_only=True).items()
        }
    else:
        raise FileNotFoundError(f"no model.safetensors or pytorch_model.bin under {model_name_or_path}")
    params = convert_hf_state_dict(state_dict, config)
    return Encoder(params, config, encoder_type, compute_dtype=compute_dtype)
