"""Model alias registry and loader.

Mirrors the reference's ``MODEL_MAP`` of LLM aliases
(`utils/pipeline_utils.py:30-53`) and `load_llm_tokenizer_and_model` (:26-77).
This environment has no network egress, so aliases resolve to LOCAL mirror
directories: ``$KIRAG_MODEL_DIR/<hf-repo-basename>`` (or pass a path directly).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

MODEL_MAP = {
    # llama
    "llama2_instruct": "meta-llama/Llama-2-7b-chat-hf",
    "llama3": "meta-llama/Meta-Llama-3-8B-Instruct",
    "llama3_8b": "meta-llama/Meta-Llama-3-8B",
    "llama3_70b_instruct": "meta-llama/Meta-Llama-3-70B-Instruct",
    "llama3.1_8b_instruct": "meta-llama/Llama-3.1-8B-Instruct",
    "llama3.1_70b_instruct": "meta-llama/Llama-3.1-70B-Instruct",
    # mistral
    "mistral_7b": "mistralai/Mistral-7B-v0.1",
    "mistral_7b_instruct": "mistralai/Mistral-7B-Instruct-v0.2",
    # qwen
    "qwen2_7b_instruct": "Qwen/Qwen2-7B-Instruct",
    "qwen2.5_7b_instruct": "Qwen/Qwen2.5-7B-Instruct",
    "qwen2.5_14b_instruct": "Qwen/Qwen2.5-14B-Instruct",
    "qwen2.5_32b_instruct": "Qwen/Qwen2.5-32B-Instruct",
    # encoders
    "e5": "intfloat/e5-large-v2",
    "bge": "BAAI/bge-large-en-v1.5",
    "contriever": "facebook/contriever",
    "bge_reranker": "BAAI/bge-reranker-large",
}


def resolve_model_path(name_or_path: str, model_dir: Optional[str] = None) -> str:
    """Resolve an alias or HF repo name to a local checkpoint directory.

    Order: existing local path as-is -> $KIRAG_MODEL_DIR/<basename of the
    mapped repo> -> $KIRAG_MODEL_DIR/<basename of the given name>.
    """
    if os.path.isdir(name_or_path):
        return name_or_path
    model_dir = model_dir or os.environ.get("KIRAG_MODEL_DIR", "")
    repo = MODEL_MAP.get(name_or_path, name_or_path)
    candidate = os.path.join(model_dir, os.path.basename(repo))
    if model_dir and os.path.isdir(candidate):
        return candidate
    raise FileNotFoundError(
        f"cannot resolve model '{name_or_path}': not a local directory and "
        f"'{candidate}' does not exist. This environment has no network egress; "
        "mirror checkpoints under $KIRAG_MODEL_DIR or pass a local path.")


def load_llm(name_or_path: str, max_length: int = 4096, max_new_tokens: int = 128,
             batch_size: int = 4, compute_dtype=None, model_dir: Optional[str] = None,
             int8_weights: bool = False,
             quant_bits: Optional[int] = None) -> Tuple[object, object]:
    """Load (tokenizer, Generator) for a Llama-architecture chat model —
    the counterpart of `load_llm_tokenizer_and_model`. ``quant_bits=8``
    (== ``int8_weights``) or ``quant_bits=4`` enable weight-only
    quantization (the 4-bit point matches the reference's NF4 loading)."""
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from kirag_tpu.generation.interface import Generator
    from kirag_tpu.models.llm import JaxLlamaBackend, load_llama

    path = resolve_model_path(name_or_path, model_dir)
    tokenizer = AutoTokenizer.from_pretrained(path)
    if tokenizer.pad_token is None or tokenizer.pad_token_id is None:
        tokenizer.pad_token = tokenizer.eos_token
    params, config = load_llama(path, compute_dtype=compute_dtype or jnp.bfloat16,
                                int8_weights=int8_weights, quant_bits=quant_bits)
    backend = JaxLlamaBackend(params, config, eos_token_id=tokenizer.eos_token_id)
    generator = Generator(
        tokenizer, backend, model_name=MODEL_MAP.get(name_or_path, name_or_path),
        max_length=max_length, max_new_tokens=max_new_tokens, batch_size=batch_size)
    return tokenizer, generator
