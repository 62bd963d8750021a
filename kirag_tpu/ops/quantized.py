"""int8-compressed exact-ish MIPS: the equal-memory competitor to FAISS PQ.

The reference exposes product quantization through ``faiss.IndexPQ``
(`retriever/index.py:19-21`). On TPU the equal-memory play is simpler and
faster: symmetric per-row int8 quantization of the corpus (4x smaller than
f32, 2x smaller than bf16 — so 4x more rows per chip and half the HBM
bandwidth per query), dequantized on the fly inside the same chunked MXU scan.
Recall@k vs exact f32 search is typically >0.99 for L2-normalized embeddings.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from kirag_tpu.ops.mips import NEG_INF, _chunk_topk, _merge_topk, _pvary, shard_map


def quantize_rows_int8(embeddings: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization: values in [-127, 127] * scale."""
    emb = np.asarray(embeddings, dtype=np.float32)
    absmax = np.abs(emb).max(axis=1)
    scales = (absmax / 127.0).astype(np.float32)
    safe = np.where(scales == 0, 1.0, scales)
    q = np.clip(np.rint(emb / safe[:, None]), -127, 127).astype(np.int8)
    return q, scales


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "valid_rows"))
def topk_mips_int8(queries: jnp.ndarray, corpus_i8: jnp.ndarray, scales: jnp.ndarray,
                   k: int, chunk_size: int = 32768, valid_rows: Optional[int] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked top-k over an int8 corpus with per-row scales.

    The int8 chunk is read from HBM (half the bytes of bf16), cast to bf16 in
    VMEM, matmul'd on the MXU in one fused step, and the f32 scores are scaled
    by the row scales before the two-stage top-k.
    """
    q = queries.shape[0]
    n, d = corpus_i8.shape
    n_valid = n if valid_rows is None else valid_rows
    k_eff = min(k, n)

    chunk_size = min(chunk_size, n)
    num_chunks = -(-n // chunk_size)
    n_pad = num_chunks * chunk_size
    if n_pad != n:
        corpus_i8 = jnp.pad(corpus_i8, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad - n))

    chunks = corpus_i8.reshape(num_chunks, chunk_size, d)
    scale_chunks = scales.reshape(num_chunks, chunk_size)
    qT = queries.astype(jnp.bfloat16)

    init_vals = jnp.full((q, k_eff), NEG_INF, dtype=jnp.float32)
    init_idx = jnp.zeros((q, k_eff), dtype=jnp.int32)

    def step(carry, inp):
        run_vals, run_idx = carry
        chunk_i, chunk, chunk_scales = inp
        scores = jax.lax.dot_general(
            qT, chunk.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * chunk_scales[None, :]
        row_ids = chunk_i * chunk_size + jax.lax.broadcasted_iota(
            jnp.int32, (q, chunk_size), 1)
        scores = jnp.where(row_ids < n_valid, scores, NEG_INF)
        new_vals, new_idx = _chunk_topk(scores, row_ids, k_eff)
        return _merge_topk(run_vals, run_idx, new_vals, new_idx, k_eff), None

    (vals, idx), _ = jax.lax.scan(
        step, (init_vals, init_idx),
        (jnp.arange(num_chunks, dtype=jnp.int32), chunks, scale_chunks),
    )
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return vals, idx


def _local_topk_int8(queries, corpus_i8, scales, k, chunk_size, valid_rows_dyn, axis=None):
    """Chunked int8 top-k with a traced valid-row count (shard-local body)."""
    q = queries.shape[0]
    n, d = corpus_i8.shape
    k_eff = min(k, n)
    chunk_size = min(chunk_size, n)
    num_chunks = -(-n // chunk_size)
    n_pad = num_chunks * chunk_size
    if n_pad != n:
        corpus_i8 = jnp.pad(corpus_i8, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad - n))
    chunks = corpus_i8.reshape(num_chunks, chunk_size, d)
    scale_chunks = scales.reshape(num_chunks, chunk_size)
    qT = queries.astype(jnp.bfloat16)

    init_vals = _pvary(jnp.full((q, k_eff), NEG_INF, dtype=jnp.float32), axis)
    init_idx = _pvary(jnp.zeros((q, k_eff), dtype=jnp.int32), axis)

    def step(carry, inp):
        run_vals, run_idx = carry
        chunk_i, chunk, chunk_scales = inp
        scores = jax.lax.dot_general(
            qT, chunk.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * chunk_scales[None, :]
        row_ids = chunk_i * chunk_size + jax.lax.broadcasted_iota(
            jnp.int32, (q, chunk_size), 1)
        scores = jnp.where(row_ids < valid_rows_dyn, scores, NEG_INF)
        new_vals, new_idx = _chunk_topk(scores, row_ids, k_eff)
        return _merge_topk(run_vals, run_idx, new_vals, new_idx, k_eff), None

    (vals, idx), _ = jax.lax.scan(
        step, (init_vals, init_idx),
        (jnp.arange(num_chunks, dtype=jnp.int32), chunks, scale_chunks))
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return vals, idx


def sharded_topk_mips_int8(queries: jnp.ndarray, corpus_i8: jnp.ndarray,
                           scales: jnp.ndarray, k: int, mesh: Mesh,
                           axis: str = "data", chunk_size: int = 262144,
                           valid_rows: Optional[int] = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 top-k over a corpus row-sharded across ``mesh[axis]`` (same merge
    as :func:`kirag_tpu.ops.mips.sharded_topk_mips`)."""
    n_total = corpus_i8.shape[0]
    n_valid = n_total if valid_rows is None else valid_rows
    num_shards = mesh.shape[axis]
    assert n_total % num_shards == 0, "corpus rows must divide the mesh axis"
    shard_rows = n_total // num_shards

    def local_search(q_local, c_local, s_local):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * shard_rows
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        vals, idx = _local_topk_int8(q_local, c_local, s_local, k, chunk_size,
                                     local_valid, axis=axis)
        idx = idx + offset
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        return top_vals, jnp.take_along_axis(all_idx, pos, axis=-1)

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(axis), PartitionSpec(axis)),
        out_specs=(PartitionSpec(), PartitionSpec()),
        check_vma=False,
    )
    return fn(queries, corpus_i8, scales)
