"""int8/int4-compressed exact-ish MIPS: the equal-memory competitor to PQ.

The reference exposes product quantization through ``faiss.IndexPQ``
(`retriever/index.py:19-21`). On TPU the equal-memory play is simpler and
faster: symmetric per-row int8 quantization of the corpus (4x smaller than
f32, 2x smaller than bf16 — so 4x more rows per chip and half the HBM
bandwidth per query), dequantized on the fly inside the same chunked MXU scan.
Recall@k vs exact f32 search is typically >0.99 for L2-normalized embeddings.

Round 4 adds PACKED INT4 (8x smaller than f32): two nibbles per byte with
one f32 scale per (row, 128-dim block) — the same block-linear grid as the
LLM loader's NF4-role int4 (`models/llm.py:_quantize_kernel_int4`) but with
16 levels centred at n-7.5 for finer resolution on dense embeddings. It is
what puts the full 21M-row x 1024-dim DPR corpus (`BASELINE.md` north star)
in ONE chip's HBM: 21.5 GB at int8 -> 10.8 GB packed + 0.7 GB scales.
Packing layout: byte[:, j] holds dim j in the low nibble and dim j + D/2 in
the high nibble, so both unpacked planes are contiguous in the original dim
order and kernels can run per-block matmuls without any lane shuffling.
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


INT4_BLOCK = 128  # one scale per (row, 128-dim block) — a TPU lane group


def quantize_rows_int4(embeddings: np.ndarray,
                       block: int = INT4_BLOCK
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Blockwise 4-bit quantization of embedding rows.

    Returns ``(packed uint8 [N, D/2], scales f32 [N, D/block])``. Values map
    to the 16-level grid ``(n - 7.5) * scale`` with ``scale = absmax / 7.5``
    per (row, block): symmetric, step absmax/7.5 (finer than the 15-level
    (n-7)*absmax/7 grid because no level is wasted on an unreachable code).
    Dim j packs into byte j's low nibble, dim j + D/2 into its high nibble.
    """
    emb = np.asarray(embeddings, dtype=np.float32)
    n, d = emb.shape
    assert d % (2 * block) == 0, f"dim {d} must be a multiple of {2 * block}"
    nb = d // block
    blocks = emb.reshape(n, nb, block)
    absmax = np.abs(blocks).max(axis=-1)
    scales = (absmax / 7.5).astype(np.float32)
    safe = np.where(scales == 0, 1.0, scales)
    q = np.clip(np.rint(blocks / safe[:, :, None] + 7.5), 0, 15)
    q = q.astype(np.uint8).reshape(n, d)
    packed = (q[:, :d // 2] | (q[:, d // 2:] << 4)).astype(np.uint8)
    return packed, scales


def dequantize_rows_int4(packed: np.ndarray, scales: np.ndarray,
                         block: int = INT4_BLOCK) -> np.ndarray:
    """Inverse of :func:`quantize_rows_int4` (f32) — the test oracle's view
    of what the device actually searches."""
    packed = np.asarray(packed, dtype=np.uint8)
    n, d2 = packed.shape
    nib = np.concatenate([packed & 15, packed >> 4], axis=1).astype(np.float32)
    nb = 2 * d2 // block
    vals = (nib - 7.5).reshape(n, nb, block) * scales[:, :, None]
    return vals.reshape(n, 2 * d2).astype(np.float32)


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


def _dequant_chunk_int4(chunk: jnp.ndarray, chunk_scales: jnp.ndarray
                        ) -> jnp.ndarray:
    """[chunk, D/2] packed uint8 + [chunk, NB] scales -> bf16 [chunk, D]."""
    ci = chunk.astype(jnp.int32)
    nib = jnp.concatenate([ci & 15, (ci >> 4) & 15], axis=1)
    vals = nib.astype(jnp.float32) - 7.5
    s = jnp.repeat(chunk_scales.astype(jnp.float32), INT4_BLOCK, axis=1)
    return (vals * s).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "valid_rows"))
def topk_mips_int4(queries: jnp.ndarray, corpus_q4: jnp.ndarray,
                   scales: jnp.ndarray, k: int, chunk_size: int = 32768,
                   valid_rows: Optional[int] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked top-k over a packed-int4 corpus with per-block scales (the
    XLA twin of the Pallas int4 path, for CPU and `exact_impl="xla"`)."""
    q = queries.shape[0]
    n, d2 = corpus_q4.shape
    n_valid = n if valid_rows is None else valid_rows
    k_eff = min(k, n)

    chunk_size = min(chunk_size, n)
    num_chunks = -(-n // chunk_size)
    n_pad = num_chunks * chunk_size
    if n_pad != n:
        corpus_q4 = jnp.pad(corpus_q4, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, n_pad - n), (0, 0)))

    chunks = corpus_q4.reshape(num_chunks, chunk_size, d2)
    scale_chunks = scales.reshape(num_chunks, chunk_size, -1)
    qT = queries.astype(jnp.bfloat16)

    init_vals = jnp.full((q, k_eff), NEG_INF, dtype=jnp.float32)
    init_idx = jnp.zeros((q, k_eff), dtype=jnp.int32)

    def step(carry, inp):
        run_vals, run_idx = carry
        chunk_i, chunk, chunk_scales = inp
        c = _dequant_chunk_int4(chunk, chunk_scales)
        scores = jax.lax.dot_general(
            qT, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row_ids = chunk_i * chunk_size + jax.lax.broadcasted_iota(
            jnp.int32, (q, chunk_size), 1)
        scores = jnp.where(row_ids < n_valid, scores, NEG_INF)
        new_vals, new_idx = _chunk_topk(scores, row_ids, k_eff)
        return _merge_topk(run_vals, run_idx, new_vals, new_idx, k_eff), None

    (vals, idx), _ = jax.lax.scan(
        step, (init_vals, init_idx),
        (jnp.arange(num_chunks, dtype=jnp.int32), chunks, scale_chunks))
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return vals, idx


def sharded_topk_mips_int4(queries: jnp.ndarray, corpus_q4: jnp.ndarray,
                           scales: jnp.ndarray, k: int, mesh: Mesh,
                           axis: str = "data", chunk_size: int = 262144,
                           valid_rows: Optional[int] = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed-int4 top-k over a corpus row-sharded across ``mesh[axis]``
    (same candidate merge as the int8/f32 sharded paths)."""
    n_total = corpus_q4.shape[0]
    n_valid = n_total if valid_rows is None else valid_rows
    num_shards = mesh.shape[axis]
    assert n_total % num_shards == 0, "corpus rows must divide the mesh axis"
    shard_rows = n_total // num_shards

    def local_search(q_local, c_local, s_local):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * shard_rows
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        n, d2 = c_local.shape
        k_eff = min(k, n)
        local_chunk = min(chunk_size, n)
        num_chunks = -(-n // local_chunk)
        n_pad = num_chunks * local_chunk
        c_pad = jnp.pad(c_local, ((0, n_pad - n), (0, 0)))
        s_pad = jnp.pad(s_local, ((0, n_pad - n), (0, 0)))
        chunks = c_pad.reshape(num_chunks, local_chunk, d2)
        s_chunks = s_pad.reshape(num_chunks, local_chunk, -1)
        qT = q_local.astype(jnp.bfloat16)
        init = (_pvary(jnp.full((q_local.shape[0], k_eff), NEG_INF,
                                dtype=jnp.float32), axis),
                _pvary(jnp.zeros((q_local.shape[0], k_eff),
                                 dtype=jnp.int32), axis))

        def step(carry, inp):
            run_vals, run_idx = carry
            chunk_i, chunk, chunk_scales = inp
            c = _dequant_chunk_int4(chunk, chunk_scales)
            scores = jax.lax.dot_general(
                qT, c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            row_ids = chunk_i * local_chunk + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1)
            scores = jnp.where(row_ids < local_valid, scores, NEG_INF)
            new_vals, new_idx = _chunk_topk(scores, row_ids, k_eff)
            return _merge_topk(run_vals, run_idx, new_vals, new_idx,
                               k_eff), None

        (vals, idx), _ = jax.lax.scan(
            step, init, (jnp.arange(num_chunks, dtype=jnp.int32),
                         chunks, s_chunks))
        idx = idx + offset
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, min(k, n_total))
        return top_vals, jnp.take_along_axis(all_idx, pos, axis=-1)

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(axis), PartitionSpec(axis)),
        out_specs=(PartitionSpec(), PartitionSpec()),
        check_vma=False,
    )
    vals, idx = fn(queries, corpus_q4, scales)
    k_got = vals.shape[1]
    if k_got < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_got)),
                       constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_got)))
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
