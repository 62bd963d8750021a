"""Pallas TPU kernel: fused MIPS scoring + per-group max/argmax.

The hot inner loop of retrieval is ``scores = Q @ C_chunk.T`` followed by a
reduction. The XLA path (:mod:`kirag_tpu.ops.mips`) materializes the [Q, chunk]
score block to HBM between those steps; this kernel fuses them — the MXU
matmul's output stays in VMEM and only the per-128-row-group (max, argmax)
leaves the chip, cutting HBM traffic to ``corpus_bytes + Q*N/128*8``.

On top of it, :func:`approx_topk_mips` implements group-sampled top-k (the
"one winner per group" reduction of the TPU-KNN recipe): top-k over the group
maxima, each group contributing its argmax row. Recall@k vs exact search is
1 - O(k^2 * 128 / (2N)) for randomly ordered corpora (~0.994 at k=100, N=1M);
the exact path remains :func:`kirag_tpu.ops.mips.topk_mips`.

The kernel runs in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

try:  # jax>=0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

LANES = 128


def _group_max_kernel(q_ref, c_ref, *rest, groups_per_chunk: int,
                      quant: str = "none", winners: int = 1):
    """One grid step: score a [CHUNK, D] corpus block against all queries and
    emit, per group, the top-``winners`` (value, lane) pairs by iterated
    masked-max peeling (ties -> lowest lane, like the exact kernels).

    Refs:
      q_ref:    [Q, D]               (VMEM, same block every step)
      c_ref:    [CHUNK, D]           (VMEM, pipelined per chunk; bf16/int8,
                                      or packed-nibble uint8 [CHUNK, D/2])
      s_ref:    [1, G, LANES] f32    (int8: per-row dequant scales) or
                [1, NB, CHUNK] f32   (int4: per-block scales)
      gmax_ref: [1, W, groups, Q] f32   (output block for this chunk)
      gidx_ref: [1, W, groups, Q] int32 (peeled lane indices)

    Scoring (incl. in-VMEM int8/int4 dequantization) is shared with the
    exact kernels — :func:`kirag_tpu.ops.pallas_exact._chunk_scores` — so
    approx and exact see bit-identical quantized scores.
    """
    from kirag_tpu.ops.pallas_exact import _chunk_scores

    if len(rest) == 3:
        s_ref, gmax_ref, gidx_ref = rest
    else:
        s_ref = None
        gmax_ref, gidx_ref = rest
    scores = _chunk_scores(q_ref[:], c_ref[:],
                           s_ref[0] if s_ref is not None else None, quant)
    n_q = scores.shape[0]
    s3 = scores.reshape(n_q, groups_per_chunk, LANES)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    for t in range(winners):
        m = jnp.max(s3, axis=-1)  # [Q, G]
        idx = jnp.min(jnp.where(s3 == m[..., None], lane_ids, LANES),
                      axis=-1)
        gmax_ref[0, t] = m.T
        gidx_ref[0, t] = idx.astype(jnp.int32).T
        if t + 1 < winners:
            s3 = jnp.where(lane_ids == idx[..., None], -jnp.inf, s3)


def _resolve_interpret(interpret: Optional[bool]) -> bool:
    """Pallas TPU kernels only compile on TPU; fall back to the interpreter
    on CPU (tests / virtual meshes)."""
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu",)


@functools.partial(jax.jit, static_argnames=("chunk_size", "interpret",
                                              "winners"))
def grouped_max_scores(queries: jnp.ndarray, corpus: jnp.ndarray,
                       chunk_size: int = 2048, interpret: bool = False,
                       scales: Optional[jnp.ndarray] = None,
                       winners: int = 1
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused scores + per-128-row-group top-``winners`` over the corpus.

    Returns (gmax [Q, W, N/128] f32, gidx [Q, W, N/128] int32
    lane-in-group), W = ``winners``; the W axis is descending per group.
    ``corpus`` rows must be divisible by ``chunk_size`` and ``chunk_size`` by
    128 (pad upstream). ``scales`` enables quantized corpora (same contract
    as the exact kernels): 1-D [N] f32 per-row factors for int8 rows, or
    2-D [N, D/128] per-block factors for packed-nibble int4 rows — both
    dequantized in VMEM before the group reduction.
    """
    from kirag_tpu.ops.pallas_exact import _quant_kind, _scale_operand

    n, d = corpus.shape
    n_q = queries.shape[0]
    d_q = queries.shape[1]  # = 2*d for packed int4 corpora
    assert n % chunk_size == 0 and chunk_size % LANES == 0
    assert 1 <= winners <= LANES
    num_chunks = n // chunk_size
    groups_per_chunk = chunk_size // LANES
    quant = _quant_kind(corpus, scales)

    kernel = functools.partial(_group_max_kernel,
                               groups_per_chunk=groups_per_chunk, quant=quant,
                               winners=winners)
    kwargs = {}
    if pltpu is not None and not interpret:
        # grid steps write disjoint output blocks -> dependency-free grid dim
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
            dimension_semantics=("parallel",))
    in_specs = [
        pl.BlockSpec((n_q, d_q), lambda i: (0, 0)),
        pl.BlockSpec((chunk_size, d), lambda i: (i, 0)),
    ]
    operands = [queries, corpus]
    if scales is not None:
        s_op, s_spec = _scale_operand(scales, quant, num_chunks,
                                      groups_per_chunk, chunk_size)
        in_specs.append(s_spec)
        operands.append(s_op)
    gmax, gidx = pl.pallas_call(
        kernel,
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, winners, groups_per_chunk, n_q),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, winners, groups_per_chunk, n_q),
                         lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_chunks, winners, groups_per_chunk, n_q),
                                 jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, winners, groups_per_chunk, n_q),
                                 jnp.int32),
        ],
        interpret=interpret,
        **kwargs,
    )(*operands)
    # [num_chunks, W, groups, Q] -> [Q, W, total_groups]
    total_groups = num_chunks * groups_per_chunk
    gmax = gmax.transpose(3, 1, 0, 2).reshape(n_q, winners, total_groups)
    gidx = gidx.transpose(3, 1, 0, 2).reshape(n_q, winners, total_groups)
    return gmax, gidx


def approx_topk_mips(queries: jnp.ndarray, corpus: jnp.ndarray, k: int,
                     chunk_size: int = 2048, valid_rows: Optional[int] = None,
                     interpret: Optional[bool] = None,
                     scales: Optional[jnp.ndarray] = None,
                     row_offset=0,
                     winners_per_group: int = 1
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Group-sampled top-k: ``winners_per_group`` candidates per 128-row
    group (the recall/speed dial, the FAISS-nprobe role).

    Exact for k=1; at W=1, recall@k ~ 1 - k(k-1)*64/N for random row
    order. The dominant miss mode is >W true top-k rows landing in one
    group, so W=2 squares the miss term away (and W=128 IS exact search).
    Row order correlated with similarity (an article's passages in
    consecutive rows) degrades recall — at most W rows per group can
    surface; shuffle rows upstream (``TPUIndexer(shuffle_rows=True)``) or
    use exact mode for such corpora. Pads the corpus to the chunk grid;
    padded rows are masked via ``valid_rows`` (a traced scalar is
    accepted, for shard-local calls). ``scales`` enables int8 ([N] f32)
    and packed-int4 ([N, D/128] f32) corpora; ``row_offset`` shifts
    returned row ids (sharded search).
    """
    interpret = _resolve_interpret(interpret)
    n, d = corpus.shape
    n_valid = n if valid_rows is None else valid_rows
    pad_to = -(-n // chunk_size) * chunk_size
    if pad_to != n:
        corpus = jnp.pad(corpus, ((0, pad_to - n), (0, 0)))
        if scales is not None:
            scales = jnp.pad(scales, ((0, pad_to - n),) +
                             ((0, 0),) * (scales.ndim - 1))
    gmax, gidx = grouped_max_scores(queries, corpus, chunk_size=chunk_size,
                                    interpret=interpret, scales=scales,
                                    winners=winners_per_group)
    n_q, w, total_groups = gmax.shape
    group_base = jnp.arange(total_groups, dtype=jnp.int32) * LANES
    rows = group_base[None, None, :] + gidx  # [Q, W, G] local candidate rows
    gmax = jnp.where(rows < n_valid, gmax, -jnp.inf)
    # group-major flatten: equal values tie toward the lower group id, and
    # within a group toward the better-peeled winner
    cand = gmax.transpose(0, 2, 1).reshape(n_q, total_groups * w)
    crow = rows.transpose(0, 2, 1).reshape(n_q, total_groups * w)
    k_eff = min(k, total_groups * w)
    vals, pos = jax.lax.top_k(cand, k_eff)
    idx = jnp.take_along_axis(crow, pos, axis=-1) + row_offset
    idx = jnp.where(jnp.isfinite(vals), idx, 0)  # masked-out slots carry no row
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return vals, idx


def sharded_approx_topk_mips(queries: jnp.ndarray, corpus_sharded: jnp.ndarray,
                             k: int, mesh: Mesh, axis: str = "data",
                             chunk_size: int = 2048,
                             valid_rows: Optional[int] = None,
                             interpret: Optional[bool] = None,
                             scales: Optional[jnp.ndarray] = None,
                             winners_per_group: int = 1
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Group-sampled top-k over a corpus row-sharded across ``mesh[axis]``.

    Each shard runs the fused Pallas kernel on its local rows (with globally
    offset row ids), then per-shard [Q, k] candidates are all-gathered over ICI
    and reduced with one final top-k — the same merge as the exact path
    (:func:`kirag_tpu.ops.mips.sharded_topk_mips`).
    """
    interpret = _resolve_interpret(interpret)
    n_total = corpus_sharded.shape[0]
    n_valid = n_total if valid_rows is None else valid_rows
    num_shards = mesh.shape[axis]
    assert n_total % num_shards == 0, "corpus rows must divide the mesh axis"
    shard_rows = n_total // num_shards

    def local_search(q_local, corpus_local, *scale_args):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * shard_rows
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        local_scales = scale_args[0] if scale_args else None
        vals, idx = approx_topk_mips(
            q_local, corpus_local, k, chunk_size=min(chunk_size, shard_rows),
            valid_rows=local_valid, interpret=interpret, scales=local_scales,
            row_offset=offset, winners_per_group=winners_per_group)
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        return top_vals, jnp.take_along_axis(all_idx, pos, axis=-1)

    in_specs = [PartitionSpec(), PartitionSpec(axis)]
    operands = [queries, corpus_sharded]
    if scales is not None:
        in_specs.append(PartitionSpec(axis))
        operands.append(scales)
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(PartitionSpec(), PartitionSpec()),
        # outputs ARE replicated (all_gather + identical top_k on each shard)
        check_vma=False,
    )
    return fn(*operands)
