"""Exact maximum-inner-product search (MIPS) with streaming top-k on TPU.

This is the device-side replacement for the reference's FAISS ``IndexFlatIP``
search (`retriever/index.py:36-53`): instead of a GPU->CPU round-trip into a
C++ flat index, the corpus embeddings live in device HBM (row-sharded across
the mesh ``data`` axis) and each query batch does a chunked matmul on the MXU
with a running top-k merge, never materializing the full [Q, N] score matrix.

Two layers:
- :func:`topk_mips`          — single-shard chunked scan (jit-compiled).
- :func:`sharded_topk_mips`  — shard_map over the mesh: per-shard top-k with
  global row indices, merged via all_gather + final top_k (the TPU analogue of
  a multi-GPU FAISS shard merge, riding ICI instead of PCIe).

A fused Pallas kernel (matmul + in-VMEM top-k) lives in
``kirag_tpu.ops.pallas_mips`` and is used when enabled; this module is the
always-correct XLA baseline and the oracle for its tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

try:  # jax>=0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

# plain float: evaluating a jnp scalar at import time would initialize the
# jax backend before the caller can configure platforms
NEG_INF = float("-inf")
# finite mask value: the one-pass path routes masked scores through an MXU
# matmul where 0 * -inf would poison candidates with NaN. Must be
# bf16-REPRESENTABLE: the TPU MXU decomposes f32 operands into bf16 terms,
# and f32max (3.4028e38) rounds to bf16 +-inf — which NaN-poisoned the 1M-row
# padded path on real hardware (benchmarks/probe_r2b: exact_onepass_1m).
FIN_MIN = -1e30
LANES = 128


def _chunk_topk(scores: jnp.ndarray, row_ids: jnp.ndarray, k: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k of a [Q, C] score block.

    Two-stage selection (measured ~2.2x faster than a full `lax.top_k` over
    the chunk on TPU v5e at C=128k, k=100): (1) max over 128-lane groups and
    top-k of the group maxima, (2) gather those k groups and take the exact
    top-k of the k*128 candidates. Exactness: any row in the true top-k lives
    in a group whose max is >= the kth score, and at most k distinct groups
    can contain top-k rows — if a group were displaced from the group-top-k,
    the k displacing groups would each contribute a strictly larger score,
    contradicting membership. Ties preserve top-k VALUES; index tie-breaking
    matches a stable scan (lower index wins) like FAISS.
    """
    q, c = scores.shape
    lanes = 128
    groups = c // lanes
    if c % lanes != 0 or groups < 2 or k >= groups:
        # small/ragged chunk: the grouped pass cannot win — full sort
        vals, pos = jax.lax.top_k(scores, k)
        return vals, jnp.take_along_axis(row_ids, pos, axis=-1)
    s3 = scores.reshape(q, groups, lanes)
    gmax = s3.max(-1)
    _, gidx = jax.lax.top_k(gmax, k)
    # ascending group order => candidates laid out in global row order, so the
    # final stable top_k breaks score ties toward the LOWER row id even when
    # the tied rows live in different groups (FAISS flat-scan parity)
    gidx = jnp.sort(gidx, axis=-1)
    cand = jnp.take_along_axis(s3, gidx[:, :, None], axis=1).reshape(q, k * lanes)
    cand_rows = jnp.take_along_axis(
        row_ids.reshape(q, groups, lanes), gidx[:, :, None], axis=1).reshape(q, k * lanes)
    # NOTE: a third grouped stage over the k*128 candidates (8-lane subgroups)
    # was measured SLOWER on v5e (48ms vs 33ms at chunk 512k): sub-128-lane
    # gathers fight the vector layout. Two stages is the sweet spot.
    vals, pos = jax.lax.top_k(cand, k)
    return vals, jnp.take_along_axis(cand_rows, pos, axis=-1)


def _merge_topk(run_vals: jnp.ndarray, run_idx: jnp.ndarray,
                new_vals: jnp.ndarray, new_idx: jnp.ndarray, k: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two (values, indices) candidate sets into the top-k.

    Running candidates are concatenated first so that `lax.top_k`'s stable
    ordering prefers earlier (lower-index) rows on score ties, matching the
    tie-breaking of a sequential flat scan.
    """
    vals = jnp.concatenate([run_vals, new_vals], axis=-1)
    idx = jnp.concatenate([run_idx, new_idx], axis=-1)
    top_vals, pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=-1)
    return top_vals, top_idx


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "valid_rows"))
def topk_mips(queries: jnp.ndarray, corpus: jnp.ndarray, k: int,
              chunk_size: int = 262144, valid_rows: Optional[int] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k inner-product search of ``queries`` against ``corpus``.

    Args:
      queries: [Q, D] float array.
      corpus:  [N, D] float array (rows beyond ``valid_rows`` are padding).
      k: number of neighbours.
      chunk_size: corpus rows scanned per step (bounds live memory to
        Q*chunk_size scores).
      valid_rows: number of real corpus rows; defaults to N.

    Returns:
      (values [Q, k] float32, indices [Q, k] int32) sorted by descending score.
    """
    q = queries.shape[0]
    n, d = corpus.shape
    n_valid = n if valid_rows is None else valid_rows
    k_eff = min(k, n)

    chunk_size = min(chunk_size, n)
    num_chunks = -(-n // chunk_size)
    n_pad = num_chunks * chunk_size
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))

    corpus_chunks = corpus.reshape(num_chunks, chunk_size, d)
    qT = queries.astype(corpus.dtype)

    init_vals = jnp.full((q, k_eff), NEG_INF, dtype=jnp.float32)
    init_idx = jnp.zeros((q, k_eff), dtype=jnp.int32)

    def step(carry, inp):
        run_vals, run_idx = carry
        chunk_i, chunk = inp
        # [Q, chunk] scores on the MXU, f32 accumulation
        scores = jax.lax.dot_general(
            qT, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row_ids = chunk_i * chunk_size + jax.lax.broadcasted_iota(jnp.int32, (q, chunk_size), 1)
        scores = jnp.where(row_ids < n_valid, scores, NEG_INF)
        new_vals, new_idx = _chunk_topk(scores, row_ids, k_eff)
        return _merge_topk(run_vals, run_idx, new_vals, new_idx, k_eff), None

    (vals, idx), _ = jax.lax.scan(
        step, (init_vals, init_idx),
        (jnp.arange(num_chunks, dtype=jnp.int32), corpus_chunks),
    )
    if k_eff < k:  # pad to requested k for shape stability
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return vals, idx


def _onepass_body(queries, corpus, k: int, n_valid):
    """Scan-free exact two-stage top-k (shared by the jitted single-chip entry
    and the shard_map local body; ``n_valid`` may be a traced scalar).

    Round-2 redesign from measured evidence (benchmarks/probe_r2): the v1
    scan's per-chunk `take_along_axis` group gather costs 6.4ms/chunk on v5e
    (~26ms of the 33.6ms total) and carry-reductions inside `lax.scan`
    pathologically wedge this toolchain's compiler. Here the whole corpus is
    scored in ONE matmul and the candidate gather becomes a one-hot batched
    matmul on the MXU; the only sorts are [Q, N/128] and [Q, k*128].

    Live memory is Q * N * 4 bytes of scores — callers bound Q per call
    (1024 queries x 1M rows = 4.3GB; `search_knn` batches queries anyway).
    """
    q = queries.shape[0]
    n, d = corpus.shape
    k_cap = min(k, n)
    n_pad = -(-n // LANES) * LANES
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
    groups = n_pad // LANES

    scores = jax.lax.dot_general(
        queries.astype(corpus.dtype), corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, n_pad] f32
    col = jax.lax.broadcasted_iota(jnp.int32, (q, n_pad), 1)
    scores = jnp.where(col < n_valid, scores, FIN_MIN)

    if groups < 2 or k_cap >= groups:  # tiny corpus: direct sort
        vals, idx = jax.lax.top_k(scores, k_cap)
        return vals, idx

    s3 = scores.reshape(q, groups, LANES)
    gmax = s3.max(-1)  # [Q, groups]
    _, gsel = jax.lax.top_k(gmax, k_cap)  # stable: lower group id on ties
    # ascending group order => candidates in global row order (see _chunk_topk)
    gsel = jnp.sort(gsel, axis=-1)
    # candidate gather as a one-hot MXU matmul (NOT take_along_axis)
    onehot = (gsel[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (q, k_cap, groups), 2)).astype(jnp.float32)
    # HIGHEST precision: the MXU's default f32 path truncates operands to
    # bf16, which would round the gathered candidate VALUES (breaking parity
    # with the f32 scores); the 3-term bf16 split reconstructs 0/1 * score
    # products exactly
    cand = jax.lax.dot_general(
        onehot, s3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).reshape(q, k_cap * LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, k_cap, LANES), 2)
    cand_rows = (gsel[:, :, None] * LANES + lane).reshape(q, k_cap * LANES)
    vals, pos = jax.lax.top_k(cand, k_cap)
    return vals, jnp.take_along_axis(cand_rows, pos, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "valid_rows"))
def topk_mips_onepass(queries: jnp.ndarray, corpus: jnp.ndarray, k: int,
                      valid_rows: Optional[int] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k inner-product search, one pass, no scan (see
    :func:`_onepass_body`). Same contract as :func:`topk_mips`; v1 remains
    the low-memory fallback for query batches too large to materialize
    [Q, N] f32 scores."""
    n = corpus.shape[0]
    n_valid = n if valid_rows is None else valid_rows
    k_eff = min(k, n)
    vals, idx = _onepass_body(queries, corpus, k_eff, n_valid)
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return vals, idx


def sharded_topk_mips_onepass(queries: jnp.ndarray, corpus_sharded: jnp.ndarray,
                              k: int, mesh: Mesh, axis: str = "data",
                              valid_rows: Optional[int] = None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-pass exact top-k over a corpus row-sharded across ``mesh[axis]``
    (same ICI merge as :func:`sharded_topk_mips`, scan-free local search)."""
    n_total = corpus_sharded.shape[0]
    n_valid = n_total if valid_rows is None else valid_rows
    num_shards = mesh.shape[axis]
    assert n_total % num_shards == 0, "corpus rows must divide the mesh axis"
    shard_rows = n_total // num_shards
    k_eff = min(k, shard_rows)

    def local_search(q_local, corpus_local):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * shard_rows
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        vals, idx = _onepass_body(q_local, corpus_local, k_eff, local_valid)
        idx = idx + offset
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, min(k, n_total))
        return top_vals, jnp.take_along_axis(all_idx, pos, axis=-1)

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(axis)),
        out_specs=(PartitionSpec(), PartitionSpec()),
        check_vma=False,
    )
    vals, idx = fn(queries, corpus_sharded)
    k_got = vals.shape[1]
    if k_got < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_got)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_got)))
    return vals, idx


def sharded_topk_mips(queries: jnp.ndarray, corpus_sharded: jnp.ndarray, k: int,
                      mesh: Mesh, axis: str = "data", chunk_size: int = 262144,
                      valid_rows: Optional[int] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k MIPS over a corpus row-sharded across ``mesh[axis]``.

    Each device scans only its local corpus shard (local chunked top-k with
    globally-offset row indices), then the per-shard [Q, k] candidates are
    all-gathered over ICI and reduced with one final top-k — the merge the
    reference performs implicitly inside single-host FAISS.
    """
    n_total = corpus_sharded.shape[0]
    n_valid = n_total if valid_rows is None else valid_rows
    num_shards = mesh.shape[axis]
    assert n_total % num_shards == 0, "corpus rows must divide the mesh axis"
    shard_rows = n_total // num_shards

    def local_search(q_local, corpus_local):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * shard_rows
        # valid rows inside this shard
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        vals, idx = _local_topk(q_local, corpus_local, k, chunk_size, local_valid, axis=axis)
        idx = idx + offset
        # gather candidates from every shard: [num_shards * k] per query
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=-1)
        return top_vals, top_idx

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(axis)),
        out_specs=(PartitionSpec(), PartitionSpec()),
        # outputs ARE replicated (all_gather + identical top_k on each shard),
        # but that is not statically inferable from the vma types
        check_vma=False,
    )
    return fn(queries, corpus_sharded)


def _pvary(x, axis):
    """Mark ``x`` as varying over a shard_map axis (jax>=0.5 vma tracking)."""
    if axis is None:
        return x
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis,), to="varying")
    return jax.lax.pvary(x, (axis,))  # pragma: no cover - older jax


def _local_topk(queries, corpus_local, k, chunk_size, valid_rows_dyn, axis=None):
    """Chunked top-k where the valid-row count is a traced scalar."""
    q = queries.shape[0]
    n, d = corpus_local.shape
    k_eff = min(k, n)
    chunk_size = min(chunk_size, n)
    num_chunks = -(-n // chunk_size)
    n_pad = num_chunks * chunk_size
    if n_pad != n:
        corpus_local = jnp.pad(corpus_local, ((0, n_pad - n), (0, 0)))
    chunks = corpus_local.reshape(num_chunks, chunk_size, d)
    qT = queries.astype(corpus_local.dtype)

    init_vals = _pvary(jnp.full((q, k_eff), NEG_INF, dtype=jnp.float32), axis)
    init_idx = _pvary(jnp.zeros((q, k_eff), dtype=jnp.int32), axis)

    def step(carry, inp):
        run_vals, run_idx = carry
        chunk_i, chunk = inp
        scores = jax.lax.dot_general(
            qT, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row_ids = chunk_i * chunk_size + jax.lax.broadcasted_iota(jnp.int32, (q, chunk_size), 1)
        scores = jnp.where(row_ids < valid_rows_dyn, scores, NEG_INF)
        new_vals, new_idx = _chunk_topk(scores, row_ids, k_eff)
        return _merge_topk(run_vals, run_idx, new_vals, new_idx, k_eff), None

    (vals, idx), _ = jax.lax.scan(
        step, (init_vals, init_idx),
        (jnp.arange(num_chunks, dtype=jnp.int32), chunks),
    )
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return vals, idx
