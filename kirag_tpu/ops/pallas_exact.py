"""Pallas TPU kernels: fused EXACT top-k MIPS (matmul + in-VMEM selection).

This is the round-2/3/4 centerpiece (SURVEY §7.4): the device-side
replacement for FAISS ``IndexFlatIP.search`` (`retriever/index.py:36-53`) at
speed-of-light. The XLA exact paths in :mod:`kirag_tpu.ops.mips` either
materialize the full [Q, N] f32 score matrix to HBM (one-pass) or pay a
sort-dominated per-chunk selection (scan); both leave most of the chip idle.

Round-4 default, ``impl="stream"`` (one corpus read, NO score-matrix
traffic): the scoring kernel keeps each chunk's scores entirely in VMEM and
emits only (a) the per-128-lane-group maxima and (b) the scores of the
chunk's top-``B`` groups ("captured" candidates, selected in-VMEM by B
masked-max extractions + a one-hot MXU gather). Afterwards the global top-k
groups are selected from the gmax table exactly as before; if every selected
group was captured by its chunk (checked on device), the candidate rows are
assembled from the small capture buffer — otherwise a `lax.cond` falls back
to the corpus-read-twice gather, so results are EXACT for every input. The
capture budget ``B = ~2k/num_chunks`` makes the happy path overwhelmingly
likely for real embedding corpora (top-k rows spread across chunks) while
HBM traffic drops from corpus + 2x4QN bytes to corpus + ~2% overhead
(measured numbers in benchmarks/probe_r4_results.jsonl / BENCH_r04).

Corpora may be bf16/f32, int8 (per-row scales, dequant fused into the
matmul) or PACKED INT4 (two nibbles per byte, per-row-per-128-dim-block
scales — :func:`kirag_tpu.ops.quantized.quantize_rows_int4`): int4 puts the
full 21M-row DPR corpus (21.5 GB at int8) in one chip's HBM at ~10.8 GB.

Structure of the round-3 ``impl="single"`` (exactness argument in
:func:`exact_topk_mips`; the corpus is read from HBM exactly ONCE):

1. **Fused pass** (:func:`_score_gmax_kernel`): chunked MXU matmul fused
   with a per-128-lane-group max; the f32 score chunk is streamed to HBM
   (4*Q*N bytes) alongside the [Q, N/128] group maxima. Invalid rows
   (``valid_rows`` padding) are masked in-kernel so garbage rows can never
   displace a real group.
2. **Group selection**: top-k of the group maxima. Any true top-k row lives
   in a group whose max is >= the kth overall score, and at most k distinct
   groups can contain top-k rows, so the top-k groups by max are a superset
   of the groups containing the true top-k. Selected group ids are sorted
   ascending so candidate order is global-row order (FAISS tie-breaking).
3. **Candidate gather** (:func:`_score_gather_kernel`): stream the
   materialized [C, Q, chunk] scores once and pull each query's selected
   groups with one-hot MXU matmuls accumulated in VMEM (XLA's slice gather
   measured ~1.9 GB/s effective — 512-byte slices; probe_r3). No re-score.
4. **Final selection**: exact top-k of the k*128 candidates.

The index should be PRE-PADDED to the chunk grid (TPUIndexer.to_device
does this): the kernel otherwise pads per call inside jit — a full
read+write copy of the corpus (~5.8 ms at 1M x 1024 bf16, measured).

``impl="twopass"`` keeps the round-2 kernel pair (:func:`_gmax_kernel` +
:func:`_gather_kernel` one-hot MXU re-score): scores never leave VMEM, at
the cost of reading the corpus twice — the right trade only when the
[Q, N] f32 score write does not fit in HBM next to the index.

Selections (steps 2 and 4) default to `lax.top_k`; ``select="hier"`` uses
:func:`hier_topk` (two narrow sorts + a contiguous `take_along_axis` slice
gather) — the measured round-3 winner (16.1 vs 17.7 ms/batch at 1M x 1024;
benchmarks/probe_r3_results.jsonl).

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=64)
def _warn_chunk_clamped(requested: int, clamped: int, why: str) -> None:
    """Once per (requested, clamped) pair: a silently-clamped chunk makes
    "bigger chunk" A/Bs time the SAME program twice (the r5 stream32k row
    compiled in 0.1 s because Q=256 clamps 32768 back to 16384)."""
    logger.info("chunk_size %d clamped to %d (%s)", requested, clamped, why)

try:  # jax>=0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

LANES = 128
# finite mask value (not -inf, and bf16-REPRESENTABLE): masked scores flow
# through MXU matmuls where 0 * -inf would poison the candidates with NaN,
# and the MXU decomposes f32 operands into bf16 terms (f32max rounds to
# bf16 inf — measured NaN poisoning at 1M rows, benchmarks/probe_r2b)
FIN_MIN = -1e30


def _resolve_interpret(interpret: Optional[bool]) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu",)


def _compiler_params(interpret: bool, parallel: bool = False,
                     grid_dims: int = 1):
    """``parallel=True`` marks all ``grid_dims`` grid dims as dependency-free
    — legal for the score/gmax kernels (every step writes disjoint output
    blocks), NOT for the accumulating two-pass gather kernel."""
    if pltpu is None or interpret:
        return {}
    kw = {"vmem_limit_bytes": 128 * 1024 * 1024}
    if parallel:
        kw["dimension_semantics"] = ("parallel",) * grid_dims
    return {"compiler_params": pltpu.CompilerParams(**kw)}


# ----------------------------------------------------------------- flat top-k


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_lastdim(x: jnp.ndarray, k: int, interpret: Optional[bool] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last dim of ``x`` [Q, W] -> (vals f32, idx int32),
    descending, score ties broken toward the lower index (lax.top_k is
    stable, which gives FAISS tie order).

    History: an iterative Pallas kernel (k masked-max extractions) lived
    here through round 3, kept as a "future building block". Measured 2.5-
    3.6x SLOWER than lax.top_k on v5e (benchmarks/probe_r2b, W=7936/12800,
    Q=256, k=100) -- k sequential VPU reductions are latency-bound -- and
    the building-block role materialized differently: the stream exact
    kernel's in-VMEM capture uses its own peel loop (`_topb_ids`), so the
    standalone kernel was dead opt-in code and was removed (VERDICT r3).
    ``interpret`` is accepted for call-site compatibility; selection is
    plain XLA either way.
    """
    del interpret
    q, w = x.shape
    return jax.lax.top_k(x.astype(jnp.float32), min(k, w))


def hier_topk(x: jnp.ndarray, k: int, block: int = 16
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last dim via two-level selection.

    Same exactness/displacement argument as the group selection: every true
    top-k element lives in a ``block``-wide slice whose max is >= the kth
    value, and at most k slices can hold top-k elements, so the top-k slices
    by slice-max contain them all. Replaces one wide `lax.top_k` (O(W) sort
    width) with two narrow ones (W/block and k*block) plus a contiguous
    `take_along_axis` slice gather (round 3: the earlier one-hot MXU gather
    measured SLOWER end-to-end — its [k, W/block] x [W/block, block] matmuls
    leave 7/8 of the 128-wide MXU idle at block=16; probe_r3 vs probe_r2b).

    Ties: blocks partition consecutive index ranges and block ids sort
    ascending before the gather, so both stable top_ks compose to global
    lower-index-wins. -inf mask values pass through untouched (no matmul in
    the path anymore, so no FIN_MIN clamping and no domain restriction).
    """
    q, w = x.shape
    x = x.astype(jnp.float32)
    w1 = -(-w // block)
    if k >= w1 or w <= 2 * block:
        return jax.lax.top_k(x, min(k, w))
    w_pad = w1 * block
    if w_pad != w:
        x = jnp.pad(x, ((0, 0), (0, w_pad - w)), constant_values=-jnp.inf)
    x3 = x.reshape(q, w1, block)
    bmax = x3.max(-1)                                     # [Q, W/block]
    _, bsel = jax.lax.top_k(bmax, k)                      # stable ties
    bsel = jnp.sort(bsel, axis=-1)                        # ascending ids
    cand = jnp.take_along_axis(x3, bsel[:, :, None], axis=1)  # [Q, k, block]
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, k, block), 2)
    cand_idx = (bsel[:, :, None] * block + lane).reshape(q, k * block)
    vals, pos = jax.lax.top_k(cand.reshape(q, k * block), k)
    return vals, jnp.take_along_axis(cand_idx, pos, axis=-1)


# ------------------------------------------------------ shared chunk scoring


def _quant_kind(corpus, scales, quant: Optional[str] = None) -> str:
    """Infer the corpus quantization from the operand shapes: int8 rows carry
    1-D per-row scales; packed int4 carries 2-D [N, D/128] block scales.
    ``quant`` overrides inference — required for "pq4", whose [16, D] level
    table also rides the scales slot (shape inference can't distinguish it
    from a 16-row int4 corpus)."""
    if quant is not None:
        if quant == "pq4" and (scales is None or corpus.dtype != jnp.uint8):
            raise ValueError("pq4 needs packed uint8 codes + a [16, D] "
                             "level table in `scales`")
        return quant
    if scales is None:
        return "none"
    if scales.ndim == 2:
        if corpus.dtype != jnp.uint8:
            raise ValueError("2-D (int4 block) scales require a packed uint8 "
                             f"corpus, got {corpus.dtype}")
        return "int4"
    return "int8"


def _lut16_rows(idx, levels):
    """16-entry lookup of int32 ``idx`` [R, W] where each ENTRY is a [1, W]
    row of ``levels`` [16, W] (per-column tables — PQ centroids differ per
    subspace): balanced 15-select tree on the 4 index bits, the vector-table
    sibling of :func:`kirag_tpu.ops.pallas_qmm._lut16`."""
    lv = [levels[t:t + 1, :] for t in range(16)]
    b0 = (idx & 1) == 1
    lv = [jnp.where(b0, lv[i + 1], lv[i]) for i in range(0, 16, 2)]
    b1 = (idx & 2) == 2
    lv = [jnp.where(b1, lv[i + 1], lv[i]) for i in range(0, 8, 2)]
    b2 = (idx & 4) == 4
    lv = [jnp.where(b2, lv[i + 1], lv[i]) for i in range(0, 4, 2)]
    return jnp.where((idx & 8) == 8, lv[1], lv[0])


def _chunk_scores(q, c, s, quant: str):
    """Exact f32 scores [Q, CHUNK] of a (possibly quantized) corpus chunk.

    ``quant``: "none" (bf16/f32 chunk), "int8" (int8 chunk, ``s`` = row
    scales laid out [G, LANES], applied after the matmul), or "int4"
    (packed-nibble uint8 chunk [CHUNK, D/2], ``s`` = [NB, CHUNK] per-block
    scales). int4 runs one 128-wide matmul per block: the nibble values
    (n - 7.5, exactly representable in bf16) hit the MXU unscaled and each
    partial product is scaled by its block's row scales in f32 — so the
    block scale never rounds through bf16.
    """
    if quant == "pq4":
        # c: [CHUNK, m/2] packed PQ codes (plane layout: low nibble =
        # subspace t, high = t + m/2); s: [16, D] level table
        # (ops/pq.pq_level_table). Decode = 15-select tree per (component,
        # plane); each decoded [CHUNK, m/2] plane hits the MXU against the
        # matching contiguous query columns — no gather, no code widening
        # (the strided-subspace layout, ops/pq.py module docstring).
        d = q.shape[1]
        m2 = c.shape[1]
        m = 2 * m2
        ds = d // m
        ci = c.astype(jnp.int32)
        lo = ci & 15
        hi = (ci >> 4) & 15
        out = None
        for j in range(ds):
            for plane, nib in ((0, lo), (1, hi)):
                off = j * m + plane * m2
                v = _lut16_rows(nib, s[:, off:off + m2]).astype(jnp.bfloat16)
                qb = q[:, off:off + m2].astype(jnp.bfloat16)
                p = jax.lax.dot_general(
                    qb, v, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [Q, CHUNK]
                out = p if out is None else out + p
        return out
    if quant == "int4":
        nb = s.shape[0]
        half = nb // 2
        ci = c.astype(jnp.int32)
        out = None
        for b_i in range(nb):
            plane = ci if b_i < half else (ci >> 4)
            col0 = (b_i % half) * LANES
            nib = (plane[:, col0:col0 + LANES] & 15).astype(jnp.float32)
            v = (nib - 7.5).astype(jnp.bfloat16)            # [CHUNK, LANES]
            qb = q[:, b_i * LANES:(b_i + 1) * LANES].astype(jnp.bfloat16)
            p = jax.lax.dot_general(
                qb, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [Q, CHUNK]
            p = p * s[b_i][None, :]
            out = p if out is None else out + p
        return out
    if c.dtype == jnp.int8:
        c = c.astype(jnp.bfloat16)
        q = q.astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [Q, CHUNK]
    if s is not None:
        scores = scores * s.reshape(1, -1)
    return scores


def _scale_operand(scales, quant: str, num_chunks: int, groups_per_chunk: int,
                   chunk_size: int, chunk_axis: int = 0):
    """Reshape flat scales into the kernel's per-chunk block layout + spec.
    Both layouts keep the last two block dims (8,128)-divisible (the Mosaic
    window rule that interpret mode does not check). ``chunk_axis`` names
    which grid coordinate sweeps chunks (the stream grid is
    (chunks, qblocks); the tiled gather grid is (qblocks, chunks))."""
    if quant == "int8":
        shape = (1, groups_per_chunk, LANES)
        op = scales.astype(jnp.float32).reshape(
            num_chunks, groups_per_chunk, LANES)
    elif quant == "pq4":
        # the [16, D] level table is chunk-invariant: one (1, 16, D) block,
        # every grid step maps to it (16 sublanes / D lanes satisfy the
        # Mosaic (8,128) window rule for D % 128 == 0)
        shape = (1,) + tuple(scales.shape)
        op = scales.astype(jnp.float32).reshape(shape)
        if chunk_axis == 0:
            return op, pl.BlockSpec(shape, lambda i, *js: (0, 0, 0))
        return op, pl.BlockSpec(shape, lambda j, i: (0, 0, 0))
    else:  # int4: [N, NB] -> [chunks, NB, CHUNK]
        nb = scales.shape[1]
        shape = (1, nb, chunk_size)
        op = scales.astype(jnp.float32).reshape(
            num_chunks, chunk_size, nb).transpose(0, 2, 1)
    if chunk_axis == 0:
        spec = pl.BlockSpec(shape, lambda i, *js: (i, 0, 0))
    else:
        spec = pl.BlockSpec(shape, lambda j, i: (i, 0, 0))
    return op, spec


def _dense_scores(q, c, scales, quant: str, n_valid):
    """Tiny-corpus path: one dense XLA matmul mirroring the kernel's exact
    dequant arithmetic (per-block bf16 partial dots, f32 block scaling)."""
    if quant == "pq4":
        # _chunk_scores is shape-agnostic: the whole corpus is one "chunk",
        # so the arithmetic (and rounding) is identical to the kernel path
        scores = _chunk_scores(q, c, scales.astype(jnp.float32), quant)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        return jnp.where(col < n_valid, scores, -jnp.inf)
    if quant == "int4":
        nb = scales.shape[1]
        ci = c.astype(jnp.int32)
        nib = jnp.concatenate([ci & 15, (ci >> 4) & 15], axis=1)
        v = (nib.astype(jnp.float32) - 7.5).astype(jnp.bfloat16)
        n = c.shape[0]
        v3 = v.reshape(n, nb, LANES)
        q3 = q.astype(jnp.bfloat16).reshape(q.shape[0], nb, LANES)
        # [NB, Q, N] partial dots, scaled per block then summed — identical
        # rounding to the kernel path
        p = jax.lax.dot_general(
            q3, v3, dimension_numbers=(((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.float32)
        scores = jnp.sum(p * scales.astype(jnp.float32).T[:, None, :], axis=0)
    else:
        if c.dtype == jnp.int8:
            c = c.astype(jnp.bfloat16)
            q = q.astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            q, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if scales is not None:
            scores = scores * scales.astype(jnp.float32)[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    return jnp.where(col < n_valid, scores, -jnp.inf)


# ------------------------------------------------------ fused scoring pass


def _score_gmax_kernel(q_ref, c_ref, valid_ref, *rest, groups_per_chunk: int,
                       chunk_size: int, chunked: bool = False,
                       with_scores: bool = True, quant: str = "none"):
    """Fused scoring pass: MXU matmul + per-group max, optionally writing
    the f32 score chunk to HBM (the single-read path; ``with_scores=False``
    is pass A of the corpus-read-twice fallback, scores stay in VMEM).

    Refs: q [Q, D] (constant), c [CHUNK, D] (per chunk), valid [1,1] SMEM,
    optional s [1, G, LANES] f32 dequant scales (3-D: Mosaic requires the
    last two block dims (8,128)-divisible); outs: [scores] + gmax
    [1, G, Q] f32. Score layout: ``chunked`` = [1, Q, CHUNK] blocks of a
    [C, Q, CHUNK] array (dense per-step writes), else [Q, CHUNK] windows of
    [Q, N] (strided rows; kept for A/B).
    """
    rest = list(rest)
    gmax_ref = rest.pop()
    scores_ref = rest.pop() if with_scores else None
    s_ref = rest.pop() if rest else None
    scores = _chunk_scores(q_ref[:], c_ref[:],
                           s_ref[0] if s_ref is not None else None, quant)
    n_q = scores.shape[0]
    # scores are written RAW: invalid rows are re-masked after the candidate
    # gather (rows < n_valid), so only the group maxima need in-kernel
    # masking — and only in chunks that actually intersect the invalid tail
    # (saves a [Q, CHUNK] iota+where on every interior chunk)
    if scores_ref is not None:
        if chunked:
            scores_ref[0] = scores
        else:
            scores_ref[:] = scores
    chunk_start = pl.program_id(0) * chunk_size

    def write_gmax(s):
        s3 = s.reshape(n_q, groups_per_chunk, LANES)
        gmax_ref[0] = jnp.max(s3, axis=-1).T             # [G, Q]

    @pl.when(chunk_start + chunk_size > valid_ref[0, 0])
    def _():
        row = chunk_start + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1)
        write_gmax(jnp.where(row < valid_ref[0, 0], scores, FIN_MIN))

    @pl.when(chunk_start + chunk_size <= valid_ref[0, 0])
    def _():
        write_gmax(scores)


# ------------------------------------------------------------ stream kernel


def _topb_ids(x, b: int):
    """In-kernel top-``b`` group ids of ``x`` [Q, G] by b masked-max
    extractions (ties to the lowest id — FAISS order). Callers clamp ``x``
    to finite values and keep b <= G, so the b extracted ids are distinct
    (the -inf removal marker can never tie a remaining entry).

    Returns ``(sel [Q, b] int32, vals [Q, b] f32, resid [Q] f32)``: the
    peeled ids, their values (descending; within ties, ascending id), and
    the max over everything NOT peeled (-inf when b == G) — the per-chunk
    residual the capture-domain selection tail checks exactness against."""
    qn, g = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, g), 1)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (qn, b), 1)

    def body(j, carry):
        x, sel, vals = carry
        m = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.min(jnp.where(x == m, col, g), axis=-1, keepdims=True)
        sel = jnp.where(bcol == j, s, sel)
        vals = jnp.where(bcol == j, m, vals)
        x = jnp.where(col == s, -jnp.inf, x)
        return x, sel, vals

    x_left, sel, vals = jax.lax.fori_loop(
        0, b, body, (x, jnp.zeros((qn, b), dtype=jnp.int32),
                     jnp.zeros((qn, b), dtype=jnp.float32)))
    return sel, vals, jnp.max(x_left, axis=-1)


def _worstb_ids(x, b: int):
    """In-kernel ``b`` SMALLEST values of ``x`` [Q, S] by b masked-min
    extractions (ties to the lowest slot). Any tie pick is safe for
    exactness: a "wrong" tied peel at the ejection boundary is covered by
    the lost-max check in :func:`_merge_body` (equal-value losses force the
    fallback). Callers only pass keys < +inf, so the +inf removal marker
    can never tie a remaining entry.

    Returns ``(pos [Q, b] int32, vals [Q, b] f32)`` in ascending value
    order; the peeled slot positions are distinct."""
    qn, s = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, s), 1)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (qn, b), 1)

    def body(j, carry):
        x, pos, vals = carry
        m = jnp.min(x, axis=-1, keepdims=True)
        c = jnp.min(jnp.where(x == m, col, s), axis=-1, keepdims=True)
        pos = jnp.where(bcol == j, c, pos)
        vals = jnp.where(bcol == j, m, vals)
        x = jnp.where(col == c, jnp.inf, x)
        return x, pos, vals

    _, pos, vals = jax.lax.fori_loop(
        0, b, body, (x, jnp.zeros((qn, b), dtype=jnp.int32),
                     jnp.zeros((qn, b), dtype=jnp.float32)))
    return pos, vals


def _stream_kernel(q_ref, c_ref, valid_ref, *rest, groups_per_chunk: int,
                   chunk_size: int, b: int, quant: str,
                   capdom: bool = False):
    """Single-read scoring pass with in-VMEM candidate capture: scores never
    leave VMEM. Per chunk, emits (a) the per-group maxima (as the other
    impls) and (b) the full 128-lane scores of the chunk's top-``b`` groups
    plus their global group ids — the capture from which `_exact_body`
    assembles the final candidates when the membership check passes.
    With ``capdom`` it additionally emits the peeled capture maxima and the
    non-captured residual max (both free by-products of `_topb_ids`), which
    let the tail select in the C*B capture domain instead of over all group
    maxima (see `_stream_body`). All writes are chunk-disjoint (grid is
    parallel)."""
    rest = list(rest)
    if capdom:
        resid_ref = rest.pop()
        capmax_ref = rest.pop()
    gid_ref = rest.pop()
    cand_ref = rest.pop()
    gmax_ref = rest.pop()
    s_ref = rest.pop() if rest else None
    scores = _chunk_scores(q_ref[:], c_ref[:],
                           s_ref[0] if s_ref is not None else None, quant)
    n_q = scores.shape[0]
    s3 = scores.reshape(n_q, groups_per_chunk, LANES)
    i = pl.program_id(0)
    chunk_start = i * chunk_size

    def finish(gmax):
        # clamp: keeps _topb_ids' -inf removal marker unambiguous even if an
        # adversarial input produced -inf scores
        gmax = jnp.maximum(gmax, FIN_MIN)
        gmax_ref[0] = gmax.T                             # [G, Q]
        bsel, bvals, resid = _topb_ids(gmax, b)          # [Q, B] x2, [Q]
        gid_ref[0] = bsel.T + i * groups_per_chunk       # [B, Q] global ids
        if capdom:
            capmax_ref[0] = bvals.T                      # [B, Q]
            # -inf when b == G (nothing left uncaptured): the tail's strict
            # comparison then always passes for this chunk
            resid_ref[0] = resid[None, :]                # [1, Q]
        gc = jax.lax.broadcasted_iota(
            jnp.int32, (n_q, b, groups_per_chunk), 2)
        onehot = (bsel[:, :, None] == gc).astype(jnp.float32)
        # HIGHEST: the 0/1 x score products must not round through bf16
        cand = jax.lax.dot_general(
            onehot, s3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [Q, B, LANES]
        cand_ref[0] = cand.reshape(n_q, b * LANES)

    # captured VALUES stay raw (invalid rows re-masked by row id after the
    # candidate assembly, as in every other impl); only the selection maxima
    # need masking, and only in chunks intersecting the invalid tail
    @pl.when(chunk_start + chunk_size > valid_ref[0, 0])
    def _():
        row = chunk_start + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1)
        masked = jnp.where(row < valid_ref[0, 0], scores, FIN_MIN)
        finish(jnp.max(masked.reshape(n_q, groups_per_chunk, LANES), axis=-1))

    @pl.when(chunk_start + chunk_size <= valid_ref[0, 0])
    def _():
        finish(jnp.max(s3, axis=-1))


def _merge_kernel(q_ref, c_ref, valid_ref, *rest, groups_per_chunk: int,
                  chunk_size: int, bc: int, br: int, num_chunks: int,
                  total_groups: int, quant: str):
    """Round-5 stream variant (``select="merge"``): a RUNNING top-``br``
    candidate window held in the kernel's accumulating output refs across
    chunk steps — the [C, B, Q, 128] capture HBM round-trip and the tail's
    one-hot assembly disappear; only the final top-k over the window runs
    outside.

    Grid = (qblocks, chunks) with the CHUNK axis minor, so each query
    block's window refs (`win` [Q, br, 128] payload, `wkey` [Q, br] group
    maxima, `wgid` [Q, br] group ids) are revisited consecutively and stay
    VMEM-resident (the :func:`_gather_kernel` accumulate pattern). Per
    step: peel the chunk's top-``bc`` groups (:func:`_topb_ids`), then
    merge them exactly into the window — peel the window's ``bc`` worst
    slots, rank the 2*bc union under the strict (value desc, gid asc)
    total order, overwrite ejected slots with surviving new items via a
    one-hot MXU blend. The bottom ``bc`` of (window + bc new) always lie
    inside that union, so the post-merge window is exactly the top-``br``
    of all groups captured so far.

    Exactness machinery: `lost` tracks, per chunk step, max(best
    non-captured group max, best EJECTED window key) — if the k-th final
    window key strictly beats every step's lost value, no group that could
    hold a true top-k row was ever dropped (see :func:`_merge_body`);
    ties or adversarial clustering force the exact global fallback.
    Empty slots carry -inf keys and unique NEGATIVE gids so the total
    order stays strict; at the last step the window is sorted by gid
    ascending in-kernel (one-hot permutation matmul) so the tail's stable
    top-k composes to FAISS lower-row-id tie-breaking. Group ids ride
    through VPU math as f32: exact below 2**24 groups (= 2.1B rows).
    """
    rest = list(rest)
    lost_ref = rest.pop()
    wgid_ref = rest.pop()
    wkey_ref = rest.pop()
    win_ref = rest.pop()
    gmax_ref = rest.pop()
    s_ref = rest.pop() if rest else None
    scores = _chunk_scores(q_ref[:], c_ref[:],
                           s_ref[0] if s_ref is not None else None, quant)
    n_q = scores.shape[0]
    s3 = scores.reshape(n_q, groups_per_chunk, LANES)
    i = pl.program_id(1)                                 # chunk axis: MINOR
    chunk_start = i * chunk_size

    # ---- group maxima (masked only in chunks intersecting the invalid
    # tail, as the other impls); clamped to FIN_MIN so -inf never enters
    # the peel/merge order, then read back from the output ref so the merge
    # below exists once instead of once per mask branch
    @pl.when(chunk_start + chunk_size > valid_ref[0, 0])
    def _():
        row = chunk_start + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1)
        masked = jnp.where(row < valid_ref[0, 0], scores, FIN_MIN)
        gmax_ref[0] = jnp.maximum(
            jnp.max(masked.reshape(n_q, groups_per_chunk, LANES), axis=-1),
            FIN_MIN).T

    @pl.when(chunk_start + chunk_size <= valid_ref[0, 0])
    def _():
        gmax_ref[0] = jnp.maximum(jnp.max(s3, axis=-1), FIN_MIN).T

    gmax = gmax_ref[0].T                                 # [Q, G] clamped
    bsel, bvals, resid = _topb_ids(gmax, bc)             # [Q, bc] x2, [Q]
    ngid = bsel + i * groups_per_chunk                   # [Q, bc] global ids
    ngid_f = ngid.astype(jnp.float32)
    gc = jax.lax.broadcasted_iota(jnp.int32, (n_q, bc, groups_per_chunk), 2)
    onehot = (bsel[:, :, None] == gc).astype(jnp.float32)
    # HIGHEST: 0/1 x score products must not round through bf16
    cand = jax.lax.dot_general(
        onehot, s3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [Q, bc, LANES]

    @pl.when(i == 0)
    def _():
        pad = br - bc
        wkey_ref[...] = jnp.pad(bvals, ((0, 0), (0, pad)),
                                constant_values=-jnp.inf)
        slot = jax.lax.broadcasted_iota(jnp.int32, (n_q, br), 1)
        wgid_ref[...] = jnp.where(slot < bc,
                                  jnp.pad(ngid, ((0, 0), (0, pad))),
                                  -(slot + 1))
        win_ref[...] = jnp.pad(cand, ((0, 0), (0, pad), (0, 0)))
        lost_ref[0] = resid[None, :]

    @pl.when(i > 0)
    def _():
        wkeys = wkey_ref[...]                            # [Q, br]
        wgids = wgid_ref[...]                            # [Q, br] int32
        wpos, wvals = _worstb_ids(wkeys, bc)             # [Q, bc]
        srange = jax.lax.broadcasted_iota(jnp.int32, (n_q, bc, br), 2)
        wp1 = (wpos[:, :, None] == srange).astype(jnp.float32)  # [Q, bc, br]
        wg = jnp.sum(wp1 * wgids[:, None, :].astype(jnp.float32), axis=-1)
        # strict total order over the 2*bc union: values desc, gid asc on
        # ties; gids are distinct (window groups unique, new groups from an
        # unseen chunk, empties negative-unique) so ranks are a permutation
        v16 = jnp.concatenate([wvals, bvals], axis=-1)   # [Q, 2bc]
        g16 = jnp.concatenate([wg, ngid_f], axis=-1)
        beats = (v16[:, :, None] > v16[:, None, :]) | (
            (v16[:, :, None] == v16[:, None, :])
            & (g16[:, :, None] < g16[:, None, :]))
        rank = jnp.sum(beats.astype(jnp.int32), axis=1)  # [Q, 2bc]
        survive = rank < bc                              # top bc of 2bc
        # Mosaic lowers [:, :, None] minor-dim insertion only for 32-bit
        # lane types — i1 masks must widen BEFORE broadcasting (TPU-only
        # failure; interpret mode accepts the i1 form)
        surv_i = survive.astype(jnp.int32)               # [Q, 2bc]
        ej_old = 1 - surv_i[:, :bc]                      # [Q, bc] int32 0/1
        sv_new = surv_i[:, bc:]
        # pair j-th ejected slot with j-th surviving new item (counts are
        # equal: #ejected_old = bc - #survived_old = #survived_new)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (bc, bc), 1)
               <= jax.lax.broadcasted_iota(jnp.int32, (bc, bc), 0)
               ).astype(jnp.int32)
        orde = jnp.sum(ej_old[:, None, :] * tri[None],
                       axis=-1)                          # [Q, bc] cumsum
        ords = jnp.sum(sv_new[:, None, :] * tri[None],
                       axis=-1)
        assign = ((ej_old[:, :, None] * sv_new[:, None, :]).astype(jnp.float32)
                  * (orde[:, :, None] == ords[:, None, :]).astype(jnp.float32)
                  )                                      # [Q, bc(j), bc(new)]
        m_sn = jax.lax.dot_general(
            wp1, assign, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [Q, br, bc]
        rm = jnp.sum(m_sn, axis=-1)                      # [Q, br] 0/1
        newpay = jax.lax.dot_general(
            m_sn, cand, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [Q, br, LANES]
        win_ref[...] = jnp.where(rm[:, :, None] > 0, newpay, win_ref[...])
        wkey_ref[...] = jnp.where(rm > 0, jnp.sum(m_sn * bvals[:, None, :],
                                                  axis=-1), wkeys)
        wgid_ref[...] = jnp.where(
            rm > 0, jnp.sum(m_sn * ngid_f[:, None, :],
                            axis=-1).astype(jnp.int32), wgids)
        # ejected keys can carry real groups — their max joins the chunk's
        # non-captured residual so the tail check catches ANY window loss
        ej = jnp.max(jnp.where(survive, -jnp.inf, v16), axis=-1)
        lost_ref[0] = jnp.maximum(resid, ej)[None, :]

    @pl.when(i == num_chunks - 1)
    def _():
        # sort the window by gid ascending (one-hot permutation matmul) so
        # downstream candidate order is global row order and the stable
        # final top-k ties to the lower row id. Empty slots get unique
        # sentinels >= total_groups: they sort last and their rows fall
        # beyond n_valid, so _final_select masks them.
        keys = jnp.maximum(wkey_ref[...], FIN_MIN)       # -inf empties: no
        gids = wgid_ref[...]                             # 0 * -inf NaN risk
        slot = jax.lax.broadcasted_iota(jnp.int32, (n_q, br), 1)
        sg = jnp.where(gids < 0, total_groups + slot, gids)
        sgf = sg.astype(jnp.float32)
        rank = jnp.sum((sgf[:, :, None] > sgf[:, None, :]).astype(jnp.int32),
                       axis=-1)                          # ascending, unique
        perm = (rank[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (n_q, br, br), 1)).astype(jnp.float32)
        win_ref[...] = jax.lax.dot_general(
            perm, win_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        wkey_ref[...] = jnp.sum(perm * keys[:, None, :], axis=-1)
        wgid_ref[...] = jnp.sum(perm * sgf[:, None, :],
                                axis=-1).astype(jnp.int32)


def _cap_assemble_kernel(cpos_ref, cand_ref, out_ref, *, b: int):
    """Streaming assembly of the final [Q, k, 128] candidates from the
    stream kernel's capture ([C, Q, B*128] in HBM): per chunk step, the
    selected capture positions that fall in this chunk one-hot-blend the
    chunk's capture block into the VMEM-resident output (grid minor axis
    revisit — the `_gather_kernel` accumulate pattern). Replaces the XLA
    einsum tail, which materialized the [Q, k, C*B] one-hot in HBM (~208 MB
    at 1M x 1024 / Q=256 — the bulk of the 2.24 ms assembly stage,
    probe_r4b); here the one-hot exists only per-chunk in VMEM
    ([Q, k, B] ≈ 1.7 MB) and HBM traffic is one capture read."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    n_q, k = cpos_ref.shape
    lp = cpos_ref[...] - i * b                           # [Q, k] local pos
    oh = (lp[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (n_q, k, b), 2)).astype(jnp.float32)  # in-range iff equal
    cap = cand_ref[0].reshape(n_q, b, LANES)
    # HIGHEST: 0/1 x f32 capture values must not round through bf16
    out_ref[...] += jax.lax.dot_general(
        oh, cap, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _cap_assemble(cpos, cand_out, num_chunks: int, b: int, k_eff: int,
                  n_q: int, interpret: bool):
    """pallas assembly entry: ``cpos`` [Q, k] flat capture positions
    (chunk-ascending [C, B] order), ``cand_out`` [C, Q, B*128] capture."""
    return pl.pallas_call(
        functools.partial(_cap_assemble_kernel, b=b),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((n_q, k_eff), lambda i: (0, 0)),
            pl.BlockSpec((1, n_q, b * LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_q, k_eff, LANES), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_q, k_eff, LANES), jnp.float32),
        interpret=interpret,
        # the output ref accumulates across chunk steps: NOT parallel
        **_compiler_params(interpret),
    )(cpos, cand_out)


# ------------------------------------------------------------------- pass B


def _score_gather_kernel(s_ref, gsel_ref, cand_ref, *, groups_per_chunk: int,
                         k: int):
    """Candidate extraction from the MATERIALIZED score matrix: stream the
    [C, Q, chunk] scores once and pull each query's selected groups with a
    one-hot MXU matmul, accumulating [Q, k, LANES] in VMEM.

    Replaces the XLA advanced-indexing gather, which moves 512-byte slices
    at ~1.9 GB/s effective (~7 ms of the 16.4 ms pipeline — probe_r3
    sc_m_* micros put every other non-kernel stage under 1 ms). Each group
    lives in exactly one chunk, so each (query, slot) accumulates exactly
    one exact contribution (cf. :func:`_gather_kernel`); unlike that
    kernel there is NO corpus re-read and NO re-score matmul.
    """
    i = pl.program_id(0)
    scores = s_ref[0]                                    # [Q, CHUNK]
    n_q = scores.shape[0]
    s3 = scores.reshape(n_q, groups_per_chunk, LANES)
    rel = gsel_ref[:] - i * groups_per_chunk             # [Q, k]
    gc = jax.lax.broadcasted_iota(jnp.int32, (n_q, k, groups_per_chunk), 2)
    onehot = (rel[:, :, None] == gc).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        onehot, s3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [Q, k, LANES]

    @pl.when(i == 0)
    def _():
        cand_ref[:] = contrib

    @pl.when(i > 0)
    def _():
        cand_ref[:] = cand_ref[:] + contrib


def _gather_kernel(q_ref, c_ref, gsel_ref, *rest, groups_per_chunk: int,
                   k: int, quant: str = "none"):
    """Second fused pass: re-score the chunk and extract the selected groups
    with a one-hot MXU matmul, accumulating [Q, k, LANES] candidates in VMEM.

    Each selected group id lives in exactly one chunk, so across the grid
    each (query, slot) accumulates exactly one (exact) contribution; slots
    whose group is in another chunk contribute 0.
    """
    if len(rest) == 2:
        s_ref, cand_ref = rest
    else:
        s_ref = None
        (cand_ref,) = rest
    # grid = (qblocks, chunks): the chunk sweep is the MINOR axis so each
    # query block's output window accumulates across consecutive steps
    i = pl.program_id(1)
    scores = _chunk_scores(q_ref[:], c_ref[:],
                           s_ref[0] if s_ref is not None else None, quant)
    n_q = scores.shape[0]
    s3 = scores.reshape(n_q, groups_per_chunk, LANES)
    rel = gsel_ref[:] - i * groups_per_chunk             # [Q, k]
    gc = jax.lax.broadcasted_iota(jnp.int32, (n_q, k, groups_per_chunk), 2)
    onehot = (rel[:, :, None] == gc).astype(jnp.float32)
    # HIGHEST precision: the default f32 MXU path truncates operands to bf16
    # (rounds the gathered candidate values); the 3-term bf16 split keeps
    # 0/1 * score products exact
    contrib = jax.lax.dot_general(
        onehot, s3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [Q, k, LANES]

    @pl.when(i == 0)
    def _():
        cand_ref[:] = contrib

    @pl.when(i > 0)
    def _():
        cand_ref[:] = cand_ref[:] + contrib


# ------------------------------------------------------------------ exact api


def _pad_to_chunks(corpus, scales, chunk_size, quant: str = "none"):
    n = corpus.shape[0]
    n_pad = -(-n // chunk_size) * chunk_size
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
        if scales is not None and quant != "pq4":
            # per-row scales pad with their rows; the pq4 level table is
            # chunk-invariant ([16, D]) and must stay untouched — pq pad
            # rows decode to real centroid values, but their scores only
            # ever flow through row-masked gmax / _final_select
            pad = ((0, n_pad - n),) + ((0, 0),) * (scales.ndim - 1)
            scales = jnp.pad(scales, pad)
    return corpus, scales


def _capture_budget(k_eff: int, num_chunks: int, groups_per_chunk: int) -> int:
    """Per-chunk capture width for impl="stream": ~2x the expected count of
    globally-selected groups per chunk (so the membership check passes for
    any corpus whose top-k rows are not pathologically chunk-clustered),
    floored at 8 sublanes and capped at the chunk's group count (at which
    point capture is total and the check can never fail)."""
    b = -(-2 * k_eff // num_chunks)
    b = max(8, -(-b // 8) * 8)
    return min(b, groups_per_chunk)


def _exact_body(queries, corpus, k_eff: int, chunk_size: int, n_valid,
                interpret: bool, scales, select: str = "flat",
                impl: str = "single", quant: Optional[str] = None,
                on_miss: str = "fallback"):
    """Shared by the jitted single-chip entry and the shard_map local body
    (``n_valid`` may be a traced scalar). ``select`` picks the selection
    stages: "flat" = lax.top_k, "hier" = two-level :func:`hier_topk`.
    ``impl``: "stream" = one corpus read, scores never leave VMEM (per-chunk
    top-B capture + membership-checked assembly, lax.cond fallback to the
    twopass gather keeps it exact on adversarial inputs); "single" = one
    corpus read, scores materialized to HBM, candidates gathered from the
    score matrix; "twopass" = the round-2 kernel pair that re-scores the
    corpus to gather candidates (never materializes [Q, N] scores).

    ``on_miss="flag"`` returns ``(vals, idx, ok)`` instead of embedding the
    stream impl's exactness fallback as an in-program lax.cond: the capture
    path runs unconditionally and ``ok`` (scalar bool) reports whether its
    results are exact. Measured on chip (probe_r8 capfin vs full, 1M x 1024):
    the mere presence of the cond costs ~0.7 ms/batch at Q=256 even when the
    fallback never executes. Callers that fetch results to host anyway (the
    indexer's search_knn) check ``ok`` for free and re-dispatch the checked
    program on the rare miss; in-jit compositions keep the default. Impls
    with no fallback (single/twopass/tiny-corpus) report ok=True."""
    if select in ("capdom", "merge") and impl != "stream":
        # capture-domain / running-window selection only exists in the
        # stream kernels; the other impls have no capture to select over
        select = "hier"
    quant = _quant_kind(corpus, scales, quant)
    n, d_c = corpus.shape
    n_q = queries.shape[0]
    d_q = queries.shape[1]
    corpus, scales = _pad_to_chunks(corpus, scales, chunk_size, quant)
    n_pad = corpus.shape[0]
    num_chunks = n_pad // chunk_size
    groups = n_pad // LANES
    groups_per_chunk = chunk_size // LANES

    def _tag(vals, idx):
        # exact by construction: no fallback exists, so flag mode reports ok
        if on_miss == "flag":
            return vals, idx, jnp.asarray(True)
        return vals, idx

    if groups < 2 or k_eff >= groups:
        # tiny corpus: one matmul + direct sort is optimal and the grouped
        # exactness argument needs k < groups
        scores = _dense_scores(queries, corpus, scales, quant, n_valid)
        vals, idx = jax.lax.top_k(scores, k_eff)
        # invalid (-inf masked) slots report row 0 like _final_select and
        # the numpy/scan oracles — never an out-of-range padded row id
        return _tag(vals, jnp.where(jnp.isfinite(vals), idx, 0))

    valid_arr = jnp.asarray(n_valid, dtype=jnp.int32).reshape(1, 1)
    operands = [queries, corpus, valid_arr]

    if impl == "stream":
        if select == "merge":
            # the running window must stay VMEM-resident across chunk
            # steps: [qb, br, 128] f32 + the final-sort permutation scratch.
            # Beyond ~24 MB (br ~= 180 at qb=256) degrade to capdom instead
            # of OOMing at Mosaic lowering — large-k callers lose nothing
            # (capdom's tail amortizes better as k grows anyway).
            bc, br, qb = _merge_geometry(k_eff, num_chunks,
                                         groups_per_chunk, n_q)
            if qb * br * LANES * 4 > 24 * 1024 * 1024:
                select = "capdom"
            else:
                # merge keeps its in-kernel window + device cond (exact as
                # returned), so flag mode truthfully reports ok
                return _tag(*_merge_body(queries, corpus, scales, quant,
                                         k_eff, chunk_size, n_valid,
                                         interpret, n_q, num_chunks, groups,
                                         groups_per_chunk))
        return _stream_body(queries, corpus, scales, quant, k_eff, chunk_size,
                            n_valid, interpret, select, n_q, num_chunks,
                            groups, groups_per_chunk, operands,
                            on_miss=on_miss)

    # ---- specs for the 1-D-grid fused scoring pass (the stream/merge
    # bodies above build their own 2-D-grid specs)
    if pltpu is not None:
        valid_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    else:  # pragma: no cover - no TPU pallas backend
        valid_spec = pl.BlockSpec((1, 1), lambda i: (0, 0))
    in_specs = [
        pl.BlockSpec((n_q, d_q), lambda i: (0, 0)),
        pl.BlockSpec((chunk_size, d_c), lambda i: (i, 0)),
        valid_spec,
    ]
    if scales is not None:
        s_op, s_spec = _scale_operand(scales, quant, num_chunks,
                                      groups_per_chunk, chunk_size)
        in_specs.append(s_spec)
        operands.append(s_op)

    # ---- fused scoring pass: matmul + masked group max, plus the f32
    # scores in HBM for the single-read impls. Default score layout is
    # CHUNK-CONTIGUOUS ([C, Q, chunk]: dense per-step writes); the
    # "single_strided" variant writes [Q, N] directly (256 separate 32 KB
    # row segments per step), kept for A/B.
    with_scores = impl in ("single", "single_strided")
    chunked = impl == "single"
    out_specs = []
    out_shape = []
    if with_scores:
        if chunked:
            out_specs.append(pl.BlockSpec((1, n_q, chunk_size),
                                          lambda i: (i, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct(
                (num_chunks, n_q, chunk_size), jnp.float32))
        else:
            out_specs.append(pl.BlockSpec((n_q, chunk_size), lambda i: (0, i)))
            out_shape.append(jax.ShapeDtypeStruct((n_q, n_pad), jnp.float32))
    out_specs.append(pl.BlockSpec((1, groups_per_chunk, n_q),
                                  lambda i: (i, 0, 0)))
    out_shape.append(jax.ShapeDtypeStruct(
        (num_chunks, groups_per_chunk, n_q), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_score_gmax_kernel,
                          groups_per_chunk=groups_per_chunk,
                          chunk_size=chunk_size, chunked=chunked,
                          with_scores=with_scores, quant=quant),
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **_compiler_params(interpret, parallel=True),
    )(*operands)
    scores = outs[0] if with_scores else None
    gmax = outs[-1].reshape(groups, n_q).T               # [Q, groups]

    # ---- group selection; ascending sort => candidates in global row
    # order, so the final stable top-k breaks ties toward the lower row id
    if select == "hier":
        _, gsel = hier_topk(gmax, k_eff)
    else:
        _, gsel = topk_lastdim(gmax, k_eff, interpret=interpret)
    gsel = jnp.sort(gsel, axis=-1)

    # ---- candidate extraction
    if with_scores:
        if chunked:
            # stream the score matrix once through a one-hot accumulate
            # kernel: the XLA slice gather measured ~1.9 GB/s effective
            # (~7 ms at Q=256/k=100 — probe_r3 micros)
            cand = pl.pallas_call(
                functools.partial(_score_gather_kernel,
                                  groups_per_chunk=groups_per_chunk, k=k_eff),
                grid=(num_chunks,),
                in_specs=[
                    pl.BlockSpec((1, n_q, chunk_size), lambda i: (i, 0, 0)),
                    pl.BlockSpec((n_q, k_eff), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((n_q, k_eff, LANES),
                                       lambda i: (0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((n_q, k_eff, LANES),
                                               jnp.float32),
                interpret=interpret,
                **_compiler_params(interpret),
            )(scores, gsel)
        else:
            cand = jnp.take_along_axis(
                scores.reshape(n_q, groups, LANES), gsel[:, :, None], axis=1)
    else:
        # ---- pass B: fused re-score + one-hot candidate gather
        cand = _twopass_gather(queries, corpus, gsel, scales, quant,
                               chunk_size, num_chunks, groups_per_chunk,
                               k_eff, interpret)

    return _tag(*_final_select(cand, gsel, k_eff, n_valid, n_q, select,
                               interpret))


def _twopass_gather(queries, corpus, gsel, scales, quant, chunk_size,
                    num_chunks, groups_per_chunk, k_eff, interpret):
    """Candidate extraction by re-reading + re-scoring the corpus
    (:func:`_gather_kernel`). Used by impl="twopass" and as the lax.cond
    fallback branch of impl="stream".

    Query batches beyond QUERY_BLOCK are tiled on the grid's MAJOR axis
    (grid = (qblocks, chunks)): each query block's [qb, k, LANES] output
    window stays VMEM-resident while the chunk axis sweeps and accumulates
    (the same consecutive-revisit pattern as the untiled kernel), and the
    per-step VMEM footprint stays within the validated [qb, chunk]
    envelope. The corpus is re-read once per query block here — this is
    the rare fallback/second pass, where correctness beats traffic."""
    n_q = queries.shape[0]
    qb = (QUERY_BLOCK if n_q > QUERY_BLOCK and n_q % QUERY_BLOCK == 0
          else n_q)
    num_qb = n_q // qb
    gather_specs = [
        pl.BlockSpec((qb, queries.shape[1]), lambda j, i: (j, 0)),
        pl.BlockSpec((chunk_size, corpus.shape[1]), lambda j, i: (i, 0)),
        pl.BlockSpec((qb, k_eff), lambda j, i: (j, 0)),
    ]
    gather_ops = [queries, corpus, gsel]
    if scales is not None:
        s_op, s_spec = _scale_operand(scales, quant, num_chunks,
                                      groups_per_chunk, chunk_size,
                                      chunk_axis=1)
        gather_specs.append(s_spec)
        gather_ops.append(s_op)
    return pl.pallas_call(
        functools.partial(_gather_kernel,
                          groups_per_chunk=groups_per_chunk, k=k_eff,
                          quant=quant),
        grid=(num_qb, num_chunks),
        in_specs=gather_specs,
        out_specs=pl.BlockSpec((qb, k_eff, LANES), lambda j, i: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_q, k_eff, LANES), jnp.float32),
        interpret=interpret,
        **_compiler_params(interpret),
    )(*gather_ops)


def _final_select(cand, gsel, k_eff, n_valid, n_q, select, interpret):
    """Shared tail: mask padded/invalid rows, exact top-k over the S*128
    candidates (S = k_eff for the capture/gather impls, the window width
    for select="merge"), map candidate positions back to global row ids.

    Round-5 shape (probe_r9, chip, [256, 100, 128]): hier block=32 beats the
    former block-16 default (1.04 vs 1.22 ms) and the positions map back to
    rows ARITHMETICALLY through a tiny [Q, k] gather of ``gsel`` instead of
    materializing + gathering the [Q, S*128] row-id iota (ship vs arith)."""
    s = gsel.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_q, s, LANES), 2)
    rows3 = gsel[:, :, None] * LANES + lane
    cand = jnp.where(rows3 < n_valid, cand.reshape(n_q, s, LANES),
                     -jnp.inf).reshape(n_q, s * LANES)

    if select == "hier":
        vals, pos = hier_topk(cand, k_eff, block=32)
    else:
        vals, pos = topk_lastdim(cand, k_eff, interpret=interpret)
    gsel_win = jnp.take_along_axis(gsel, pos // LANES, axis=-1)
    idx = gsel_win * LANES + pos % LANES
    idx = jnp.where(jnp.isfinite(vals), idx, 0)
    return vals, idx


def _stream_body(queries, corpus, scales, quant, k_eff, chunk_size, n_valid,
                 interpret, select, n_q, num_chunks, groups,
                 groups_per_chunk, operands, on_miss: str = "fallback"):
    """impl="stream": one pallas pass emits gmax + per-chunk top-B capture;
    candidates are assembled from the capture when the on-device membership
    check passes, else a lax.cond re-scores the corpus (exact either way).

    Exactness: the global top-k groups by gmax contain all true top-k rows
    (the impl="single" superset argument). The capture holds the FULL
    128-lane scores of each chunk's top-B groups, so if every globally
    selected group was captured by its chunk, the assembled candidate set —
    and therefore the final selection, tie-breaking included — is identical
    to impl="single"'s. The check is structural (group-id membership), so
    ties and duplicate rows never produce a silently-wrong result; they at
    most force the fallback branch.
    """
    b = _capture_budget(k_eff, num_chunks, groups_per_chunk)
    capdom = select == "capdom"
    # In-kernel QUERY TILING (round 4): grid = (chunks, qblocks) with the
    # qblock axis MINOR, and the corpus window's index map ignoring it — so
    # Mosaic keeps each corpus chunk resident in VMEM while every query
    # block scores against it. A 1024-query batch reads the corpus ONCE
    # (the former lax.map blocking re-read all 2 GB per 256-query block:
    # 4x the HBM traffic of the tiled grid at 1M x 1024 bf16).
    qb = (QUERY_BLOCK if n_q > QUERY_BLOCK and n_q % QUERY_BLOCK == 0
          else n_q)
    num_qb = n_q // qb
    d_q = queries.shape[1]
    in_specs = [
        pl.BlockSpec((qb, d_q), lambda i, j: (j, 0)),
        pl.BlockSpec((chunk_size, corpus.shape[1]), lambda i, j: (i, 0)),
        (pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                      memory_space=pltpu.SMEM) if pltpu is not None
         else pl.BlockSpec((1, 1), lambda i, j: (0, 0))),
    ]
    if scales is not None:
        s_op, s_spec = _scale_operand(scales, quant, num_chunks,
                                      groups_per_chunk, chunk_size)
        in_specs.append(s_spec)
        operands = operands[:3] + [s_op]
    out_specs = [
        pl.BlockSpec((1, groups_per_chunk, qb), lambda i, j: (i, 0, j)),
        pl.BlockSpec((1, qb, b * LANES), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, b, qb), lambda i, j: (i, 0, j)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_chunks, groups_per_chunk, n_q),
                             jnp.float32),
        jax.ShapeDtypeStruct((num_chunks, n_q, b * LANES), jnp.float32),
        jax.ShapeDtypeStruct((num_chunks, b, n_q), jnp.int32),
    ]
    if capdom:
        out_specs += [
            pl.BlockSpec((1, b, qb), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, qb), lambda i, j: (i, 0, j)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((num_chunks, b, n_q), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, 1, n_q), jnp.float32),
        ]
    outs = pl.pallas_call(
        functools.partial(_stream_kernel, groups_per_chunk=groups_per_chunk,
                          chunk_size=chunk_size, b=b, quant=quant,
                          capdom=capdom),
        grid=(num_chunks, num_qb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **_compiler_params(interpret, parallel=True, grid_dims=2),
    )(*operands)
    gmax_out, cand_out, gid_out = outs[:3]
    cb = num_chunks * b
    gids = gid_out.transpose(2, 0, 1).reshape(n_q, cb)

    if capdom:
        return _capdom_tail(outs, gids, queries, corpus, scales, quant,
                            k_eff, chunk_size, n_valid, interpret, n_q,
                            num_chunks, groups, groups_per_chunk, b,
                            on_miss=on_miss)

    gmax = gmax_out.reshape(groups, n_q).T               # [Q, groups]
    if select == "hier":
        gvals, gsel = hier_topk(gmax, k_eff)
    else:
        gvals, gsel = topk_lastdim(gmax, k_eff, interpret=interpret)
    # ascending group order (candidates in global row order => stable final
    # top-k breaks ties toward the lower row id); keep gvals aligned
    order = jnp.argsort(gsel, axis=-1)
    gsel = jnp.take_along_axis(gsel, order, axis=-1)
    gvals = jnp.take_along_axis(gvals, order, axis=-1)

    cand_all = cand_out.reshape(num_chunks, n_q, b, LANES).transpose(
        1, 0, 2, 3).reshape(n_q, cb, LANES)

    # membership: every selected group must appear in its chunk's capture.
    # Group ids are globally unique and captured at most once, so `eq` has
    # at most one hit per (query, slot) and the one-hot assembly is exact.
    # Selected groups whose max is the FIN_MIN mask value carry no valid
    # rows (they only appear when fewer than k real groups exist locally,
    # e.g. a fully-invalid shard) — their rows are -inf-masked downstream,
    # so missing capture for them must not force the fallback.
    eq = gsel[:, :, None] == gids[:, None, :]            # [Q, k, C*B]
    found = jnp.any(eq, axis=-1)
    ok = jnp.all(found | (gvals <= FIN_MIN))

    def from_capture(_):
        return jax.lax.dot_general(
            eq.astype(jnp.float32), cand_all,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [Q, k, LANES]

    def from_corpus(_):
        return _twopass_gather(queries, corpus, gsel, scales, quant,
                               chunk_size, num_chunks, groups_per_chunk,
                               k_eff, interpret)

    if _STREAM_ASSERT_CAPTURE or on_miss == "flag":
        # test hook / flag mode: capture path unconditionally (flag callers
        # re-dispatch the checked program themselves when ok is False)
        cand = from_capture(None)
    else:
        cand = jax.lax.cond(ok, from_capture, from_corpus, None)
    vals, idx = _final_select(cand, gsel, k_eff, n_valid, n_q, select,
                              interpret)
    if on_miss == "flag":
        return vals, idx, ok
    return vals, idx


def _capdom_tail(outs, gids, queries, corpus, scales, quant, k_eff,
                 chunk_size, n_valid, interpret, n_q, num_chunks, groups,
                 groups_per_chunk, b, on_miss: str = "fallback"):
    """select="capdom": group selection in the CAPTURE domain.

    Instead of a top-k over all ``groups`` maxima followed by a membership
    check, select directly over the ``C*B`` peeled capture maxima (~1952 at
    1M rows/chunk 8192 vs 7813 group maxima) and prove exactness with a
    residual comparison: the kernel emits, per chunk, the max group score
    it did NOT capture; if the kth selected capture max is STRICTLY above
    every chunk's residual, then every group that could hold a true top-k
    row is captured AND selected (any group with gmax >= kth selected value
    beats all residuals, so it was captured; top-k over captures then keeps
    it). Strictness matters: at equality the globally-correct selection
    could prefer a lower-gid non-captured group (FAISS lower-row-id ties),
    so ties fall back to the exact global path.

    Tie order inside the capture domain matches the global rule by
    construction: flattened [C, B] order is chunk-ascending (= gid
    ascending) and `_topb_ids` peels equal values lowest-gid-first, so
    `lax.top_k`'s stable lowest-index tie-break composes to lowest-gid.

    The fallback branch re-selects over the full group maxima and gathers
    by re-scoring the corpus — bitwise the ordinary exact path.
    """
    gmax_out, cand_out, gid_out, capmax_out, resid_out = outs
    cb = num_chunks * b
    capmax = capmax_out.transpose(2, 0, 1).reshape(n_q, cb)  # [Q, C*B]
    cvals, cpos = jax.lax.top_k(capmax, k_eff)
    resid = jnp.max(resid_out[:, 0, :], axis=0)              # [Q]
    # resid <= FIN_MIN: nothing real was left uncaptured anywhere (fully
    # captured chunks peel to -inf; fully-masked tails clamp to FIN_MIN and
    # carry no valid rows), so the capture holds every real group
    ok = jnp.all((cvals[:, -1] > resid) | (resid <= FIN_MIN))

    # ascending group order => stable final top-k ties to the lower row id.
    # probe_r9b: lax.top_k here is 0.05 ms but the former gid plumbing
    # (gather gids + argsort + two reorder gathers) was 0.68 ms of
    # small-gather latency. Pack (gid * PACK + position) ELEMENTWISE before
    # selection, then one gather + one sort + arithmetic unpack does the
    # same reorder: gids are non-negative and unique per query (a group is
    # captured at most once), so sorting the packed keys sorts by gid.
    pack = 1 << (cb - 1).bit_length()                        # static
    if groups * pack < 2 ** 31:
        packed = gids * pack + jax.lax.broadcasted_iota(
            jnp.int32, (n_q, cb), 1)
        sel = jnp.take_along_axis(packed, cpos, axis=-1)
        sel = jnp.sort(sel, axis=-1)
        gsel_cap = sel // pack
        cpos = sel % pack
    else:  # >2M-group shards would overflow int32 packing: original path
        gsel_cap = jnp.take_along_axis(gids, cpos, axis=-1)
        order = jnp.argsort(gsel_cap, axis=-1)
        gsel_cap = jnp.take_along_axis(gsel_cap, order, axis=-1)
        cpos = jnp.take_along_axis(cpos, order, axis=-1)

    def from_capture(_):
        if CAPDOM_ASSEMBLY == "pallas":
            # streaming one-hot blend in VMEM (no [Q, k, C*B] HBM one-hot)
            cand = _cap_assemble(cpos, cand_out, num_chunks, b, k_eff, n_q,
                                 interpret)
            return cand, gsel_cap
        eq = cpos[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (n_q, k_eff, cb), 2)
        # contraction on the capture's NATIVE [C, Q, B, L] layout: XLA fuses
        # the transpose into the dot (probe_r4d v_einsum)
        eq4 = eq.reshape(n_q, k_eff, num_chunks, b).astype(jnp.float32)
        cand4 = cand_out.reshape(num_chunks, n_q, b, LANES)
        cand = jnp.einsum("qkcb,cqbl->qkl", eq4, cand4,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return cand, gsel_cap

    def from_global(_):
        gmax = gmax_out.reshape(groups, n_q).T               # [Q, groups]
        _, gsel = hier_topk(gmax, k_eff)
        gsel = jnp.sort(gsel, axis=-1)
        cand = _twopass_gather(queries, corpus, gsel, scales, quant,
                               chunk_size, num_chunks, groups_per_chunk,
                               k_eff, interpret)
        return cand, gsel

    if _STREAM_ASSERT_CAPTURE or on_miss == "flag":
        cand, gsel = from_capture(None)
    else:
        cand, gsel = jax.lax.cond(ok, from_capture, from_global, None)
    vals, idx = _final_select(cand, gsel, k_eff, n_valid, n_q, "hier",
                              interpret)
    if on_miss == "flag":
        return vals, idx, ok
    return vals, idx


def _merge_geometry(k_eff: int, num_chunks: int, groups_per_chunk: int,
                    n_q: int):
    """(bc, br, qb) for select="merge" — ONE definition shared by the
    window-VMEM degrade guard in :func:`_exact_body` and the kernel setup
    in :func:`_merge_body`, so the guard can never drift from what the
    kernel actually allocates."""
    bc = _capture_budget(k_eff, num_chunks, groups_per_chunk)
    br = max(-(-k_eff // 8) * 8, bc)
    qb = (QUERY_BLOCK if n_q > QUERY_BLOCK and n_q % QUERY_BLOCK == 0
          else n_q)
    return bc, br, qb


def _merge_body(queries, corpus, scales, quant, k_eff, chunk_size, n_valid,
                interpret, n_q, num_chunks, groups, groups_per_chunk):
    """select="merge": running in-kernel top-``br`` window (round 5).

    One pallas pass emits the final candidate window directly (payload +
    keys + gids, already gid-sorted) — no capture matrix, no assembly.
    Exactness: the window is exactly the top-``br`` (>= k) groups among
    those each chunk captured, under the strict (value desc, gid asc)
    order. A true top-k group can only be missing if it was (a) never
    captured by its chunk or (b) ejected from the window; both events
    record the group's max in ``lost``. If the k-th window key strictly
    beats every lost value, no such group can rank at or above the k-th
    selected group, so the window's top-k groups are the global top-k
    groups and the assembled rows match impl="single" bit-for-bit. At
    equality the globally-correct selection could prefer a lower-gid lost
    group (FAISS lower-row-id ties), so ties fall back — identically to
    select="capdom"'s residual rule, extended with ejections.

    The fallback branch re-selects over the full group maxima (still
    emitted: ~2% of corpus bytes) and re-scores the corpus — bitwise the
    ordinary exact path."""
    bc, br, qb = _merge_geometry(k_eff, num_chunks, groups_per_chunk, n_q)
    num_qb = n_q // qb
    d_q = queries.shape[1]
    in_specs = [
        pl.BlockSpec((qb, d_q), lambda j, i: (j, 0)),
        pl.BlockSpec((chunk_size, corpus.shape[1]), lambda j, i: (i, 0)),
        (pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                      memory_space=pltpu.SMEM) if pltpu is not None
         else pl.BlockSpec((1, 1), lambda j, i: (0, 0))),
    ]
    valid_arr = jnp.asarray(n_valid, dtype=jnp.int32).reshape(1, 1)
    operands = [queries, corpus, valid_arr]
    if scales is not None:
        s_op, s_spec = _scale_operand(scales, quant, num_chunks,
                                      groups_per_chunk, chunk_size,
                                      chunk_axis=1)
        in_specs.append(s_spec)
        operands.append(s_op)
    out_specs = [
        pl.BlockSpec((1, groups_per_chunk, qb), lambda j, i: (i, 0, j)),
        pl.BlockSpec((qb, br, LANES), lambda j, i: (j, 0, 0)),
        pl.BlockSpec((qb, br), lambda j, i: (j, 0)),
        pl.BlockSpec((qb, br), lambda j, i: (j, 0)),
        pl.BlockSpec((1, 1, qb), lambda j, i: (i, 0, j)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_chunks, groups_per_chunk, n_q),
                             jnp.float32),
        jax.ShapeDtypeStruct((n_q, br, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_q, br), jnp.float32),
        jax.ShapeDtypeStruct((n_q, br), jnp.int32),
        jax.ShapeDtypeStruct((num_chunks, 1, n_q), jnp.float32),
    ]
    gmax_out, win, wkey, wgid, lost_out = pl.pallas_call(
        functools.partial(_merge_kernel, groups_per_chunk=groups_per_chunk,
                          chunk_size=chunk_size, bc=bc, br=br,
                          num_chunks=num_chunks, total_groups=groups,
                          quant=quant),
        grid=(num_qb, num_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        # chunk axis carries the window dependency: NOT parallel
        **_compiler_params(interpret),
    )(*operands)

    lost = jnp.max(lost_out[:, 0, :], axis=0)            # [Q]
    kth = jax.lax.top_k(wkey, k_eff)[0][:, -1]           # [Q]
    ok = jnp.all((kth > lost) | (lost <= FIN_MIN))

    def from_window(_):
        return win, wgid

    def from_global(_):
        gmax = gmax_out.reshape(groups, n_q).T           # [Q, groups]
        _, gsel = hier_topk(gmax, k_eff)
        gsel = jnp.sort(gsel, axis=-1)
        cand = _twopass_gather(queries, corpus, gsel, scales, quant,
                               chunk_size, num_chunks, groups_per_chunk,
                               k_eff, interpret)
        # pad to the window width so both cond branches agree; sentinel
        # gids map to rows >= n_valid, masked in _final_select
        pad = br - k_eff
        cand = jnp.pad(cand, ((0, 0), (0, pad), (0, 0)))
        gsel = jnp.pad(gsel, ((0, 0), (0, pad)), constant_values=groups)
        return cand, gsel

    if _STREAM_ASSERT_CAPTURE:
        cand, gsel = from_window(None)
    else:
        cand, gsel = jax.lax.cond(ok, from_window, from_global, None)
    return _final_select(cand, gsel, k_eff, n_valid, n_q, "hier", interpret)


_STREAM_ASSERT_CAPTURE = False  # see _stream_body; tests only

# capdom candidate assembly: "einsum" is the XLA one-hot form; "pallas"
# streams the capture once through _cap_assemble_kernel with the one-hot in
# VMEM. Results are bit-identical; only the schedule differs. On-chip A/B at
# 1M x 1024 (bench_select_ab_results.jsonl, r5): einsum 7.41 ms/batch vs
# pallas 9.80 — the kernel's revisited [Q, k, 128] f32 output ref writes
# back ~13 MB on every one of the 123 chunk steps (~1.6 GB), dwarfing the
# einsum's one-shot 208 MB HBM one-hot. Default: the measured winner.
CAPDOM_ASSEMBLY = os.environ.get("KIRAG_CAPDOM_ASSEMBLY", "einsum")


QUERY_BLOCK = 256  # the validated VMEM envelope's query-batch unit
# stream impl: max query blocks tiled on one kernel grid (one corpus read
# covers QUERY_BLOCK * STREAM_QTILE queries; beyond that, lax.map over
# super-tiles bounds the [C, Q, B*128] capture buffer and the tail's
# [Q, k, C*B] one-hot working set)
STREAM_QTILE = 4


@functools.partial(jax.jit,
                   static_argnames=("k", "chunk_size", "valid_rows",
                                    "interpret", "select", "impl", "quant",
                                    "on_miss"))
def _exact_topk_jit(queries, corpus, k, chunk_size, valid_rows, interpret,
                    scales, select="flat", impl="single", quant=None,
                    on_miss="fallback"):
    n = corpus.shape[0]
    n_valid = n if valid_rows is None else valid_rows
    k_eff = min(k, n)
    n_q = queries.shape[0]
    ok = jnp.asarray(True)
    if n_q > QUERY_BLOCK and n_q % QUERY_BLOCK == 0:
        # large query batches: queries are independent. The stream kernel
        # tiles query blocks on its own grid's minor axis (one corpus read
        # for up to STREAM_QTILE query blocks — see _stream_body); for it,
        # lax.map only over SUPER-tiles beyond that. The other impls run
        # the fast QUERY_BLOCK-sized program per block under lax.map (one
        # compile, one dispatch, per-block VMEM footprint) instead of
        # degrading the whole batch to a smaller chunk / the twopass
        # fallback.
        n_blocks = n_q // QUERY_BLOCK
        if impl == "stream" and select != "merge":
            group = next(g for g in range(min(STREAM_QTILE, n_blocks), 0, -1)
                         if n_blocks % g == 0)
        else:
            # merge: the window revisit needs the chunk axis minor, which
            # re-reads the corpus per query block — tile by single blocks
            # (capdom's one-read tiling wins beyond QUERY_BLOCK queries)
            group = 1
        tile = QUERY_BLOCK * group
        if tile == n_q:
            out = _exact_body(queries, corpus, k_eff, chunk_size,
                              n_valid, interpret, scales,
                              select=select, impl=impl, quant=quant,
                              on_miss=on_miss)
            vals, idx = out[:2]
            if on_miss == "flag":
                ok = out[2]
        else:
            blocks = queries.reshape(n_q // tile, tile, -1)
            out = jax.lax.map(
                lambda q: _exact_body(q, corpus, k_eff, chunk_size, n_valid,
                                      interpret, scales, select=select,
                                      impl=impl, quant=quant,
                                      on_miss=on_miss), blocks)
            vals = out[0].reshape(n_q, k_eff)
            idx = out[1].reshape(n_q, k_eff)
            if on_miss == "flag":
                ok = jnp.all(out[2])
    else:
        out = _exact_body(queries, corpus, k_eff, chunk_size, n_valid,
                          interpret, scales, select=select, impl=impl,
                          quant=quant, on_miss=on_miss)
        vals, idx = out[:2]
        if on_miss == "flag":
            ok = out[2]
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)),
                       constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    if on_miss == "flag":
        return vals, idx, ok
    return vals, idx


def exact_topk_mips(queries: jnp.ndarray, corpus: jnp.ndarray, k: int,
                    chunk_size: int = 4096,
                    valid_rows: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    scales: Optional[jnp.ndarray] = None,
                    select: str = "flat",
                    impl: str = "auto",
                    quant: Optional[str] = None,
                    on_miss: str = "fallback") -> Tuple[jnp.ndarray, ...]:
    """Exact top-k inner-product search, fully fused on TPU.

    Same contract as :func:`kirag_tpu.ops.mips.topk_mips` (which is the test
    oracle): (values [Q, k] f32, indices [Q, k] int32), descending, ties to
    the lower row id. ``scales`` enables quantized corpora, matching the
    dequantized oracle: [N] f32 per-row factors for an int8 corpus, or
    [N, D/128] f32 per-block factors for a packed-int4 uint8 corpus
    (:func:`kirag_tpu.ops.quantized.quantize_rows_int4`).

    ``impl="stream"`` (the round-4 default for ``auto``): one corpus read,
    scores never leave VMEM — per-chunk top-B capture with an on-device
    membership check and a lax.cond twopass fallback (see
    :func:`_stream_body` for the exactness argument). ``impl="single"``:
    the round-3 kernel — the fused scoring pass materializes f32 scores +
    group maxima; candidates come from a one-hot-kernel gather of the score
    matrix (HBM cost: corpus bytes + 2x 4*Q*N score traffic).
    ``impl="twopass"``: the round-2 kernel pair (corpus read twice) for
    query batches whose [Q, chunk] score window busts the VMEM envelope.

    ``on_miss="flag"`` returns ``(vals, idx, ok)``: the stream impl skips its
    in-program lax.cond fallback (whose presence alone costs ~0.7 ms/batch at
    the 1M x 1024 flagship shape — probe_r8 capfin) and instead reports
    exactness in the scalar bool ``ok``. A False flag means the caller must
    re-dispatch with ``on_miss="fallback"`` to get exact results (the
    indexer's host-side search_knn does; see TPUIndexer._run_mips).
    """
    interpret = _resolve_interpret(interpret)
    _check_select(select)
    if on_miss not in ("fallback", "flag"):
        raise ValueError(f"on_miss must be fallback|flag, got {on_miss!r}")
    if quant == "pq4":
        # scales = the [16, D] level table (ops/pq.pq_level_table); the
        # query dim and the per-plane slice widths must stay lane-aligned
        # for the Mosaic window slicing in _chunk_scores
        m2 = corpus.shape[1]
        if scales is None or scales.shape[0] != 16 or scales.shape[1] % (
                2 * m2) != 0:
            raise ValueError(
                "pq4 needs a [16, D] level table with D % (2 * packed cols) "
                f"== 0; got codes {corpus.shape}, table "
                f"{None if scales is None else scales.shape}")
        if not interpret and (m2 % LANES != 0 or queries.shape[1] % LANES != 0):
            raise ValueError(
                "on-TPU pq4 needs m/2 and dim lane-aligned (m % 256 == 0, "
                f"dim % 128 == 0); got m={2 * m2}, dim={queries.shape[1]}")
    elif scales is not None and scales.ndim == 2:
        d_packed = corpus.shape[1]
        if 2 * d_packed % 256 != 0 or scales.shape[1] != 2 * d_packed // 128:
            raise ValueError(
                "int4 corpora need dim % 256 == 0 and [N, dim/128] scales; "
                f"got packed {corpus.shape} with scales {scales.shape}")
    # round DOWN to a LANES multiple (a stray chunk like 1000 would break the
    # in-kernel [Q, G, LANES] reshape with an opaque trace error), then clamp
    requested_chunk = chunk_size
    chunk_size = max(LANES, (chunk_size // LANES) * LANES)
    chunk_size = min(chunk_size, -(-corpus.shape[0] // LANES) * LANES)
    chunk_size = _clamp_chunk_for_corpus_window(chunk_size, corpus)
    if select == "merge":
        chunk_size = _clamp_chunk_for_corpus_window(
            chunk_size, corpus, budget=32 * 1024 * 1024)
    n_q = queries.shape[0]
    # QUERY_BLOCK-multiple batches run blockwise under lax.map (see
    # _exact_topk_jit), so VMEM sizing follows the block, not the batch
    eff_q = (QUERY_BLOCK if n_q > QUERY_BLOCK and n_q % QUERY_BLOCK == 0
             else n_q)
    chunk_size = _clamp_chunk_for_queries(chunk_size, eff_q)
    if chunk_size != requested_chunk:
        _warn_chunk_clamped(
            requested_chunk, chunk_size,
            f"corpus rows {corpus.shape[0]}, eff queries {eff_q}: the "
            "[Q, chunk] score block + corpus window must fit the validated "
            "VMEM envelope")
    impl = _resolve_impl(impl, eff_q, corpus.shape[0],
                         corpus.nbytes, chunk_size)
    return _exact_topk_jit(queries, corpus, k, chunk_size, valid_rows,
                           interpret, scales, select=select, impl=impl,
                           quant=quant, on_miss=on_miss)


def _clamp_chunk_for_queries(chunk_size: int, n_queries: int) -> int:
    """Every kernel variant holds a [Q, chunk] f32 score block in VMEM;
    large query batches must trade chunk size for it (Q=1024 at chunk 16384
    measured a 138 MB VMEM requirement vs the 128 MB capacity). Keep
    Q * chunk within the validated Q=256 x 16384 envelope.

    The clamped chunk is chosen among DIVISORS of the requested chunk, so a
    corpus pre-padded to the requested chunk grid (TPUIndexer.to_device)
    still divides evenly and never re-pads inside jit — a full read+write
    copy of the corpus per call (~5.8 ms at 1M x 1024, the round-3 lesson).
    A 128-multiple divisor always exists because chunk_size is pre-rounded
    to a 128 multiple."""
    budget = 256 * 16384
    if n_queries * chunk_size <= budget:
        return chunk_size
    target = max(LANES, budget // max(n_queries, 1))
    best = LANES
    d = LANES
    while d <= target:
        if chunk_size % d == 0:
            best = d
        d += LANES
    return best


def _clamp_chunk_for_corpus_window(chunk_size: int, corpus: jnp.ndarray,
                                   budget: int = 64 * 1024 * 1024) -> int:
    """Bound the kernel's corpus input window, not just the score block.

    Every variant streams a ``[chunk, D]`` corpus window into VMEM with 2
    buffering levels, so the window costs ``2 * chunk * D * itemsize`` bytes.
    The Q=256 x chunk=16384 envelope was validated on bf16/int8 corpora
    (window <= 64 MB); an f32 corpus at d=1024 doubles that to 128 MB and
    OOMs VMEM outright (measured: 128.85M of 128.00M, bench_kirag_batched
    r4 with a 114688 x 1024 f32 corpus). Keep the window within the 64 MB
    validated budget by shrinking the chunk for wide dtypes.

    Like :func:`_clamp_chunk_for_queries`, the result is a divisor of the
    requested chunk so pre-padded corpus grids (TPUIndexer.to_device) still
    divide evenly and never re-pad inside jit. select="merge" passes a
    halved ``budget``: its [Q, br, 128] f32 window plus the final-sort
    permutation scratch add ~25 MB of VMEM next to the corpus window."""
    row_bytes = 2 * corpus.shape[-1] * corpus.dtype.itemsize
    if chunk_size * row_bytes <= budget:
        return chunk_size
    target = max(LANES, budget // row_bytes)
    best = LANES
    d = LANES
    while d <= target:
        if chunk_size % d == 0:
            best = d
        d += LANES
    return best


def _resolve_impl(impl: str, n_queries: int, rows: int, nbytes: int,
                  chunk_size: int = 8192) -> str:
    """auto = "stream" (one corpus read, no score-matrix HBM traffic, exact
    via membership check + in-jit fallback) whenever the [Q, chunk] score
    window fits the validated VMEM envelope, else the corpus-read-twice
    kernel. "single"/"single_strided" (score matrix in HBM) remain for A/B;
    note single additionally needs 4*Q*N score bytes free in HBM.
    ``rows``/``nbytes`` are PER-DEVICE (the local shard when sharded)."""
    if impl not in ("auto", "stream", "single", "single_strided", "twopass"):
        raise ValueError(f"impl must be auto|stream|single|single_strided|"
                         f"twopass, got {impl!r}")
    if impl != "auto":
        return impl
    if n_queries > 512 or n_queries * chunk_size > 256 * 16384:
        # VMEM envelope: every single-read kernel holds a [Q, chunk] f32
        # score block in VMEM next to the (x2-buffered) corpus window.
        # Measured: Q=256/chunk=16384 compiles and runs; Q=1024/chunk=8192
        # OOMs (probe_r3) — Q*chunk <= 256*16384 is the validated envelope
        return "twopass"
    return "stream"


def _check_select(select: str) -> None:
    if select not in ("flat", "hier", "capdom", "merge"):
        raise ValueError(f"select must be 'flat', 'hier', 'capdom' or "
                         f"'merge', got {select!r}")


def sharded_exact_topk_mips(queries: jnp.ndarray, corpus_sharded: jnp.ndarray,
                            k: int, mesh: Mesh, axis: str = "data",
                            chunk_size: int = 4096,
                            valid_rows: Optional[int] = None,
                            interpret: Optional[bool] = None,
                            scales: Optional[jnp.ndarray] = None,
                            impl: str = "auto",
                            select: str = "flat",
                            quant: Optional[str] = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused exact top-k over a corpus row-sharded across ``mesh[axis]``:
    per-shard fused search with global row ids, candidates all-gathered over
    ICI, one final top-k (identical merge to the other sharded paths)."""
    interpret = _resolve_interpret(interpret)
    n_total = corpus_sharded.shape[0]
    n_valid = n_total if valid_rows is None else valid_rows
    num_shards = mesh.shape[axis]
    assert n_total % num_shards == 0, "corpus rows must divide the mesh axis"
    shard_rows = n_total // num_shards
    k_eff = min(k, shard_rows)
    local_chunk = max(LANES, (chunk_size // LANES) * LANES)
    local_chunk = min(local_chunk, -(-shard_rows // LANES) * LANES)
    local_chunk = _clamp_chunk_for_corpus_window(local_chunk, corpus_sharded)
    _check_select(select)
    if select == "merge":
        local_chunk = _clamp_chunk_for_corpus_window(
            local_chunk, corpus_sharded, budget=32 * 1024 * 1024)
    local_chunk = _clamp_chunk_for_queries(local_chunk, queries.shape[0])
    # per-shard budget: local corpus rows/bytes (same guards as unsharded)
    impl = _resolve_impl(impl, queries.shape[0], shard_rows,
                         corpus_sharded.nbytes // num_shards, local_chunk)

    def local_search(q_local, corpus_local, *scale_args):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * shard_rows
        local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
        local_scales = scale_args[0] if scale_args else None
        vals, idx = _exact_body(q_local, corpus_local, k_eff, local_chunk,
                                local_valid, interpret, local_scales,
                                select=select, impl=impl, quant=quant)
        idx = idx + offset
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, min(k, n_total))
        return top_vals, jnp.take_along_axis(all_idx, pos, axis=-1)

    in_specs = [PartitionSpec(), PartitionSpec(axis)]
    operands = [queries, corpus_sharded]
    if scales is not None:
        # per-row scale arrays shard with their rows; the pq4 level table
        # is row-invariant and replicates
        in_specs.append(PartitionSpec() if quant == "pq4"
                        else PartitionSpec(axis))
        operands.append(scales)
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(PartitionSpec(), PartitionSpec()),
        # outputs ARE replicated (all_gather + identical top_k on each shard)
        check_vma=False,
    )
    vals, idx = fn(*operands)
    k_got = vals.shape[1]
    if k_got < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_got)),
                       constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_got)))
    return vals, idx
