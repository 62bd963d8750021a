"""Pallas weight-only int4 matmul for decode: y = x @ dequant(packed, scales).

Why this kernel exists: weight-only int4 decode is HBM-bandwidth-bound, and
XLA cannot fuse the blockwise dequant (``reshape(nb, 64, out) * scale`` or
any equivalent) into a matmul operand — it materializes the dequantized
kernel in bf16 every step, so the int4 path *read packed bytes + wrote and
re-read a full bf16 kernel*, measured SLOWER than int8 (8B geometry: 37.8 ms
vs int8's 11.5 ms/step, r4 chip rows in benchmarks/bench_decode_results.jsonl;
the int8 path's per-output-channel scale commutes with the contraction so XLA
fuses it — the int4 per-input-block scale does not). Here the nibbles are
unpacked and dequantized in VMEM: HBM traffic is exactly the packed bytes +
scales, the speed-of-light for 4-bit weights (~4x bf16, ~2x int8).

Format (shared with :func:`kirag_tpu.models.llm._quantize_kernel_int4`, the
TPU analogue of the reference's NF4 block-64 loading at
`utils/pipeline_utils.py:6-24`):
  packed [in/2, out] uint8 — two signed nibbles per byte along the input dim
    (low nibble = original row 2i, high = row 2i+1, values in [-7, 7])
  scales [in/64, out] f32 — one scale per (64-input-row block, out channel)

Kernel structure: grid over (out blocks, input blocks), the output block
revisited across input steps (standard accumulate pattern). Each step loads a
[bh, bo] packed tile, sign-extends both nibbles with int32 shifts, and runs
one small matmul per 32-packed-row sub-block (= one 64-input-row scale block)
against the pre-deinterleaved activations, scaling each partial product by
its block's [1, bo] scale row in f32 — the same scale-the-partials trick the
exact-search kernel uses for int4 corpora (ops/pallas_exact._matmul_scores),
so the block scale never rounds through bf16 and no dequantized tile is ever
written anywhere.

The activations are tiny at decode (batch x 1 rows), so deinterleaving them
into even/odd input columns OUTSIDE the kernel costs nothing and lets each
nibble plane hit the MXU directly with unit stride.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

SUB = 32          # packed rows per scale block (= 64 original rows / 2)
_LANES = 128


def _lut16(idx, cb_vals):
    """16-entry codebook lookup of int32 indices via a balanced select tree
    on the 4 index bits (15 vector selects — TPUs have no per-element
    gather; bnb's CUDA kernel does this lookup in registers). ``cb_vals`` is
    a list of 16 f32 SCALARS (SMEM reads), so every select is
    vector-predicate x scalar-operands."""
    b0 = (idx & 1) == 1
    lvl = [jnp.where(b0, cb_vals[i + 1], cb_vals[i]) for i in range(0, 16, 2)]
    b1 = (idx & 2) == 2
    lvl = [jnp.where(b1, lvl[i + 1], lvl[i]) for i in range(0, 8, 2)]
    b2 = (idx & 4) == 4
    lvl = [jnp.where(b2, lvl[i + 1], lvl[i]) for i in range(0, 4, 2)]
    return jnp.where((idx & 8) == 8, lvl[1], lvl[0])


def _qmm_kernel(xe_ref, xo_ref, pk_ref, s_ref, *rest, bh: int, bo: int,
                with_cb: bool):
    if with_cb:
        cb_ref, o_ref = rest
    else:
        (o_ref,) = rest
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    p = pk_ref[...].astype(jnp.int32)                      # [bh, bo]
    if with_cb:
        # NF4: unsigned nibble indices -> codebook values (f32 lookup, then
        # one rounding to bf16 — matching _dense's take(cb32, idx).astype)
        cb_vals = [cb_ref[0, t] for t in range(16)]
        lo = _lut16(p & 0xF, cb_vals)
        hi = _lut16((p >> 4) & 0xF, cb_vals)
    else:
        lo = (p << 28) >> 28                               # even rows, signed
        hi = (p << 24) >> 28                               # odd rows (arith)
    lo = lo.astype(jnp.bfloat16)
    hi = hi.astype(jnp.bfloat16)
    xe = xe_ref[...]                                       # [B8, bh] bf16
    xo = xo_ref[...]

    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
    for sb in range(bh // SUB):
        sl = slice(sb * SUB, (sb + 1) * SUB)
        part = jax.lax.dot_general(
            xe[:, sl], lo[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        part = part + jax.lax.dot_general(
            xo[:, sl], hi[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + part * s_ref[sb:sb + 1, :]             # [1, bo] f32 scale
    o_ref[...] += acc


def _pick_block(dim: int, candidates) -> Optional[int]:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def supported(half: int, out_dim: int) -> bool:
    """True when the kernel's block grid can tile this [in/2, out] kernel."""
    return (_pick_block(half, (512, 256)) is not None
            and _pick_block(out_dim, (512, 256, 128)) is not None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                codebook: Optional[jnp.ndarray] = None,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """``x [..., in] @ dequant(packed [in/2, out], scales [in/64, out])``.

    ``x.shape[-1]`` must equal ``2 * packed.shape[0]`` (callers pad, as
    :func:`kirag_tpu.models.llm._dense` already does for the XLA path).
    Output is ``x.dtype`` with f32 accumulation, bit-matching the XLA
    nibble-parity path's numerics (same per-block f32 partial scaling).
    ``codebook`` ([16] f32, e.g. NF4) switches the nibbles from signed
    integers to unsigned indices dequantized in-VMEM via a select tree.
    """
    if interpret is None:  # resolved at trace time; stable per process
        interpret = jax.default_backend() != "tpu"
    half, out_dim = packed.shape
    lead = x.shape[:-1]
    in_dim = x.shape[-1]
    if in_dim != 2 * half:
        raise ValueError(f"x last dim {in_dim} != 2 * packed rows {half}")
    bh = _pick_block(half, (512, 256))
    bo = _pick_block(out_dim, (512, 256, 128))
    if bh is None or bo is None:
        raise ValueError(f"unsupported tiling for [in/2={half}, out={out_dim}]")

    b = 1
    for d in lead:
        b *= d
    b8 = max(8, -(-b // 8) * 8)
    xf = x.reshape(b, in_dim)
    if b8 != b:
        xf = jnp.pad(xf, ((0, b8 - b), (0, 0)))
    xe = xf[:, 0::2]                                       # [b8, half]
    xo = xf[:, 1::2]

    grid = (out_dim // bo, half // bh)
    in_specs = [
        pl.BlockSpec((b8, bh), lambda i, k: (0, k)),
        pl.BlockSpec((b8, bh), lambda i, k: (0, k)),
        pl.BlockSpec((bh, bo), lambda i, k: (k, i)),
        pl.BlockSpec((bh // SUB, bo), lambda i, k: (k, i)),
    ]
    operands = [xe, xo, packed, scales.astype(jnp.float32)]
    if codebook is not None:
        cb = jnp.asarray(codebook, jnp.float32).reshape(1, 16)
        in_specs.append(
            pl.BlockSpec((1, 16), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM)
            if (pltpu is not None and not interpret)
            else pl.BlockSpec((1, 16), lambda i, k: (0, 0)))
        operands.append(cb)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, bh=bh, bo=bo,
                          with_cb=codebook is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b8, bo), lambda i, k: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b8, out_dim), jnp.float32),
        interpret=interpret,
        **({} if (pltpu is None or interpret) else {
            # out blocks are independent; the input axis accumulates
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024)}),
    )(*operands)
    return out[:b].reshape(*lead, out_dim).astype(x.dtype)
