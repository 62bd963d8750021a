"""Product quantization (PQ) for corpus embeddings — the TPU-native answer to
FAISS ``IndexPQ(n_subquantizers, n_bits)`` (`/root/reference/retriever/index.py:19-24`).

Role: sub-int4 memory points. Scalar int4 stores D/2 bytes + scales per row
(8x vs f32); PQ at m subquantizers stores m/2 bytes (two 4-bit codes per
byte) — e.g. 32x vs f32 at D=1024, m=256 — so 100M+-row corpora fit one
chip's HBM.

TPU-native design (what replaces FAISS's CPU LUT-ADC scan):

- **Strided subspaces.** Subspace ``s`` owns the dims ``{j*m + s : j < ds}``
  (``ds = D / m``) rather than FAISS's contiguous blocks. The partition is
  ours to choose (codebooks are trained for it), and this one makes the
  decode land on the kernel's native layout: component ``j`` of every
  subspace forms the contiguous column block ``[j*m, (j+1)*m)``, so scoring
  needs NO per-element gather, transpose, or code widening — the classic
  reasons PQ is "a CPU/GPU trick" — and as a bonus each subspace samples
  decorrelated dims instead of one contiguous (often correlated) slice.
- **nbits = 4 (K = 16 centroids/subspace).** Decode is then a 16-entry
  lookup = a 15-select balanced tree on the code bits (the NF4 trick,
  :func:`kirag_tpu.ops.pallas_qmm._lut16`) — ~15 VPU ops per reconstructed
  element, the same class as int4's nibble unpack. K = 256 would force
  either 255 selects or a one-hot matmul costing K*D MXU FLOPs per row
  (measured class: seconds per 1M rows) — a written no. An 8-bit request
  (FAISS's default) maps to 2x the subquantizers at 4 bits: equal bytes per
  row, comparable recall, device-rate decode.
- Scoring runs inside the exact-search kernels (quant="pq4" in
  :mod:`kirag_tpu.ops.pallas_exact`): per chunk, 2*ds select-tree lookups
  of the packed nibble planes against the [16, D] level table, then one
  [Q, m/2] x [m/2, CHUNK] MXU partial per (component, plane) accumulated in
  f32 — decode never leaves VMEM, HBM reads exactly the m/2 packed bytes.

Training is Lloyd k-means, vmapped across all m subspaces at once on device
(every iteration is one batched assign-matmul + one segment-sum), seeded by
distinct sample rows.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

K = 16          # centroids per subspace (4-bit codes; see module docstring)
NBITS = 4


def subspace_view(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """[N, D] -> [m, N, ds] under the strided-subspace partition
    (subspace s = dims {j*m + s})."""
    n, d = x.shape
    ds = d // m
    return x.reshape(n, ds, m).transpose(2, 0, 1)     # [m, N, ds]


@functools.partial(jax.jit, static_argnames=("m", "iters"))
def _train_jit(sample: jnp.ndarray, m: int, iters: int, key) -> jnp.ndarray:
    sub = subspace_view(sample.astype(jnp.float32), m)     # [m, N, ds]
    n = sub.shape[1]
    init_rows = jax.random.choice(key, n, shape=(K,), replace=False)
    cent = sub[:, init_rows, :]                            # [m, K, ds]

    def assign(cent):
        # nearest centroid by ||x||^2-free argmin: max of x.c - ||c||^2/2;
        # ties to the lower centroid id (argmax is lowest-index on ties)
        scores = jnp.einsum("mnd,mkd->mnk", sub, cent)
        scores = scores - 0.5 * jnp.sum(cent * cent, axis=-1)[:, None, :]
        return jnp.argmax(scores, axis=-1)                 # [m, N]

    def step(cent, _):
        code = assign(cent)
        onehot = jax.nn.one_hot(code, K, dtype=jnp.float32)  # [m, N, K]
        counts = jnp.sum(onehot, axis=1)                     # [m, K]
        sums = jnp.einsum("mnk,mnd->mkd", onehot, sub)
        # empty clusters keep their previous centroid
        new = jnp.where(counts[:, :, None] > 0,
                        sums / jnp.maximum(counts, 1.0)[:, :, None], cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


def train_pq(sample: np.ndarray, m: int, iters: int = 25,
             seed: int = 0) -> np.ndarray:
    """Lloyd k-means per subspace -> codebooks [m, K, ds] f32 (values snapped
    to bf16-representable, so every decode path — XLA oracle, kernel select
    tree, MXU matmul — sees identical numbers)."""
    n, d = sample.shape
    _check_geometry(d, m)
    if n < K:
        raise ValueError(f"need at least {K} training rows, got {n}")
    import ml_dtypes

    cent = np.asarray(_train_jit(jnp.asarray(sample, jnp.float32), m, iters,
                                 jax.random.key(seed)))
    return cent.astype(ml_dtypes.bfloat16).astype(np.float32)


def _check_geometry(d: int, m: int) -> None:
    if m < 2 or m % 2 != 0 or d % m != 0:
        raise ValueError(
            f"PQ needs an even subquantizer count dividing dim; got m={m}, "
            f"dim={d}")


@functools.partial(jax.jit, static_argnames=())
def _encode_jit(x: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    m = codebooks.shape[0]
    sub = subspace_view(x.astype(jnp.float32), m)          # [m, N, ds]
    scores = jnp.einsum("mnd,mkd->mnk", sub, codebooks)
    scores = scores - 0.5 * jnp.sum(codebooks * codebooks, axis=-1)[:, None, :]
    code = jnp.argmax(scores, axis=-1).astype(jnp.uint8)   # [m, N]
    lo = code[: m // 2]                                    # subspaces 0..m/2
    hi = code[m // 2:]
    return (lo | (hi << 4)).T                              # [N, m/2] packed


def encode_pq(x: np.ndarray, codebooks: np.ndarray,
              batch: int = 262144) -> np.ndarray:
    """Assign each row's subspace vectors to their nearest centroid and pack
    two 4-bit codes per byte: byte column t = code(subspace t) |
    code(subspace t + m/2) << 4 — the plane layout the scoring kernel's
    nibble unpack expects (low plane = first m/2 subspaces)."""
    m = codebooks.shape[0]
    _check_geometry(x.shape[1], m)
    cb = jnp.asarray(codebooks, jnp.float32)
    out = np.empty((x.shape[0], m // 2), dtype=np.uint8)
    for start in range(0, x.shape[0], batch):
        rows = x[start:start + batch]
        out[start:start + len(rows)] = np.asarray(
            _encode_jit(jnp.asarray(rows, jnp.float32), cb))
    return out


def pq_level_table(codebooks: np.ndarray) -> np.ndarray:
    """Codebooks [m, K, ds] -> the kernel's level table L [K, D]:
    ``L[t, j*m + s] = codebooks[s, t, j]`` (level-major, columns in the
    original dim order of the strided partition)."""
    m, k, ds = codebooks.shape
    assert k == K
    return np.ascontiguousarray(
        np.transpose(codebooks, (1, 2, 0)).reshape(K, ds * m)
    ).astype(np.float32)


def decode_pq(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Numpy reconstruction oracle: packed [N, m/2] codes -> [N, D] f32."""
    m, k, ds = codebooks.shape
    lo = (codes & 0xF).astype(np.int64).T                  # [m/2, N]
    hi = (codes >> 4).astype(np.int64).T
    code = np.concatenate([lo, hi], axis=0)                # [m, N]
    sub = codebooks[np.arange(m)[:, None], code]           # [m, N, ds]
    return np.ascontiguousarray(
        sub.transpose(1, 2, 0).reshape(codes.shape[0], ds * m))


def pq_bytes_per_row(d: int, m: int) -> int:
    return m // 2


def resolve_subquantizers(d: int, n_subquantizers: int, n_bits: int) -> int:
    """Map a FAISS ``IndexPQ(n_subquantizers, n_bits)`` request onto the
    4-bit kernel: >4-bit requests double the subquantizer count (equal bytes
    per row); the result is clamped to a legal geometry (even, divides d,
    at most d)."""
    m = n_subquantizers if n_bits <= NBITS else 2 * n_subquantizers
    m = max(2, min(m, d))
    while m > 2 and (d % m != 0 or m % 2 != 0):
        m -= 1
    return m
