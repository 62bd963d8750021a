"""Device-resident exact MIPS index: the TPU-native FAISS-flat replacement.

API-compatible with the reference's FAISS wrapper (`retriever/index.py:17-79`):
``index_data(ids, embeddings)``, ``search_knn(query_vectors, top_docs)``
returning per-query ``(db_id str list, score array)``, and
``serialize``/``deserialize_from``. But instead of a host C++ index reached
through a GPU->CPU copy (`retriever/retrievers.py:253-261`), the corpus matrix
lives in TPU HBM — row-sharded across the mesh ``data`` axis — and search is
the chunked MXU matmul + streaming top-k of :mod:`kirag_tpu.ops.mips`, with
per-shard candidates merged over ICI.

Metrics:
- ``inner_product`` — scores descending (== faiss.IndexFlatIP).
- ``l2``            — squared L2 distances ascending (== faiss.IndexFlatL2),
  computed as ||q||^2 - 2 q.c + ||c||^2 from the same MIPS kernel.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kirag_tpu.ops.mips import sharded_topk_mips, topk_mips

logger = logging.getLogger(__name__)

SUPPORTED_METRICS = ("inner_product", "l2")


def _next_pow2(n: int, floor: int = 8) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


class TPUIndexer:
    """Exact flat index over a row-sharded device-resident embedding matrix."""

    def __init__(self, vector_sz: int, metric: str = "inner_product",
                 mesh=None, mesh_axis: str = "data",
                 device_dtype: jnp.dtype = jnp.float32, chunk_size: int = 262144,
                 compression: str = "none", n_subquantizers: int = 0, n_bits: int = 8,
                 max_device_rows: Optional[int] = None,
                 exact_impl: str = "auto", pallas_chunk_size: int = 16384,
                 pallas_select: str = "capdom", shuffle_rows: bool = False,
                 shuffle_seed: int = 0, approx_winners: int = 1):
        # drop-in compatibility with the reference ctor (`retriever/index.py:19`):
        # an IndexPQ(n_subquantizers, n_bits) request is served by TRUE
        # codebook PQ (round 5, ops/pq.py) — >4-bit requests map to 2x the
        # subquantizers at 4 bits (equal bytes/row; see ops/pq.py on why
        # K=16 is the TPU-rate operating point)
        faiss_pq_request = n_subquantizers > 0 and compression == "none"
        if faiss_pq_request:
            compression = "pq"
            logger.info(f"PQ({n_subquantizers}x{n_bits}b) requested -> "
                        "codebook product quantization")
        if metric not in SUPPORTED_METRICS:
            raise KeyError(f"metric must be one of {SUPPORTED_METRICS}, got {metric}")
        if compression not in ("none", "int8", "int4", "pq"):
            raise KeyError(f"compression must be 'none', 'int8', 'int4' or "
                           f"'pq', got {compression}")
        if compression == "int4" and vector_sz % 256 != 0:
            raise ValueError("int4 compression needs vector_sz % 256 == 0 "
                             f"(plane packing), got {vector_sz}")
        self.pq_m = 0
        if compression == "pq":
            from kirag_tpu.ops.pq import resolve_subquantizers

            if metric != "inner_product":
                raise ValueError("compression='pq' supports inner_product "
                                 "only (quantize the l2 norm column via "
                                 "int4/int8 compression instead)")
            if max_device_rows is not None:
                raise ValueError("compression='pq' is 32x-compressed and "
                                 "corpus-resident; streaming mode does not "
                                 "compose with it")
            # only FAISS-style requests carry an n_bits to remap; explicit
            # compression="pq" means n_subquantizers IS the 4-bit count
            self.pq_m = resolve_subquantizers(
                vector_sz, n_subquantizers or max(2, vector_sz // 4),
                n_bits if faiss_pq_request else 4)
        self.vector_sz = vector_sz
        self.metric = metric
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.device_dtype = device_dtype
        self.chunk_size = chunk_size
        self.compression = compression
        # rows beyond this stream through HBM block-by-block at search time
        # (the beyond-HBM mode for e.g. the 21M-row DPR corpus on one chip);
        # None = whole corpus resident (the fast path)
        self.max_device_rows = max_device_rows
        # exact-search implementation: "pallas" = fused two-pass kernel
        # (ops/pallas_exact.py), "xla" = chunked-scan baseline (ops/mips.py),
        # "auto" = pallas on TPU, xla elsewhere (interpret-mode pallas on CPU
        # is orders of magnitude slower than compiled XLA)
        if exact_impl not in ("auto", "pallas", "xla"):
            raise KeyError(f"exact_impl must be auto|pallas|xla, got {exact_impl}")
        self.exact_impl = exact_impl
        if pallas_chunk_size < 128 or pallas_chunk_size % 128 != 0:
            # the kernel would silently round it down, de-aligning the
            # chunk-grid pre-pad in to_device (which would then re-pad the
            # whole corpus inside jit on every search)
            raise ValueError("pallas_chunk_size must be a positive multiple "
                             f"of 128, got {pallas_chunk_size}")
        self.pallas_chunk_size = pallas_chunk_size
        # selection stages inside the fused kernel: "capdom" (selection in
        # the capture domain with a residual exactness check — the measured
        # round-4 winner on the stream impl, 7.51 vs hier's 7.72 ms/iter at
        # 1M x 1024; degrades to hier on non-stream impls), "merge" (round-5
        # running in-kernel top-B window: no capture round-trip or assembly;
        # opt-in until chip-validated), "hier" (two-level, the round-3
        # winner: 16.1 vs flat's 17.7 ms/batch), or "flat" (plain lax.top_k)
        if pallas_select not in ("hier", "flat", "capdom", "merge"):
            raise KeyError("pallas_select must be hier|flat|capdom|merge, "
                           f"got {pallas_select}")
        self.pallas_select = pallas_select

        # shuffle_rows: apply a seeded global row permutation before
        # materialization. mode="approx" samples ONE winner per 128-row
        # group, so corpora whose similar rows sit ADJACENT (consecutive
        # passages of one article in DPR layout) under-recall; decorrelating
        # row order from similarity restores the kernel's measured ~0.994
        # recall@100. The id map permutes alongside, so returned db_ids are
        # unaffected; only FAISS tie ORDER among exactly-equal scores
        # follows the shuffled layout instead of insertion order.
        self.shuffle_rows = shuffle_rows
        self.shuffle_seed = shuffle_seed
        self._shuffled = False
        # l2 metric: the corpus is stored AUGMENTED with a -0.5*||c||^2
        # column at to_device (argmin ||q-c||^2 == argmax q.c - 0.5||c||^2
        # with a constant-one query column), so one fused MIPS kernel
        # serves both metrics and no per-search corpus copy exists. int8
        # shares ONE scale per row, so the norm column is balanced by a
        # power-of-2 alpha (exact in bf16/f32, exact inverse on the query
        # side) to keep it from dominating the row absmax; int4's
        # block-128 scales give the norm column its own block, where a
        # block absmax quantizes LOSSLESSLY ((n-7.5)*absmax/7.5 grid).
        self._l2_alpha = 1.0
        # mode="approx" recall/speed dial: candidates surfaced per 128-row
        # group (the FAISS-nprobe role). 1 = the classic one-winner
        # sampling (~0.994 recall@100 at 1M); 2 squares the dominant
        # same-group miss term away; 128 degenerates to exact
        if not 1 <= approx_winners <= 128:
            raise ValueError(f"approx_winners must be in [1, 128], got "
                             f"{approx_winners}")
        self.approx_winners = approx_winners

        self._host_chunks: List[np.ndarray] = []
        self.index_id_to_db_id: np.ndarray = np.empty((0,), dtype=object)
        self._device_corpus: Optional[jnp.ndarray] = None
        self._device_scales: Optional[jnp.ndarray] = None
        self._device_rows: int = 0
        self._stream_blocks: Optional[List[dict]] = None
        # pq state: codebooks train once (first to_device, or loaded from a
        # serialized index) and persist across appends — codes re-encode
        self.pq_train_rows = 131072
        self.pq_iters = 25
        self._pq_codebooks: Optional[np.ndarray] = None

    # -- build ---------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.index_id_to_db_id)

    @property
    def ntotal(self) -> int:
        return len(self)

    def index_data(self, ids: Sequence, embeddings: np.ndarray) -> None:
        """Append rows; device residency refreshes lazily on next search."""
        embeddings = np.asarray(embeddings, dtype=np.float32)
        assert embeddings.ndim == 2 and embeddings.shape[1] == self.vector_sz, (
            f"expected [n, {self.vector_sz}] embeddings, got {embeddings.shape}")
        assert len(ids) == len(embeddings)
        self._host_chunks.append(embeddings)
        new_ids = np.asarray([str(i) for i in ids], dtype=object)
        self.index_id_to_db_id = np.concatenate([self.index_id_to_db_id, new_ids])
        self._device_corpus = None  # invalidate
        self._stream_blocks = None
        self._shuffled = False  # appended rows join the next shuffle
        logger.info(f"Total data indexed {len(self.index_id_to_db_id)}")

    def _host_rows(self, start: int, end: int) -> np.ndarray:
        """Assemble rows [start, end) across the host chunk list WITHOUT
        concatenating the whole corpus (chunks may be mmap'd shard files)."""
        parts, ofs = [], 0
        for chunk in self._host_chunks:
            lo, hi = max(start - ofs, 0), min(end - ofs, len(chunk))
            if lo < hi:
                parts.append(np.asarray(chunk[lo:hi], dtype=np.float32))
            ofs += len(chunk)
            if ofs >= end:
                break
        if not parts:
            return np.zeros((0, self.vector_sz), dtype=np.float32)
        return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)

    def _host_take(self, indices: np.ndarray) -> np.ndarray:
        """Random-access row gather across the host chunk list (chunks may
        be mmap'd shard files). Callers pass bounded blocks of indices so no
        second full-corpus copy ever materializes."""
        out = np.empty((len(indices), self.vector_sz), dtype=np.float32)
        ofs = 0
        for chunk in self._host_chunks:
            m = (indices >= ofs) & (indices < ofs + len(chunk))
            if m.any():
                out[m] = np.asarray(chunk[indices[m] - ofs], dtype=np.float32)
            ofs += len(chunk)
        return out

    def _maybe_shuffle(self) -> None:
        """Apply the ``shuffle_rows`` permutation (see ``__init__``) once per
        corpus state, host-side and block-wise, before any materialization.
        Re-applying after an append re-permutes the whole corpus — ids move
        with their rows, so repeated shuffles stay consistent."""
        if not self.shuffle_rows or self._shuffled or len(self) == 0:
            return
        n = len(self)
        perm = np.random.default_rng(self.shuffle_seed).permutation(n)
        block = 1 << 20
        new_chunks = [self._host_take(perm[start:start + block])
                      for start in range(0, n, block)]
        self._host_chunks = new_chunks
        self.index_id_to_db_id = self.index_id_to_db_id[perm]
        self._shuffled = True

    def _shard_count(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape[self.mesh_axis]

    def _l2_aug_width(self) -> int:
        """Width of the augmented corpus for metric="l2": +1 norm column,
        +256 for int4 (packing needs dim % 256 == 0; the norm lands at the
        head of its own 128-dim scale block and quantizes losslessly)."""
        if self.metric != "l2":
            return self.vector_sz
        return self.vector_sz + (256 if self.compression == "int4" else 1)

    def _l2_augment(self, rows: np.ndarray) -> np.ndarray:
        """Append the alpha * -0.5*||c||^2 column (+ int4 zero padding)."""
        nc = -0.5 * np.sum(rows.astype(np.float32) ** 2, axis=1,
                           dtype=np.float32)[:, None]
        cols = [np.asarray(rows, dtype=np.float32),
                np.float32(self._l2_alpha) * nc]
        if self.compression == "int4":
            cols.append(np.zeros((len(rows), 255), dtype=np.float32))
        return np.concatenate(cols, axis=1)

    def _fit_l2_alpha(self) -> None:
        """int8 + l2: pick the power-of-2 alpha that brings the norm column
        to the typical row absmax, so the shared per-row int8 scale keeps
        quantizing the data columns finely (unnormalized corpora otherwise
        let ||c||^2/2 >> max|c_j| crush them). Power of 2 => alpha and its
        query-side inverse are exact in f32 AND bf16."""
        if self.metric != "l2" or self.compression != "int8":
            self._l2_alpha = 1.0
            return
        sample = self._host_rows(0, min(len(self), 4096))
        m_el = float(np.median(np.abs(sample).max(axis=1)))
        m_nc = float(np.median(0.5 * np.sum(sample ** 2, axis=1)))
        if m_el <= 0 or m_nc <= 0:
            self._l2_alpha = 1.0
            return
        self._l2_alpha = float(2.0 ** round(np.log2(m_el / m_nc)))

    def _train_pq(self, n: int) -> None:
        """Train the PQ codebooks once, on an evenly-strided sample (corpora
        are often similarity-ordered — consecutive passages of one article —
        so a head sample would be biased)."""
        if self._pq_codebooks is not None:
            return
        from kirag_tpu.ops import pq as pqmod

        n_train = min(n, self.pq_train_rows)
        step = max(1, n // n_train)
        sample = self._host_take(np.arange(0, n, step)[:n_train])
        self._pq_codebooks = pqmod.train_pq(sample, self.pq_m,
                                            iters=self.pq_iters,
                                            seed=self.shuffle_seed)

    def to_device(self) -> None:
        """Pad rows to the shard grid and place the corpus into HBM.

        Assembly (and int8 quantization) run CHUNK-WISE over the host chunk
        list, so an mmap'd multi-file index never materializes a second full
        f32 copy — at DPR scale (21M x 1024) that copy alone is 86GB. For
        metric="l2" each chunk is augmented with its norm column on the way
        (see ``__init__``): the former per-search ``jnp.concatenate`` of the
        whole corpus (a full device copy per call) is gone.
        """
        self._maybe_shuffle()
        self._fit_l2_alpha()
        n = len(self)
        d = self._l2_aug_width()
        shards = self._shard_count()
        # rows must divide both the shard count and the tile sublane (8)
        unit = 8 * shards
        # large corpora additionally pre-pad to the Pallas chunk grid: the
        # kernel otherwise pads per CALL inside jit — a full read+write copy
        # of the corpus (measured ~4-5 ms/call at 1M x 1024 bf16). The extra
        # rows cost < one chunk per shard and are masked via valid_rows.
        if self.exact_impl != "xla" and n >= self.pallas_chunk_size * shards:
            unit = self.pallas_chunk_size * shards
        n_pad = max(-(-n // unit) * unit, unit)
        block = 1 << 20

        def shard_put(arr):
            if self.mesh is None:
                return jnp.asarray(arr)
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(arr, NamedSharding(self.mesh, PartitionSpec(self.mesh_axis)))

        if self.compression == "int8":
            from kirag_tpu.ops.quantized import quantize_rows_int8

            q = np.zeros((n_pad, d), dtype=np.int8)
            scales = np.zeros((n_pad,), dtype=np.float32)
            for start in range(0, n, block):
                rows = self._host_rows(start, min(start + block, n))
                if self.metric == "l2":
                    rows = self._l2_augment(rows)
                q[start:start + len(rows)], scales[start:start + len(rows)] = (
                    quantize_rows_int8(rows))
            self._device_corpus = shard_put(q)
            self._device_scales = shard_put(scales)
            self._device_rows = n
            return

        if self.compression == "int4":
            from kirag_tpu.ops.quantized import INT4_BLOCK, quantize_rows_int4

            q = np.zeros((n_pad, d // 2), dtype=np.uint8)
            scales = np.zeros((n_pad, d // INT4_BLOCK), dtype=np.float32)
            for start in range(0, n, block):
                rows = self._host_rows(start, min(start + block, n))
                if self.metric == "l2":
                    rows = self._l2_augment(rows)
                q[start:start + len(rows)], scales[start:start + len(rows)] = (
                    quantize_rows_int4(rows))
            self._device_corpus = shard_put(q)
            self._device_scales = shard_put(scales)
            self._device_rows = n
            return

        if self.compression == "pq":
            from kirag_tpu.ops import pq as pqmod

            self._train_pq(n)
            q = np.zeros((n_pad, self.pq_m // 2), dtype=np.uint8)
            for start in range(0, n, block):
                rows = self._host_rows(start, min(start + block, n))
                q[start:start + len(rows)] = pqmod.encode_pq(
                    rows, self._pq_codebooks)
            self._device_corpus = shard_put(q)
            # the [16, D] level table is row-invariant: replicated, NOT
            # sharded with the code rows
            self._device_scales = jnp.asarray(
                pqmod.pq_level_table(self._pq_codebooks))
            self._device_rows = n
            return

        import ml_dtypes

        np_dtype = np.dtype(jnp.dtype(self.device_dtype).name) \
            if self.device_dtype != jnp.bfloat16 else np.dtype(ml_dtypes.bfloat16)
        mat = np.zeros((n_pad, d), dtype=np_dtype)
        for start in range(0, n, block):
            rows = self._host_rows(start, min(start + block, n))
            if self.metric == "l2":
                rows = self._l2_augment(rows)
            mat[start:start + len(rows)] = rows.astype(np_dtype)
        self._device_corpus = shard_put(mat)
        self._device_rows = n

    # -- streaming (beyond-HBM corpora) ----------------------------------------

    def _use_streaming(self) -> bool:
        return (self.max_device_rows is not None
                and len(self) > self.max_device_rows)

    def _prepare_stream_blocks(self) -> None:
        """Pre-assemble uniform host blocks in their final device dtype (int8
        + scales, or device_dtype) so every search reuses ONE compiled program
        shape and pays only the host->HBM copy per block."""
        if self._stream_blocks is not None:
            return
        self._maybe_shuffle()
        self._fit_l2_alpha()
        assert self.mesh is None, "streaming mode is single-chip (shard the "\
            "corpus across the mesh instead when chips are available)"
        import ml_dtypes

        n, d = len(self), self._l2_aug_width()
        rows_per_block = max(8, (self.max_device_rows // 8) * 8)
        blocks = []
        for start in range(0, n, rows_per_block):
            rows = self._host_rows(start, min(start + rows_per_block, n))
            if self.metric == "l2":
                rows = self._l2_augment(rows)
            valid = len(rows)
            if valid < rows_per_block:
                rows = np.concatenate(
                    [rows, np.zeros((rows_per_block - valid, d), np.float32)])
            if self.compression == "int8":
                from kirag_tpu.ops.quantized import quantize_rows_int8

                q, scales = quantize_rows_int8(rows)
                blocks.append({"corpus": q, "scales": scales,
                               "start": start, "valid": valid})
            elif self.compression == "int4":
                from kirag_tpu.ops.quantized import quantize_rows_int4

                q, scales = quantize_rows_int4(rows)
                blocks.append({"corpus": q, "scales": scales,
                               "start": start, "valid": valid})
            else:
                np_dtype = (np.dtype(ml_dtypes.bfloat16)
                            if self.device_dtype == jnp.bfloat16
                            else np.dtype(jnp.dtype(self.device_dtype).name))
                blocks.append({"corpus": rows.astype(np_dtype),
                               "start": start, "valid": valid})
        self._stream_blocks = blocks

    def _streaming_search(self, queries: jnp.ndarray, k: int, mode: str
                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Search a corpus larger than HBM: stream uniform row blocks through
        the device and merge per-block top-k candidates on host (stable
        lower-index tie-break, matching the resident path)."""
        self._prepare_stream_blocks()
        k_eff = min(k, len(self))
        all_vals, all_idx = [], []
        for blk in self._stream_blocks:
            corpus = jnp.asarray(blk["corpus"])
            if mode == "approx":
                from kirag_tpu.ops.pallas_mips import approx_topk_mips

                vals, idx = approx_topk_mips(
                    queries, corpus, k_eff, valid_rows=blk["valid"],
                    scales=(jnp.asarray(blk["scales"])
                            if self.compression in ("int8", "int4")
                            else None),
                    winners_per_group=self.approx_winners)
            elif self._use_pallas_exact():
                from kirag_tpu.ops.pallas_exact import exact_topk_mips

                vals, idx = exact_topk_mips(
                    queries, corpus, k_eff,
                    chunk_size=self.pallas_chunk_size,
                    valid_rows=blk["valid"], select=self.pallas_select,
                    scales=(jnp.asarray(blk["scales"])
                            if self.compression in ("int8", "int4")
                            else None))
            elif self.compression == "int4":
                from kirag_tpu.ops.quantized import topk_mips_int4

                vals, idx = topk_mips_int4(
                    queries, corpus, jnp.asarray(blk["scales"]), k_eff,
                    chunk_size=min(self.chunk_size, corpus.shape[0]),
                    valid_rows=blk["valid"])
            elif self.compression == "int8":
                from kirag_tpu.ops.quantized import topk_mips_int8

                vals, idx = topk_mips_int8(
                    queries, corpus, jnp.asarray(blk["scales"]), k_eff,
                    chunk_size=min(self.chunk_size, corpus.shape[0]),
                    valid_rows=blk["valid"])
            else:
                vals, idx = topk_mips(
                    queries, corpus, k_eff,
                    chunk_size=min(self.chunk_size, corpus.shape[0]),
                    valid_rows=blk["valid"])
            all_vals.append(np.asarray(vals))
            all_idx.append(np.asarray(idx) + blk["start"])
        vals = np.concatenate(all_vals, axis=1)
        idx = np.concatenate(all_idx, axis=1)
        # stable merge: by descending value, then ascending global row id
        order = np.lexsort((idx, -vals), axis=1)[:, :k_eff]
        return (np.take_along_axis(vals, order, axis=1),
                np.take_along_axis(idx, order, axis=1))

    # -- search ----------------------------------------------------------------

    def _device_search(self, queries: jnp.ndarray, k: int, mode: str = "exact"
                       ) -> Tuple[np.ndarray, np.ndarray]:
        streaming = self._use_streaming()
        if streaming:
            self._prepare_stream_blocks()   # sets _l2_alpha before q_aug
        elif self._device_corpus is None:
            self.to_device()
        q_search = queries
        if self.metric == "l2":
            # argmin ||q-c||^2 == argmax (q.c - 0.5 ||c||^2): the corpus
            # (resident matrix or streaming blocks) carries the
            # alpha * -0.5||c||^2 column baked in, so only the tiny query
            # side is augmented here — a constant 1/alpha column (+ zeros
            # to the int4 pack width).
            cols = [queries,
                    jnp.full((queries.shape[0], 1), 1.0 / self._l2_alpha,
                             dtype=queries.dtype)]
            if self.compression == "int4":
                cols.append(jnp.zeros((queries.shape[0], 255),
                                      dtype=queries.dtype))
            q_search = jnp.concatenate(cols, axis=1)
        if streaming:
            vals, idx = self._streaming_search(q_search, k, mode)
        else:
            vals, idx = self._run_mips(q_search, self._device_corpus, k,
                                       mode=mode)
        if self.metric == "l2":
            q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1,
                           keepdims=True)
            vals = q_sq - 2.0 * vals  # ||q||^2 - 2(q.c - 0.5||c||^2)
        return np.asarray(vals), np.asarray(idx)

    def _use_pallas_exact(self) -> bool:
        if self.exact_impl == "pallas":
            return True
        if self.exact_impl == "xla":
            return False
        return jax.default_backend() == "tpu"

    def _run_mips(self, queries, corpus, k, mode: str = "exact"):
        sharded = self.mesh is not None and self._shard_count() > 1
        scales = (self._device_scales
                  if self.compression in ("int8", "int4") else None)
        if self.compression == "pq":
            # codebook PQ only exists in the exact kernels (quant="pq4");
            # an approx-mode request logs and serves exact-over-pq (which
            # is already an approximation of the f32 scores)
            if mode == "approx":
                logger.info("mode='approx' on a pq index: serving the "
                            "exact-over-pq kernel instead")
            if sharded:
                from kirag_tpu.ops.pallas_exact import sharded_exact_topk_mips

                return sharded_exact_topk_mips(
                    queries, corpus, k, self.mesh, axis=self.mesh_axis,
                    chunk_size=self.pallas_chunk_size,
                    valid_rows=self._device_rows,
                    scales=self._device_scales,
                    select=self.pallas_select, quant="pq4")
            from kirag_tpu.ops.pallas_exact import exact_topk_mips

            # same flag-mode host check as the exact branch below
            vals, idx, ok = exact_topk_mips(
                queries, corpus, k, chunk_size=self.pallas_chunk_size,
                valid_rows=self._device_rows, scales=self._device_scales,
                select=self.pallas_select, quant="pq4", on_miss="flag")
            if bool(ok):
                return vals, idx
            logger.info("pq capture missed a selected group; re-dispatching "
                        "the checked exact program")
            return exact_topk_mips(queries, corpus, k,
                                   chunk_size=self.pallas_chunk_size,
                                   valid_rows=self._device_rows,
                                   scales=self._device_scales,
                                   select=self.pallas_select, quant="pq4")
        if mode == "exact" and self._use_pallas_exact():
            # fused Pallas kernel (impl=auto: single corpus read with scores
            # materialized when they fit HBM, corpus-read-twice otherwise);
            # composes with int8 (in-VMEM dequant) and sharding
            if sharded:
                from kirag_tpu.ops.pallas_exact import sharded_exact_topk_mips

                return sharded_exact_topk_mips(
                    queries, corpus, k, self.mesh, axis=self.mesh_axis,
                    chunk_size=self.pallas_chunk_size,
                    valid_rows=self._device_rows, scales=scales,
                    select=self.pallas_select)
            from kirag_tpu.ops.pallas_exact import exact_topk_mips

            # single-device host entry: run WITHOUT the in-program exactness
            # fallback (its lax.cond alone costs ~0.7 ms/batch at 1M x 1024,
            # probe_r8) and check the flag here — results reach host right
            # after anyway. The rare miss (adversarial chunk-clustered ties)
            # re-dispatches the checked program, which stays bitwise exact.
            vals, idx, ok = exact_topk_mips(
                queries, corpus, k, chunk_size=self.pallas_chunk_size,
                valid_rows=self._device_rows, scales=scales,
                select=self.pallas_select, on_miss="flag")
            if bool(ok):
                return vals, idx
            logger.info("stream capture missed a selected group; "
                        "re-dispatching the checked exact program")
            return exact_topk_mips(queries, corpus, k,
                                   chunk_size=self.pallas_chunk_size,
                                   valid_rows=self._device_rows, scales=scales,
                                   select=self.pallas_select)
        if mode == "approx":
            # fused Pallas group-sampled kernel; composes with int8/int4
            # (the kernel dequantizes in VMEM) and with corpus sharding
            if sharded:
                from kirag_tpu.ops.pallas_mips import sharded_approx_topk_mips

                return sharded_approx_topk_mips(
                    queries, corpus, k, self.mesh, axis=self.mesh_axis,
                    valid_rows=self._device_rows, scales=scales,
                    winners_per_group=self.approx_winners)
            from kirag_tpu.ops.pallas_mips import approx_topk_mips

            return approx_topk_mips(queries, corpus, k,
                                    valid_rows=self._device_rows, scales=scales,
                                    winners_per_group=self.approx_winners)
        if self.compression == "int8":
            if sharded:
                from kirag_tpu.ops.quantized import sharded_topk_mips_int8

                return sharded_topk_mips_int8(
                    queries, corpus, self._device_scales, k, self.mesh,
                    axis=self.mesh_axis, chunk_size=self.chunk_size,
                    valid_rows=self._device_rows)
            from kirag_tpu.ops.quantized import topk_mips_int8

            return topk_mips_int8(queries, corpus, self._device_scales, k,
                                  chunk_size=min(self.chunk_size, corpus.shape[0]),
                                  valid_rows=self._device_rows)
        if self.compression == "int4":
            if sharded:
                from kirag_tpu.ops.quantized import sharded_topk_mips_int4

                return sharded_topk_mips_int4(
                    queries, corpus, self._device_scales, k, self.mesh,
                    axis=self.mesh_axis, chunk_size=self.chunk_size,
                    valid_rows=self._device_rows)
            from kirag_tpu.ops.quantized import topk_mips_int4

            return topk_mips_int4(queries, corpus, self._device_scales, k,
                                  chunk_size=min(self.chunk_size, corpus.shape[0]),
                                  valid_rows=self._device_rows)
        if sharded:
            return sharded_topk_mips(queries, corpus, k, self.mesh, axis=self.mesh_axis,
                                     chunk_size=self.chunk_size, valid_rows=self._device_rows)
        return topk_mips(queries, corpus, k, chunk_size=min(self.chunk_size, corpus.shape[0]),
                         valid_rows=self._device_rows)

    def search_knn(self, query_vectors: np.ndarray, top_docs: int,
                   index_batch_size: int = 1024, verbose: bool = False,
                   mode: str = "exact") -> List[Tuple[List[str], np.ndarray]]:
        """Return per-query ``([db_id, ...], scores)`` like the reference
        (`retriever/index.py:36-53`). Query batches are padded to power-of-two
        row counts to bound XLA recompiles.

        ``mode="approx"`` uses the Pallas group-sampled kernel
        (recall@100 ~0.994, fused scoring; see ops/pallas_mips.py).
        """
        if len(self) == 0:
            raise RuntimeError("search_knn on an empty index; call index_data first")
        query_vectors = np.asarray(query_vectors, dtype=np.float32)
        if query_vectors.ndim == 1:
            query_vectors = query_vectors[None]
        n_q = len(query_vectors)
        k = min(top_docs, len(self))

        results: List[Tuple[List[str], np.ndarray]] = []
        for start in range(0, n_q, index_batch_size):
            q = query_vectors[start: start + index_batch_size]
            q_pad = _next_pow2(len(q))
            if q_pad != len(q):
                q = np.pad(q, ((0, q_pad - len(q)), (0, 0)))
            vals, idx = self._device_search(jnp.asarray(q, dtype=self.device_dtype), k,
                                            mode=mode)
            for row in range(min(index_batch_size, n_q - start)):
                db_ids = [str(self.index_id_to_db_id[i]) for i in idx[row]]
                results.append((db_ids, vals[row]))
        return results

    # -- persistence -----------------------------------------------------------

    def serialize(self, dir_path: str, rows_per_file: int = 1_000_000) -> None:
        """Write the index as SHARD files ``index_{start}_{end}.npy`` (plus the
        id map and config). Multi-file layout keeps writes/loads streamable at
        21M-row scale — no monolithic 86GB ``index.npy`` — and shard files
        mmap independently on load."""
        self._maybe_shuffle()  # shuffle_rows: persist the permuted layout
        os.makedirs(dir_path, exist_ok=True)
        meta_file = os.path.join(dir_path, "index_meta.pkl")
        config_file = os.path.join(dir_path, "index_config.json")
        n = len(self)
        files = []
        for start in range(0, max(n, 1), rows_per_file):
            end = min(start + rows_per_file, n)
            name = f"index_{start:010d}_{end:010d}.npy"
            np.save(os.path.join(dir_path, name), self._host_rows(start, end))
            files.append(name)
            logger.info(f"wrote {name} ({end - start} rows)")
        with open(meta_file, "wb") as f:
            pickle.dump(list(self.index_id_to_db_id), f)
        if self.compression == "pq":
            # persist trained codebooks so a reload reproduces the exact
            # same codes (no retraining on deserialize)
            self._train_pq(n)
            np.save(os.path.join(dir_path, "pq_codebooks.npy"),
                    self._pq_codebooks)
        with open(config_file, "w") as f:
            json.dump({"vector_sz": self.vector_sz, "metric": self.metric,
                       "compression": self.compression, "nrows": n,
                       "pq_m": self.pq_m, "files": files}, f)

    def deserialize_from(self, dir_path: str, mmap: bool = True) -> None:
        meta_file = os.path.join(dir_path, "index_meta.pkl")
        config_file = os.path.join(dir_path, "index_config.json")
        logger.info(f"Loading index from {dir_path}")
        files = None
        if os.path.exists(config_file):
            with open(config_file) as f:
                cfg = json.load(f)
            assert cfg["vector_sz"] == self.vector_sz, (
                f"index built with dim {cfg['vector_sz']}, indexer expects {self.vector_sz}")
            self.metric = cfg.get("metric", self.metric)
            # honored on meshes too: sharded int8 search exists
            # (ops/quantized.py:sharded_topk_mips_int8)
            self.compression = cfg.get("compression", self.compression)
            if self.compression == "pq":
                self.pq_m = cfg.get("pq_m", self.pq_m)
                cb_file = os.path.join(dir_path, "pq_codebooks.npy")
                if os.path.exists(cb_file):
                    self._pq_codebooks = np.load(cb_file)
            files = cfg.get("files")
        mode = "r" if mmap else None
        if files:  # multi-file layout (mmap per shard)
            self._host_chunks = [np.load(os.path.join(dir_path, f), mmap_mode=mode)
                                 for f in files]
        else:  # legacy monolithic index.npy
            self._host_chunks = [np.load(os.path.join(dir_path, "index.npy"),
                                         mmap_mode=mode)]
        with open(meta_file, "rb") as f:
            self.index_id_to_db_id = np.asarray(pickle.load(f), dtype=object)
        n_rows = sum(len(c) for c in self._host_chunks)
        assert len(self.index_id_to_db_id) == n_rows, (
            "deserialized id map must match index size")
        self._device_corpus = None
        self._stream_blocks = None
