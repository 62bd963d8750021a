"""21M-row scale correctness: the DPR psgs_w100 north star, on the virtual mesh.

The reference's unit of scale is the 21,015,324-passage Wikipedia corpus
(`dataset/corpus.py:17`, BASELINE.md). Real multi-chip hardware is not
available in CI, so this exercises the EXACT sharded int8 search path at the
full row count on the 8-device CPU mesh (dim shrunk to keep wall time down —
correctness of sharding, masking, and the ICI merge is row-count-dependent,
not dim-dependent). ~40s on one CPU core.
"""

import numpy as np
import pytest

import jax.numpy as jnp

DPR_ROWS = 21_015_324
DIM = 32


@pytest.fixture(scope="module")
def corpus_21m():
    rng = np.random.default_rng(0)
    block = rng.integers(-127, 128, size=(1_000_000, DIM), dtype=np.int8)
    corpus = np.empty((DPR_ROWS, DIM), dtype=np.int8)
    for start in range(0, DPR_ROWS, len(block)):
        end = min(start + len(block), DPR_ROWS)
        corpus[start:end] = block[: end - start]
    # plant four DISTINCT max-magnitude rows, one per mesh-shard region
    qrows = np.array([5, DPR_ROWS // 3, DPR_ROWS // 2 + 17, DPR_ROWS - 9])
    corpus[qrows] = np.where(rng.random((4, DIM)) < 0.5, -127, 127).astype(np.int8)
    return corpus, qrows


class TestDPRScale:
    def test_sharded_int8_21m_rows(self, corpus_21m, mesh8):
        from kirag_tpu.ops.quantized import sharded_topk_mips_int8

        corpus, qrows = corpus_21m
        shards = mesh8.shape["data"] * mesh8.shape["model"]
        n_pad = -(-DPR_ROWS // (8 * shards)) * (8 * shards)
        corpus_p = np.zeros((n_pad, DIM), np.int8)
        corpus_p[:DPR_ROWS] = corpus
        scales = np.zeros((n_pad,), np.float32)
        scales[:DPR_ROWS] = 1.0

        queries = jnp.asarray(corpus[qrows].astype(np.float32))
        vals, idx = sharded_topk_mips_int8(
            queries, jnp.asarray(corpus_p), jnp.asarray(scales), 10, mesh8,
            chunk_size=262144, valid_rows=DPR_ROWS)
        idx, vals = np.asarray(idx), np.asarray(vals)
        # each planted row retrieves itself across the 8-shard merge, with the
        # exact max score; no padding row (>= DPR_ROWS) ever surfaces
        np.testing.assert_array_equal(idx[:, 0], qrows)
        np.testing.assert_allclose(vals[:, 0], DIM * 127.0 ** 2)
        assert idx.max() < DPR_ROWS
        assert np.all(np.diff(vals, axis=1) <= 1e-3)  # sorted descending
