"""Unit tests for pooling and MIPS top-k ops against numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from kirag_tpu.ops import (
    cls_pool,
    l2_normalize,
    masked_mean_pool,
    sharded_topk_mips,
    topk_mips,
)
from kirag_tpu.ops.mips import sharded_topk_mips_onepass, topk_mips_onepass


def numpy_topk(scores: np.ndarray, k: int):
    """Oracle: exact top-k sorted by (-score, index) — flat-scan tie-breaking."""
    order = np.lexsort((np.arange(scores.shape[-1])[None, :].repeat(len(scores), 0), -scores), axis=-1)
    idx = order[:, :k]
    vals = np.take_along_axis(scores, idx, axis=-1)
    return vals, idx


class TestPooling:
    def test_masked_mean_pool(self, rng):
        x = rng.randn(3, 5, 8).astype(np.float32)
        mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 0, 0, 0, 0]], dtype=np.int32)
        got = np.asarray(masked_mean_pool(jnp.asarray(x), jnp.asarray(mask)))
        for i in range(3):
            valid = x[i][mask[i].astype(bool)]
            np.testing.assert_allclose(got[i], valid.mean(0), rtol=1e-5)

    def test_mean_pool_all_masked_no_nan(self):
        x = jnp.ones((1, 4, 8))
        mask = jnp.zeros((1, 4), dtype=jnp.int32)
        out = masked_mean_pool(x, mask)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_cls_pool(self, rng):
        x = rng.randn(2, 5, 8).astype(np.float32)
        np.testing.assert_allclose(np.asarray(cls_pool(jnp.asarray(x))), x[:, 0])

    def test_l2_normalize(self, rng):
        x = rng.randn(4, 16).astype(np.float32)
        got = np.asarray(l2_normalize(jnp.asarray(x)))
        np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(got, x / np.linalg.norm(x, axis=-1, keepdims=True), rtol=1e-5)


class TestTopkMips:
    @pytest.mark.parametrize("n,k,chunk", [(100, 5, 32), (1000, 17, 256), (257, 10, 64)])
    def test_matches_oracle(self, rng, n, k, chunk):
        q = rng.randn(7, 32).astype(np.float32)
        c = rng.randn(n, 32).astype(np.float32)
        vals, idx = topk_mips(jnp.asarray(q), jnp.asarray(c), k, chunk_size=chunk)
        oracle_vals, oracle_idx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), oracle_vals, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)

    def test_valid_rows_masks_padding(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(64, 16).astype(np.float32)
        c[50:] = 100.0  # would dominate if not masked out
        vals, idx = topk_mips(jnp.asarray(q), jnp.asarray(c), 5, chunk_size=32, valid_rows=50)
        assert np.asarray(idx).max() < 50
        oracle_vals, oracle_idx = numpy_topk(q @ c[:50].T, 5)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)

    def test_k_larger_than_n(self, rng):
        q = rng.randn(2, 8).astype(np.float32)
        c = rng.randn(3, 8).astype(np.float32)
        vals, idx = topk_mips(jnp.asarray(q), jnp.asarray(c), 5)
        assert vals.shape == (2, 5) and idx.shape == (2, 5)
        assert bool(jnp.all(vals[:, 3:] == -jnp.inf))

    @pytest.mark.parametrize("n,k,chunk", [(4096, 10, 1024), (5000, 25, 2048)])
    def test_two_stage_path_matches_oracle(self, rng, n, k, chunk):
        """Chunks >= 2*128 with k < groups take the grouped two-stage path."""
        q = rng.randn(5, 24).astype(np.float32)
        c = rng.randn(n, 24).astype(np.float32)
        vals, idx = topk_mips(jnp.asarray(q), jnp.asarray(c), k, chunk_size=chunk)
        oracle_vals, oracle_idx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), oracle_vals, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)

    def test_two_stage_ties_prefer_lower_index(self):
        q = np.ones((1, 8), dtype=np.float32)
        c = np.ones((2048, 8), dtype=np.float32)  # all scores tie, grouped path
        _, idx = topk_mips(jnp.asarray(q), jnp.asarray(c), 5, chunk_size=1024)
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3, 4])

    def test_ties_prefer_lower_index(self):
        q = np.ones((1, 4), dtype=np.float32)
        c = np.ones((10, 4), dtype=np.float32)  # all scores identical
        _, idx = topk_mips(jnp.asarray(q), jnp.asarray(c), 3, chunk_size=4)
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2])


class TestTopkMipsOnepass:
    """Scan-free exact path (round-2 redesign) against the same oracles."""

    @pytest.mark.parametrize("n,k", [(100, 5), (1000, 17), (257, 10),
                                     (4096, 10), (5000, 25)])
    def test_matches_oracle(self, rng, n, k):
        q = rng.randn(7, 32).astype(np.float32)
        c = rng.randn(n, 32).astype(np.float32)
        vals, idx = topk_mips_onepass(jnp.asarray(q), jnp.asarray(c), k)
        oracle_vals, oracle_idx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), oracle_vals, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)

    def test_valid_rows_masks_padding(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(4096, 16).astype(np.float32)
        c[4000:] = 100.0
        vals, idx = topk_mips_onepass(jnp.asarray(q), jnp.asarray(c), 5,
                                      valid_rows=4000)
        assert np.asarray(idx).max() < 4000
        _, oracle_idx = numpy_topk(q @ c[:4000].T, 5)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)

    def test_k_larger_than_n(self, rng):
        q = rng.randn(2, 8).astype(np.float32)
        c = rng.randn(3, 8).astype(np.float32)
        vals, idx = topk_mips_onepass(jnp.asarray(q), jnp.asarray(c), 5)
        assert vals.shape == (2, 5) and idx.shape == (2, 5)
        assert bool(jnp.all(vals[:, 3:] == -jnp.inf))

    def test_ties_prefer_lower_index(self):
        q = np.ones((1, 8), dtype=np.float32)
        c = np.ones((2048, 8), dtype=np.float32)  # all scores tie, grouped path
        _, idx = topk_mips_onepass(jnp.asarray(q), jnp.asarray(c), 5)
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3, 4])

    def test_negative_scores_not_poisoned_by_mask(self, rng):
        # all-negative scores: the finite mask value must stay below them and
        # the one-hot matmul must not produce NaNs
        q = -np.abs(rng.randn(2, 16)).astype(np.float32)
        c = np.abs(rng.randn(300, 16)).astype(np.float32)
        vals, idx = topk_mips_onepass(jnp.asarray(q), jnp.asarray(c), 4,
                                      valid_rows=290)
        assert np.isfinite(np.asarray(vals)).all()
        _, oracle_idx = numpy_topk(q @ c[:290].T, 4)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)

    def test_sharded_matches_oracle(self, rng, mesh8):
        n, d, k = 2048, 32, 13
        q = rng.randn(5, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        vals, idx = sharded_topk_mips_onepass(jnp.asarray(q), jnp.asarray(c), k, mesh8)
        oracle_vals, oracle_idx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), oracle_vals, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)

    def test_sharded_valid_rows(self, rng, mesh8):
        n, d, k = 2048, 16, 7
        q = rng.randn(3, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        c[1900:] = 50.0
        vals, idx = sharded_topk_mips_onepass(jnp.asarray(q), jnp.asarray(c), k,
                                              mesh8, valid_rows=1900)
        assert np.asarray(idx).max() < 1900
        _, oracle_idx = numpy_topk(q @ c[:1900].T, k)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)


class TestShardedTopkMips:
    def test_matches_single_shard(self, rng, mesh8):
        n, d, k = 512, 32, 13
        q = rng.randn(5, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        vals, idx = sharded_topk_mips(jnp.asarray(q), jnp.asarray(c), k, mesh8, chunk_size=64)
        oracle_vals, oracle_idx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), oracle_vals, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)

    def test_valid_rows_across_shards(self, rng, mesh8):
        n, d, k = 512, 16, 7
        q = rng.randn(3, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        c[300:] = 50.0
        vals, idx = sharded_topk_mips(jnp.asarray(q), jnp.asarray(c), k, mesh8,
                                      chunk_size=64, valid_rows=300)
        assert np.asarray(idx).max() < 300
        _, oracle_idx = numpy_topk(q @ c[:300].T, k)
        np.testing.assert_array_equal(np.asarray(idx), oracle_idx)
