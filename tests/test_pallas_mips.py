"""Pallas grouped-max kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kirag_tpu.ops.pallas_mips import LANES, approx_topk_mips, grouped_max_scores


class TestGroupedMaxScores:
    def test_matches_numpy(self, rng):
        q = rng.randn(8, 32).astype(np.float32)
        c = rng.randn(1024, 32).astype(np.float32)
        gmax, gidx = grouped_max_scores(jnp.asarray(q), jnp.asarray(c),
                                        chunk_size=256, interpret=True)
        scores = q @ c.T
        ref = scores.reshape(8, 1024 // LANES, LANES)
        np.testing.assert_allclose(np.asarray(gmax), ref.max(-1), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(gidx), ref.argmax(-1))

    def test_tie_prefers_lowest_lane(self):
        q = np.ones((1, 8), dtype=np.float32)
        c = np.ones((256, 8), dtype=np.float32)
        _, gidx = grouped_max_scores(jnp.asarray(q), jnp.asarray(c),
                                     chunk_size=256, interpret=True)
        assert np.all(np.asarray(gidx) == 0)


class TestApproxTopk:
    def test_top1_exact(self, rng):
        q = rng.randn(6, 16).astype(np.float32)
        c = rng.randn(512, 16).astype(np.float32)
        vals, idx = approx_topk_mips(jnp.asarray(q), jnp.asarray(c), k=1,
                                     chunk_size=256, interpret=True)
        ref = np.argmax(q @ c.T, axis=1)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], ref)

    def test_recall_vs_exact(self, rng):
        from kirag_tpu.ops.mips import topk_mips

        q = rng.randn(16, 24).astype(np.float32)
        c = rng.randn(4096, 24).astype(np.float32)
        k = 10
        va, ia = approx_topk_mips(jnp.asarray(q), jnp.asarray(c), k=k,
                                  chunk_size=512, interpret=True)
        ve, ie = topk_mips(jnp.asarray(q), jnp.asarray(c), k, chunk_size=512)
        recalls = [len(set(np.asarray(ia)[i]) & set(np.asarray(ie)[i])) / k
                   for i in range(16)]
        # expected ~1 - k(k-1)*64/N = ~0.86 here (small N); generous floor
        assert np.mean(recalls) > 0.75
        # returned values are real scores
        scores = q @ c.T
        got = np.take_along_axis(scores, np.asarray(ia), axis=1)
        np.testing.assert_allclose(np.asarray(va), got, rtol=1e-4, atol=1e-4)

    def test_valid_rows_masks_padding(self, rng):
        q = rng.randn(2, 8).astype(np.float32)
        c = rng.randn(300, 8).astype(np.float32)
        c[250:] = 100.0
        vals, idx = approx_topk_mips(jnp.asarray(q), jnp.asarray(c), k=5,
                                     chunk_size=256, valid_rows=250, interpret=True)
        assert np.asarray(idx).max() < 250
