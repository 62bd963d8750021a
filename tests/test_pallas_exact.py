"""Fused exact Pallas MIPS kernels vs the numpy oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kirag_tpu.ops.pallas_exact import (
    exact_topk_mips,
    sharded_exact_topk_mips,
    topk_lastdim,
)

def numpy_topk(scores: np.ndarray, k: int):
    """Oracle: exact top-k sorted by (-score, index) — flat-scan tie-breaking."""
    order = np.lexsort(
        (np.arange(scores.shape[-1])[None, :].repeat(len(scores), 0), -scores),
        axis=-1)
    idx = order[:, :k]
    vals = np.take_along_axis(scores, idx, axis=-1)
    return vals, idx


class TestTopkLastdim:
    @pytest.mark.parametrize("q,w,k", [(3, 256, 5), (8, 512, 17), (5, 384, 1)])
    def test_matches_oracle_param(self, rng, q, w, k):
        x = rng.randn(q, w).astype(np.float32)
        vals, idx = topk_lastdim(jnp.asarray(x), k, interpret=True)
        ovals, oidx = numpy_topk(x, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_ties_prefer_lower_index(self):
        x = np.zeros((2, 256), dtype=np.float32)
        x[0, [7, 3, 200]] = 1.0  # three-way tie
        x[1, :] = 2.0            # full-row tie
        vals, idx = topk_lastdim(jnp.asarray(x), 3, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx)[0], [3, 7, 200])
        np.testing.assert_array_equal(np.asarray(idx)[1], [0, 1, 2])

    def test_ragged_width_and_rows(self, rng):
        x = rng.randn(5, 300).astype(np.float32)
        vals, idx = topk_lastdim(jnp.asarray(x), 7, interpret=True)
        ovals, oidx = numpy_topk(x, 7)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_fallback_matches_oracle(self, rng):
        x = rng.randn(4, 100).astype(np.float32)
        vals, idx = topk_lastdim(jnp.asarray(x), 5)
        ovals, oidx = numpy_topk(x, 5)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), oidx)


class TestExactTopkMips:
    @pytest.mark.parametrize("n,k,chunk", [(1024, 5, 256), (4096, 25, 1024),
                                           (2500, 10, 512)])
    def test_matches_oracle(self, rng, n, k, chunk):
        q = rng.randn(7, 32).astype(np.float32)
        c = rng.randn(n, 32).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                    chunk_size=chunk, interpret=True)
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_tiny_corpus_fallback(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(100, 16).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 5,
                                    interpret=True)
        ovals, oidx = numpy_topk(q @ c.T, 5)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_k_larger_than_n(self, rng):
        q = rng.randn(2, 8).astype(np.float32)
        c = rng.randn(3, 8).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 5,
                                    interpret=True)
        assert vals.shape == (2, 5) and idx.shape == (2, 5)
        assert bool(jnp.all(vals[:, 3:] == -jnp.inf))

    def test_valid_rows_masks_poisoned_tail(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        c[1900:] = 100.0  # would displace real groups if unmasked in pass A
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                    chunk_size=512, valid_rows=1900,
                                    interpret=True)
        assert np.asarray(idx).max() < 1900
        _, oidx = numpy_topk(q @ c[:1900].T, 7)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_all_scores_tie(self):
        q = np.ones((1, 8), dtype=np.float32)
        c = np.ones((2048, 8), dtype=np.float32)
        _, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 5,
                                 chunk_size=512, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3, 4])

    def test_cross_group_tie_prefers_lower_row(self):
        # row 130 (group 1) scores highest; rows 3 (group 0) and 200 (group 1)
        # tie below it. Group 1 has the larger group-max, so an UNSORTED
        # group gather would list row 200 before row 3.
        d = 8
        v = np.zeros(d, dtype=np.float32)
        v[0] = 1.0
        c = np.zeros((2048, d), dtype=np.float32)
        c[3] = v
        c[200] = v
        c[130] = 2 * v
        q = v[None, :]
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 3,
                                    chunk_size=512, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx)[0], [130, 3, 200])
        np.testing.assert_allclose(np.asarray(vals)[0], [2.0, 1.0, 1.0])

    def test_int8_scales_match_dequantized_oracle(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        c = rng.randn(1024, 32).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        ci8, scales = quantize_rows_int8(c)
        vals, idx = exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        # self-retrieval survives int8 quantization
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))
        assert np.isfinite(np.asarray(vals)).all()

    def test_negative_scores_not_poisoned_by_mask(self, rng):
        q = -np.abs(rng.randn(2, 16)).astype(np.float32)
        c = np.abs(rng.randn(600, 16)).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 4,
                                    chunk_size=256, valid_rows=590,
                                    interpret=True)
        assert np.isfinite(np.asarray(vals)).all()
        _, oidx = numpy_topk(q @ c[:590].T, 4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)


class TestTwopassImpl:
    """The round-2 two-pass kernel stays available as the low-HBM fallback
    (impl="twopass") — same oracle contract as the single-read default."""

    @pytest.mark.parametrize("n,k,chunk", [(4096, 25, 1024), (2500, 10, 512)])
    def test_matches_oracle(self, rng, n, k, chunk):
        q = rng.randn(7, 32).astype(np.float32)
        c = rng.randn(n, 32).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                    chunk_size=chunk, interpret=True,
                                    impl="twopass")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_valid_rows_and_ties(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        c[1900:] = 100.0
        _, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                 chunk_size=512, valid_rows=1900,
                                 interpret=True, impl="twopass")
        assert np.asarray(idx).max() < 1900
        _, oidx = numpy_topk(q @ c[:1900].T, 7)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_int8_scales(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        c = rng.randn(1024, 32).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        ci8, scales = quantize_rows_int8(c)
        _, idx = exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales),
            impl="twopass")
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))

    def test_sharded_twopass(self, rng, mesh8):
        n, d, k = 2048, 16, 7
        q = rng.randn(3, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        vals, idx = sharded_exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                            mesh8, chunk_size=256,
                                            interpret=True, impl="twopass")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_chunk_size_not_lane_multiple_is_rounded(self, rng):
        # regression: chunk_size=1000 used to survive the clamp and break the
        # in-kernel [Q, G, LANES] reshape at trace time
        q = rng.randn(2, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        _, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 5,
                                 chunk_size=1000, interpret=True)
        _, oidx = numpy_topk(q @ c.T, 5)
        np.testing.assert_array_equal(np.asarray(idx), oidx)


class TestShardedExact:
    def test_matches_oracle(self, rng, mesh8):
        n, d, k = 4096, 32, 13
        q = rng.randn(5, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        vals, idx = sharded_exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                            mesh8, chunk_size=256,
                                            interpret=True)
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_valid_rows_in_last_shard(self, rng, mesh8):
        n, d, k = 2048, 16, 7
        q = rng.randn(3, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        c[1900:] = 50.0
        vals, idx = sharded_exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                            mesh8, chunk_size=256,
                                            valid_rows=1900, interpret=True)
        assert np.asarray(idx).max() < 1900
        _, oidx = numpy_topk(q @ c[:1900].T, k)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_sharded_int8(self, rng, mesh8):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        c = rng.randn(2048, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        ci8, scales = quantize_rows_int8(c)
        vals, idx = sharded_exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5, mesh8,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))


class TestCrossGroupTieRegression:
    """The same adversarial tie against the XLA exact paths (regression for
    the unsorted-group-gather tie-break bug)."""

    def _fixture(self):
        d = 8
        v = np.zeros(d, dtype=np.float32)
        v[0] = 1.0
        c = np.zeros((2048, d), dtype=np.float32)
        c[3] = v
        c[200] = v
        c[130] = 2 * v
        return v[None, :], c

    def test_scan_path(self):
        from kirag_tpu.ops.mips import topk_mips

        q, c = self._fixture()
        _, idx = topk_mips(jnp.asarray(q), jnp.asarray(c), 3, chunk_size=2048)
        np.testing.assert_array_equal(np.asarray(idx)[0], [130, 3, 200])

    def test_onepass_path(self):
        from kirag_tpu.ops.mips import topk_mips_onepass

        q, c = self._fixture()
        _, idx = topk_mips_onepass(jnp.asarray(q), jnp.asarray(c), 3)
        np.testing.assert_array_equal(np.asarray(idx)[0], [130, 3, 200])


class TestHierTopk:
    @pytest.mark.parametrize("w,k,block", [(512, 10, 16), (1000, 7, 8),
                                           (4096, 100, 16)])
    def test_matches_oracle(self, rng, w, k, block):
        from kirag_tpu.ops.pallas_exact import hier_topk

        x = rng.randn(5, w).astype(np.float32)
        vals, idx = jax.jit(hier_topk, static_argnums=(1, 2))(
            jnp.asarray(x), k, block)
        ovals, oidx = numpy_topk(x, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_cross_block_ties(self):
        from kirag_tpu.ops.pallas_exact import hier_topk

        # tie spans blocks where the later block has the larger block-max
        x = np.zeros((1, 512), dtype=np.float32)
        x[0, 3] = 1.0
        x[0, 200] = 1.0
        x[0, 130] = 2.0
        vals, idx = hier_topk(jnp.asarray(x), 3, block=16)
        np.testing.assert_array_equal(np.asarray(idx)[0], [130, 3, 200])

    def test_neg_inf_mask_values(self, rng):
        from kirag_tpu.ops.pallas_exact import hier_topk

        x = rng.randn(2, 512).astype(np.float32)
        x[:, 400:] = -np.inf
        vals, idx = hier_topk(jnp.asarray(x), 5)
        ovals, oidx = numpy_topk(x[:, :400], 5)
        np.testing.assert_array_equal(np.asarray(idx), oidx)
        assert np.isfinite(np.asarray(vals)).all()

    def test_all_masked_returns_neg_inf(self):
        from kirag_tpu.ops.pallas_exact import hier_topk

        x = np.full((1, 512), -np.inf, dtype=np.float32)
        vals, _ = hier_topk(jnp.asarray(x), 3)
        assert bool(jnp.all(vals == -jnp.inf))


class TestExactSelectHier:
    @pytest.mark.parametrize("n,k,chunk", [(4096, 25, 1024), (2500, 10, 512)])
    def test_matches_oracle(self, rng, n, k, chunk):
        q = rng.randn(7, 32).astype(np.float32)
        c = rng.randn(n, 32).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                    chunk_size=chunk, interpret=True,
                                    select="hier")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_cross_group_tie(self):
        d = 8
        v = np.zeros(d, dtype=np.float32)
        v[0] = 1.0
        c = np.zeros((4096, d), dtype=np.float32)
        c[3] = v
        c[200] = v
        c[130] = 2 * v
        vals, idx = exact_topk_mips(jnp.asarray(v[None]), jnp.asarray(c), 3,
                                    chunk_size=512, interpret=True,
                                    select="hier")
        np.testing.assert_array_equal(np.asarray(idx)[0], [130, 3, 200])

    def test_valid_rows(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        c[1900:] = 100.0
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                    chunk_size=512, valid_rows=1900,
                                    interpret=True, select="hier")
        assert np.asarray(idx).max() < 1900
        _, oidx = numpy_topk(q @ c[:1900].T, 7)
        np.testing.assert_array_equal(np.asarray(idx), oidx)


class TestImplResolution:
    def test_explicit_impls_are_honored(self):
        from kirag_tpu.ops.pallas_exact import _resolve_impl

        assert _resolve_impl("auto", 256, 10_000, 10_000 * 128) == "stream"
        assert _resolve_impl("single", 256, 10_000, 10_000 * 128) == "single"
        assert _resolve_impl("twopass", 256, 10_000, 10_000 * 128) == "twopass"

    def test_auto_falls_back_on_vmem_pressure(self):
        from kirag_tpu.ops.pallas_exact import _resolve_impl

        # large Q: the [Q, chunk] f32 score window alone busts VMEM
        assert _resolve_impl("auto", 1024, 10_000, 10_000 * 128) == "twopass"
        assert _resolve_impl("auto", 256, 10_000, 10_000 * 128,
                             chunk_size=32768) == "twopass"

    def test_invalid_values_raise(self):
        from kirag_tpu.ops.pallas_exact import _check_select, _resolve_impl

        with pytest.raises(ValueError):
            _resolve_impl("bogus", 256, 1000, 1000)
        with pytest.raises(ValueError):
            _check_select("heir")
        with pytest.raises(ValueError):
            exact_topk_mips(jnp.zeros((2, 8)), jnp.zeros((64, 8)), 3,
                            select="Hier", interpret=True)

    def test_indexer_validates_select(self):
        from kirag_tpu.index import TPUIndexer

        with pytest.raises(KeyError):
            TPUIndexer(16, pallas_select="heir")

    def test_sharded_large_q_uses_twopass_guard(self, rng, mesh8):
        # Q > 512 through the SHARDED path must not pick the single kernel
        # (VMEM guard lives in the shared _resolve_impl)
        from kirag_tpu.ops.pallas_exact import sharded_exact_topk_mips

        q = rng.randn(520, 16).astype(np.float32)
        c = rng.randn(1024, 16).astype(np.float32)
        vals, idx = sharded_exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 3,
                                            mesh8, chunk_size=128,
                                            interpret=True, impl="auto")
        ovals, oidx = numpy_topk(q @ c.T, 3)
        np.testing.assert_array_equal(np.asarray(idx), oidx)


class TestSingleStridedLayout:
    """The [Q, N]-layout score-write variant (impl="single_strided") kept
    for on-chip A/B against the chunk-contiguous default."""

    def test_matches_oracle_and_ties(self, rng):
        q = rng.randn(5, 32).astype(np.float32)
        c = rng.randn(4096, 32).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 25,
                                    chunk_size=1024, interpret=True,
                                    impl="single_strided", select="hier")
        ovals, oidx = numpy_topk(q @ c.T, 25)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)


class TestQueryBlocking:
    def test_large_batch_matches_oracle(self, rng):
        """Q > QUERY_BLOCK (and a multiple): blockwise lax.map path must be
        oracle-identical to the flat path incl. tie-breaking."""
        from kirag_tpu.ops import pallas_exact as pe

        old = pe.QUERY_BLOCK
        pe.QUERY_BLOCK = 4  # force blocking at test scale
        try:
            q = rng.randn(12, 16).astype(np.float32)
            c = rng.randn(2048, 16).astype(np.float32)
            c[100] = c[900] = q[5] * 3  # cross-block tie for one query
            vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                        chunk_size=512, interpret=True)
            ovals, oidx = numpy_topk(q @ c.T, 7)
            np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            pe.QUERY_BLOCK = old

    def test_non_multiple_batch_still_exact(self, rng):
        from kirag_tpu.ops import pallas_exact as pe

        old = pe.QUERY_BLOCK
        pe.QUERY_BLOCK = 4
        try:
            q = rng.randn(10, 16).astype(np.float32)  # not a multiple of 4
            c = rng.randn(1024, 16).astype(np.float32)
            _, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 5,
                                     chunk_size=256, interpret=True)
            _, oidx = numpy_topk(q @ c.T, 5)
            np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            pe.QUERY_BLOCK = old


class TestStreamImpl:
    """impl="stream" (round 4): one corpus read, in-VMEM capture, membership
    check, lax.cond exact fallback — same oracle contract as single/twopass."""

    @pytest.mark.parametrize("n,k,chunk", [(1024, 5, 256), (4096, 25, 1024),
                                           (2500, 10, 512)])
    def test_matches_oracle(self, rng, n, k, chunk):
        q = rng.randn(7, 32).astype(np.float32)
        c = rng.randn(n, 32).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                    chunk_size=chunk, interpret=True,
                                    impl="stream")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_hier_select_and_valid_rows(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        c[1900:] = 100.0  # poison tail: must be masked inside the kernel
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                    chunk_size=512, valid_rows=1900,
                                    interpret=True, impl="stream",
                                    select="hier")
        assert np.asarray(idx).max() < 1900
        _, oidx = numpy_topk(q @ c[:1900].T, 7)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_cross_group_tie_prefers_lower_row(self):
        d = 8
        v = np.zeros(d, dtype=np.float32)
        v[0] = 1.0
        c = np.zeros((2048, d), dtype=np.float32)
        c[3] = v
        c[200] = v
        c[130] = 2 * v
        vals, idx = exact_topk_mips(jnp.asarray(v[None]), jnp.asarray(c), 3,
                                    chunk_size=512, interpret=True,
                                    impl="stream")
        np.testing.assert_array_equal(np.asarray(idx)[0], [130, 3, 200])
        np.testing.assert_allclose(np.asarray(vals)[0], [2.0, 1.0, 1.0])

    def test_adversarial_cluster_falls_back_exactly(self, rng):
        # every top-k row in ONE chunk: the capture budget (B ~ 2k/chunks)
        # cannot hold them, the membership check must fail, and the lax.cond
        # fallback must still return oracle-exact results
        c = (rng.randn(4096, 16) * 0.01).astype(np.float32)
        c[100:200] = (rng.randn(100, 16) + 5.0).astype(np.float32)
        q = np.ones((3, 16), dtype=np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 30,
                                    chunk_size=512, interpret=True,
                                    impl="stream")
        ovals, oidx = numpy_topk(q @ c.T, 30)
        np.testing.assert_array_equal(np.asarray(idx), oidx)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)

    def test_random_data_serves_from_capture(self, rng):
        # the fast path must actually be taken on typical data: bypass the
        # fallback branch entirely and demand oracle parity from the capture
        from kirag_tpu.ops import pallas_exact as pe

        jax.clear_caches()  # the hook is not part of the jit key
        pe._STREAM_ASSERT_CAPTURE = True
        try:
            q = rng.randn(6, 24).astype(np.float32)
            c = rng.randn(4224, 24).astype(np.float32)
            vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 11,
                                        chunk_size=384, interpret=True,
                                        impl="stream")
            _, oidx = numpy_topk(q @ c.T, 11)
            np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            pe._STREAM_ASSERT_CAPTURE = False
            jax.clear_caches()

    def test_int8_scales(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        c = rng.randn(1024, 32).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        ci8, scales = quantize_rows_int8(c)
        _, idx = exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales),
            impl="stream")
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))

    def test_sharded_stream(self, rng, mesh8):
        n, d, k = 4096, 32, 13
        q = rng.randn(5, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        vals, idx = sharded_exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                            mesh8, chunk_size=256,
                                            interpret=True, impl="stream")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_blockwise_large_batch(self, rng):
        from kirag_tpu.ops import pallas_exact as pe

        old = pe.QUERY_BLOCK
        pe.QUERY_BLOCK = 4
        try:
            q = rng.randn(12, 16).astype(np.float32)
            c = rng.randn(2048, 16).astype(np.float32)
            _, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                     chunk_size=512, interpret=True,
                                     impl="stream")
            _, oidx = numpy_topk(q @ c.T, 7)
            np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            pe.QUERY_BLOCK = old

    def test_auto_resolves_to_stream(self):
        from kirag_tpu.ops.pallas_exact import _resolve_impl

        assert _resolve_impl("auto", 256, 10_000, 10_000 * 128) == "stream"
        # 8M int8 rows: stream has no HBM score buffer, stays stream
        assert _resolve_impl("auto", 256, 8_388_608,
                             8_388_608 * 1024) == "stream"
        # VMEM envelope still forces twopass for huge query batches
        assert _resolve_impl("auto", 1024, 10_000, 10_000 * 128) == "twopass"

    def test_capture_budget_bounds(self):
        from kirag_tpu.ops.pallas_exact import _capture_budget

        assert _capture_budget(100, 61, 128) == 8      # 1M/16384 regime
        assert _capture_budget(100, 7, 128) == 32      # few chunks -> wider
        assert _capture_budget(100, 1, 128) == 128     # capped at G = total
        assert _capture_budget(5, 16, 128) == 8        # floor


class TestCapdomSelect:
    """select="capdom" on impl="stream": group selection over the C*B
    capture maxima with a residual exactness proof (ties or an overflowed
    capture flip the lax.cond to the exact global path)."""

    @pytest.mark.parametrize("n,k,chunk", [(1024, 5, 256), (4096, 25, 1024),
                                           (2500, 10, 512)])
    def test_matches_oracle(self, rng, n, k, chunk):
        q = rng.randn(7, 32).astype(np.float32)
        c = rng.randn(n, 32).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                    chunk_size=chunk, interpret=True,
                                    impl="stream", select="capdom")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_assembly_forms_bit_identical(self, rng):
        # "pallas" (capture-streaming one-hot blend) vs "einsum" (round-4
        # XLA form): same candidates, values AND indices bit-for-bit —
        # only the schedule differs (VERDICT r4 #1: the einsum materialized
        # a [Q, k, C*B] one-hot in HBM)
        from kirag_tpu.ops import pallas_exact as pe

        q = rng.randn(6, 32).astype(np.float32)
        c = rng.randn(4096, 32).astype(np.float32)
        outs = {}
        saved = pe.CAPDOM_ASSEMBLY
        try:
            for mode in ("pallas", "einsum"):
                pe.CAPDOM_ASSEMBLY = mode
                jax.clear_caches()
                outs[mode] = exact_topk_mips(
                    jnp.asarray(q), jnp.asarray(c), 17, chunk_size=512,
                    interpret=True, impl="stream", select="capdom")
        finally:
            pe.CAPDOM_ASSEMBLY = saved
            jax.clear_caches()
        np.testing.assert_array_equal(np.asarray(outs["pallas"][0]),
                                      np.asarray(outs["einsum"][0]))
        np.testing.assert_array_equal(np.asarray(outs["pallas"][1]),
                                      np.asarray(outs["einsum"][1]))
        _, oidx = numpy_topk(q @ c.T, 17)
        np.testing.assert_array_equal(np.asarray(outs["pallas"][1]), oidx)

    def test_random_data_serves_from_capture(self, rng):
        # the fast path must actually fire on typical data
        from kirag_tpu.ops import pallas_exact as pe

        jax.clear_caches()
        pe._STREAM_ASSERT_CAPTURE = True
        try:
            q = rng.randn(6, 24).astype(np.float32)
            c = rng.randn(4224, 24).astype(np.float32)
            vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 11,
                                        chunk_size=384, interpret=True,
                                        impl="stream", select="capdom")
            _, oidx = numpy_topk(q @ c.T, 11)
            np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            pe._STREAM_ASSERT_CAPTURE = False
            jax.clear_caches()

    def test_cross_group_tie_prefers_lower_row(self):
        # equal scores land in different groups AND different chunks: the
        # flattened capture order + stable top_k must still produce global
        # FAISS (lowest-row-id) tie order
        d = 8
        v = np.zeros(d, dtype=np.float32)
        v[0] = 1.0
        c = np.zeros((2048, d), dtype=np.float32)
        c[3] = v
        c[1800] = v  # different chunk at chunk_size=512
        c[130] = 2 * v
        vals, idx = exact_topk_mips(jnp.asarray(v[None]), jnp.asarray(c), 2,
                                    chunk_size=512, interpret=True,
                                    impl="stream", select="capdom")
        np.testing.assert_array_equal(np.asarray(idx)[0], [130, 3])
        np.testing.assert_allclose(np.asarray(vals)[0], [2.0, 1.0])

    def test_adversarial_cluster_falls_back_exactly(self, rng):
        # every top-k row in ONE chunk: capture overflows, residual check
        # fails, fallback must still be oracle-exact
        c = (rng.randn(4096, 16) * 0.01).astype(np.float32)
        c[100:200] = (rng.randn(100, 16) + 5.0).astype(np.float32)
        q = np.ones((3, 16), dtype=np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 30,
                                    chunk_size=512, interpret=True,
                                    impl="stream", select="capdom")
        ovals, oidx = numpy_topk(q @ c.T, 30)
        np.testing.assert_array_equal(np.asarray(idx), oidx)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)

    def test_valid_rows_masked(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        c[1900:] = 100.0
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                    chunk_size=512, valid_rows=1900,
                                    interpret=True, impl="stream",
                                    select="capdom")
        assert np.asarray(idx).max() < 1900
        _, oidx = numpy_topk(q @ c[:1900].T, 7)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_int8_scales(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        c = rng.randn(1024, 32).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        ci8, scales = quantize_rows_int8(c)
        _, idx = exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales),
            impl="stream", select="capdom")
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))

    def test_nonstream_impl_degrades_to_hier(self, rng):
        # capdom has no meaning outside the stream kernel: other impls must
        # silently select hier and stay oracle-exact
        q = rng.randn(4, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        _, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 9,
                                 chunk_size=512, interpret=True,
                                 impl="twopass", select="capdom")
        _, oidx = numpy_topk(q @ c.T, 9)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_tiled_query_blocks_match_oracle(self, rng):
        # Q > QUERY_BLOCK on the stream impl: query blocks tile the kernel
        # grid's minor axis (ONE corpus read), capdom tail over the full
        # batch — must be oracle-identical incl. cross-block queries
        from kirag_tpu.ops import pallas_exact as pe

        old = pe.QUERY_BLOCK
        pe.QUERY_BLOCK = 4
        try:
            q = rng.randn(12, 16).astype(np.float32)
            c = rng.randn(2048, 16).astype(np.float32)
            c[100] = c[900] = q[5] * 3  # tie seen by one query block
            for sel in ("capdom", "hier"):
                vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                            chunk_size=512, interpret=True,
                                            impl="stream", select=sel)
                ovals, oidx = numpy_topk(q @ c.T, 7)
                np.testing.assert_allclose(np.asarray(vals), ovals,
                                           rtol=1e-4, atol=1e-4)
                np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            pe.QUERY_BLOCK = old

    def test_tiled_int8_scales(self, rng):
        # scale operands must follow the CHUNK grid coordinate, not the
        # qblock one, in both the stream kernel and the fallback gather
        from kirag_tpu.ops import pallas_exact as pe
        from kirag_tpu.ops.quantized import quantize_rows_int8

        old = pe.QUERY_BLOCK
        pe.QUERY_BLOCK = 4
        try:
            c = rng.randn(1024, 32).astype(np.float32)
            c /= np.linalg.norm(c, axis=-1, keepdims=True)
            q = c[:8]
            ci8, scales = quantize_rows_int8(c)
            _, idx = exact_topk_mips(
                jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5,
                chunk_size=256, interpret=True, scales=jnp.asarray(scales),
                impl="stream", select="capdom")
            np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(8))
        finally:
            pe.QUERY_BLOCK = old

    def test_tiled_adversarial_falls_back_exactly(self, rng):
        # tiled batch + capture overflow: the QUERY-TILED twopass gather
        # fallback must still assemble oracle-exact candidates
        from kirag_tpu.ops import pallas_exact as pe

        old = pe.QUERY_BLOCK
        pe.QUERY_BLOCK = 4
        try:
            c = (rng.randn(4096, 16) * 0.01).astype(np.float32)
            c[100:200] = (rng.randn(100, 16) + 5.0).astype(np.float32)
            q = np.ones((8, 16), dtype=np.float32) + \
                rng.randn(8, 16).astype(np.float32) * 0.01
            for sel in ("capdom", "hier"):
                vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c),
                                            30, chunk_size=512,
                                            interpret=True, impl="stream",
                                            select=sel)
                ovals, oidx = numpy_topk(q @ c.T, 30)
                np.testing.assert_array_equal(np.asarray(idx), oidx)
                np.testing.assert_allclose(np.asarray(vals), ovals,
                                           rtol=1e-4, atol=1e-4)
        finally:
            pe.QUERY_BLOCK = old

    def test_supertile_grouping(self):
        # dispatch: 12 blocks of QUERY_BLOCK group into 4-block supertiles;
        # 6 into 3; 5 into 1 (indivisible by 2..4)
        from kirag_tpu.ops.pallas_exact import STREAM_QTILE

        def group_of(n_blocks):
            return next(g for g in range(min(STREAM_QTILE, n_blocks), 0, -1)
                        if n_blocks % g == 0)

        assert group_of(12) == 4
        assert group_of(6) == 3
        assert group_of(5) == 1
        assert group_of(4) == 4
        assert group_of(1) == 1

    def test_sharded_capdom(self, rng, mesh8):
        n, d, k = 4096, 32, 13
        q = rng.randn(5, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        vals, idx = sharded_exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                            mesh8, chunk_size=256,
                                            interpret=True, impl="stream",
                                            select="capdom")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)


class TestMergeSelect:
    """select="merge" on impl="stream": the round-5 running in-kernel
    top-B window — candidates accumulate in the kernel's revisited output
    refs across chunk steps; no capture matrix, no assembly. Exactness is
    proven by the lost-max check (non-captured residual + ejected window
    keys); ties or adversarial clustering flip the lax.cond to the exact
    global path."""

    @pytest.mark.parametrize("n,k,chunk", [(1024, 5, 256), (4096, 25, 1024),
                                           (2500, 10, 512), (4096, 1, 512)])
    def test_matches_oracle(self, rng, n, k, chunk):
        q = rng.randn(7, 32).astype(np.float32)
        c = rng.randn(n, 32).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                    chunk_size=chunk, interpret=True,
                                    impl="stream", select="merge")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_random_data_serves_from_window(self, rng):
        # the fast path must actually fire on typical data
        from kirag_tpu.ops import pallas_exact as pe

        jax.clear_caches()
        pe._STREAM_ASSERT_CAPTURE = True
        try:
            q = rng.randn(6, 24).astype(np.float32)
            c = rng.randn(4224, 24).astype(np.float32)
            vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 11,
                                        chunk_size=384, interpret=True,
                                        impl="stream", select="merge")
            _, oidx = numpy_topk(q @ c.T, 11)
            np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            pe._STREAM_ASSERT_CAPTURE = False
            jax.clear_caches()

    def test_cross_chunk_tie_prefers_lower_row(self):
        # equal scores in different groups AND different chunks: the final
        # in-kernel gid sort must compose to global FAISS (lowest-row) order
        d = 8
        v = np.zeros(d, dtype=np.float32)
        v[0] = 1.0
        c = np.zeros((2048, d), dtype=np.float32)
        c[3] = v
        c[1800] = v  # different chunk at chunk_size=512
        c[130] = 2 * v
        vals, idx = exact_topk_mips(jnp.asarray(v[None]), jnp.asarray(c), 2,
                                    chunk_size=512, interpret=True,
                                    impl="stream", select="merge")
        np.testing.assert_array_equal(np.asarray(idx)[0], [130, 3])
        np.testing.assert_allclose(np.asarray(vals)[0], [2.0, 1.0])

    def test_adversarial_cluster_falls_back_exactly(self, rng):
        # every top-k row in ONE chunk: per-chunk capture overflows, the
        # lost check fails, fallback must still be oracle-exact
        c = (rng.randn(4096, 16) * 0.01).astype(np.float32)
        c[100:200] = (rng.randn(100, 16) + 5.0).astype(np.float32)
        q = np.ones((3, 16), dtype=np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 30,
                                    chunk_size=512, interpret=True,
                                    impl="stream", select="merge")
        ovals, oidx = numpy_topk(q @ c.T, 30)
        np.testing.assert_array_equal(np.asarray(idx), oidx)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)

    def test_all_tie_corpus_falls_back_exactly(self, rng):
        # every score equal: the strict lost check must fail and the
        # fallback must reproduce FAISS ascending-row order
        q = np.ones((4, 16), dtype=np.float32)
        c = np.ones((2048, 16), dtype=np.float32)
        _, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 10,
                                 chunk_size=256, interpret=True,
                                 impl="stream", select="merge")
        np.testing.assert_array_equal(
            np.asarray(idx), np.tile(np.arange(10), (4, 1)))

    def test_valid_rows_masked(self, rng):
        q = rng.randn(3, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        c[1900:] = 100.0
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                    chunk_size=512, valid_rows=1900,
                                    interpret=True, impl="stream",
                                    select="merge")
        assert np.asarray(idx).max() < 1900
        _, oidx = numpy_topk(q @ c[:1900].T, 7)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_int8_scales(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        c = rng.randn(1024, 32).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        ci8, scales = quantize_rows_int8(c)
        _, idx = exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales),
            impl="stream", select="merge")
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))

    def test_int4_matches_capdom(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int4

        c = rng.randn(2048, 256).astype(np.float32)
        q = rng.randn(5, 256).astype(np.float32)
        packed, scales = quantize_rows_int4(c)
        out = {}
        for sel in ("merge", "capdom"):
            out[sel] = exact_topk_mips(
                jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(packed), 12,
                chunk_size=512, interpret=True, scales=jnp.asarray(scales),
                impl="stream", select=sel)
        np.testing.assert_array_equal(np.asarray(out["merge"][1]),
                                      np.asarray(out["capdom"][1]))
        np.testing.assert_array_equal(np.asarray(out["merge"][0]),
                                      np.asarray(out["capdom"][0]))

    def test_nonstream_impl_degrades_to_hier(self, rng):
        q = rng.randn(4, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        _, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 9,
                                 chunk_size=512, interpret=True,
                                 impl="twopass", select="merge")
        _, oidx = numpy_topk(q @ c.T, 9)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_blockwise_query_batches(self, rng):
        # merge tiles per single QUERY_BLOCK (the window revisit needs the
        # chunk axis minor), so big batches run block-by-block under lax.map
        from kirag_tpu.ops import pallas_exact as pe

        old = pe.QUERY_BLOCK
        pe.QUERY_BLOCK = 4
        try:
            q = rng.randn(12, 16).astype(np.float32)
            c = rng.randn(2048, 16).astype(np.float32)
            c[100] = c[900] = q[5] * 3  # tie seen by one query block
            vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                        chunk_size=512, interpret=True,
                                        impl="stream", select="merge")
            ovals, oidx = numpy_topk(q @ c.T, 7)
            np.testing.assert_allclose(np.asarray(vals), ovals,
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            pe.QUERY_BLOCK = old

    def test_single_chunk_corpus(self, rng):
        # num_chunks == 1: window init and the final gid sort run on the
        # same grid step
        q = rng.randn(5, 32).astype(np.float32)
        c = rng.randn(1024, 32).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 9,
                                    chunk_size=1024, interpret=True,
                                    impl="stream", select="merge")
        _, oidx = numpy_topk(q @ c.T, 9)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_large_k_degrades_to_capdom(self, rng):
        # qb=256 x br=408 slots x [128] f32 = 53 MB of window: beyond the
        # ~24 MB VMEM guard the route must silently fall back to capdom
        # (still oracle-exact) instead of OOMing at Mosaic lowering
        q = rng.randn(256, 16).astype(np.float32)
        c = rng.randn(32768, 16).astype(np.float32)
        vals, idx = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 400,
                                    chunk_size=4096, interpret=True,
                                    impl="stream", select="merge")
        _, oidx = numpy_topk(q @ c.T, 400)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_sharded_merge(self, rng, mesh8):
        n, d, k = 4096, 32, 13
        q = rng.randn(5, d).astype(np.float32)
        c = rng.randn(n, d).astype(np.float32)
        vals, idx = sharded_exact_topk_mips(jnp.asarray(q), jnp.asarray(c), k,
                                            mesh8, chunk_size=256,
                                            interpret=True, impl="stream",
                                            select="merge")
        ovals, oidx = numpy_topk(q @ c.T, k)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), oidx)


class TestInt4Corpus:
    """Packed-int4 corpora (block-128 scales) across all exact impls."""

    def _quantized(self, rng, n=1024, d=256):
        from kirag_tpu.ops.quantized import quantize_rows_int4

        c = rng.randn(n, d).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        packed, scales = quantize_rows_int4(c)
        return c, packed, scales

    def test_roundtrip_error_bound(self, rng):
        from kirag_tpu.ops.quantized import (dequantize_rows_int4,
                                             quantize_rows_int4)

        c = rng.randn(128, 512).astype(np.float32)
        packed, scales = quantize_rows_int4(c)
        deq = dequantize_rows_int4(packed, scales)
        # worst-case error of the 16-level grid: half a step = absmax / 15
        bound = np.abs(c.reshape(128, 4, 128)).max(-1) / 15.0 + 1e-6
        err = np.abs(deq - c).reshape(128, 4, 128).max(-1)
        assert (err <= bound).all()

    def test_zero_rows_roundtrip_to_zero(self):
        from kirag_tpu.ops.quantized import (dequantize_rows_int4,
                                             quantize_rows_int4)

        packed, scales = quantize_rows_int4(np.zeros((8, 256), np.float32))
        np.testing.assert_array_equal(
            dequantize_rows_int4(packed, scales), 0.0)

    @pytest.mark.parametrize("impl", ["stream", "single", "twopass"])
    def test_kernel_matches_dequantized_oracle(self, rng, impl):
        from kirag_tpu.ops.quantized import dequantize_rows_int4

        c, packed, scales = self._quantized(rng)
        q = c[:4]
        vals, idx = exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(packed), 5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales),
            impl=impl)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))
        assert np.isfinite(np.asarray(vals)).all()
        # high recall vs the exact top-k of the dequantized corpus
        deq = dequantize_rows_int4(packed, scales)
        _, oidx = numpy_topk(q @ deq.T, 5)
        overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 5.0
                           for a, b in zip(np.asarray(idx), oidx)])
        assert overlap >= 0.8, overlap

    def test_tiny_corpus_dense_path(self, rng):
        c, packed, scales = self._quantized(rng, n=100)
        q = c[:3]
        vals, idx = exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(packed), 5,
            interpret=True, scales=jnp.asarray(scales))
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(3))

    def test_sharded_int4(self, rng, mesh8):
        c, packed, scales = self._quantized(rng, n=2048)
        q = c[:4]
        _, idx = sharded_exact_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(packed), 5,
            mesh8, chunk_size=256, interpret=True,
            scales=jnp.asarray(scales), impl="stream")
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))

    def test_bad_shapes_raise(self, rng):
        c, packed, scales = self._quantized(rng)
        with pytest.raises(ValueError):
            exact_topk_mips(jnp.zeros((2, 256)), jnp.asarray(packed), 3,
                            interpret=True,
                            scales=jnp.asarray(scales[:, :1]))
        with pytest.raises(ValueError):
            # 2-D scales demand a packed uint8 corpus
            exact_topk_mips(jnp.zeros((2, 256)),
                            jnp.zeros((1024, 256), jnp.bfloat16), 3,
                            interpret=True, scales=jnp.asarray(scales))


class TestClampChunkDivisor:
    def test_clamped_chunk_divides_requested_chunk(self):
        """Regression (ADVICE r3): the VMEM clamp must return a divisor of
        the requested chunk so chunk-grid pre-padded corpora never re-pad
        inside jit."""
        from kirag_tpu.ops.pallas_exact import _clamp_chunk_for_queries

        for q in (320, 333, 512, 1000, 1024):
            got = _clamp_chunk_for_queries(16384, q)
            assert 16384 % got == 0 and got % 128 == 0
            assert q * got <= 256 * 16384
        # no clamping needed: returned untouched
        assert _clamp_chunk_for_queries(16384, 256) == 16384
        # non-power-of-two chunk still gets a 128-multiple divisor
        got = _clamp_chunk_for_queries(3 * 4096, 512)
        assert (3 * 4096) % got == 0 and got % 128 == 0

    def test_corpus_window_clamp_by_dtype(self):
        """Regression (bench_kirag_batched r4): an f32 corpus at d=1024 with
        chunk 16384 puts a 128 MB double-buffered window in VMEM and OOMs;
        the chunk must shrink with the corpus dtype width."""
        from kirag_tpu.ops.pallas_exact import _clamp_chunk_for_corpus_window

        f32 = jnp.zeros((256, 1024), jnp.float32)
        bf16 = jnp.zeros((256, 1024), jnp.bfloat16)
        i8 = jnp.zeros((256, 1024), jnp.int8)
        packed4 = jnp.zeros((256, 512), jnp.uint8)
        # validated bf16/int8 envelope untouched
        assert _clamp_chunk_for_corpus_window(16384, bf16) == 16384
        assert _clamp_chunk_for_corpus_window(16384, i8) == 16384
        assert _clamp_chunk_for_corpus_window(16384, packed4) == 16384
        # f32 halves the chunk: 2*8192*1024*4 = 64 MB window
        assert _clamp_chunk_for_corpus_window(16384, f32) == 8192
        # result is always a LANES-multiple divisor of the request
        got = _clamp_chunk_for_corpus_window(3 * 4096, f32)
        assert (3 * 4096) % got == 0 and got % 128 == 0
        assert 2 * got * 1024 * 4 <= 64 * 1024 * 1024


class TestFuzzVsOracle:
    """Seeded random sweep over (shape, k, chunk, impl, select, quant)
    combinations — every draw must match the numpy oracle bit-for-bit on
    indices (FAISS lower-index tie-break included). Deterministic seeds:
    failures reproduce by case number."""

    CASES = 18

    @pytest.mark.parametrize("case", range(CASES))
    def test_random_config_matches_oracle(self, case):
        from kirag_tpu.ops.quantized import (dequantize_rows_int4,
                                             quantize_rows_int4,
                                             quantize_rows_int8)

        r = np.random.default_rng(1000 + case)
        impl = r.choice(["stream", "single", "twopass", "auto"])
        select = r.choice(["capdom", "hier", "flat", "merge"])
        quant = r.choice(["none", "none", "int8", "int4"])
        d = 256 if quant == "int4" else int(r.choice([16, 64, 96]))
        n = int(r.integers(300, 4000))
        n_q = int(r.integers(1, 24))
        k = int(r.integers(1, 40))
        chunk = int(r.choice([128, 256, 512, 1024]))
        c = r.standard_normal((n, d), dtype=np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        # duplicated rows exercise tie-breaking under every selection
        dup = r.integers(0, n, size=max(2, n // 50))
        c[dup] = c[dup[0]]
        q = c[r.integers(0, n, size=n_q)] + 0.01 * r.standard_normal(
            (n_q, d), dtype=np.float32)

        import ml_dtypes

        if quant == "int8":
            corpus, scales = quantize_rows_int8(c)
            oracle_c = corpus.astype(np.float32) * scales[:, None]
        elif quant == "int4":
            corpus, scales = quantize_rows_int4(c)
            oracle_c = dequantize_rows_int4(corpus, scales)
        else:
            corpus, scales = c, None
            oracle_c = c
        oracle_q = q
        if quant != "none":
            # quantized kernels round the queries to bf16 before the MXU
            # (the corpus side — int8 values, (nibble-7.5) — is bf16-exact)
            oracle_q = q.astype(ml_dtypes.bfloat16).astype(np.float32)

        vals, idx = exact_topk_mips(
            jnp.asarray(q), jnp.asarray(corpus), k, chunk_size=chunk,
            interpret=True, impl=str(impl), select=str(select),
            scales=None if scales is None else jnp.asarray(scales))
        oscores = oracle_q @ oracle_c.T
        ovals, oidx = numpy_topk(oscores, min(k, n))
        label = f"case={case} impl={impl} select={select} quant={quant} " \
                f"n={n} d={d} q={n_q} k={k} chunk={chunk}"
        vals, idx = np.asarray(vals), np.asarray(idx)
        if quant == "none":
            # unquantized: bit-exact index parity incl. FAISS tie-breaking
            np.testing.assert_array_equal(idx, oidx, err_msg=label)
            np.testing.assert_allclose(vals, ovals, rtol=3e-3, atol=3e-3,
                                       err_msg=label)
        else:
            # quantized: the kernel's blockwise f32 accumulation order
            # differs from numpy's at the last ulp, so near-ties may swap —
            # demand (a) the top-k SCORE curve matches, (b) returned values
            # equal the oracle's scores AT the returned rows (no fabricated
            # candidates), (c) >=90% row overlap with the oracle's top-k
            np.testing.assert_allclose(vals, ovals, rtol=3e-3, atol=3e-3,
                                       err_msg=label)
            at_idx = np.take_along_axis(oscores, idx, axis=-1)
            np.testing.assert_allclose(vals, at_idx, rtol=3e-3, atol=3e-3,
                                       err_msg=label)
            k_eff = min(k, n)
            for qi in range(n_q):
                ov = len(set(idx[qi].tolist()) & set(oidx[qi].tolist()))
                assert ov >= max(1, int(0.9 * k_eff)), (label, qi, ov)


class TestOnMissFlag:
    """on_miss="flag" (round 5): the stream impl without its in-program
    lax.cond fallback — returns (vals, idx, ok). probe_r8 measured the cond's
    presence alone at ~0.7 ms/batch on the 1M flagship shape, so the product
    search_knn path runs flag mode and re-dispatches the checked program on a
    False flag (TPUIndexer._run_mips)."""

    @pytest.mark.parametrize("select", ["capdom", "hier"])
    def test_ok_and_exact_on_random(self, rng, select):
        q = rng.randn(5, 32).astype(np.float32)
        c = rng.randn(4096, 32).astype(np.float32)
        vals, idx, ok = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 13,
                                        chunk_size=1024, interpret=True,
                                        impl="stream", select=select,
                                        on_miss="flag")
        assert bool(ok)
        ovals, oidx = numpy_topk(q @ c.T, 13)
        np.testing.assert_array_equal(np.asarray(idx), oidx)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4,
                                   atol=1e-4)

    @pytest.mark.parametrize("select", ["capdom", "hier"])
    def test_reports_miss_on_adversarial_cluster(self, rng, select):
        # top-k rows spread over MORE groups of one chunk than the capture
        # budget holds (b = max(8, ceil(2k/chunks)) here: 8 < 15 hot groups),
        # so flag mode must say so instead of silently returning the capture
        c = (rng.randn(65536, 16) * 0.01).astype(np.float32)
        hot = np.arange(30) * 64  # 30 hot rows across 15 groups of chunk 0
        c[hot] = (rng.randn(30, 16) + 5.0).astype(np.float32)
        q = np.ones((3, 16), dtype=np.float32)
        _, _, ok = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 30,
                                   chunk_size=2048, interpret=True,
                                   impl="stream", select=select,
                                   on_miss="flag")
        assert not bool(ok)

    def test_unconditional_impls_report_true(self, rng):
        q = rng.randn(4, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        for impl in ("single", "twopass"):
            vals, idx, ok = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 9,
                                            chunk_size=512, interpret=True,
                                            impl=impl, on_miss="flag")
            assert bool(ok)
            _, oidx = numpy_topk(q @ c.T, 9)
            np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_tiny_corpus_reports_true(self, rng):
        q = rng.randn(2, 8).astype(np.float32)
        c = rng.randn(96, 8).astype(np.float32)
        vals, idx, ok = exact_topk_mips(jnp.asarray(q), jnp.asarray(c), 90,
                                        chunk_size=128, interpret=True,
                                        impl="stream", on_miss="flag")
        assert bool(ok)
        _, oidx = numpy_topk(q @ c.T, 90)
        np.testing.assert_array_equal(np.asarray(idx), oidx)

    def test_blocked_query_batch_ands_flags(self, rng, monkeypatch):
        from kirag_tpu.ops import pallas_exact as pe

        jax.clear_caches()
        monkeypatch.setattr(pe, "QUERY_BLOCK", 4)
        monkeypatch.setattr(pe, "STREAM_QTILE", 1)
        try:
            q = rng.randn(8, 16).astype(np.float32)
            c = rng.randn(2048, 16).astype(np.float32)
            vals, idx, ok = exact_topk_mips(
                jnp.asarray(q), jnp.asarray(c), 7, chunk_size=512,
                interpret=True, impl="stream", on_miss="flag")
            assert bool(ok)
            _, oidx = numpy_topk(q @ c.T, 7)
            np.testing.assert_array_equal(np.asarray(idx), oidx)
        finally:
            jax.clear_caches()

    def test_indexer_redispatches_to_exact_on_miss(self, rng):
        # the PRODUCT contract: search_knn stays oracle-exact even on the
        # adversarial corpus whose capture must miss — via the host-side
        # re-dispatch of the checked program
        from kirag_tpu.index import TPUIndexer

        c = (rng.randn(65536, 16) * 0.01).astype(np.float32)
        hot = np.arange(30) * 64  # 30 hot rows across 15 groups of chunk 0
        c[hot] = (rng.randn(30, 16) + 5.0).astype(np.float32)
        q = np.ones((3, 16), dtype=np.float32)
        indexer = TPUIndexer(16, exact_impl="pallas", pallas_chunk_size=2048,
                             pallas_select="capdom")
        indexer.index_data([str(i) for i in range(65536)], c)
        results = indexer.search_knn(q, top_docs=30)
        ovals, oidx = numpy_topk(q @ c.T, 30)
        for row, (db_ids, scores) in enumerate(results):
            assert db_ids == [str(i) for i in oidx[row]]
            np.testing.assert_allclose(scores, ovals[row], rtol=1e-4,
                                       atol=1e-4)
