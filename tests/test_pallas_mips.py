"""Pallas grouped-max kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kirag_tpu.ops.pallas_mips import (
    LANES,
    approx_topk_mips,
    grouped_max_scores,
    sharded_approx_topk_mips,
)


class TestGroupedMaxScores:
    def test_matches_numpy(self, rng):
        q = rng.randn(8, 32).astype(np.float32)
        c = rng.randn(1024, 32).astype(np.float32)
        gmax, gidx = grouped_max_scores(jnp.asarray(q), jnp.asarray(c),
                                        chunk_size=256, interpret=True)
        scores = q @ c.T
        ref = scores.reshape(8, 1024 // LANES, LANES)
        np.testing.assert_allclose(np.asarray(gmax)[:, 0], ref.max(-1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(gidx)[:, 0], ref.argmax(-1))

    def test_tie_prefers_lowest_lane(self):
        q = np.ones((1, 8), dtype=np.float32)
        c = np.ones((256, 8), dtype=np.float32)
        _, gidx = grouped_max_scores(jnp.asarray(q), jnp.asarray(c),
                                     chunk_size=256, interpret=True)
        assert np.all(np.asarray(gidx) == 0)

    def test_winners_peel_matches_numpy_topw(self, rng):
        q = rng.randn(4, 16).astype(np.float32)
        c = rng.randn(512, 16).astype(np.float32)
        w = 3
        gmax, gidx = grouped_max_scores(jnp.asarray(q), jnp.asarray(c),
                                        chunk_size=256, interpret=True,
                                        winners=w)
        s3 = (q @ c.T).reshape(4, 512 // LANES, LANES)
        ref_vals = -np.sort(-s3, axis=-1)[..., :w]          # [Q, G, w]
        ref_idx = np.argsort(-s3, kind="stable", axis=-1)[..., :w]
        np.testing.assert_allclose(np.asarray(gmax).transpose(0, 2, 1),
                                   ref_vals, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(gidx).transpose(0, 2, 1),
                                      ref_idx)


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

    def test_recall_regression_100k(self, rng):
        """Pin approx recall@10 >= 0.99 vs exact at >=100k rows (the scale
        where the group-sampling loss model ~1-(k-1)*64/N starts to apply)."""
        from kirag_tpu.ops.mips import topk_mips

        n, d, k = 100_352, 32, 10  # n divisible by the 2048-row chunk grid
        q = rng.randn(16, d).astype(np.float32)
        c = np.random.default_rng(7).standard_normal((n, d), dtype=np.float32)
        va, ia = approx_topk_mips(jnp.asarray(q), jnp.asarray(c), k=k,
                                  interpret=True)
        ve, ie = topk_mips(jnp.asarray(q), jnp.asarray(c), k, chunk_size=16384)
        ia_np, ie_np = np.asarray(ia), np.asarray(ie)
        recall = np.mean([len(set(ia_np[i]) & set(ie_np[i])) / k
                          for i in range(len(q))])
        assert recall >= 0.99, f"approx recall@{k} regressed: {recall}"


class TestWinnersPerGroup:
    """winners_per_group: the recall/speed dial (the FAISS-nprobe role)."""

    def test_w2_recovers_same_group_pair(self, rng):
        # two near-duplicate rows in the SAME 128-row group: W=1 can
        # surface only one; W=2 must return both
        c = (rng.randn(2048, 16) * 0.05).astype(np.float32)
        q = rng.randn(1, 16).astype(np.float32)
        q /= np.linalg.norm(q)
        c[200] = q[0] * 2
        c[201] = q[0] * 1.9
        v1, i1 = approx_topk_mips(jnp.asarray(q), jnp.asarray(c), k=4,
                                  chunk_size=512, interpret=True,
                                  winners_per_group=1)
        v2, i2 = approx_topk_mips(jnp.asarray(q), jnp.asarray(c), k=4,
                                  chunk_size=512, interpret=True,
                                  winners_per_group=2)
        assert 200 in np.asarray(i1)[0] and 201 not in np.asarray(i1)[0]
        assert {200, 201} <= set(np.asarray(i2)[0])
        assert np.asarray(i2)[0, 0] == 200 and np.asarray(i2)[0, 1] == 201

    def test_w128_equals_exact(self, rng):
        from kirag_tpu.ops.mips import topk_mips

        q = rng.randn(5, 16).astype(np.float32)
        c = rng.randn(1024, 16).astype(np.float32)
        va, ia = approx_topk_mips(jnp.asarray(q), jnp.asarray(c), k=9,
                                  chunk_size=256, interpret=True,
                                  winners_per_group=LANES)
        ve, ie = topk_mips(jnp.asarray(q), jnp.asarray(c), 9, chunk_size=256)
        np.testing.assert_allclose(np.asarray(va), np.asarray(ve),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ie))

    def test_w2_sharded(self, rng, mesh8):
        c = (rng.randn(2048, 16) * 0.05).astype(np.float32)
        q = rng.randn(1, 16).astype(np.float32)
        c[300] = q[0] * 2
        c[301] = q[0] * 1.9
        _, idx = sharded_approx_topk_mips(jnp.asarray(q), jnp.asarray(c), 4,
                                          mesh8, chunk_size=256,
                                          interpret=True,
                                          winners_per_group=2)
        assert {300, 301} <= set(np.asarray(idx)[0])

    def test_indexer_approx_winners(self, rng):
        from kirag_tpu.index import TPUIndexer

        c = (rng.randn(2048, 16) * 0.05).astype(np.float32)
        q = rng.randn(1, 16).astype(np.float32)
        c[500] = q[0] * 2
        c[501] = q[0] * 1.9
        ix = TPUIndexer(16, approx_winners=2)
        ix.index_data(range(2048), c)
        ids, _ = ix.search_knn(q, 4, mode="approx")[0]
        assert {"500", "501"} <= set(ids)
        with pytest.raises(ValueError):
            TPUIndexer(16, approx_winners=0)


class TestInt8Scales:
    def test_scaled_kernel_matches_numpy(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        q = rng.randn(4, 32).astype(np.float32)
        c = rng.randn(512, 32).astype(np.float32)
        ci8, scales = quantize_rows_int8(c)
        gmax, gidx = grouped_max_scores(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8),
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        deq = ci8.astype(np.float32) * scales[:, None]
        ref = (q @ deq.T).reshape(4, 512 // LANES, LANES)
        # bf16 queries + bf16 int8-cast matmul: loose tolerance
        np.testing.assert_allclose(np.asarray(gmax)[:, 0], ref.max(-1),
                                   rtol=2e-2, atol=2e-2)

    def test_approx_int8_selects_real_rows(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        c = rng.randn(1024, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        ci8, scales = quantize_rows_int8(c)
        vals, idx = approx_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), k=5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        # self-retrieval survives quantization (top-1 is exact in approx mode)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))

    def test_approx_int4_matches_dequant_oracle(self, rng):
        from kirag_tpu.ops.quantized import (dequantize_rows_int4,
                                             quantize_rows_int4)

        c = rng.randn(1024, 256).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        packed, scales = quantize_rows_int4(c)
        vals, idx = approx_topk_mips(
            jnp.asarray(q), jnp.asarray(packed), k=5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))
        # returned values = the dequantized corpus' scores at the returned
        # rows (the kernel dequantizes in VMEM; bf16 matmul tolerance)
        deq = dequantize_rows_int4(np.asarray(packed), np.asarray(scales))
        ref = np.take_along_axis(q @ deq.T, np.asarray(idx), axis=1)
        np.testing.assert_allclose(np.asarray(vals), ref, rtol=2e-2, atol=2e-2)


class TestShardedApprox:
    def test_matches_single_shard(self, rng, mesh8):
        # 8 shards x 256 rows; chunk 256 => identical group partition to the
        # single-shard call, so results must match exactly
        q = rng.randn(4, 16).astype(np.float32)
        c = rng.randn(2048, 16).astype(np.float32)
        vs, is_ = sharded_approx_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                           mesh8, chunk_size=256, interpret=True)
        v1, i1 = approx_topk_mips(jnp.asarray(q), jnp.asarray(c), 7,
                                  chunk_size=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(is_), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(vs), np.asarray(v1), rtol=1e-5)

    def test_valid_rows_in_last_shard(self, rng, mesh8):
        q = rng.randn(2, 8).astype(np.float32)
        c = rng.randn(2048, 8).astype(np.float32)
        c[1900:] = 100.0  # poison the padding region
        vals, idx = sharded_approx_topk_mips(jnp.asarray(q), jnp.asarray(c), 5,
                                             mesh8, chunk_size=256,
                                             valid_rows=1900, interpret=True)
        assert np.asarray(idx).max() < 1900

    def test_sharded_int8(self, rng, mesh8):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        c = rng.randn(2048, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        ci8, scales = quantize_rows_int8(c)
        vs, is_ = sharded_approx_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5, mesh8,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        v1, i1 = approx_topk_mips(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(ci8), 5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        np.testing.assert_array_equal(np.asarray(is_), np.asarray(i1))

    def test_sharded_int4(self, rng, mesh8):
        from kirag_tpu.ops.quantized import quantize_rows_int4

        c = rng.randn(2048, 256).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        packed, scales = quantize_rows_int4(c)
        vs, is_ = sharded_approx_topk_mips(
            jnp.asarray(q), jnp.asarray(packed), 5, mesh8,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        v1, i1 = approx_topk_mips(
            jnp.asarray(q), jnp.asarray(packed), 5,
            chunk_size=256, interpret=True, scales=jnp.asarray(scales))
        np.testing.assert_array_equal(np.asarray(is_), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(vs), np.asarray(v1), rtol=1e-5)


class TestFuzzApproxVsOracle:
    """Seeded random sweep: group-sampled top-k has an EXACT oracle (per
    128-row-group argmax, then top-k over group winners with stable
    lowest-group tie-break) — every draw must reproduce it."""

    CASES = 8

    @pytest.mark.parametrize("case", range(CASES))
    def test_random_config_matches_group_oracle(self, case):
        import ml_dtypes

        from kirag_tpu.ops.quantized import (dequantize_rows_int4,
                                             quantize_rows_int8,
                                             quantize_rows_int4)

        r = np.random.default_rng(2000 + case)
        quant = r.choice(["none", "none", "int8", "int4"])
        d = 256 if quant == "int4" else int(r.choice([16, 64]))
        n = int(r.integers(300, 3000))
        n_q = int(r.integers(1, 16))
        k = int(r.integers(1, 20))
        chunk = int(r.choice([128, 256, 512]))
        c = r.standard_normal((n, d), dtype=np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[r.integers(0, n, size=n_q)] + 0.01 * r.standard_normal(
            (n_q, d), dtype=np.float32)

        if quant == "int8":
            corpus, scales = quantize_rows_int8(c)
            oracle_c = corpus.astype(np.float32) * scales[:, None]
        elif quant == "int4":
            corpus, scales = quantize_rows_int4(c)
            oracle_c = dequantize_rows_int4(corpus, scales)
        else:
            corpus, scales = c, None
            oracle_c = c
        oracle_q = (q.astype(ml_dtypes.bfloat16).astype(np.float32)
                    if quant != "none" else q)

        vals, idx = approx_topk_mips(
            jnp.asarray(q), jnp.asarray(corpus), k, chunk_size=chunk,
            interpret=True,
            scales=None if scales is None else jnp.asarray(scales))
        vals, idx = np.asarray(vals), np.asarray(idx)

        # oracle: pad to a LANES grid, per-group (max, lowest-argmax row)
        s = oracle_q @ oracle_c.T
        pad = (-n) % LANES
        s_pad = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
        g = s_pad.reshape(n_q, -1, LANES)
        gmax = g.max(-1)
        grow = g.argmax(-1) + np.arange(g.shape[1])[None, :] * LANES
        k_eff = min(k, g.shape[1])
        sel = np.lexsort((np.arange(g.shape[1])[None, :].repeat(n_q, 0),
                          -gmax), axis=-1)[:, :k_eff]
        o_vals = np.take_along_axis(gmax, sel, axis=-1)
        o_idx = np.take_along_axis(grow, sel, axis=-1)

        label = f"case={case} quant={quant} n={n} d={d} q={n_q} k={k} " \
                f"chunk={chunk}"
        np.testing.assert_allclose(vals[:, :k_eff], o_vals, rtol=3e-3,
                                   atol=3e-3, err_msg=label)
        if quant == "none":
            np.testing.assert_array_equal(idx[:, :k_eff], o_idx,
                                          err_msg=label)
        else:
            at_idx = np.take_along_axis(s, idx[:, :k_eff], axis=-1)
            np.testing.assert_allclose(vals[:, :k_eff], at_idx, rtol=3e-3,
                                       atol=3e-3, err_msg=label)
