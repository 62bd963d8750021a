"""TPUIndexer parity tests vs numpy oracles (the FAISS-flat contract)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kirag_tpu.index import TPUIndexer


def oracle_ip(q, c, k):
    scores = q @ c.T
    order = np.lexsort((np.arange(c.shape[0])[None].repeat(len(q), 0), -scores), axis=-1)[:, :k]
    return np.take_along_axis(scores, order, -1), order


def oracle_l2(q, c, k):
    d = ((q[:, None, :] - c[None]) ** 2).sum(-1)
    order = np.lexsort((np.arange(c.shape[0])[None].repeat(len(q), 0), d), axis=-1)[:, :k]
    return np.take_along_axis(d, order, -1), order


class TestInnerProduct:
    def test_search_matches_oracle(self, rng):
        c = rng.randn(333, 16).astype(np.float32)
        q = rng.randn(9, 16).astype(np.float32)
        indexer = TPUIndexer(16, chunk_size=64)
        indexer.index_data([str(i) for i in range(333)], c)
        results = indexer.search_knn(q, top_docs=7)
        vals, idx = oracle_ip(q, c, 7)
        assert len(results) == 9
        for row, (db_ids, scores) in enumerate(results):
            assert db_ids == [str(i) for i in idx[row]]
            np.testing.assert_allclose(scores, vals[row], rtol=1e-4, atol=1e-4)

    def test_incremental_add(self, rng):
        c1 = rng.randn(50, 8).astype(np.float32)
        c2 = rng.randn(70, 8).astype(np.float32)
        indexer = TPUIndexer(8)
        indexer.index_data(range(50), c1)
        indexer.index_data(range(50, 120), c2)
        assert len(indexer) == 120
        q = rng.randn(2, 8).astype(np.float32)
        results = indexer.search_knn(q, top_docs=3)
        _, idx = oracle_ip(q, np.concatenate([c1, c2]), 3)
        for row, (db_ids, _) in enumerate(results):
            assert db_ids == [str(i) for i in idx[row]]

    def test_string_db_ids(self, rng):
        c = rng.randn(10, 4).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)  # unit norm: self-maximal IP
        indexer = TPUIndexer(4)
        indexer.index_data([f"doc_{i}" for i in range(10)], c)
        (db_ids, _), = indexer.search_knn(c[3:4], top_docs=1)
        assert db_ids == ["doc_3"]

    def test_empty_index_raises(self, rng):
        indexer = TPUIndexer(4)
        with pytest.raises(RuntimeError):
            indexer.search_knn(rng.randn(1, 4).astype(np.float32), top_docs=1)

    def test_topk_capped_at_ntotal(self, rng):
        c = rng.randn(5, 4).astype(np.float32)
        indexer = TPUIndexer(4)
        indexer.index_data(range(5), c)
        (db_ids, scores), = indexer.search_knn(c[:1], top_docs=100)
        assert len(db_ids) == 5


class TestL2:
    def test_l2_distances_ascending(self, rng):
        c = rng.randn(123, 8).astype(np.float32)
        q = rng.randn(4, 8).astype(np.float32)
        indexer = TPUIndexer(8, metric="l2", chunk_size=32)
        indexer.index_data(range(123), c)
        results = indexer.search_knn(q, top_docs=5)
        vals, idx = oracle_l2(q, c, 5)
        for row, (db_ids, dists) in enumerate(results):
            assert db_ids == [str(i) for i in idx[row]]
            np.testing.assert_allclose(dists, vals[row], rtol=1e-3, atol=1e-3)
            assert np.all(np.diff(dists) >= -1e-4)  # ascending


class TestShardedIndex:
    def test_mesh_sharded_search(self, rng, mesh8):
        c = rng.randn(640, 16).astype(np.float32)
        q = rng.randn(3, 16).astype(np.float32)
        indexer = TPUIndexer(16, mesh=mesh8, chunk_size=32)
        indexer.index_data(range(640), c)
        results = indexer.search_knn(q, top_docs=9)
        vals, idx = oracle_ip(q, c, 9)
        for row, (db_ids, scores) in enumerate(results):
            assert db_ids == [str(i) for i in idx[row]]
            np.testing.assert_allclose(scores, vals[row], rtol=1e-4, atol=1e-4)

    def test_sharded_unaligned_rows(self, rng, mesh8):
        # 100 rows does not divide 8 shards: padding must stay invisible
        c = rng.randn(100, 8).astype(np.float32)
        indexer = TPUIndexer(8, mesh=mesh8, chunk_size=16)
        indexer.index_data(range(100), c)
        q = rng.randn(2, 8).astype(np.float32)
        results = indexer.search_knn(q, top_docs=10)
        _, idx = oracle_ip(q, c, 10)
        for row, (db_ids, _) in enumerate(results):
            assert db_ids == [str(i) for i in idx[row]]


class TestInt8Compression:
    def test_quantize_roundtrip_error(self, rng):
        from kirag_tpu.ops.quantized import quantize_rows_int8

        emb = rng.randn(50, 64).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        q, scales = quantize_rows_int8(emb)
        recon = q.astype(np.float32) * scales[:, None]
        assert np.abs(recon - emb).max() < 1e-2  # <= scale/2 per element

    def test_int8_index_recall(self, rng):
        c = rng.randn(400, 32).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:8] + 0.01 * rng.randn(8, 32).astype(np.float32)

        exact = TPUIndexer(32, chunk_size=128)
        exact.index_data(range(400), c)
        quant = TPUIndexer(32, chunk_size=128, compression="int8")
        quant.index_data(range(400), c)

        r_exact = exact.search_knn(q, top_docs=10)
        r_quant = quant.search_knn(q, top_docs=10)
        recalls = []
        for (ids_e, _), (ids_q, _) in zip(r_exact, r_quant):
            recalls.append(len(set(ids_e) & set(ids_q)) / 10)
        assert np.mean(recalls) >= 0.9
        # top-1 (self) must survive quantization
        for row, (ids_q, _) in enumerate(r_quant):
            assert ids_q[0] == str(row)

    def test_int8_guards(self):
        with pytest.raises(KeyError):
            TPUIndexer(8, compression="bogus")

    def test_sharded_int8(self, rng, mesh8):
        c = rng.randn(512, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4] + 0.01 * rng.randn(4, 16).astype(np.float32)
        sharded = TPUIndexer(16, mesh=mesh8, chunk_size=64, compression="int8")
        sharded.index_data(range(512), c)
        single = TPUIndexer(16, chunk_size=64, compression="int8")
        single.index_data(range(512), c)
        r_s = sharded.search_knn(q, top_docs=8)
        r_1 = single.search_knn(q, top_docs=8)
        for (ids_s, vs), (ids_1, v1) in zip(r_s, r_1):
            assert ids_s == ids_1
            np.testing.assert_allclose(vs, v1, rtol=1e-4, atol=1e-4)


class TestInt4Compression:
    """compression="int4": packed nibbles + block-128 scales — 8x smaller
    than f32, the config that makes 21M x 1024 DPR rows single-chip
    resident (VERDICT r3 item 2 / reference IndexPQ's low-bit role)."""

    def _corpus(self, rng, n=512, d=256):
        c = rng.randn(n, d).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        return c

    def test_int4_index_recall(self, rng):
        c = self._corpus(rng)
        q = c[:8] + 0.01 * rng.randn(8, 256).astype(np.float32)
        exact = TPUIndexer(256, chunk_size=128)
        exact.index_data(range(512), c)
        quant = TPUIndexer(256, chunk_size=128, compression="int4")
        quant.index_data(range(512), c)
        r_exact = exact.search_knn(q, top_docs=10)
        r_quant = quant.search_knn(q, top_docs=10)
        recalls = [len(set(ids_e) & set(ids_q)) / 10
                   for (ids_e, _), (ids_q, _) in zip(r_exact, r_quant)]
        assert np.mean(recalls) >= 0.9, recalls
        for row, (ids_q, _) in enumerate(r_quant):
            assert ids_q[0] == str(row)

    def test_pq_request_maps_to_codebook_pq(self):
        # round 5: IndexPQ requests get TRUE codebook PQ (ops/pq.py); an
        # 8-bit request doubles the 4-bit subquantizers (equal bytes/row)
        ix = TPUIndexer(256, n_subquantizers=64, n_bits=4)
        assert ix.compression == "pq" and ix.pq_m == 64
        ix8 = TPUIndexer(256, n_subquantizers=64, n_bits=8)
        assert ix8.compression == "pq" and ix8.pq_m == 128

    def test_int4_guards(self):
        with pytest.raises(ValueError):
            TPUIndexer(8, metric="l2", compression="int4")
        with pytest.raises(ValueError):
            TPUIndexer(100, compression="int4")  # dim % 256 != 0

    def test_sharded_int4_matches_single(self, rng, mesh8):
        c = self._corpus(rng)
        q = c[:4] + 0.01 * rng.randn(4, 256).astype(np.float32)
        sharded = TPUIndexer(256, mesh=mesh8, chunk_size=64,
                             compression="int4")
        sharded.index_data(range(512), c)
        single = TPUIndexer(256, chunk_size=64, compression="int4")
        single.index_data(range(512), c)
        r_s = sharded.search_knn(q, top_docs=8)
        r_1 = single.search_knn(q, top_docs=8)
        for (ids_s, vs), (ids_1, v1) in zip(r_s, r_1):
            assert ids_s == ids_1
            np.testing.assert_allclose(vs, v1, rtol=1e-4, atol=1e-4)

    def test_int4_pallas_path(self, rng):
        c = self._corpus(rng)
        ix = TPUIndexer(256, compression="int4", exact_impl="pallas",
                        pallas_chunk_size=128)
        ix.index_data(range(512), c)
        res = ix.search_knn(c[:4], top_docs=5)
        for row, (ids, vals) in enumerate(res):
            assert ids[0] == str(row)
            assert np.isfinite(vals).all()

    def test_int4_streaming_blocks(self, rng):
        c = self._corpus(rng, n=600)
        ix = TPUIndexer(256, compression="int4", max_device_rows=256,
                        chunk_size=128)
        ix.index_data(range(600), c)
        res = ix.search_knn(c[:4], top_docs=5)
        for row, (ids, _) in enumerate(res):
            assert ids[0] == str(row)

    def test_int4_approx_mode(self, rng):
        c = self._corpus(rng)
        ix = TPUIndexer(256, compression="int4")
        ix.index_data(range(512), c)
        approx = ix.search_knn(c[:4], top_docs=5, mode="approx")
        for row, (ids, _) in enumerate(approx):
            # top-1 survives int4 quantization + group sampling
            assert ids[0] == str(row)

    def test_int4_streaming_approx(self, rng):
        c = self._corpus(rng)
        ix = TPUIndexer(256, compression="int4", max_device_rows=256)
        ix.index_data(range(512), c)
        approx = ix.search_knn(c[:4], top_docs=5, mode="approx")
        for row, (ids, _) in enumerate(approx):
            assert ids[0] == str(row)

    def test_int4_serialize_roundtrip(self, rng, tmp_path):
        c = self._corpus(rng)
        ix = TPUIndexer(256, compression="int4")
        ix.index_data(range(512), c)
        ix.serialize(str(tmp_path))
        loaded = TPUIndexer(256)
        loaded.deserialize_from(str(tmp_path))
        assert loaded.compression == "int4"
        res = loaded.search_knn(c[:4], top_docs=5)
        for row, (ids, _) in enumerate(res):
            assert ids[0] == str(row)


class TestPQCompression:
    """compression="pq": true codebook product quantization (ops/pq.py) —
    the reference's IndexPQ role (`retriever/index.py:19-24`) at sub-int4
    memory (m/2 bytes/row; 32x vs f32 at D=1024, m=256)."""

    def _clustered(self, rng, n=768, d=64, n_centers=48, noise=0.03):
        centers = rng.randn(n_centers, d).astype(np.float32)
        c = (centers[rng.randint(0, n_centers, n)]
             + noise * rng.randn(n, d).astype(np.float32))
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        return c

    def test_pq_planted_neighbor_recovery(self, rng):
        # queries' true neighbors are separated from the bulk by more than
        # the quantization error: PQ must recover them at top-1
        c = rng.randn(1024, 64).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = rng.randn(6, 64).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        c[:6] = q + 0.15 * c[:6]
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        ix = TPUIndexer(64, compression="pq", n_subquantizers=16,
                        chunk_size=256, pallas_chunk_size=256)
        ix.index_data(range(1024), c)
        res = ix.search_knn(q, top_docs=5)
        for row, (ids, vals) in enumerate(res):
            assert ids[0] == str(row)
            assert np.isfinite(vals).all() and vals[0] >= vals[-1]

    def test_pq_recall_on_clustered_corpus(self, rng):
        # coarse-region recall (what PQ is for): the exact top-20 cluster
        # mates should largely survive quantization
        c = self._clustered(rng)
        q = c[rng.randint(0, len(c), 8)] + 0.01 * rng.randn(8, 64).astype(
            np.float32)
        exact = TPUIndexer(64, chunk_size=256)
        exact.index_data(range(len(c)), c)
        pq = TPUIndexer(64, compression="pq", n_subquantizers=16,
                        pallas_chunk_size=256)
        pq.index_data(range(len(c)), c)
        r_e = exact.search_knn(q, top_docs=20)
        r_p = pq.search_knn(q, top_docs=20)
        recalls = [len(set(a) & set(b)) / 20
                   for (a, _), (b, _) in zip(r_e, r_p)]
        assert np.mean(recalls) >= 0.6, recalls

    def test_pq_memory_footprint(self, rng):
        # 32x vs f32 at m = d/4 (plus the constant [16, D] level table)
        c = self._clustered(rng, n=512)
        ix = TPUIndexer(64, compression="pq", n_subquantizers=16,
                        pallas_chunk_size=256)
        ix.index_data(range(512), c)
        ix.to_device()
        assert ix._device_corpus.dtype == jnp.uint8
        assert ix._device_corpus.shape[1] == 8      # m/2 bytes per row
        assert ix._device_scales.shape == (16, 64)  # level table

    def test_pq_matches_decode_oracle_with_faiss_ties(self, rng):
        # exact-over-quantized contract: results == brute force over the
        # DECODED corpus incl. lower-row-id tie order (duplicate codes tie)
        from kirag_tpu.ops import pq as pqmod

        c = self._clustered(rng, n=640)
        ix = TPUIndexer(64, compression="pq", n_subquantizers=16,
                        pallas_chunk_size=256)
        ix.index_data(range(640), c)
        ix.to_device()
        codes = np.asarray(ix._device_corpus)[:640]
        recon = pqmod.decode_pq(codes, ix._pq_codebooks)
        q = c[:5]
        res = ix.search_knn(q, top_docs=9)
        import ml_dtypes
        scores = (q.astype(ml_dtypes.bfloat16).astype(np.float32)
                  @ recon.astype(ml_dtypes.bfloat16).astype(np.float32).T)
        for (ids, vals), row in zip(res, scores):
            order = np.argsort(-row, kind="stable")[:9]
            assert ids == [str(i) for i in order]
            np.testing.assert_allclose(vals, row[order], rtol=2e-3, atol=2e-3)

    def test_pq_sharded_matches_single(self, rng, mesh8):
        c = self._clustered(rng, n=512)
        q = c[:4]
        sharded = TPUIndexer(64, mesh=mesh8, compression="pq",
                             n_subquantizers=16, pallas_chunk_size=128)
        sharded.index_data(range(512), c)
        single = TPUIndexer(64, compression="pq", n_subquantizers=16,
                            pallas_chunk_size=128)
        single.index_data(range(512), c)
        r_s = sharded.search_knn(q, top_docs=8)
        r_1 = single.search_knn(q, top_docs=8)
        for (ids_s, vs), (ids_1, v1) in zip(r_s, r_1):
            assert ids_s == ids_1
            np.testing.assert_allclose(vs, v1, rtol=1e-4, atol=1e-4)

    def test_pq_serialize_roundtrip_same_codes(self, rng, tmp_path):
        c = self._clustered(rng, n=512)
        ix = TPUIndexer(64, compression="pq", n_subquantizers=16,
                        pallas_chunk_size=256)
        ix.index_data(range(512), c)
        r0 = ix.search_knn(c[:4], top_docs=7)
        ix.serialize(str(tmp_path))
        loaded = TPUIndexer(64, pallas_chunk_size=256)
        loaded.deserialize_from(str(tmp_path))
        assert loaded.compression == "pq" and loaded.pq_m == 16
        # codebooks persisted: identical codes, identical results
        np.testing.assert_array_equal(loaded._pq_codebooks, ix._pq_codebooks)
        r1 = loaded.search_knn(c[:4], top_docs=7)
        for (a, va), (b, vb) in zip(r0, r1):
            assert a == b
            np.testing.assert_array_equal(va, vb)

    def test_pq_guards(self):
        with pytest.raises(ValueError, match="inner_product"):
            TPUIndexer(64, metric="l2", compression="pq")
        with pytest.raises(ValueError, match="streaming"):
            TPUIndexer(64, compression="pq", max_device_rows=128)

    def test_pq_approx_mode_serves_exact(self, rng):
        c = self._clustered(rng, n=512)
        ix = TPUIndexer(64, compression="pq", n_subquantizers=16,
                        pallas_chunk_size=256)
        ix.index_data(range(512), c)
        r_a = ix.search_knn(c[:3], top_docs=5, mode="approx")
        r_e = ix.search_knn(c[:3], top_docs=5)
        for (a, va), (b, vb) in zip(r_a, r_e):
            assert a == b
            np.testing.assert_array_equal(va, vb)


class TestApproxMode:
    def test_approx_search_mode(self, rng):
        c = rng.randn(1024, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        indexer = TPUIndexer(16, chunk_size=256)
        indexer.index_data(range(1024), c)
        exact = indexer.search_knn(c[:4], top_docs=5)
        approx = indexer.search_knn(c[:4], top_docs=5, mode="approx")
        for (ids_e, _), (ids_a, _) in zip(exact, approx):
            assert ids_a[0] == ids_e[0]  # top-1 is exact in approx mode
            assert len(set(ids_e) & set(ids_a)) >= 3

    def test_approx_sharded(self, rng, mesh8):
        c = rng.randn(2048, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        indexer = TPUIndexer(16, mesh=mesh8)
        indexer.index_data(range(2048), c)
        approx = indexer.search_knn(c[:4], top_docs=5, mode="approx")
        for row, (ids_a, _) in enumerate(approx):
            assert ids_a[0] == str(row)  # top-1 exact across the shard merge

    def test_approx_int8(self, rng):
        c = rng.randn(1024, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        indexer = TPUIndexer(16, compression="int8")
        indexer.index_data(range(1024), c)
        approx = indexer.search_knn(c[:4], top_docs=5, mode="approx")
        for row, (ids_a, _) in enumerate(approx):
            assert ids_a[0] == str(row)


class TestL2Compression:
    """metric="l2" composed with int8/int4: the corpus is stored augmented
    with its (alpha-balanced) norm column at to_device and quantized as a
    whole — one fused MIPS kernel serves both metrics at every
    compression level (the reference's IndexPQ supports l2 too)."""

    def test_l2_int8_self_hit_and_order(self, rng):
        c = rng.randn(1024, 32).astype(np.float32)
        q = c[:6] + 0.01 * rng.randn(6, 32).astype(np.float32)
        ix = TPUIndexer(32, metric="l2", compression="int8")
        ix.index_data(range(1024), c)
        res = ix.search_knn(q, 5)
        oracle = np.argsort(
            ((q[:, None, :] - c[None]) ** 2).sum(-1), axis=1)[:, :5]
        for row, (ids, dists) in enumerate(res):
            assert ids[0] == str(row)  # nearest = the perturbed source row
            assert np.all(np.diff(np.asarray(dists)) >= -1e-4)  # ascending
            assert len(set(ids) & {str(i) for i in oracle[row]}) >= 4

    def test_l2_int8_unnormalized_alpha_balancing(self, rng):
        # norms ~100x the element scale: without the power-of-2 alpha the
        # shared int8 row scale would crush the data columns
        c = (rng.randn(512, 16) * 10.0).astype(np.float32)
        q = c[:5] + 0.1 * rng.randn(5, 16).astype(np.float32)
        ix = TPUIndexer(16, metric="l2", compression="int8")
        ix.index_data(range(512), c)
        ix.to_device()
        alpha = ix._l2_alpha
        assert alpha == 2.0 ** round(np.log2(alpha))  # exact power of two
        for row, (ids, _) in enumerate(ix.search_knn(q, 3)):
            assert ids[0] == str(row)

    def test_l2_int4_self_hit_and_order(self, rng):
        c = rng.randn(768, 256).astype(np.float32)
        q = c[:5] + 0.01 * rng.randn(5, 256).astype(np.float32)
        ix = TPUIndexer(256, metric="l2", compression="int4")
        ix.index_data(range(768), c)
        res = ix.search_knn(q, 5)
        oracle = np.argsort(
            ((q[:, None, :] - c[None]) ** 2).sum(-1), axis=1)[:, :5]
        for row, (ids, dists) in enumerate(res):
            assert ids[0] == str(row)
            assert np.all(np.diff(np.asarray(dists)) >= -1e-4)
            assert len(set(ids) & {str(i) for i in oracle[row]}) >= 4

    def test_l2_int4_norm_column_lossless(self, rng):
        # the norm column heads its own 128-dim scale block, where a block
        # absmax sits exactly on the (n-7.5)*absmax/7.5 grid
        from kirag_tpu.ops.quantized import (dequantize_rows_int4,
                                             quantize_rows_int4)

        rows = rng.randn(32, 256).astype(np.float32)
        ix = TPUIndexer(256, metric="l2", compression="int4")
        aug = ix._l2_augment(rows)
        packed, scales = quantize_rows_int4(aug)
        deq = dequantize_rows_int4(packed, scales)
        np.testing.assert_allclose(
            deq[:, 256], -0.5 * np.sum(rows ** 2, axis=1), rtol=1e-6)

    def test_l2_int8_sharded(self, rng, mesh8):
        c = rng.randn(1024, 16).astype(np.float32)
        q = c[:4] + 0.01 * rng.randn(4, 16).astype(np.float32)
        ix = TPUIndexer(16, metric="l2", compression="int8", mesh=mesh8)
        ix.index_data(range(1024), c)
        for row, (ids, _) in enumerate(ix.search_knn(q, 3)):
            assert ids[0] == str(row)

    def test_l2_streaming(self, rng):
        # beyond-HBM blocks carry the same baked norm column; the host
        # merge runs in the (monotone) IP domain before the dist transform
        c = rng.randn(2000, 16).astype(np.float32)
        q = rng.randn(3, 16).astype(np.float32)
        ix = TPUIndexer(16, metric="l2", max_device_rows=512)
        ix.index_data(range(2000), c)
        res = ix.search_knn(q, 6)
        d2 = ((q[:, None, :] - c[None]) ** 2).sum(-1)
        oidx = np.argsort(d2, axis=1)[:, :6]
        for row, (ids, dists) in enumerate(res):
            np.testing.assert_array_equal([int(s) for s in ids], oidx[row])
            np.testing.assert_allclose(np.asarray(dists),
                                       np.sort(d2[row])[:6], rtol=2e-4,
                                       atol=2e-4)

    def test_l2_streaming_int8(self, rng):
        c = rng.randn(1500, 32).astype(np.float32)
        q = c[:4] + 0.01 * rng.randn(4, 32).astype(np.float32)
        ix = TPUIndexer(32, metric="l2", compression="int8",
                        max_device_rows=512)
        ix.index_data(range(1500), c)
        for row, (ids, dists) in enumerate(ix.search_knn(q, 3)):
            assert ids[0] == str(row)
            assert np.all(np.diff(np.asarray(dists)) >= -1e-4)

    def test_l2_uncompressed_unchanged(self, rng):
        # the refactor (augment at to_device, not per search) must keep the
        # plain-f32 l2 contract: ascending squared distances, oracle order
        c = rng.randn(600, 24).astype(np.float32)
        q = rng.randn(3, 24).astype(np.float32)
        ix = TPUIndexer(24, metric="l2")
        ix.index_data(range(600), c)
        res = ix.search_knn(q, 7)
        d2 = ((q[:, None, :] - c[None]) ** 2).sum(-1)
        oidx = np.argsort(d2, axis=1)[:, :7]
        for row, (ids, dists) in enumerate(res):
            np.testing.assert_array_equal([int(s) for s in ids], oidx[row])
            np.testing.assert_allclose(np.asarray(dists),
                                       np.sort(d2[row])[:7], rtol=2e-4,
                                       atol=2e-4)


class TestShuffleRows:
    """shuffle_rows=True: seeded global row permutation at materialization.
    Closes the documented approx-mode adjacency caveat (one winner per
    128-row group under-recalls ADJACENT similar rows — consecutive
    passages of one article in DPR layout)."""

    def test_exact_results_unchanged(self, rng):
        c = rng.randn(1024, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:5] + 0.01 * rng.randn(5, 16).astype(np.float32)
        plain = TPUIndexer(16, chunk_size=256)
        plain.index_data(range(1024), c)
        shuf = TPUIndexer(16, chunk_size=256, shuffle_rows=True,
                          shuffle_seed=3)
        shuf.index_data(range(1024), c)
        for (ids_p, vals_p), (ids_s, vals_s) in zip(
                plain.search_knn(q, 7), shuf.search_knn(q, 7)):
            assert ids_p == ids_s  # db ids move with their rows
            np.testing.assert_allclose(np.asarray(vals_p),
                                       np.asarray(vals_s), rtol=1e-5)

    def test_approx_recovers_adjacent_cluster(self, rng):
        # 8 near-duplicate rows ADJACENT inside one 128-row group: the
        # group-sampling approx kernel can return at most ~1 of them
        # unshuffled; the shuffle spreads them across groups
        n, d = 8192, 16  # 64 groups: shuffled cluster rows rarely collide
        c = rng.randn(n, d).astype(np.float32) * 0.05
        q = rng.randn(1, d).astype(np.float32)
        q /= np.linalg.norm(q)
        cluster = np.arange(256, 264)
        c[cluster] = q + 0.001 * rng.randn(8, d).astype(np.float32)
        want = {str(i) for i in cluster}

        plain = TPUIndexer(d, chunk_size=512)
        plain.index_data(range(n), c)
        ids_plain, _ = plain.search_knn(q, 8, mode="approx")[0]
        shuf = TPUIndexer(d, chunk_size=512, shuffle_rows=True,
                          shuffle_seed=0)
        shuf.index_data(range(n), c)
        ids_shuf, _ = shuf.search_knn(q, 8, mode="approx")[0]

        assert len(want & set(ids_plain)) <= 2  # the documented caveat
        assert len(want & set(ids_shuf)) >= 6   # decorrelated layout
        # exact mode finds the full cluster either way
        ids_exact, _ = shuf.search_knn(q, 8)[0]
        assert set(ids_exact) == want

    def test_serialize_persists_shuffled_layout(self, rng, tmp_path):
        c = rng.randn(300, 8).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        ix = TPUIndexer(8, shuffle_rows=True, shuffle_seed=1)
        ix.index_data(range(300), c)
        ix.serialize(str(tmp_path / "ix"))
        loaded = TPUIndexer(8)
        loaded.deserialize_from(str(tmp_path / "ix"))
        ids, _ = loaded.search_knn(c[17:18], 1)[0]
        assert ids[0] == "17"

    def test_append_after_shuffle_reshuffles_consistently(self, rng):
        c = rng.randn(512, 8).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        ix = TPUIndexer(8, chunk_size=128, shuffle_rows=True, shuffle_seed=2)
        ix.index_data(range(256), c[:256])
        ids, _ = ix.search_knn(c[10:11], 1)[0]
        assert ids[0] == "10"
        ix.index_data(range(256, 512), c[256:])
        ids2, _ = ix.search_knn(c[300:301], 1)[0]
        assert ids2[0] == "300"
        ids3, _ = ix.search_knn(c[10:11], 1)[0]
        assert ids3[0] == "10"


class TestPersistence:
    def test_serialize_roundtrip(self, rng, tmp_path):
        c = rng.randn(40, 8).astype(np.float32)
        indexer = TPUIndexer(8)
        indexer.index_data([f"d{i}" for i in range(40)], c)
        indexer.serialize(str(tmp_path))
        loaded = TPUIndexer(8)
        loaded.deserialize_from(str(tmp_path))
        assert len(loaded) == 40
        q = rng.randn(2, 8).astype(np.float32)
        r1 = indexer.search_knn(q, top_docs=3)
        r2 = loaded.search_knn(q, top_docs=3)
        for (ids1, s1), (ids2, s2) in zip(r1, r2):
            assert ids1 == ids2
            np.testing.assert_allclose(s1, s2)

    def test_multi_file_serialization(self, rng, tmp_path):
        """Indexes serialize as shard files (no monolithic index.npy at 21M
        scale); loads mmap each shard independently."""
        import os

        c = rng.randn(100, 8).astype(np.float32)
        indexer = TPUIndexer(8)
        indexer.index_data([f"d{i}" for i in range(100)], c)
        indexer.serialize(str(tmp_path), rows_per_file=32)
        names = sorted(f for f in os.listdir(str(tmp_path)) if f.endswith(".npy"))
        assert len(names) == 4  # 32+32+32+4
        assert not os.path.exists(str(tmp_path / "index.npy"))
        loaded = TPUIndexer(8)
        loaded.deserialize_from(str(tmp_path))
        assert len(loaded._host_chunks) == 4
        q = rng.randn(2, 8).astype(np.float32)
        r1 = indexer.search_knn(q, top_docs=5)
        r2 = loaded.search_knn(q, top_docs=5)
        for (ids1, s1), (ids2, s2) in zip(r1, r2):
            assert ids1 == ids2
            np.testing.assert_allclose(s1, s2)

    def test_legacy_monolithic_load(self, rng, tmp_path):
        """Round-1 indexes (single index.npy, config without 'files') load."""
        import json
        import pickle

        c = rng.randn(30, 8).astype(np.float32)
        np.save(str(tmp_path / "index.npy"), c)
        with open(tmp_path / "index_meta.pkl", "wb") as f:
            pickle.dump([f"d{i}" for i in range(30)], f)
        with open(tmp_path / "index_config.json", "w") as f:
            json.dump({"vector_sz": 8, "metric": "inner_product",
                       "compression": "none"}, f)
        loaded = TPUIndexer(8)
        loaded.deserialize_from(str(tmp_path))
        assert len(loaded) == 30
        _, idx = oracle_ip(c[:2], c, 3)
        results = loaded.search_knn(c[:2], top_docs=3)
        for row, (db_ids, _) in enumerate(results):
            assert db_ids == [f"d{i}" for i in idx[row]]


class TestStreamingSearch:
    """Beyond-HBM mode: corpus blocks stream through the device per search."""

    def test_matches_resident_exact(self, rng):
        c = rng.randn(500, 16).astype(np.float32)
        q = rng.randn(3, 16).astype(np.float32)
        resident = TPUIndexer(16, chunk_size=64)
        resident.index_data(range(500), c)
        streaming = TPUIndexer(16, chunk_size=64, max_device_rows=128)
        streaming.index_data(range(500), c)
        r_res = resident.search_knn(q, top_docs=7)
        r_str = streaming.search_knn(q, top_docs=7)
        for (ids_r, s_r), (ids_s, s_s) in zip(r_res, r_str):
            assert ids_r == ids_s
            np.testing.assert_allclose(s_r, s_s, rtol=1e-5, atol=1e-5)

    def test_streaming_tie_break(self, rng):
        # duplicated rows across different blocks: lowest index must win
        base = rng.randn(64, 8).astype(np.float32)
        c = np.concatenate([base, base, base])  # 3 blocks of duplicates
        streaming = TPUIndexer(8, chunk_size=32, max_device_rows=64)
        streaming.index_data(range(192), c)
        (ids, _), = streaming.search_knn(base[:1], top_docs=3)
        vals, idx = oracle_ip(base[:1], c, 3)
        assert ids == [str(i) for i in idx[0]]

    def test_streaming_int8(self, rng):
        c = rng.randn(300, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        streaming = TPUIndexer(16, chunk_size=64, max_device_rows=128,
                               compression="int8")
        streaming.index_data(range(300), c)
        results = streaming.search_knn(c[:4], top_docs=5)
        for row, (ids, _) in enumerate(results):
            assert ids[0] == str(row)

    def test_streaming_approx(self, rng):
        c = rng.randn(1024, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        streaming = TPUIndexer(16, max_device_rows=512)
        streaming.index_data(range(1024), c)
        results = streaming.search_knn(c[:4], top_docs=5, mode="approx")
        for row, (ids, _) in enumerate(results):
            assert ids[0] == str(row)  # approx top-1 is exact per block

    def test_dim_mismatch_raises(self, rng, tmp_path):
        indexer = TPUIndexer(8)
        indexer.index_data(range(4), rng.randn(4, 8).astype(np.float32))
        indexer.serialize(str(tmp_path))
        with pytest.raises(AssertionError):
            TPUIndexer(16).deserialize_from(str(tmp_path))

    def test_int8_config_survives_mesh_load(self, rng, tmp_path, mesh8):
        """An int8-built index loaded onto a mesh must KEEP the compression
        (round-1 regression: it silently ran uncompressed on meshes)."""
        c = rng.randn(512, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        built = TPUIndexer(16, compression="int8")
        built.index_data(range(512), c)
        built.serialize(str(tmp_path))

        loaded = TPUIndexer(16, mesh=mesh8)
        loaded.deserialize_from(str(tmp_path))
        assert loaded.compression == "int8"
        results = loaded.search_knn(c[:4], top_docs=3)
        for row, (ids, _) in enumerate(results):
            assert ids[0] == str(row)
        assert loaded._device_corpus.dtype == np.int8


class TestPallasExactImpl:
    """exact_impl="pallas" routes exact search through the fused two-pass
    kernel (interpret mode on CPU) and must match the oracle incl. id map."""

    def test_resident_matches_oracle(self, rng):
        c = rng.randn(1500, 16).astype(np.float32)
        q = rng.randn(4, 16).astype(np.float32)
        indexer = TPUIndexer(16, exact_impl="pallas", pallas_chunk_size=256)
        indexer.index_data([f"d{i}" for i in range(1500)], c)
        results = indexer.search_knn(q, top_docs=6)
        vals, idx = oracle_ip(q, c, 6)
        for row, (db_ids, scores) in enumerate(results):
            assert db_ids == [f"d{i}" for i in idx[row]]
            np.testing.assert_allclose(scores, vals[row], rtol=1e-4, atol=1e-4)

    def test_l2_metric(self, rng):
        c = rng.randn(900, 8).astype(np.float32)
        q = rng.randn(3, 8).astype(np.float32)
        indexer = TPUIndexer(8, metric="l2", exact_impl="pallas",
                             pallas_chunk_size=256)
        indexer.index_data(list(range(900)), c)
        results = indexer.search_knn(q, top_docs=5)
        vals, idx = oracle_l2(q, c, 5)
        for row, (db_ids, dists) in enumerate(results):
            assert db_ids == [str(i) for i in idx[row]]
            np.testing.assert_allclose(dists, vals[row], rtol=1e-3, atol=1e-3)

    def test_int8_compression(self, rng):
        c = rng.randn(1024, 16).astype(np.float32)
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        q = c[:4]
        indexer = TPUIndexer(16, compression="int8", exact_impl="pallas",
                             pallas_chunk_size=256)
        indexer.index_data(list(range(1024)), c)
        results = indexer.search_knn(q, top_docs=3)
        for row, (db_ids, _) in enumerate(results):
            assert db_ids[0] == str(row)  # self-retrieval survives int8

    def test_streaming_blocks(self, rng):
        c = rng.randn(700, 8).astype(np.float32)
        q = rng.randn(2, 8).astype(np.float32)
        indexer = TPUIndexer(8, exact_impl="pallas", pallas_chunk_size=128,
                             max_device_rows=256)
        indexer.index_data(list(range(700)), c)
        results = indexer.search_knn(q, top_docs=5)
        vals, idx = oracle_ip(q, c, 5)
        for row, (db_ids, scores) in enumerate(results):
            assert db_ids == [str(i) for i in idx[row]]
            np.testing.assert_allclose(scores, vals[row], rtol=1e-4, atol=1e-4)

    def test_invalid_impl_raises(self):
        with pytest.raises(KeyError):
            TPUIndexer(8, exact_impl="nope")


class TestChunkGridPrepad:
    def test_large_corpus_rows_align_to_chunk_grid(self, rng):
        """to_device pre-pads big corpora to pallas_chunk_size multiples so
        the fused kernel never pads (a full corpus copy) inside jit."""
        from kirag_tpu.index import TPUIndexer

        idx = TPUIndexer(16, pallas_chunk_size=128)
        n = 300  # >= chunk (128): triggers the chunk-grid pre-pad
        emb = rng.randn(n, 16).astype(np.float32)
        idx.index_data([f"d{i}" for i in range(n)], emb)
        idx.to_device()
        assert idx._device_corpus.shape[0] % 128 == 0
        assert idx._device_rows == n  # valid_rows still the true count
        # search is oracle-exact across the padded boundary
        q = emb[:3]
        results = idx.search_knn(q, 5)  # per-query ([db_id...], scores)
        scores = q @ emb.T
        order = np.lexsort((np.arange(n)[None].repeat(3, 0), -scores),
                           axis=-1)[:, :5]
        for r, row in zip(results, order):
            assert r[0] == [f"d{j}" for j in row]

    def test_small_corpus_keeps_minimal_pad(self, rng):
        from kirag_tpu.index import TPUIndexer

        idx = TPUIndexer(16, pallas_chunk_size=8192)
        emb = rng.randn(20, 16).astype(np.float32)
        idx.index_data([f"d{i}" for i in range(20)], emb)
        idx.to_device()
        # below the chunk threshold: only the 8-row sublane pad applies
        assert idx._device_corpus.shape[0] == 24


class TestL2Approx:
    def test_l2_approx_top1_matches_exact(self, rng):
        # l2 rides the augmented-column MIPS trick; group-sampled approx
        # must keep its top-1-exact property under that augmentation
        c = rng.randn(1024, 16).astype(np.float32)
        q = c[:4] + 0.01 * rng.randn(4, 16).astype(np.float32)
        ix = TPUIndexer(16, metric="l2", chunk_size=256)
        ix.index_data(range(1024), c)
        exact = ix.search_knn(q, top_docs=5)
        approx = ix.search_knn(q, top_docs=5, mode="approx")
        for (ids_e, vals_e), (ids_a, vals_a) in zip(exact, approx):
            assert ids_a[0] == ids_e[0]
            assert abs(vals_a[0] - vals_e[0]) < 1e-3  # same (squared) distance
            # distances ascend (l2 contract) in approx mode too
            assert list(vals_a) == sorted(vals_a)
