"""Native C++ flat index: parity vs numpy oracle and vs the TPU indexer."""

import numpy as np
import pytest

from kirag_tpu.index.native import CPUFlatIndex, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def oracle_ip(q, c, k):
    scores = q @ c.T
    order = np.lexsort((np.arange(c.shape[0])[None].repeat(len(q), 0), -scores), axis=-1)[:, :k]
    return np.take_along_axis(scores, order, -1), order


class TestCPUFlatIndex:
    def test_ip_matches_oracle(self, rng):
        c = rng.randn(500, 32).astype(np.float32)
        q = rng.randn(7, 32).astype(np.float32)
        ix = CPUFlatIndex(32)
        ix.index_data([str(i) for i in range(500)], c)
        results = ix.search_knn(q, top_docs=9)
        vals, idx = oracle_ip(q, c, 9)
        for row, (db_ids, scores) in enumerate(results):
            assert db_ids == [str(i) for i in idx[row]]
            np.testing.assert_allclose(scores, vals[row], rtol=1e-5, atol=1e-5)

    def test_l2_matches_oracle(self, rng):
        c = rng.randn(300, 16).astype(np.float32)
        q = rng.randn(5, 16).astype(np.float32)
        ix = CPUFlatIndex(16, metric="l2")
        ix.index_data(range(300), c)
        results = ix.search_knn(q, top_docs=4)
        d = ((q[:, None, :] - c[None]) ** 2).sum(-1)
        order = np.lexsort((np.arange(300)[None].repeat(5, 0), d), axis=-1)[:, :4]
        for row, (db_ids, dists) in enumerate(results):
            assert db_ids == [str(i) for i in order[row]]
            np.testing.assert_allclose(
                dists, np.take_along_axis(d, order, -1)[row], rtol=1e-4, atol=1e-4)

    def test_tie_breaking_lower_index(self):
        c = np.ones((10, 4), dtype=np.float32)
        q = np.ones((1, 4), dtype=np.float32)
        ix = CPUFlatIndex(4)
        ix.index_data(range(10), c)
        (db_ids, _), = ix.search_knn(q, top_docs=3)
        assert db_ids == ["0", "1", "2"]

    def test_incremental_and_persistence(self, rng, tmp_path):
        c1 = rng.randn(40, 8).astype(np.float32)
        c2 = rng.randn(25, 8).astype(np.float32)
        ix = CPUFlatIndex(8)
        ix.index_data(range(40), c1)
        ix.index_data(range(40, 65), c2)
        assert len(ix) == 65
        ix.serialize(str(tmp_path))

        loaded = CPUFlatIndex(8)
        loaded.deserialize_from(str(tmp_path))
        assert len(loaded) == 65
        q = rng.randn(3, 8).astype(np.float32)
        r1, r2 = ix.search_knn(q, 5), loaded.search_knn(q, 5)
        for (i1, s1), (i2, s2) in zip(r1, r2):
            assert i1 == i2
            np.testing.assert_allclose(s1, s2)

    def test_matches_tpu_indexer(self, rng):
        from kirag_tpu.index import TPUIndexer

        c = rng.randn(200, 16).astype(np.float32)
        q = rng.randn(4, 16).astype(np.float32)
        cpu = CPUFlatIndex(16)
        cpu.index_data(range(200), c)
        tpu = TPUIndexer(16, chunk_size=64)
        tpu.index_data(range(200), c)
        r_cpu = cpu.search_knn(q, 8)
        r_tpu = tpu.search_knn(q, 8)
        for (i1, s1), (i2, s2) in zip(r_cpu, r_tpu):
            assert i1 == i2
            np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)
