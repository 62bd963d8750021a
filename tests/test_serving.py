"""RetrievalEngine: micro-batching, concurrency, warmup, error surfacing."""

import threading

import pytest

from kirag_tpu.serving import RetrievalEngine

from tests.test_retrieval import build_retriever


@pytest.fixture
def engine(tmp_path):
    retriever, corpus, _ = build_retriever(tmp_path)
    eng = RetrievalEngine(retriever, max_batch=16, max_wait_ms=20,
                          topk_buckets=(3, 5))
    yield eng, corpus
    eng.close()


class TestRetrievalEngine:
    def test_single_request(self, engine):
        eng, corpus = engine
        out = eng.search([corpus[4]["passage"]], topk=3)
        assert len(out) == 1 and len(out[0]) == 3
        assert out[0][0]["id"] == "doc4"

    def test_concurrent_requests_coalesce(self, engine):
        eng, corpus = engine
        results = {}
        errors = []

        def worker(i):
            try:
                results[i] = eng.search([corpus[i]["passage"]], topk=2)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors
        for i in range(8):
            assert results[i][0][0]["id"] == f"doc{i}"
        # at least some coalescing happened (fewer device batches than requests)
        assert eng.stats["batches"] <= eng.stats["requests"]

    def test_topk_bucketing_trims(self, engine):
        eng, corpus = engine
        out = eng.search([corpus[0]["passage"]], topk=4)  # bucket 5, trimmed to 4
        assert len(out[0]) == 4

    def test_error_surfaces_to_caller(self, engine):
        eng, corpus = engine
        eng.retriever.indexer = None  # force a failure inside the batcher
        with pytest.raises(Exception):
            eng.search(["x"], topk=2)
