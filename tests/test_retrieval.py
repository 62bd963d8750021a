"""End-to-end DenseRetriever tests: encode -> device index -> corpus join."""

import numpy as np

from kirag_tpu.data import E5Collator, HotPotQA
from kirag_tpu.index import TPUIndexer
from kirag_tpu.retrieval import DenseRetriever

from tests.helpers import make_corpus_json, make_tiny_encoder, make_tokenizer


def build_retriever(tmp_path, mesh=None, batch_size=4):
    tok = make_tokenizer(tmp_path)
    encoder = make_tiny_encoder(vocab_size=tok.vocab_size)
    collator = E5Collator(tokenizer=tok, query_maxlength=64, doc_maxlength=64)
    path, _ = make_corpus_json(tmp_path)
    corpus = HotPotQA(title_prefix="title:", passage_prefix="text:", corpus_path=path)
    indexer = TPUIndexer(encoder.embedding_size, mesh=mesh, chunk_size=32)

    retriever = DenseRetriever(encoder, collator, indexer=indexer, corpus=corpus,
                               batch_size=batch_size)
    doc_texts = [corpus[i]["passage"] for i in range(len(corpus))]
    embeddings = retriever.calculate_document_embeddings(doc_texts)
    indexer.index_data([corpus[i]["passage_id"] for i in range(len(corpus))], embeddings)
    return retriever, corpus, embeddings


class TestDenseRetriever:
    def test_self_retrieval(self, tmp_path):
        retriever, corpus, embeddings = build_retriever(tmp_path)
        # querying with a doc's own text must rank that doc first
        results = retriever(corpus[7]["passage"], topk=3)
        assert results[0]["id"] == "doc7"
        assert results[0]["score"] >= results[1]["score"]
        assert "sentences" in results[0]  # joined with full corpus record

    def test_batch_retrieve_odd_batches(self, tmp_path):
        retriever, corpus, _ = build_retriever(tmp_path, batch_size=4)
        queries = [corpus[i]["passage"] for i in range(7)]  # 7 % 4 != 0
        results = retriever(queries, topk=2)
        assert len(results) == 7
        for i, one in enumerate(results):
            assert one[0]["id"] == f"doc{i}"

    def test_embeddings_batch_invariance(self, tmp_path):
        """Padding the tail batch must not change embeddings."""
        retriever, corpus, _ = build_retriever(tmp_path, batch_size=4)
        texts = [corpus[i]["passage"] for i in range(5)]
        full = retriever.calculate_document_embeddings(texts)
        one = retriever.calculate_document_embeddings(texts[4:5])
        np.testing.assert_allclose(full[4], one[0], rtol=1e-4, atol=1e-5)

    def test_get_documents_dict_ranked(self, tmp_path):
        retriever, corpus, _ = build_retriever(tmp_path)
        docs = retriever.get_documents({"doc1": 0.2, "doc5": 0.9, "doc3": 0.5})
        assert [d["id"] for d in docs] == ["doc5", "doc3", "doc1"]
        assert docs[0]["score"] == 0.9

    def test_encode_score_rank(self, tmp_path):
        retriever, corpus, _ = build_retriever(tmp_path)
        queries = ["w3 question", "w8 question"]
        docs = [corpus[i]["passage"] for i in range(10)]
        indices, scores = retriever.encode_score_rank(queries, docs, k=4)
        assert len(indices) == 2 and len(indices[0]) == 4
        # scores descending per query
        for s in scores:
            assert all(s[i] >= s[i + 1] - 1e-6 for i in range(len(s) - 1))

    def test_sharded_index_matches_single(self, tmp_path, mesh8):
        retriever_s, corpus, _ = build_retriever(tmp_path, mesh=mesh8)
        retriever_1, _, _ = build_retriever(tmp_path)
        q = [corpus[2]["passage"], corpus[9]["passage"]]
        r_s = retriever_s(q, topk=5)
        r_1 = retriever_1(q, topk=5)
        for a, b in zip(r_s, r_1):
            assert [d["id"] for d in a] == [d["id"] for d in b]
