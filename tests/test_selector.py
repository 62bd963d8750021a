"""TripleSelector tests: option-prob extraction and beam expansion with stubs."""

import re

import numpy as np
import pytest

from kirag_tpu.data import E5Collator, HotPotQA
from kirag_tpu.generation import make_stub_generator
from kirag_tpu.index import TPUIndexer
from kirag_tpu.kg import KGGenerator
from kirag_tpu.pipeline import TripleSelector
from kirag_tpu.retrieval import DenseRetriever

from tests.helpers import make_corpus_json, make_tiny_encoder, make_tokenizer


def _build_selector(tmp_path, selector_responses):
    tok = make_tokenizer(tmp_path)
    enc = make_tiny_encoder(vocab_size=tok.vocab_size)
    coll = E5Collator(tokenizer=tok, query_maxlength=64, doc_maxlength=64)
    path, _ = make_corpus_json(tmp_path)
    corpus = HotPotQA(title_prefix="title:", passage_prefix="text:", corpus_path=path)
    idx = TPUIndexer(enc.embedding_size, chunk_size=32)
    retriever = DenseRetriever(enc, coll, indexer=idx, corpus=corpus, batch_size=8)
    idx.index_data([corpus[i]["passage_id"] for i in range(len(corpus))],
                   retriever.calculate_document_embeddings(
                       [corpus[i]["passage"] for i in range(len(corpus))]))
    aligner = DenseRetriever(enc, coll, batch_size=8)

    def kg_match(p):
        return "knowledge" in p and "title :" in p and "candidate" not in p

    def kg_respond(p):
        m = re.findall(r"title : (w\d+)", p)
        t = m[-1] if m else "w0"
        return f"< {t} ; is ; w{int(t[1:]) + 100} >"

    kg_llm = make_stub_generator(tok, rules=[(kg_match, kg_respond)])
    kg = KGGenerator(kg_llm, examplar_type="hotpotqa", adaptive_examplars=False,
                     max_length=2048)

    state = {"i": 0}

    def selector_respond(p):
        r = selector_responses[min(state["i"], len(selector_responses) - 1)]
        state["i"] += 1
        return r

    constructor = make_stub_generator(
        tok, rules=[(lambda p: "candidate" in p.lower(), selector_respond)],
        max_new_tokens=8)

    selector = TripleSelector(
        retriever=retriever, kg_generator=kg, constructor=constructor, aligner=aligner,
        examplar_type="hotpotqa", adaptive_examplars=False, num_turns=3, topk=3,
        num_candidate_triples=5)
    return selector, corpus, constructor


class TestOptionProbs:
    def test_extraction(self, tmp_path):
        selector, _, constructor = _build_selector(tmp_path, ["1"])
        tok = constructor.tokenizer
        ids = np.asarray(tok("2", add_special_tokens=False)["input_ids"],
                         dtype=np.int32)[None]
        vocab = tok.vocab_size
        logits = np.zeros((1, ids.shape[1], vocab), dtype=np.float32)
        logits[0, 0, ids[0, 0]] = 8.0  # strongly prefer '2'
        options, probs = selector.get_option_tokens_probs(ids, logits, num_options=4)
        best = options[int(np.argmax(probs[0]))]
        assert best == "2"
        np.testing.assert_allclose(probs[0].sum(), 1.0, rtol=1e-5)

    def test_no_option_token_gives_nan(self, tmp_path):
        selector, _, constructor = _build_selector(tmp_path, ["1"])
        tok = constructor.tokenizer
        ids = np.asarray(tok("alpha", add_special_tokens=False)["input_ids"],
                         dtype=np.int32)[None]
        logits = np.zeros((1, ids.shape[1], tok.vocab_size), dtype=np.float32)
        _, probs = selector.get_option_tokens_probs(ids, logits, num_options=3)
        assert np.all(np.isnan(probs[0]))


class TestSelectorBeam:
    def test_choice_extends_chain(self, tmp_path):
        # select option 1 (first candidate), then 0 (stop)
        selector, corpus, _ = _build_selector(tmp_path, ["1", "0"])
        chains, doc_scores = selector.retrieve(corpus[4]["passage"], num_beams=1,
                                               max_num_chains=2)
        assert len(chains) >= 1
        top = chains[0]
        assert len(top["triples"]) == 1  # one triple selected before stop
        assert top["finished"]
        assert 0 < top["score"] <= 1.0
        assert len(doc_scores) > 0

    def test_stop_first_turn(self, tmp_path):
        selector, corpus, constructor = _build_selector(tmp_path, ["0"])
        chains, doc_scores = selector.retrieve(corpus[2]["passage"], num_beams=1)
        assert chains[0]["finished"] and chains[0]["triples"] == []
        # fallback: dense scores used when no triples selected
        assert len(doc_scores) > 0

    def test_duplicate_filtering(self, tmp_path):
        selector, _, _ = _build_selector(tmp_path, ["1"])
        t = {"title": "w", "text": "<a; b; c>", "reference": ["d", 0]}
        chains = [[t]]
        idx, sc = selector.filter_duplicate_triples(
            chains, [t, {"title": "w", "text": "<x; y; z>", "reference": ["e", 0]}],
            [[0, 1]], [[0.9, 0.8]])
        assert idx == [[1]] and sc == [[0.8]]

    def test_choices_menu_format(self, tmp_path):
        selector, _, _ = _build_selector(tmp_path, ["0"])
        choices = selector.convert_candidate_triples_to_choices(["<a;b;c>", "<d;e;f>"])
        assert choices[0].startswith("0. no need")
        assert choices[1] == "1. <a;b;c>"
        assert choices[2] == "2. <d;e;f>"


class TestRetrieverOnlyBeam:
    """select_wo_selector: the reference `forward_wo_selector` beam
    (`models.py:1102-1183`) — aligner scores expand chains, no LLM call."""

    def test_expands_by_aligner_scores_without_llm(self, tmp_path):
        selector, corpus, constructor = _build_selector(tmp_path, ["1"])
        docs = selector.retriever.get_documents(
            {corpus[i]["passage_id"]: 1.0 for i in range(4)})
        docs = selector.kg_generator(docs)
        n_llm_calls = len(constructor.backend.calls)
        chains = selector.select_wo_selector(corpus[1]["passage"], docs,
                                             num_beams=2)
        # the constructor LLM must not have been touched
        assert len(constructor.backend.calls) == n_llm_calls
        assert 1 <= len(chains) <= 2
        assert all(len(c["triples"]) == 1 and not c["finished"] for c in chains)
        scores = [c["score"] for c in chains]
        assert scores == sorted(scores, reverse=True)

    def test_second_step_accumulates_scores(self, tmp_path):
        selector, corpus, _ = _build_selector(tmp_path, ["1"])
        docs = selector.kg_generator(selector.retriever.get_documents(
            {corpus[i]["passage_id"]: 1.0 for i in range(4)}))
        step1 = selector.select_wo_selector(corpus[1]["passage"], docs,
                                            num_beams=1,
                                            return_triple_filter_scores=True)
        step2 = selector.select_wo_selector(corpus[1]["passage"], docs,
                                            existing_reasoning_chains=step1,
                                            num_beams=1,
                                            return_triple_filter_scores=True)
        top = step2[0]
        assert len(top["triples"]) == 2
        # score is the SUM of the per-step aligner scores (additive beam)
        np.testing.assert_allclose(top["score"],
                                   sum(top["triple_filter_scores"]), rtol=1e-5)
        # duplicate filtering: the second triple differs from the first
        assert top["triples"][0]["text"] != top["triples"][1]["text"]

    def test_finished_chains_pass_through(self, tmp_path):
        selector, corpus, _ = _build_selector(tmp_path, ["1"])
        done = [{"triples": [], "score": 0.3, "finished": True}]
        out = selector.select_wo_selector(corpus[1]["passage"], [],
                                          existing_reasoning_chains=done)
        assert out == done

    def test_retrieve_with_use_llm_selector_false(self, tmp_path):
        selector, corpus, constructor = _build_selector(tmp_path, ["1"])
        selector.num_turns = 2
        chains, doc_scores = selector.retrieve(corpus[4]["passage"],
                                               num_beams=1, max_num_chains=2,
                                               use_llm_selector=False)
        assert len(constructor.backend.calls) == 0  # LLM never invoked
        assert chains and chains[0]["triples"]
        assert len(doc_scores) > 0
