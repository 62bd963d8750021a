"""Tests for corpora, collators, and the aligner training dataset."""

import numpy as np
import pytest

from kirag_tpu.data import (
    BGECollator,
    E5Collator,
    HotPotQA,
    KGChainRetrieverSeqSampleDataset,
    Wikipedia,
)
from kirag_tpu.data.collators import bucket_length

from tests.helpers import make_corpus_json, make_tokenizer


class TestCorpus:
    def test_json_corpus(self, tmp_path):
        path, docs = make_corpus_json(tmp_path)
        corpus = HotPotQA(title_prefix="title:", passage_prefix="text:", corpus_path=path)
        assert len(corpus) == 20
        doc = corpus.get_document("doc3")
        assert doc["title"] == "w3"
        item = corpus[3]
        assert item["passage_id"] == "doc3"
        # reference passage format `dataset/corpus.py:53`
        assert item["passage"].startswith("title: w3, text: w3 is the")
        assert corpus.get_document_text("doc3") == item["passage"]

    def test_wikipedia_tsv(self, tmp_path):
        tsv = tmp_path / "psgs.tsv"
        tsv.write_text(
            "id\ttext\ttitle\n"
            "1\t\"Some passage text.\"\t\"A Title\"\n"
            "2\tplain text\tPlain Title\n"
        )
        corpus = Wikipedia(corpus_path=str(tsv))
        assert len(corpus) == 2
        # punctuation trimmed from first/last char (reference corpus.py:21-27)
        assert corpus.get_document("1")["text"] == "Some passage text."
        assert corpus.get_document("1")["title"] == "A Title"
        assert corpus[1]["passage"] == "title: Plain Title, context: plain text"


class TestCollators:
    def test_bucket_length(self):
        assert bucket_length(10, 512) == 16
        assert bucket_length(17, 512) == 32
        assert bucket_length(300, 512) == 512
        assert bucket_length(1000, 256) == 256

    def test_e5_prefixes(self, tmp_path):
        tok = make_tokenizer(tmp_path)
        coll = E5Collator(tokenizer=tok, query_maxlength=32, doc_maxlength=32)
        q = coll.encode_query(["alpha beta"])
        decoded = tok.decode(q["input_ids"][0], skip_special_tokens=True)
        assert decoded.startswith("query : alpha beta") or decoded.startswith("query: alpha beta")
        d = coll.encode_doc(["gamma delta"])
        decoded_d = tok.decode(d["input_ids"][0], skip_special_tokens=True)
        assert "passage" in decoded_d and "gamma delta" in decoded_d

    def test_bge_query_instruction(self, tmp_path):
        tok = make_tokenizer(tmp_path)
        coll = BGECollator(tokenizer=tok, query_maxlength=64, doc_maxlength=32)
        q = coll.encode_query(["alpha"])
        decoded = tok.decode(q["input_ids"][0], skip_special_tokens=True)
        assert "represent this sentence for searching relevant passages" in decoded

    def test_bucket_padding_shapes(self, tmp_path):
        tok = make_tokenizer(tmp_path)
        coll = E5Collator(tokenizer=tok, query_maxlength=512, doc_maxlength=512)
        out = coll.encode_query(["alpha beta gamma"])
        assert out["input_ids"].shape[1] in (16, 32)  # bucketed, not 512
        out2 = coll.encode_query(["alpha " * 400])
        assert out2["input_ids"].shape[1] == 512  # capped at maxlength

    def test_training_call_layout(self, tmp_path):
        tok = make_tokenizer(tmp_path)
        coll = E5Collator(tokenizer=tok, query_maxlength=64, doc_maxlength=64)
        batch = [
            {"index": 0, "question": "alpha ?", "answers": ["beta"],
             "positive_passage": "beta", "negative_passages": ["gamma", "delta"]},
            {"index": 1, "question": "pi ?", "answers": ["rho"],
             "positive_passage": "rho", "negative_passages": ["sigma", "tau"]},
        ]
        q_args, d_args, pos_idx, index = coll(batch)
        assert q_args["input_ids"].shape[0] == 2
        assert d_args["input_ids"].shape[0] == 6  # 2 * (1 pos + 2 negs)
        np.testing.assert_array_equal(pos_idx, [0, 3])
        np.testing.assert_array_equal(index, [0, 1])

    def test_right_padding_restored_after_generator_flip(self, tmp_path):
        """Regression: a decoder-only Generator sharing the tokenizer switches
        padding_side to 'left'; the collator's right-side bucket trim must not
        then chop off the real tokens (zero embeddings downstream)."""
        tok = make_tokenizer(tmp_path)
        coll = E5Collator(tokenizer=tok, query_maxlength=512, doc_maxlength=512)
        tok.padding_side = "left"  # what Generator.tokenizer_encode does
        out = coll.encode_query(["alpha beta gamma"])
        assert out["attention_mask"][0].sum() > 0
        # real tokens at the front (right padding), not trimmed away
        assert out["attention_mask"][0][0] == 1

    def test_nested_batch_flattened(self, tmp_path):
        tok = make_tokenizer(tmp_path)
        coll = E5Collator(tokenizer=tok, query_maxlength=64, doc_maxlength=64)
        ex = {"index": 0, "question": "alpha", "answers": [],
              "positive_passage": "beta", "negative_passages": ["gamma"]}
        q_args, d_args, pos_idx, _ = coll([[ex, ex], [ex]])
        assert q_args["input_ids"].shape[0] == 3
        np.testing.assert_array_equal(pos_idx, [0, 2, 4])


def _write_aligner_data(tmp_path, name, comparison=False):
    import json
    import pickle

    folder = tmp_path / name
    folder.mkdir()
    example = {
        "id": "q1",
        "question": "who wrote alpha ?",
        "answers": ["beta"],
        "supporting_triples": [
            {"title": "t0", "text": "<alpha; wrote; beta>"},
            {"title": "t1", "text": "<beta; born; gamma>"},
        ],
        "hard_negative_triples": {
            "hop0": [{"title": "n", "text": "<x; y; z>"}, {"title": "n", "text": "<u; v; w>"}],
        },
    }
    for split in ("train_aligner.json", "dev_aligner.json"):
        with open(folder / split, "w") as f:
            json.dump([example], f)
    with open(folder / "is_comparison_map.pkl", "wb") as f:
        pickle.dump({"q1": comparison}, f)
    return str(folder)


class TestAlignerDataset:
    def test_sequential_chains(self, tmp_path):
        folder = _write_aligner_data(tmp_path, "hotpotqa_x")
        ds = KGChainRetrieverSeqSampleDataset(
            is_train=False, data_folders=[folder], num_negatives=3)
        results = ds[0]
        # non-comparison 2-hop: combos are (0,) and (0,1)
        assert len(results) == 2
        assert results[0]["question"] == "who wrote alpha ?"
        assert results[0]["positive_passage"] == "<alpha; wrote; beta>"
        assert "knowledge triples: <alpha; wrote; beta>." in results[1]["question"]
        assert results[1]["positive_passage"] == "<beta; born; gamma>"
        # negatives padded by resampling to num_negatives
        assert len(results[0]["negative_passages"]) == 3

    def test_comparison_permutations(self, tmp_path):
        folder = _write_aligner_data(tmp_path, "hotpotqa_cmp", comparison=True)
        ds = KGChainRetrieverSeqSampleDataset(
            is_train=False, data_folders=[folder], num_negatives=2)
        results = ds[0]
        # comparison 2-hop: hop0 -> (0,),(1,); hop1 -> 2 permutations = 4 total
        assert len(results) == 4

    def test_train_sampling_bounded(self, tmp_path):
        folder = _write_aligner_data(tmp_path, "hotpotqa_y")
        ds = KGChainRetrieverSeqSampleDataset(
            is_train=True, data_folders=[folder], num_positives=1, num_negatives=2)
        assert len(ds[0]) == 1
