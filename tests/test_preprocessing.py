"""Preprocessing tests: corpus dedup, qrels, splits, comparison maps."""

import json
import os

import pytest

from kirag_tpu.preprocessing import (
    build_corpus_from_contexts,
    convert_simple_qa_tsv,
    load_comparison_map,
)
from kirag_tpu.preprocessing.odqa import process_2wikimultihopqa, process_musique


class TestCorpusDedup:
    def test_dedup_by_content(self):
        contexts = [
            ("A", ["s1", "s2"]),
            ("B", ["s3"]),
            ("A", ["s1", "s2"]),  # duplicate
            ("A", ["s1", "different"]),  # same title, different content
        ]
        hash_to_id, records = build_corpus_from_contexts(contexts)
        assert len(records) == 3
        assert [r["id"] for r in records] == ["0", "1", "2"]


def _write_2wiki_raw(tmp_path):
    def example(qid, titles, answer="ans"):
        return {
            "_id": qid,
            "question": f"question {qid}?",
            "answer": answer,
            "type": "comparison" if qid == "q_cmp" else "bridge",
            "context": [[t, [f"{t} sent0", f"{t} sent1"]] for t in titles],
            "supporting_facts": [[titles[0], 0], [titles[1], 1]],
        }

    train = [example(f"q{i}", [f"T{i}", f"T{i + 1}"]) for i in range(6)]
    train.append(example("q_cmp", ["T0", "T1"]))
    dev = [example("qd0", ["T2", "T3"])]
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "train.json").write_text(json.dumps(train))
    (raw / "dev.json").write_text(json.dumps(dev))
    (raw / "test.json").write_text(json.dumps([]))
    return str(raw)


class Test2Wiki:
    def test_process(self, tmp_path):
        raw = _write_2wiki_raw(tmp_path)
        corpus, qrels, train, dev, test = process_2wikimultihopqa(raw, num_dev=2)
        # unique titles across examples: q0..q5 span T0..T6 (7 docs)
        assert len(corpus) == 7
        assert len(train) == 5 and len(dev) == 2 and len(test) == 1
        # qrels reference real corpus ids
        corpus_ids = {c["id"] for c in corpus}
        assert all(docid in corpus_ids for _, docid, _ in qrels)
        # every example contributes 2 supporting docs
        q0 = [r for r in qrels if r[0] == "q0"]
        assert len(q0) == 2

    def test_comparison_map(self, tmp_path):
        raw = _write_2wiki_raw(tmp_path)
        cmp_map = load_comparison_map([os.path.join(raw, "train.json"),
                                       os.path.join(raw, "dev.json")])
        assert cmp_map["q_cmp"] is True
        assert cmp_map["q0"] is False


class TestMusique:
    def test_process(self, tmp_path):
        raw = tmp_path / "raw"
        raw.mkdir()

        def example(qid):
            return {
                "id": qid,
                "question": f"q {qid}?",
                "answer": "Paris",
                "paragraphs": [
                    {"title": "P1", "paragraph_text": "First sentence. Paris is here."},
                    {"title": "P2", "paragraph_text": "Other text entirely."},
                ],
                "question_decomposition": [
                    {"paragraph_support_idx": 0, "answer": "Paris"},
                ],
            }

        for split in ("train", "dev", "test"):
            path = raw / f"musique_ans_v1.0_{split}.jsonl"
            examples = [example(f"{split}{i}") for i in range(4 if split == "train" else 1)]
            path.write_text("\n".join(json.dumps(e) for e in examples))
        corpus, qrels, train, dev, test = process_musique(str(raw), num_dev=1)
        assert len(corpus) == 2  # P1/P2 dedup across every example
        assert len(train) == 3 and len(dev) == 1 and len(test) == 1
        # supporting sentence located by answer substring (sentence 1)
        assert train[0]["supporting_facts"][0][1] == 1


class TestSimpleQATsv:
    def test_bamboogle_style(self, tmp_path):
        f = tmp_path / "t.tsv"
        f.write_text("Question\tAnswer\nwho is x?\tSomeone\n")
        qa = convert_simple_qa_tsv(str(f), skip_header=True)
        assert qa == [{"question": "who is x?", "answers": ["Someone"]}]

    def test_webqa_style(self, tmp_path):
        f = tmp_path / "t.csv"
        f.write_text('what city?\t["Paris", "Lyon"]\n')
        qa = convert_simple_qa_tsv(str(f), answers_are_python_literals=True)
        assert qa[0]["answers"] == ["Paris", "Lyon"]
