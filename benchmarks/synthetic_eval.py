"""Self-contained retrieval-quality regression harness.

Builds a synthetic multi-hop corpus with KNOWN gold chains, runs the full
KiRAG stack (tiny random encoder + oracle-ish stub LLMs), and scores
Recall@k / answer EM against the synthetic gold — the whole evaluation
pipeline (`retrieval_eval` + `qa_eval` math) exercised end-to-end with zero
external data or checkpoints.

Usage:
  python -m benchmarks.synthetic_eval [--num_questions 20] [--corpus_size 200]

Prints a JSON summary. Intended as a quality regression check: the pipeline's
R@2 on this oracle-LLM setup should stay at 1.0 — anything lower means the
loop's bookkeeping (dedup, reinforcement, ranking) regressed.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

import numpy as np


def build_world(num_questions: int, corpus_size: int, seed: int = 0):
    """A synthetic 2-hop world: question i is answered by the chain
    e{i} -> r1 -> m{i} -> r2 -> a{i}, with facts split across two docs."""
    rng = np.random.RandomState(seed)
    docs, questions, qrels = [], [], {}
    for i in range(num_questions):
        d1 = {"id": f"hop1_{i}", "title": f"e{i}",
              "sentences": [f"e{i} links to m{i} ."]}
        d2 = {"id": f"hop2_{i}", "title": f"m{i}",
              "sentences": [f"m{i} resolves to a{i} ."]}
        docs.extend([d1, d2])
        questions.append({"id": f"q{i}", "question": f"what does e{i} finally resolve to ?",
                          "answers": [f"a{i}"]})
        qrels[f"q{i}"] = {f"hop1_{i}", f"hop2_{i}"}
    # distractors
    for j in range(corpus_size - len(docs)):
        docs.append({"id": f"noise{j}", "title": f"n{j}",
                     "sentences": [f"n{j} is unrelated noise {rng.randint(1000)} ."]})
    return docs, questions, qrels


def build_stack(docs, tmpdir):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from helpers import BASE_VOCAB, WORDS  # tiny offline tokenizer vocab

    from transformers import BertTokenizerFast

    import jax

    from kirag_tpu.data import E5Collator
    from kirag_tpu.data.corpus import Corpus
    from kirag_tpu.generation import make_stub_generator
    from kirag_tpu.index import TPUIndexer
    from kirag_tpu.kg import KGGenerator
    from kirag_tpu.pipeline import KiRAG
    from kirag_tpu.retrieval import DenseRetriever

    extra = [w for i in range(200) for w in (f"e{i}", f"m{i}", f"a{i}", f"n{i}")]
    vocab_path = os.path.join(tmpdir, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(BASE_VOCAB + WORDS + ["links", "resolves", "resolve",
                                                "finally", "unrelated", "noise",
                                                "does", "what", "thought", "so"] + extra))
    tok = BertTokenizerFast(vocab_file=vocab_path, do_lower_case=True)

    class HashEncoder:
        """Deterministic bag-of-words embedding: retrieval = token overlap.

        Stands in for a trained encoder so the harness measures the LOOP's
        bookkeeping (dedup, reinforcement, ranking), not embedding quality.
        """

        embedding_size = 128

        def __call__(self, ids, mask):
            ids = np.asarray(ids)
            mask = np.asarray(mask).astype(bool)
            out = np.zeros((len(ids), self.embedding_size), np.float32)
            for r in range(len(ids)):
                for t in ids[r][mask[r]]:
                    out[r, int(t) % self.embedding_size] += 1.0
            return out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)

    encoder = HashEncoder()
    collator = E5Collator(tokenizer=tok, query_maxlength=64, doc_maxlength=64)
    corpus = Corpus(title_prefix="title:", passage_prefix="text:", data=docs)

    indexer = TPUIndexer(encoder.embedding_size, chunk_size=256)
    retriever = DenseRetriever(encoder, collator, indexer=indexer, corpus=corpus,
                               batch_size=16)
    indexer.index_data([d["id"] for d in docs],
                       retriever.calculate_document_embeddings(
                           [corpus.doc_to_str(d) for d in docs]))
    aligner = DenseRetriever(encoder, collator, batch_size=16)

    # oracle KG extractor: reads the doc sentence and emits the gold triple
    def kg_match(p):
        return "knowledge" in p and "title :" in p

    def kg_respond(p):
        m = re.findall(r"(e\d+|m\d+) (?:links to|resolves to) (m\d+|a\d+)", p)
        if not m:
            return ""
        h, t = m[-1]
        rel = "links to" if h.startswith("e") else "resolves to"
        return f"< {h} ; {rel} ; {t} >"

    kg_llm = make_stub_generator(tok, rules=[(kg_match, kg_respond)])
    kg = KGGenerator(kg_llm, examplar_type="hotpotqa", adaptive_examplars=False,
                     max_length=4096, batch_size=8)

    # oracle constructor: extends the chain with whichever gold triple comes
    # next; chain state is read from the forced "Thought:" prefix (the tail
    # of the rendered prompt)
    def cons_respond(p):
        qm = re.search(r"what does (e\d+)", p)
        if not qm:
            return ""
        i = qm.group(1)[1:]
        chain_tail = p.rsplit("thought :", 1)[-1] if "thought :" in p else ""
        if f"resolves to ; a{i}" in chain_tail:
            return f"so the answer is: a{i}"
        if f"links to ; m{i}" in chain_tail:
            return f"< m{i} ; resolves to ; a{i} >"
        return f"< e{i} ; links to ; m{i} >"

    constructor = make_stub_generator(
        tok, rules=[(lambda p: "question :" in p, cons_respond)], max_new_tokens=32)

    kirag = KiRAG(retriever=retriever, kg_generator=kg, constructor=constructor,
                  aligner=aligner, examplar_type="hotpotqa", adaptive_examplars=False,
                  num_turns=4, topk=4, num_candidate_triples=8)
    return kirag, corpus


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_questions", type=int, default=10)
    parser.add_argument("--corpus_size", type=int, default=100)
    parser.add_argument("--k", type=int, default=2)
    args = parser.parse_args()

    docs, questions, qrels = build_world(args.num_questions, args.corpus_size)
    with tempfile.TemporaryDirectory() as tmpdir:
        kirag, corpus = build_stack(docs, tmpdir)
        recalls, chain_lens = [], []
        for q in questions:
            chains, doc_scores = kirag.retrieve(q["question"])
            top = list(doc_scores.keys())[: args.k]
            gold = qrels[q["id"]]
            recalls.append(len(set(top) & gold) / len(gold))
            chain_lens.append(len(chains[0]))
    summary = {
        "questions": args.num_questions,
        "corpus_size": args.corpus_size,
        f"recall@{args.k}": float(np.mean(recalls)),
        "mean_chain_len": float(np.mean(chain_lens)),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
