"""Non-oracle end-to-end retrieval quality on real text.

The synthetic eval (benchmarks/synthetic_eval.py) uses an oracle stub; this
trains a tiny aligner FROM SCRATCH on half of the bundled real-text questions
(tests/fixtures_realtext.py) over the ~50 original bank passages, then runs
the full retrieval stack (Encoder -> TPUIndexer -> search) on the held-out
half and pins an R@k floor. A regression anywhere in tokenize -> collate ->
train -> embed -> index -> search drops the score (reference protocol:
`evaluation/retrieval_eval.py:31-67`). Calibrated: R@1=0.76, R@2=0.88.
"""

import os
import re

import numpy as np
import pytest

import jax

from tests.fixtures_realtext import REALTEXT_QA


@pytest.fixture(scope="module")
def realtext_setup(tmp_path_factory):
    from transformers import BertTokenizerFast

    from kirag_tpu.data import E5Collator
    from kirag_tpu.prompts import kg_construction as kc

    tmp = tmp_path_factory.mktemp("realtext")
    docs = (kc.HOTPOTQA_EXAMPLARS + kc.WIKIMULTIHOPQA_EXAMPLARS +
            kc.MUSIQUE_EXAMPLARS + kc.WIKIPEDIA_EXAMPLARS)
    corpus = {d["title"]: f"{d['title']}. {d['text']}" for d in docs}

    words = set()
    for t in list(corpus.values()) + [q["question"] for q in REALTEXT_QA]:
        words.update(re.findall(r"[a-z0-9']+", t.lower()))
    vocab_path = os.path.join(str(tmp), "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                          + sorted(words)))
    tok = BertTokenizerFast(vocab_file=vocab_path, do_lower_case=True)
    collator = E5Collator(tokenizer=tok, query_maxlength=32, doc_maxlength=64)
    return tmp, corpus, tok, collator


def _recall(indexer, retriever, eval_qs, k):
    q_emb = retriever.calculate_query_embeddings(
        [q["question"] for q in eval_qs], max_length=32)
    results = indexer.search_knn(q_emb, top_docs=k)
    return np.mean([q["gold"] in ids for q, (ids, _) in zip(eval_qs, results)])


def test_trained_aligner_beats_floor_end_to_end(realtext_setup):
    from kirag_tpu.index import TPUIndexer
    from kirag_tpu.models.bert import BertConfig, init_bert_params
    from kirag_tpu.models.encoders import Encoder
    from kirag_tpu.retrieval import DenseRetriever
    from kirag_tpu.training import AlignerTrainer, DataLoader, TrainerConfig

    tmp, corpus, tok, collator = realtext_setup
    titles = list(corpus)
    rng = np.random.RandomState(0)
    train_qs = [q for i, q in enumerate(REALTEXT_QA) if i % 2 == 0]
    eval_qs = [q for i, q in enumerate(REALTEXT_QA) if i % 2 == 1]
    examples = []
    for i, q in enumerate(train_qs):
        negs = [corpus[t] for t in
                rng.choice([x for x in titles if x != q["gold"]], 4, replace=False)]
        examples.append({"index": i, "question": q["question"], "answers": [],
                         "positive_passage": corpus[q["gold"]],
                         "negative_passages": negs})

    config = BertConfig(vocab_size=tok.vocab_size, hidden_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=128, max_position_embeddings=64)
    params = init_bert_params(jax.random.key(0), config)
    loader = DataLoader(examples, batch_size=8, shuffle=True,
                        collate_fn=collator, seed=0)
    tcfg = TrainerConfig(learning_rate=1e-3, save_dir=str(tmp / "run"),
                         num_train_epochs=8, eval_steps=10_000, log_steps=10_000)
    trainer = AlignerTrainer(params, config, tcfg, loader, None, temperature=0.05)

    # untrained baseline for the same stack (sensitivity check)
    def build_retriever(encoder):
        retriever = DenseRetriever(encoder, collator, batch_size=16)
        d_emb = retriever.calculate_document_embeddings(
            list(corpus.values()), max_length=64)
        indexer = TPUIndexer(64)
        indexer.index_data(titles, d_emb)
        retriever.indexer = indexer
        return indexer, retriever

    untrained = Encoder(params, config, "e5")
    idx_u, ret_u = build_retriever(untrained)
    r2_untrained = _recall(idx_u, ret_u, eval_qs, 2)

    trainer.train()
    enc_dir = str(tmp / "encoder")
    trainer.save_encoder(enc_dir)
    idx_t, ret_t = build_retriever(Encoder.load(enc_dir))
    r1 = _recall(idx_t, ret_t, eval_qs, 1)
    r2 = _recall(idx_t, ret_t, eval_qs, 2)

    assert r2 >= 0.70, f"held-out R@2 regressed: {r2} (calibrated 0.88)"
    assert r1 >= 0.50, f"held-out R@1 regressed: {r1} (calibrated 0.76)"
    assert r2 >= r2_untrained + 0.2, (
        f"training added too little: {r2} vs untrained {r2_untrained}")
