"""Shared test fixtures: tiny local tokenizer and corpora (no network)."""

import json
import os

BASE_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
WORDS = [
    "title", "context", "text", "query", "passage", "question", "answer",
    "the", "a", "of", "in", "is", "was", "and", "to", "for", "knowledge",
    "triples", "represent", "this", "sentence", "searching", "relevant",
    "passages", "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "city", "river",
    "mountain", "king", "queen", "born", "died", "wrote", "director", "film",
    ":", ",", ".", ";", "<", ">", "?",
    "candidate", "existing", "next", "choice", "need", "additional", "no",
] + [str(d) for d in range(10)] + [f"w{i}" for i in range(200)]


def make_tokenizer(tmpdir):
    """A real BertTokenizerFast over a tiny local vocab file."""
    from transformers import BertTokenizerFast

    vocab_path = os.path.join(str(tmpdir), "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(BASE_VOCAB + WORDS))
    return BertTokenizerFast(vocab_file=vocab_path, do_lower_case=True)


def make_corpus_json(tmpdir, n=20):
    """A corpus.json of n docs with distinct vocabulary words per doc."""
    docs = []
    for i in range(n):
        docs.append({
            "id": f"doc{i}",
            "title": f"w{i}",
            "sentences": [f"w{i} is the {WORDS[30 + (i % 20)]} .", f"w{i + 100} of w{i} ."],
        })
    path = os.path.join(str(tmpdir), "corpus.json")
    with open(path, "w") as f:
        json.dump(docs, f)
    return path, docs


def make_tiny_encoder(vocab_size=512, hidden=32, seed=0):
    import jax

    from kirag_tpu.models import BertConfig, init_bert_params
    from kirag_tpu.models.encoders import Encoder

    config = BertConfig(
        vocab_size=vocab_size, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=hidden * 2, max_position_embeddings=128,
    )
    params = init_bert_params(jax.random.key(seed), config)
    return Encoder(params, config, "e5")
