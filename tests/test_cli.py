"""End-to-end CLI integration: embed -> index -> retrieve -> evaluate, with
tiny on-disk checkpoints (the full user workflow of the reference README)."""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.helpers import BASE_VOCAB, WORDS, make_corpus_json


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Tiny encoder checkpoint + tokenizer + llama checkpoint + corpus + queries."""
    root = tmp_path_factory.mktemp("cli_ws")

    # tokenizer saved in HF format (loadable by AutoTokenizer)
    vocab_path = root / "vocab.txt"
    vocab_path.write_text("\n".join(BASE_VOCAB + WORDS))
    tok = transformers.BertTokenizerFast(vocab_file=str(vocab_path), do_lower_case=True)

    # encoder checkpoint
    torch.manual_seed(0)
    enc_dir = root / "e5-tiny"
    bert_cfg = transformers.BertConfig(
        vocab_size=tok.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=128,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    transformers.BertModel(bert_cfg).save_pretrained(str(enc_dir))
    tok.save_pretrained(str(enc_dir))

    # llama checkpoint (constructor + kg LLM); 'llama'+'instruct' in the name
    # drive family/chat detection
    llm_dir = root / "llama-tiny-instruct"
    llama_cfg = transformers.LlamaConfig(
        vocab_size=tok.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=512)
    transformers.LlamaForCausalLM(llama_cfg).save_pretrained(str(llm_dir))
    tok.save_pretrained(str(llm_dir))

    corpus_path, docs = make_corpus_json(root)
    queries = [
        {"id": "q0", "question": "what is w3 ?", "answers": ["w103"]},
        {"id": "q1", "question": "what is w7 ?", "answers": ["w107"]},
    ]
    query_file = root / "queries.json"
    query_file.write_text(json.dumps(queries))
    qrels = root / "qrels.tsv"
    qrels.write_text("q0\tdoc3\t1\nq1\tdoc7\t1\n")
    return {
        "root": root, "enc_dir": str(enc_dir), "llm_dir": str(llm_dir),
        "corpus_path": corpus_path, "query_file": str(query_file),
        "qrels": str(qrels),
    }


def run_cli(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


class TestCLIWorkflow:
    def test_full_workflow(self, workspace, monkeypatch, capsys):
        ws = workspace
        out = str(ws["root"] / "out")

        # 1. embed the corpus
        from kirag_tpu.cli import compute_corpus_embeddings

        run_cli(compute_corpus_embeddings, [
            "--retriever_model_name_or_path", ws["enc_dir"],
            "--corpus", "2wikimultihopqa", "--corpus_path", ws["corpus_path"],
            "--per_device_batch_size", "8", "--compute_dtype", "float32",
            "--num_passage_per_index_file", "12",
            "--save_dir", out, "--name", "e5_tiny",
        ], monkeypatch)
        shards = [f for f in os.listdir(os.path.join(out, "e5_tiny"))
                  if f.startswith("corpus_embeddings")]
        assert len(shards) == 2  # 20 docs / 12 per shard

        # 2. build the index
        from kirag_tpu.cli import build_index

        run_cli(build_index, [
            "--embeddings_dir", os.path.join(out, "e5_tiny"),
            "--embedding_size", "32",
            "--save_dir", os.path.join(out, "index"),
        ], monkeypatch)
        import glob as _glob

        assert _glob.glob(os.path.join(out, "index", "index_*_*.npy"))

        # 3. iterative retrieval with the tiny llama
        from kirag_tpu.cli import retrieve

        run_cli(retrieve, [
            "--dataset", "2wikimultihopqa", "--query_file", ws["query_file"],
            "--corpus", "2wikimultihopqa", "--corpus_path", ws["corpus_path"],
            "--index_folder", os.path.join(out, "index"),
            "--embedding_size", "32",
            "--retriever_model_name_or_path", ws["enc_dir"],
            "--compute_dtype", "float32",
            "--llm", ws["llm_dir"],
            "--aligner_model_name_or_path", ws["enc_dir"],
            "--num_turns", "2", "--topk", "3", "--num_candidate_triples", "5",
            "--concurrent_questions", "2",  # lockstep batched loop via CLI
            "--save_dir", out, "--name", "kirag", "--save_file", "results.json",
        ], monkeypatch)
        results = json.load(open(os.path.join(out, "kirag", "results.json")))
        assert len(results) == 2
        assert "ctxs" in results[0] and "paths" in results[0]
        # even with a gibberish random LLM (no parseable triples), the dense
        # fallback must return ranked documents
        assert len(results[0]["ctxs"]) > 0

        # 4. retrieval evaluation against qrels
        from kirag_tpu.cli import retrieval_eval

        run_cli(retrieval_eval, [
            "--dataset", "2wikimultihopqa",
            "--save_file", os.path.join(out, "kirag", "results.json"),
            "--qrels", ws["qrels"], "--k", "3",
        ], monkeypatch)
        printed = capsys.readouterr().out
        assert "Recall@3" in printed

    def test_multiprocess_embedding_shards(self, workspace, monkeypatch, tmp_path):
        """Two workers embed disjoint slices; build_index reassembles in order."""
        import numpy as np

        from kirag_tpu.cli import build_index, compute_corpus_embeddings

        ws = workspace
        out = str(tmp_path / "mp")
        for proc in (0, 1):
            run_cli(compute_corpus_embeddings, [
                "--retriever_model_name_or_path", ws["enc_dir"],
                "--corpus", "2wikimultihopqa", "--corpus_path", ws["corpus_path"],
                "--per_device_batch_size", "8", "--compute_dtype", "float32",
                "--process_index", str(proc), "--process_count", "2",
                "--save_dir", out, "--name", "e5",
            ], monkeypatch)
        shards = sorted(f for f in os.listdir(os.path.join(out, "e5"))
                        if f.startswith("corpus_embeddings"))
        assert len(shards) == 2
        run_cli(build_index, [
            "--embeddings_dir", os.path.join(out, "e5"),
            "--embedding_size", "32", "--save_dir", os.path.join(out, "index"),
        ], monkeypatch)
        # id order must match the corpus order after reassembly
        import pickle

        with open(os.path.join(out, "index", "index_meta.pkl"), "rb") as f:
            ids = pickle.load(f)
        assert ids == [f"doc{i}" for i in range(20)]

    def test_retrieval_eval_answer_presence(self, workspace, monkeypatch, capsys, tmp_path):
        from kirag_tpu.cli import retrieval_eval

        results = [{"id": "q", "question": "?", "answers": ["w103"],
                    "ctxs": [{"id": "doc3", "title": "w3", "text": "w3 is the w103 ."}]}]
        f = tmp_path / "r.json"
        f.write_text(json.dumps(results))
        run_cli(retrieval_eval, ["--dataset", "nq", "--save_file", str(f), "--k", "1"],
                monkeypatch)
        out = capsys.readouterr().out
        assert "'Recall@1': 1.0" in out


class TestCompressedIndexCLI:
    @pytest.mark.parametrize("compression,dim", [("int8", 32), ("int4", 256)])
    def test_build_compressed_index_roundtrip(self, tmp_path, monkeypatch,
                                              compression, dim):
        """--compression int8/int4 on build_index persists through
        serialize; a fresh indexer restores it from the config and serves
        self-hit searches (the reference's IndexPQ CLI role)."""
        import numpy as np

        from kirag_tpu.cli import build_index
        from kirag_tpu.index import TPUIndexer

        rng = np.random.default_rng(5)
        emb_dir = tmp_path / "emb"
        emb_dir.mkdir()
        emb = rng.standard_normal((300, dim)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        np.savez(emb_dir / "corpus_embeddings_0_300.npz",
                 passage_ids=np.asarray([f"d{i}" for i in range(300)],
                                        dtype=object),
                 embeddings=emb)
        out = str(tmp_path / "index")
        run_cli(build_index, [
            "--embeddings_dir", str(emb_dir), "--embedding_size", str(dim),
            "--compression", compression, "--save_dir", out,
        ], monkeypatch)

        loaded = TPUIndexer(dim)
        loaded.deserialize_from(out)
        assert loaded.compression == compression
        res = loaded.search_knn(emb[:4], top_docs=3)
        for row, (ids, _) in enumerate(res):
            assert ids[0] == f"d{row}"
