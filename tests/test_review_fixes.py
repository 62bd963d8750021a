"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.helpers import make_tokenizer


class TestEosMasking:
    def test_tokens_frozen_after_eos(self, rng):
        """Once a row emits EOS, every later token must be EOS (clean decode)."""
        transformers = pytest.importorskip("transformers")
        torch = pytest.importorskip("torch")

        from kirag_tpu.models.llm import config_from_hf, convert_hf_llama_state_dict, greedy_decode

        torch.manual_seed(0)
        hf_config = transformers.LlamaConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            max_position_embeddings=64)
        model = transformers.LlamaForCausalLM(hf_config).eval()
        config = config_from_hf(hf_config)
        params = convert_hf_llama_state_dict(
            {k: v.numpy() for k, v in model.state_dict().items()}, config)

        ids = rng.randint(1, 64, size=(2, 8)).astype(np.int32)
        mask = np.ones_like(ids)
        free_ids, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                    config, 12)
        free = np.asarray(free_ids)
        # pick the token row 0 emits at step 2 as the 'eos' and re-decode
        eos = int(free[0, 2])
        stop_ids, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                    config, 12, eos_token_id=eos)
        stop = np.asarray(stop_ids)
        for row in range(2):
            hits = np.where(stop[row] == eos)[0]
            if len(hits):
                assert np.all(stop[row][hits[0]:] == eos)

    def test_no_eos_matches_unmasked(self, rng):
        """eos_token_id=None must reproduce the original decode exactly."""
        transformers = pytest.importorskip("transformers")
        torch = pytest.importorskip("torch")

        from kirag_tpu.models.llm import config_from_hf, convert_hf_llama_state_dict, greedy_decode

        torch.manual_seed(1)
        hf_config = transformers.LlamaConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            max_position_embeddings=64)
        model = transformers.LlamaForCausalLM(hf_config).eval()
        config = config_from_hf(hf_config)
        params = convert_hf_llama_state_dict(
            {k: v.numpy() for k, v in model.state_dict().items()}, config)
        ids = rng.randint(1, 64, size=(1, 6)).astype(np.int32)
        mask = np.ones_like(ids)
        a, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask), config, 6)
        b, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask), config, 6,
                             eos_token_id=None)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestOptionMapCollisions:
    def test_stop_choice_never_shadowed(self, tmp_path):
        """Multi-digit options must not hijack the '0' (stop) token."""
        from kirag_tpu.generation import make_stub_generator
        from kirag_tpu.pipeline.selector import TripleSelector

        tok = make_tokenizer(tmp_path)
        sel = TripleSelector.__new__(TripleSelector)
        sel.constructor = make_stub_generator(tok)
        m = sel.get_option_token_id_to_option_map(21)
        zero_ids = tok.encode("0", add_special_tokens=False)
        assert m[zero_ids[0]] == "0"
        # every mapped value is a single-token option; no option maps twice
        assert len(set(m.values())) == len(set(m.values()))
        for tid, opt in m.items():
            assert len(tok.encode(opt, add_special_tokens=False)) == 1 or \
                   len(tok.encode(f" {opt}", add_special_tokens=False)) == 1


class TestTruncationSide:
    def test_overlong_prompt_keeps_tail(self, tmp_path):
        from kirag_tpu.generation import StubBackend
        from kirag_tpu.generation.interface import Generator

        tok = make_tokenizer(tmp_path)
        gen = Generator(tok, StubBackend(tok), model_name="stub-instruct",
                        max_length=24)
        gen.family = "generic"
        prompt = ("alpha " * 200) + "question : beta ?"
        enc = gen.tokenizer_encode([prompt])
        decoded = tok.decode(enc["input_ids"][0], skip_special_tokens=True)
        assert "beta" in decoded  # the tail survived
        assert enc["input_ids"].shape[1] <= 24


class TestLlama2Template:
    def test_inst_format(self):
        from kirag_tpu.generation.chat import build_messages, detect_family, render_chat

        assert detect_family("meta-llama/Llama-2-7b-chat-hf") == "llama2"
        msgs = build_messages("llama2", "SYS INSTR", "hello")
        text = render_chat("llama2", msgs)
        assert text.startswith("<s>[INST] <<SYS>>")
        assert "hello [/INST]" in text
        assert "<|start_header_id|>" not in text


class TestSplitEdgeCases:
    def test_num_dev_zero_keeps_full_train(self):
        from kirag_tpu.preprocessing.odqa import _split

        train = [{"id": i} for i in range(5)]
        tr, dev, test = _split(train, ["T"], 0)
        assert len(tr) == 5 and dev == [] and test == ["T"]

    def test_num_dev_too_large_raises(self):
        from kirag_tpu.preprocessing.odqa import _split

        with pytest.raises(ValueError):
            _split([{"id": 0}], [], 1)


class TestServingTopkGuard:
    def test_oversized_topk_raises(self, tmp_path):
        from kirag_tpu.serving import RetrievalEngine

        from tests.test_retrieval import build_retriever

        retriever, corpus, _ = build_retriever(tmp_path)
        eng = RetrievalEngine(retriever, warmup=False, topk_buckets=(3,))
        with pytest.raises(ValueError):
            eng.search(["x"], topk=10)
        eng.close()
