"""Parity of the JAX Llama decoder against torch transformers (tiny random
models — no network), plus decode-loop semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from kirag_tpu.models.llm import (
    JaxLlamaBackend,
    config_from_hf,
    convert_hf_llama_state_dict,
    greedy_decode,
    llama_block_forward,
    llama_param_shardings,
)


@pytest.fixture(scope="module")
def tiny_hf_llama():
    torch.manual_seed(0)
    hf_config = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=128, rope_theta=10000.0, tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(hf_config).eval()
    return hf_config, model


@pytest.fixture(scope="module")
def converted(tiny_hf_llama):
    hf_config, model = tiny_hf_llama
    config = config_from_hf(hf_config)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_hf_llama_state_dict(sd, config)
    return config, params, model


def left_padded_batch(rng, b=3, t=12, vocab=128):
    ids = rng.randint(1, vocab, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), dtype=np.int32)
    mask[0, :4] = 0
    mask[2, :7] = 0
    ids[mask == 0] = 0
    return ids, mask


class TestLlamaParity:
    def test_prefill_logits(self, converted, rng):
        config, params, model = converted
        ids, mask = left_padded_batch(rng)
        positions = np.clip(np.cumsum(mask, axis=1) - 1, 0, None)
        with torch.no_grad():
            ref = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                position_ids=torch.tensor(positions, dtype=torch.long),
            ).logits.numpy()
        nl = config.num_hidden_layers
        empty = [jnp.zeros((len(ids), 0, config.num_key_value_heads, config.head_dim))
                 for _ in range(nl)]
        empty_mask = jnp.zeros((len(ids), 0), dtype=jnp.int32)
        got, _, _ = llama_block_forward(
            params, jnp.asarray(ids), jnp.asarray(positions), config,
            empty, empty, empty_mask, new_mask=jnp.asarray(mask))
        got = np.asarray(got)
        sel = mask.astype(bool)
        np.testing.assert_allclose(got[sel], ref[sel], rtol=2e-4, atol=2e-4)

    def test_greedy_matches_hf_generate(self, converted, rng):
        config, params, model = converted
        ids, mask = left_padded_batch(rng)
        max_new = 8
        with torch.no_grad():
            out = model.generate(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                max_new_tokens=max_new, do_sample=False, temperature=1.0,
                pad_token_id=0, eos_token_id=None,
            )
        ref_gen = out[:, ids.shape[1]:].numpy()
        got_ids, got_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, max_new)
        np.testing.assert_array_equal(np.asarray(got_ids), ref_gen)
        assert got_logits.shape == (3, max_new, config.vocab_size)
        # per-step logits are greedy-consistent with the emitted ids
        np.testing.assert_array_equal(
            np.argmax(np.asarray(got_logits), axis=-1), np.asarray(got_ids))

    def test_qwen_style_bias_roundtrip(self, rng):
        torch.manual_seed(1)
        hf_config = transformers.Qwen2Config(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            max_position_embeddings=128, tie_word_embeddings=False,
        )
        model = transformers.Qwen2ForCausalLM(hf_config).eval()
        config = config_from_hf(hf_config)
        assert config.attention_bias
        params = convert_hf_llama_state_dict(
            {k: v.numpy() for k, v in model.state_dict().items()}, config)
        ids, mask = left_padded_batch(rng)
        got_ids, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        with torch.no_grad():
            out = model.generate(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                max_new_tokens=4, do_sample=False, pad_token_id=0, eos_token_id=None)
        np.testing.assert_array_equal(np.asarray(got_ids), out[:, ids.shape[1]:].numpy())


class TestGemma2Parity:
    def test_greedy_matches_hf_generate(self, rng):
        """Gemma-2: sandwich norms, GeGLU, softcapping, sliding window."""
        torch.manual_seed(2)
        hf_config = transformers.Gemma2Config(
            vocab_size=128, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            head_dim=16, max_position_embeddings=128, sliding_window=8,
            query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0, attn_implementation="eager")
        model = transformers.Gemma2ForCausalLM(hf_config).eval()
        from kirag_tpu.models.llm import config_from_hf as cfh

        config = cfh(hf_config)
        assert config.is_gemma2 and config.tie_word_embeddings
        params = convert_hf_llama_state_dict(
            {k: v.numpy() for k, v in model.state_dict().items()}, config)
        # seq 12 > sliding_window 8: exercises the local-attention mask
        ids, mask = left_padded_batch(rng, b=3, t=12, vocab=128)
        max_new = 6
        with torch.no_grad():
            out = model.generate(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                max_new_tokens=max_new, do_sample=False, pad_token_id=0,
                eos_token_id=None)
        ref_gen = out[:, ids.shape[1]:].numpy()
        got_ids, got_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, max_new)
        np.testing.assert_array_equal(np.asarray(got_ids), ref_gen)
        np.testing.assert_array_equal(
            np.argmax(np.asarray(got_logits), axis=-1), np.asarray(got_ids))


class TestBackend:
    def test_bucketing_invariance(self, converted, rng):
        """Left-extending padding to a bucket must not change the output."""
        config, params, model = converted
        backend = JaxLlamaBackend(params, config, eos_token_id=2,
                                  compute_dtype=jnp.float32, prompt_buckets=(16, 32))
        ids, mask = left_padded_batch(rng, t=12)
        ids_b, logits_b = backend.greedy(ids, mask, 4)
        got_direct, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        np.testing.assert_array_equal(ids_b, np.asarray(got_direct))

    def test_generator_integration(self, converted, tmp_path, rng):
        """The JAX backend slots into the text-level Generator harness."""
        from tests.helpers import make_tokenizer

        from kirag_tpu.generation.interface import Generator

        config, params, _ = converted
        tok = make_tokenizer(tmp_path)
        if tok.pad_token_id is None:
            tok.pad_token = "[PAD]"
        backend = JaxLlamaBackend(params, config, eos_token_id=tok.eos_token_id or 3,
                                  compute_dtype=jnp.float32, prompt_buckets=(32, 64))
        gen = Generator(tok, backend, model_name="llama-3-tiny-instruct",
                        max_length=64, max_new_tokens=4)
        gen.family = "generic"
        ids, logits = gen.generator_generate(["inst"], ["alpha beta"])
        assert ids.shape[0] == 1 and ids.shape[1] <= 4
        assert logits.shape[:2] == ids.shape


class TestResumableDecode:
    def test_prefill_resume_matches_fused(self, converted, rng):
        """prefill(1) + resume segments must reproduce greedy_decode exactly
        (ids AND per-step logits) — the KV-cache-resumable contract."""
        from kirag_tpu.models.llm import prefill_decode, resume_decode

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        max_new = 9
        ref_ids, ref_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, max_new)

        first_ids, first_logits, state = prefill_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, max_new)
        seg_ids, seg_logits = [np.asarray(first_ids)], [np.asarray(first_logits)]
        for _ in range(2):  # two resume segments of 4
            t, lg, state = resume_decode(params, state, config, 4)
            seg_ids.append(np.asarray(t))
            seg_logits.append(np.asarray(lg))
        got_ids = np.concatenate(seg_ids, axis=1)
        got_logits = np.concatenate(seg_logits, axis=1)
        np.testing.assert_array_equal(got_ids, np.asarray(ref_ids))
        np.testing.assert_allclose(got_logits, np.asarray(ref_logits),
                                   rtol=1e-5, atol=1e-5)

    def test_resume_respects_eos(self, converted, rng):
        """Rows finished before a resume keep emitting eos across segments."""
        from kirag_tpu.models.llm import prefill_decode, resume_decode

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        max_new = 8
        # pick the token the model actually emits first for row 0 as "eos"
        probe_ids, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                     config, 1)
        eos = int(np.asarray(probe_ids)[0, 0])
        ref_ids, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                   config, max_new, eos_token_id=eos)
        f_ids, _, state = prefill_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                         config, max_new, eos_token_id=eos)
        t1, _, state = resume_decode(params, state, config, 4, eos_token_id=eos)
        t2, _, state = resume_decode(params, state, config, 3, eos_token_id=eos)
        got = np.concatenate([np.asarray(f_ids), np.asarray(t1), np.asarray(t2)], axis=1)
        np.testing.assert_array_equal(got, np.asarray(ref_ids))
        assert np.all(got[0] == eos)  # finished row stays eos

    def test_return_logits_false(self, converted, rng):
        from kirag_tpu.models.llm import prefill_decode, resume_decode

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        ref_ids, ref_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, 6)
        got_ids, got_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, 6,
            return_logits=False)
        assert got_logits is None
        np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(ref_ids))
        _, _, state = prefill_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                     config, 6)
        t, lg, _ = resume_decode(params, state, config, 5, return_logits=False)
        assert lg is None
        np.testing.assert_array_equal(np.asarray(t), np.asarray(ref_ids)[:, 1:])

    def test_backend_segmented_stop_words(self, converted, tmp_path, rng):
        """Generator + resumable backend: stop-words trigger early exit and
        the emitted prefix matches the unsegmented decode."""
        from tests.helpers import make_tokenizer

        from kirag_tpu.generation.interface import Generator

        config, params, _ = converted
        tok = make_tokenizer(tmp_path)
        if tok.pad_token_id is None:
            tok.pad_token = "[PAD]"
        backend = JaxLlamaBackend(params, config, eos_token_id=999,  # never hits
                                  compute_dtype=jnp.float32, prompt_buckets=(32,))
        gen = Generator(tok, backend, model_name="llama-3-tiny-instruct",
                        max_length=32, max_new_tokens=12, stop_check_every=4)
        gen.family = "generic"
        enc = gen.tokenizer_encode(["alpha beta gamma"])
        ref_ids, _ = gen.greedy_generate(enc, max_new_tokens=12)
        # a stop word that never occurs: segmented path must still equal fused
        seg_ids, seg_logits = gen.greedy_generate(
            enc, max_new_tokens=12, stop_words=["☃never"])
        np.testing.assert_array_equal(seg_ids, ref_ids)
        assert seg_logits.shape[:2] == seg_ids.shape
        # a stop word the model emits immediately: the loop exits early
        first_text = tok.decode(ref_ids[0, :1], skip_special_tokens=True).strip()
        if first_text:
            early_ids, _ = gen.greedy_generate(
                enc, max_new_tokens=12, stop_words=[first_text])
            assert early_ids.shape[1] <= 5  # 1 prefill token + <=1 segment


class TestInt8Weights:
    def test_quantized_decode_close_to_f32(self, converted, rng):
        from kirag_tpu.models.llm import quantize_llama_params

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        base_ids, base_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        qparams = quantize_llama_params(params)
        q_ids, q_logits = greedy_decode(
            qparams, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        # random tiny models have near-uniform logits, so token-level agreement
        # is not guaranteed; logits must stay close though
        diff = np.abs(np.asarray(q_logits[:, 0]) - np.asarray(base_logits[:, 0]))
        assert float(diff.mean()) < 0.05

    def test_memory_halves(self, converted):
        from kirag_tpu.models.llm import quantize_llama_params

        _, params, _ = converted

        def nbytes(tree):
            import jax

            return sum(np.asarray(x).nbytes for x in jax.tree.leaves(tree))

        q = quantize_llama_params(params)
        # projections drop 4x (f32 -> int8); embeddings stay
        assert nbytes(q) < 0.55 * nbytes(params)


class TestShardings:
    def test_tp_sharded_decode_matches(self, converted, rng, mesh8):
        from kirag_tpu.parallel import create_mesh

        config, params, _ = converted
        mesh = create_mesh(data=2, model=4)
        ids, mask = left_padded_batch(rng)
        base_ids, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        backend = JaxLlamaBackend(jax.tree.map(jnp.asarray, params), config,
                                  eos_token_id=2, compute_dtype=jnp.float32).shard_params(mesh)
        got_ids, _ = greedy_decode(backend.params, jnp.asarray(ids), jnp.asarray(mask),
                                   config, 4)
        np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(base_ids))


class TestInt4Weights:
    def test_unpack_roundtrip(self, rng):
        from kirag_tpu.models.llm import _quantize_kernel_int4, _unpack_int4

        k = rng.randn(128, 48).astype(np.float32)
        p = _quantize_kernel_int4(k)
        q = np.asarray(_unpack_int4(p["kernel_q4"], jnp.float32))
        scale = np.asarray(p["kernel_scale4"])
        deq = (q.reshape(-1, 64, 48) * scale[:, None, :]).reshape(128, 48)
        # block-64 int4: max error is scale/2 = absmax/14 per block
        blocks = k.reshape(2, 64, 48)
        bound = np.abs(blocks).max(axis=1, keepdims=True) / 14.0 + 1e-6
        assert np.all(np.abs(deq.reshape(2, 64, 48) - blocks) <= bound)

    def test_dense_matches_dequant_oracle(self, rng):
        from kirag_tpu.models.llm import (
            _dense, _quantize_kernel_int4, _unpack_int4)

        k = rng.randn(100, 32).astype(np.float32)  # ragged in_dim: pads to 128
        x = rng.randn(3, 100).astype(np.float32)
        p = _quantize_kernel_int4(k)
        got = np.asarray(_dense(jnp.asarray(x), p))
        q = np.asarray(_unpack_int4(p["kernel_q4"], jnp.float32))
        scale = np.asarray(p["kernel_scale4"])
        deq = (q.reshape(-1, 64, 32) * scale[:, None, :]).reshape(-1, 32)[:100]
        np.testing.assert_allclose(got, x @ deq, rtol=1e-4, atol=1e-4)

    def test_quantized_decode_close_to_f32(self, converted, rng):
        from kirag_tpu.models.llm import quantize_llama_params

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        base_ids, base_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        qparams = quantize_llama_params(params, bits=4)
        q_ids, q_logits = greedy_decode(
            qparams, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        diff = np.abs(np.asarray(q_logits[:, 0]) - np.asarray(base_logits[:, 0]))
        assert float(diff.mean()) < 0.1  # looser than int8 (4-bit grid)

    def test_memory_quarters(self, rng):
        # at real dims (in_dim >> block 64) int4 packs two weights per byte:
        # ~8x below f32 and ~2x below int8 (block scales are 1/64 overhead)
        from kirag_tpu.models.llm import (
            _quantize_kernel_int4, _quantize_kernel_int8)

        k = rng.randn(512, 256).astype(np.float32)

        def nbytes(tree):
            return sum(np.asarray(x).nbytes for x in tree.values())

        n4 = nbytes(_quantize_kernel_int4(k))
        n8 = nbytes(_quantize_kernel_int8(k))
        assert n4 < 0.56 * n8
        assert n4 < 0.145 * k.nbytes

    def test_bad_bits_raises(self, converted):
        from kirag_tpu.models.llm import quantize_llama_params

        _, params, _ = converted
        with pytest.raises(ValueError):
            quantize_llama_params(params, bits=3)


class TestNF4Weights:
    """The reference's 4-bit format is bitsandbytes NF4
    (`utils/pipeline_utils.py:55-77`): block-64 absmax scales + a 16-entry
    normal-quantile codebook. quant_bits=4 defaults to it (VERDICT r4 #5)."""

    @staticmethod
    def _dequant(p):
        from kirag_tpu.models.llm import INT4_BLOCK

        pk = np.asarray(p["kernel_q4"])
        cb = np.asarray(p["kernel_cb4"])
        scale = np.asarray(p["kernel_scale4"])
        half, out = pk.shape
        idx = np.empty((2 * half, out), np.uint8)
        idx[0::2] = pk & 0xF
        idx[1::2] = pk >> 4
        return (cb[idx].reshape(-1, INT4_BLOCK, out)
                * scale[:, None, :]).reshape(2 * half, out)

    def test_nf4_mse_beats_linear_on_normal_weights(self, rng):
        from kirag_tpu.models.llm import (_quantize_kernel_int4,
                                          _quantize_kernel_nf4, _unpack_int4)

        k = rng.randn(1024, 256).astype(np.float32)  # heavy mass near 0
        nf4 = self._dequant(_quantize_kernel_nf4(k))
        p_lin = _quantize_kernel_int4(k)
        q = np.asarray(_unpack_int4(p_lin["kernel_q4"], jnp.float32))
        s = np.asarray(p_lin["kernel_scale4"])
        lin = (q.reshape(-1, 64, 256) * s[:, None, :]).reshape(1024, 256)
        mse_nf4 = float(np.mean((nf4 - k) ** 2))
        mse_lin = float(np.mean((lin - k) ** 2))
        assert mse_nf4 < mse_lin  # quantile levels beat the uniform grid

    def test_nf4_is_default_for_bits4(self, converted):
        from kirag_tpu.models.llm import quantize_llama_params

        _, params, _ = converted
        qp = quantize_llama_params(params, bits=4)
        assert "kernel_cb4" in qp["layers"][0]["q_proj"]
        qp_lin = quantize_llama_params(params, bits=4, int4_codebook="linear")
        assert "kernel_cb4" not in qp_lin["layers"][0]["q_proj"]

    def test_nf4_dense_matches_dequant_oracle(self, rng):
        from kirag_tpu.models.llm import _dense, _quantize_kernel_nf4

        k = rng.randn(100, 32).astype(np.float32)  # ragged in_dim: pads
        x = rng.randn(3, 100).astype(np.float32)
        p = _quantize_kernel_nf4(k)
        deq = self._dequant(p)[:100]
        for impl in ("parity", "blockdot"):
            got = np.asarray(_dense(jnp.asarray(x), p, impl))
            np.testing.assert_allclose(got, x @ deq, rtol=1e-4, atol=1e-4)

    def test_nf4_zero_pad_rows_are_exact_zero(self):
        from kirag_tpu.models.llm import _quantize_kernel_nf4

        k = np.ones((70, 32), np.float32)  # pads to 128 with zeros
        deq = self._dequant(_quantize_kernel_nf4(k))
        assert np.all(deq[70:] == 0.0)

    def test_nf4_decode_close_to_f32(self, converted, rng):
        from kirag_tpu.models.llm import quantize_llama_params

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        _, base_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        qparams = quantize_llama_params(params, bits=4)  # nf4 default
        _, q_logits = greedy_decode(
            qparams, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        diff = np.abs(np.asarray(q_logits[:, 0]) - np.asarray(base_logits[:, 0]))
        assert float(diff.mean()) < 0.1

    def test_nf4_tp_sharding_replicates_codebook(self, converted):
        from kirag_tpu.models.llm import (llama_param_shardings_like,
                                          quantize_llama_params)
        from jax.sharding import PartitionSpec as P

        config, params, _ = converted
        qp = quantize_llama_params(params, bits=4)
        specs = llama_param_shardings_like(qp, config)
        assert specs["layers"][0]["q_proj"]["kernel_cb4"] == P()


class TestQuantizedSharding:
    def test_int8_tp_sharded_decode_matches(self, converted, rng):
        from kirag_tpu.parallel import create_mesh
        from kirag_tpu.models.llm import quantize_llama_params

        config, params, _ = converted
        mesh = create_mesh(data=2, model=4)
        ids, mask = left_padded_batch(rng)
        qparams = quantize_llama_params(params, bits=8)
        base_ids, _ = greedy_decode(qparams, jnp.asarray(ids), jnp.asarray(mask),
                                    config, 4)
        backend = JaxLlamaBackend(jax.tree.map(jnp.asarray, qparams), config,
                                  eos_token_id=2,
                                  compute_dtype=jnp.float32).shard_params(mesh)
        got_ids, _ = greedy_decode(backend.params, jnp.asarray(ids),
                                   jnp.asarray(mask), config, 4)
        np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(base_ids))

    def test_int4_tp_sharded_decode_matches(self, converted, rng):
        from kirag_tpu.parallel import create_mesh
        from kirag_tpu.models.llm import quantize_llama_params

        config, params, _ = converted
        mesh = create_mesh(data=2, model=4)
        ids, mask = left_padded_batch(rng)
        qparams = quantize_llama_params(params, bits=4)
        base_ids, _ = greedy_decode(qparams, jnp.asarray(ids), jnp.asarray(mask),
                                    config, 4)
        backend = JaxLlamaBackend(jax.tree.map(jnp.asarray, qparams), config,
                                  eos_token_id=2,
                                  compute_dtype=jnp.float32).shard_params(mesh)
        got_ids, _ = greedy_decode(backend.params, jnp.asarray(ids),
                                   jnp.asarray(mask), config, 4)
        np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(base_ids))


class TestKVQuantCache:
    """int8 KV cache (LlamaConfig.kv_quant_bits=8): per-token, per-kv-head
    scales that commute with both attention contractions, so the cache is
    read as raw int8. The reference caches fp16 via HF generate
    (`generator/generator.py:171-235`); this is the TPU capacity/bandwidth
    lever for large decode batches."""

    def test_kv_quantize_roundtrip_bound(self, rng):
        from kirag_tpu.models.llm import _kv_quantize

        x = jnp.asarray(rng.randn(2, 5, 3, 16).astype(np.float32)) * 3.0
        q, s = _kv_quantize(x)
        assert q.dtype == jnp.int8 and s.shape == (2, 5, 3)
        deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
        bound = np.abs(np.asarray(x)).max(axis=-1, keepdims=True) / 253.0 + 1e-6
        assert (np.abs(deq - np.asarray(x)) <= bound).all()

    def test_logits_close_to_float_cache(self, converted, rng):
        import dataclasses

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        base_ids, base_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, 6)
        qcfg = dataclasses.replace(config, kv_quant_bits=8)
        q_ids, q_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config=qcfg,
            max_new_tokens=6)
        # step 0 is computed before anything is cached: near-identical (the
        # grouped-einsum form reorders reductions slightly)
        d0 = np.abs(np.asarray(q_logits[:, 0]) - np.asarray(base_logits[:, 0]))
        assert float(d0.max()) < 1e-3
        # later steps read the rounded cache: close, not identical
        d = np.abs(np.asarray(q_logits) - np.asarray(base_logits))
        assert float(d.mean()) < 0.05

    def test_prefill_resume_matches_fused(self, converted, rng):
        import dataclasses

        from kirag_tpu.models.llm import prefill_decode, resume_decode

        config, params, _ = converted
        qcfg = dataclasses.replace(config, kv_quant_bits=8)
        ids, mask = left_padded_batch(rng)
        fused_ids, fused_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), qcfg, 7)
        first_ids, first_logits, state = prefill_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), qcfg, 7)
        # the quantized cache is a dict pytree of int8 slots + f32 scales
        assert isinstance(state["k"][0], dict)
        assert state["k"][0]["q"].dtype == jnp.int8
        t3, lg3, state = resume_decode(params, state, qcfg, 3)
        t4, lg4, _ = resume_decode(params, state, qcfg, 3)
        got_ids = np.concatenate([np.asarray(first_ids), np.asarray(t3),
                                  np.asarray(t4)], axis=1)
        got_lg = np.concatenate([np.asarray(first_logits), np.asarray(lg3),
                                 np.asarray(lg4)], axis=1)
        np.testing.assert_array_equal(got_ids, np.asarray(fused_ids))
        np.testing.assert_array_equal(got_lg, np.asarray(fused_logits))

    def test_cache_memory_halves(self, converted, rng):
        import dataclasses

        from kirag_tpu.models.llm import prefill_decode

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        _, _, plain = prefill_decode(params, jnp.asarray(ids),
                                     jnp.asarray(mask), config, 16,
                                     compute_dtype=jnp.bfloat16)
        qcfg = dataclasses.replace(config, kv_quant_bits=8)
        _, _, quant = prefill_decode(params, jnp.asarray(ids),
                                     jnp.asarray(mask), qcfg, 16,
                                     compute_dtype=jnp.bfloat16)
        plain_b = sum(np.asarray(x).nbytes for x in jax.tree.leaves(plain["k"]))
        quant_b = sum(np.asarray(x).nbytes for x in jax.tree.leaves(quant["k"]))
        # int8 slots + a 4-byte scale per (token, kv head) vs bf16 slots:
        # (hd + 4) / (2 * hd) — 0.52x at real head dims (128), 0.625x at
        # this tiny fixture's hd=16
        hd = config.head_dim
        assert quant_b == round((hd + 4) / (2 * hd) * plain_b)

    def test_gemma2_sliding_window_composes(self, rng):
        import dataclasses

        torch.manual_seed(2)
        hf_config = transformers.Gemma2Config(
            vocab_size=128, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            head_dim=16, max_position_embeddings=128, sliding_window=8,
            query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0, attn_implementation="eager")
        model = transformers.Gemma2ForCausalLM(hf_config).eval()
        from kirag_tpu.models.llm import config_from_hf as cfh

        config = cfh(hf_config)
        params = convert_hf_llama_state_dict(
            {k: v.numpy() for k, v in model.state_dict().items()}, config)
        ids, mask = left_padded_batch(rng, b=3, t=12, vocab=128)
        base_ids, base_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, 6)
        qcfg = dataclasses.replace(config, kv_quant_bits=8)
        q_ids, q_logits = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), qcfg, 6)
        d = np.abs(np.asarray(q_logits) - np.asarray(base_logits))
        assert np.isfinite(np.asarray(q_logits)).all()
        assert float(d.mean()) < 0.05

    def test_tp_sharded_decode_matches(self, converted, rng, mesh8):
        import dataclasses

        from kirag_tpu.parallel import create_mesh

        config, params, _ = converted
        qcfg = dataclasses.replace(config, kv_quant_bits=8)
        mesh = create_mesh(data=2, model=4)
        ids, mask = left_padded_batch(rng)
        base_ids, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                    qcfg, 4)
        backend = JaxLlamaBackend(jax.tree.map(jnp.asarray, params), qcfg,
                                  eos_token_id=2,
                                  compute_dtype=jnp.float32).shard_params(mesh)
        got_ids, _ = greedy_decode(backend.params, jnp.asarray(ids),
                                   jnp.asarray(mask), backend.config, 4)
        np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(base_ids))

    def test_speculative_composition_rejected(self, converted):
        import dataclasses

        config, params, _ = converted
        qcfg = dataclasses.replace(config, kv_quant_bits=8)
        with pytest.raises(ValueError, match="full-precision KV"):
            JaxLlamaBackend(params, qcfg, eos_token_id=2,
                            draft_params=params, draft_config=config)

    def test_bad_kv_bits_raises(self, converted, rng):
        import dataclasses

        config, params, _ = converted
        ids, mask = left_padded_batch(rng)
        qcfg = dataclasses.replace(config, kv_quant_bits=4)
        with pytest.raises(ValueError, match="kv_quant_bits"):
            greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask), qcfg, 2)

    def test_int4_weights_compose(self, converted, rng):
        import dataclasses

        from kirag_tpu.models.llm import quantize_llama_params

        config, params, _ = converted
        qparams = quantize_llama_params(params, bits=4)
        qcfg = dataclasses.replace(config, kv_quant_bits=8)
        ids, mask = left_padded_batch(rng)
        base_ids, base_logits = greedy_decode(
            qparams, jnp.asarray(ids), jnp.asarray(mask), config, 4)
        kv_ids, kv_logits = greedy_decode(
            qparams, jnp.asarray(ids), jnp.asarray(mask), qcfg, 4)
        d = np.abs(np.asarray(kv_logits) - np.asarray(base_logits))
        assert np.isfinite(np.asarray(kv_logits)).all()
        assert float(d.mean()) < 0.05


class TestPrefixKVCache:
    """Prefix KV reuse (JaxLlamaBackend prefix_cache_groups): the group's
    first prompt seeds a pool slot; later calls reuse their longest common
    token prefix with the cached ids — divergent cached tails are never
    attended, so correctness holds by construction. Replaces the
    reference's full re-prefill of (instruction + examplars) on every
    constructor call (`generator/generator.py:171-235`)."""

    @staticmethod
    def _rows(rng, prefix_len=80, tails=(20, 33), vocab=128):
        prefix = rng.randint(1, vocab, size=prefix_len).astype(np.int32)
        rows = [np.concatenate([prefix,
                                rng.randint(1, vocab, size=t).astype(np.int32)])
                for t in tails]
        T = max(len(r) for r in rows)
        ids = np.zeros((len(rows), T), np.int32)
        mask = np.zeros((len(rows), T), np.int32)
        for i, r in enumerate(rows):
            ids[i, T - len(r):] = r
            mask[i, T - len(r):] = 1
        return ids, mask

    def _backend(self, params, config, groups=4, tokens=128):
        return JaxLlamaBackend(params, config, eos_token_id=None,
                               compute_dtype=jnp.float32,
                               prompt_buckets=(32, 64, 128),
                               prefix_cache_groups=groups,
                               prefix_cache_tokens=tokens)

    def test_matches_plain_greedy(self, converted, rng):
        config, params, _ = converted
        ids, mask = self._rows(rng)
        base_ids, base_lg = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, 6)
        be = self._backend(params, config)
        ids1, _ = be.greedy(ids, mask, 6, prefix_groups=["q1", "q1"])
        ids2, lg2 = be.greedy(ids, mask, 6, prefix_groups=["q1", "q1"])
        np.testing.assert_array_equal(ids1, np.asarray(base_ids))
        np.testing.assert_array_equal(ids2, np.asarray(base_ids))
        np.testing.assert_allclose(lg2, np.asarray(base_lg),
                                   rtol=1e-4, atol=1e-4)

    def test_divergent_tail_never_attended(self, converted, rng):
        """Turn-1 volatile content cached past the stable region must not
        leak into a turn-2 prompt that diverges there."""
        config, params, _ = converted
        prefix = rng.randint(1, 128, size=60).astype(np.int32)
        turn1 = np.concatenate([prefix, rng.randint(1, 128, 30).astype(np.int32)])
        turn2 = np.concatenate([prefix, rng.randint(1, 128, 25).astype(np.int32)])
        be = self._backend(params, config)
        be.greedy(turn1[None], np.ones((1, len(turn1)), np.int32), 4,
                  prefix_groups=["q"])   # seeds cache with turn-1 ids
        got, _ = be.greedy(turn2[None], np.ones((1, len(turn2)), np.int32), 4,
                           prefix_groups=["q"])
        base, _ = greedy_decode(params, jnp.asarray(turn2[None]),
                                jnp.ones((1, len(turn2)), jnp.int32), config, 4)
        np.testing.assert_array_equal(got, np.asarray(base))

    def test_lru_eviction_stays_correct(self, converted, rng):
        config, params, _ = converted
        be = self._backend(params, config, groups=2)
        prompts = {g: rng.randint(1, 128, size=70).astype(np.int32)
                   for g in ("a", "b", "c")}
        for _ in range(2):  # second pass: "a" was evicted by "c", re-seeds
            for g, row in prompts.items():
                m = np.ones((1, len(row)), np.int32)
                got, _ = be.greedy(row[None], m, 4, prefix_groups=[g])
                base, _ = greedy_decode(params, jnp.asarray(row[None]),
                                        jnp.asarray(m), config, 4)
                np.testing.assert_array_equal(got, np.asarray(base))
        assert len(be._prefix_meta) == 2

    def test_kv_quant_composes(self, converted, rng):
        import dataclasses

        config, params, _ = converted
        qcfg = dataclasses.replace(config, kv_quant_bits=8)
        ids, mask = self._rows(rng)
        base_ids, base_lg = greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), qcfg, 4)
        be = self._backend(params, qcfg)
        assert isinstance(be.config.kv_quant_bits, int)
        ids1, _ = be.greedy(ids, mask, 4, prefix_groups=["q", "q"])
        ids2, lg2 = be.greedy(ids, mask, 4, prefix_groups=["q", "q"])
        # pool stores quantized slots; prefix path rounds ONCE like the
        # plain path, so drift vs the plain kv-quant decode is reduction
        # order only
        d = np.abs(lg2 - np.asarray(base_lg))
        assert float(d.mean()) < 0.05
        np.testing.assert_array_equal(ids2, np.asarray(base_ids))

    def test_prefix_window_truncation_matches_plain(self, converted, rng):
        """With a pool wider than the bucketed window (tokens=512, match
        ~70 -> window 256), the truncated-prefix program must still match
        plain greedy exactly — the truncation only drops slots no row
        matches into."""
        config, params, _ = converted
        be = self._backend(params, config, tokens=512)
        ids, mask = self._rows(rng, prefix_len=70, tails=(10, 25))
        base, _ = greedy_decode(params, jnp.asarray(ids), jnp.asarray(mask),
                                config, 5)
        be.greedy(ids, mask, 5, prefix_groups=["q", "q"])  # seed
        got, _ = be.greedy(ids, mask, 5, prefix_groups=["q", "q"])
        np.testing.assert_array_equal(got, np.asarray(base))
        pool_w = (be._prefix_pool["k"][0]["q"]
                  if isinstance(be._prefix_pool["k"][0], dict)
                  else be._prefix_pool["k"][0]).shape[1]
        assert pool_w == 512  # pool stays full width; only the gather narrows

    def test_short_match_falls_back(self, converted, rng):
        """Rows with <16 matching tokens run with match 0 (full suffix)."""
        config, params, _ = converted
        be = self._backend(params, config)
        a = rng.randint(1, 128, size=40).astype(np.int32)
        b = rng.randint(1, 128, size=40).astype(np.int32)
        b[:8] = a[:8]  # only 8 shared tokens
        be.greedy(a[None], np.ones((1, 40), np.int32), 4, prefix_groups=["g"])
        got, _ = be.greedy(b[None], np.ones((1, 40), np.int32), 4,
                           prefix_groups=["g"])
        base, _ = greedy_decode(params, jnp.asarray(b[None]),
                                jnp.ones((1, 40), jnp.int32), config, 4)
        np.testing.assert_array_equal(got, np.asarray(base))

    def test_generator_level_plumbing(self, converted, tmp_path, rng):
        """prefix_groups rides generator_generate -> greedy_generate ->
        backend.greedy; outputs equal the no-prefix path."""
        from tests.helpers import make_tokenizer

        from kirag_tpu.generation.interface import Generator

        config, params, _ = converted
        tok = make_tokenizer(tmp_path)
        if tok.pad_token_id is None:
            tok.pad_token = "[PAD]"
        be = JaxLlamaBackend(params, config, eos_token_id=tok.eos_token_id or 3,
                             compute_dtype=jnp.float32,
                             prompt_buckets=(32, 64, 128),
                             prefix_cache_groups=4, prefix_cache_tokens=64)
        gen = Generator(tok, be, model_name="llama", max_length=128,
                        max_new_tokens=4, batch_size=4)
        inst = ["extract the triples from the passage"] * 2
        inputs = ["the cat sat on the mat", "the dog ate the bone"]
        ids_plain, _ = gen.generator_generate(inst, inputs, return_logits=False)
        ids_pref, _ = gen.generator_generate(inst, inputs, return_logits=False,
                                             prefix_groups=["q1", "q1"])
        ids_pref2, _ = gen.generator_generate(inst, inputs, return_logits=False,
                                              prefix_groups=["q1", "q1"])
        np.testing.assert_array_equal(ids_pref, ids_plain)
        np.testing.assert_array_equal(ids_pref2, ids_plain)
