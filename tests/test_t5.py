"""T5 encoder-decoder parity vs torch transformers (tiny random models)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from kirag_tpu.models.t5 import (
    JaxT5Backend,
    config_from_hf,
    convert_hf_t5_state_dict,
    t5_encode,
    t5_greedy_decode,
)


@pytest.fixture(scope="module", params=["relu", "gated-gelu"])
def tiny_t5(request):
    torch.manual_seed(0)
    hf_config = transformers.T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj=request.param,
        decoder_start_token_id=0, dropout_rate=0.0)
    model = transformers.T5ForConditionalGeneration(hf_config).eval()
    config = config_from_hf(hf_config)
    params = convert_hf_t5_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, config)
    return model, config, params


def batch(rng, b=3, t=10, vocab=96):
    ids = rng.randint(2, vocab, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), dtype=np.int32)
    mask[0, 7:] = 0  # right padding (encoder convention)
    ids[mask == 0] = 0
    return ids, mask


class TestT5Parity:
    def test_encoder_hidden(self, tiny_t5, rng):
        model, config, params = tiny_t5
        ids, mask = batch(rng)
        with torch.no_grad():
            ref = model.encoder(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        got = np.asarray(t5_encode(params, jnp.asarray(ids), jnp.asarray(mask), config))
        sel = mask.astype(bool)
        np.testing.assert_allclose(got[sel], ref[sel], rtol=2e-4, atol=2e-4)

    def test_greedy_matches_hf_generate(self, tiny_t5, rng):
        model, config, params = tiny_t5
        ids, mask = batch(rng)
        max_new = 8
        with torch.no_grad():
            out = model.generate(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                max_new_tokens=max_new, do_sample=False, eos_token_id=None,
                pad_token_id=0, min_new_tokens=max_new)
        ref_gen = out[:, 1:].numpy()  # drop decoder_start
        got_ids, got_logits = t5_greedy_decode(
            params, jnp.asarray(ids), jnp.asarray(mask), config, max_new)
        np.testing.assert_array_equal(np.asarray(got_ids), ref_gen[:, :max_new])
        np.testing.assert_array_equal(
            np.argmax(np.asarray(got_logits), axis=-1), np.asarray(got_ids))


class TestT5Backend:
    def test_generator_integration(self, tiny_t5, rng, tmp_path):
        from tests.helpers import make_tokenizer

        from kirag_tpu.generation.interface import Generator

        model, config, params = tiny_t5
        tok = make_tokenizer(tmp_path)
        tok.pad_token = "[PAD]"
        backend = JaxT5Backend(params, config, eos_token_id=tok.eos_token_id or 3,
                               compute_dtype=jnp.float32, prompt_buckets=(32,))
        gen = Generator(tok, backend, model_name="t5-tiny", is_chat=False,
                        max_length=32, max_new_tokens=5)
        ids, logits = gen.generator_generate(["summarize"], ["alpha beta gamma"])
        assert ids.shape[0] == 1 and ids.shape[1] <= 5
        assert logits.shape[:2] == ids.shape
