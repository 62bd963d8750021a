"""Numeric parity of the JAX BERT encoder against torch transformers.

The environment has no network egress, so parity is checked against tiny
RANDOM-initialized torch ``BertModel``s (same math, every weight exercised)
rather than downloaded checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from kirag_tpu.models import BertConfig, bert_encode
from kirag_tpu.models.bert import config_from_hf, convert_hf_state_dict, param_shardings
from kirag_tpu.models.encoders import Encoder
from kirag_tpu.ops.pooling import l2_normalize, masked_mean_pool


@pytest.fixture(scope="module")
def tiny_hf_bert():
    torch.manual_seed(0)
    hf_config = transformers.BertConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = transformers.BertModel(hf_config).eval()
    return hf_config, model


@pytest.fixture(scope="module")
def converted(tiny_hf_bert):
    hf_config, model = tiny_hf_bert
    config = config_from_hf(hf_config)
    state_dict = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_hf_state_dict(state_dict, config)
    return config, params, model


def make_batch(rng, b=3, t=10, vocab=128):
    ids = rng.randint(1, vocab, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), dtype=np.int32)
    mask[0, 7:] = 0
    mask[2, 4:] = 0
    ids[mask == 0] = 0
    return ids, mask


class TestBertParity:
    def test_last_hidden_state(self, converted, rng):
        config, params, model = converted
        ids, mask = make_batch(rng)
        with torch.no_grad():
            ref = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state.numpy()
        got = np.asarray(bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), config))
        # compare only non-padding positions (HF computes garbage on pad rows too,
        # but padding positions are excluded by every downstream pooling)
        sel = mask.astype(bool)
        np.testing.assert_allclose(got[sel], ref[sel], rtol=2e-4, atol=2e-5)

    def test_fused_qkv_matches_unfused(self, converted, rng):
        """``fused_qkv`` folds the three QKV projections into one [h, 3h]
        matmul (bigger MXU tiles, one launch). Every output column's dot
        product accumulates independently of its neighbors, so the fused
        path must match the three-matmul path to float tolerance."""
        import dataclasses

        config, params, _ = converted
        ids, mask = make_batch(rng)
        outs = {
            flag: np.asarray(bert_encode(
                params, jnp.asarray(ids), jnp.asarray(mask),
                dataclasses.replace(config, fused_qkv=flag)))
            for flag in (True, False)
        }
        np.testing.assert_allclose(outs[True], outs[False],
                                   rtol=1e-6, atol=1e-6)

    def test_e5_pooling_matches_torch_recipe(self, converted, rng):
        """masked mean pool + L2 norm == the reference E5Encoder.forward math."""
        config, params, model = converted
        ids, mask = make_batch(rng)
        with torch.no_grad():
            hidden = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state
            m = torch.tensor(mask, dtype=torch.bool)
            hidden = hidden.masked_fill(~m[..., None], 0.0)
            emb = hidden.sum(1) / torch.tensor(mask, dtype=torch.float32).sum(1)[..., None]
            ref = torch.nn.functional.normalize(emb, p=2, dim=1).numpy()

        enc = Encoder(params, config, "e5")
        got = np.asarray(enc(ids, mask))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_bge_cls_pooling(self, converted, rng):
        config, params, model = converted
        ids, mask = make_batch(rng)
        with torch.no_grad():
            hidden = model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).last_hidden_state
            ref = torch.nn.functional.normalize(hidden[:, 0], p=2, dim=1).numpy()
        enc = Encoder(params, config, "bge")
        got = np.asarray(enc(ids, mask))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_contriever_no_normalize(self, converted, rng):
        config, params, _ = converted
        ids, mask = make_batch(rng)
        enc = Encoder(params, config, "contriever")
        got = np.asarray(enc(ids, mask))
        norms = np.linalg.norm(got, axis=-1)
        assert not np.allclose(norms, 1.0)  # unnormalized, per reference


class TestEncoderPersistence:
    def test_save_load_roundtrip(self, converted, rng, tmp_path):
        config, params, _ = converted
        enc = Encoder(params, config, "e5")
        ids, mask = make_batch(rng)
        before = np.asarray(enc(ids, mask))
        enc.save(str(tmp_path / "ckpt"))
        enc2 = Encoder.load(str(tmp_path / "ckpt"))
        after = np.asarray(enc2(ids, mask))
        np.testing.assert_array_equal(before, after)
        assert enc2.encoder_type == "e5"


class TestTensorParallel:
    def test_sharded_forward_matches(self, converted, rng, mesh8):
        """TP-sharded params over a 2x4 (data, model) mesh match replicated."""
        from kirag_tpu.parallel import create_mesh

        config, params, _ = converted
        mesh = create_mesh(data=2, model=4)
        ids, mask = make_batch(rng, b=4)
        base = np.asarray(Encoder(params, config, "e5")(ids, mask))
        enc = Encoder(jax.tree.map(jnp.asarray, params), config, "e5").shard_params(mesh)
        got = np.asarray(enc(ids, mask))
        np.testing.assert_allclose(got, base, rtol=2e-4, atol=2e-5)

    def test_shardings_cover_params(self, converted):
        config, params, _ = converted
        specs = param_shardings(config)
        jax.tree.map(lambda p, s: None, params, specs)  # same structure or raises
