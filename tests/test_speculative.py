"""Speculative decoding vs the greedy oracle: the token stream must be
BIT-IDENTICAL to target-only greedy decode for any draft model — the whole
point of greedy draft-and-verify (kirag_tpu/models/speculative.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kirag_tpu.models.llm import (
    LlamaConfig,
    greedy_decode,
    init_llama_params,
)
from kirag_tpu.models.speculative import (
    speculative_decode,
    speculative_resume,
    speculative_start,
)

TARGET_CFG = LlamaConfig(vocab_size=128, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, intermediate_size=128,
                         max_position_embeddings=256, rope_theta=10000.0)
DRAFT_CFG = LlamaConfig(vocab_size=128, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        num_key_value_heads=1, intermediate_size=64,
                        max_position_embeddings=256, rope_theta=10000.0)


@pytest.fixture(scope="module")
def models():
    t = init_llama_params(jax.random.PRNGKey(0), TARGET_CFG)
    d = init_llama_params(jax.random.PRNGKey(7), DRAFT_CFG)
    return t, d


def _prompts(rng, b=3, t=12):
    ids = rng.randint(1, 128, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), dtype=np.int32)
    # left padding, different lengths per row
    for row, pad in enumerate(range(b)):
        ids[row, :pad] = 0
        mask[row, :pad] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


class TestGreedyParity:
    def test_self_draft_identical(self, models, rng):
        # draft == target: everything accepted, stream still must be exact
        t, _ = models
        ids, mask = _prompts(rng)
        g_ids, g_lg = greedy_decode(t, ids, mask, TARGET_CFG, 16)
        s_ids, s_lg = speculative_decode(t, TARGET_CFG, t, TARGET_CFG,
                                         ids, mask, 16, gamma=4)
        np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(g_ids))
        np.testing.assert_allclose(np.asarray(s_lg), np.asarray(g_lg),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("gamma", [1, 2, 4, 7])
    def test_adversarial_draft_identical(self, models, rng, gamma):
        # an unrelated random draft mostly mispredicts; output must STILL
        # equal target greedy, at every gamma
        t, d = models
        ids, mask = _prompts(rng)
        g_ids, g_lg = greedy_decode(t, ids, mask, TARGET_CFG, 14)
        s_ids, s_lg = speculative_decode(t, TARGET_CFG, d, DRAFT_CFG,
                                         ids, mask, 14, gamma=gamma)
        np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(g_ids))
        np.testing.assert_allclose(np.asarray(s_lg), np.asarray(g_lg),
                                   rtol=1e-4, atol=1e-4)

    def test_eos_pad_after_finish(self, models, rng):
        # pick the first greedy token of row 0 as "eos": that row finishes
        # immediately and must pad with eos; other rows keep decoding
        t, d = models
        ids, mask = _prompts(rng)
        g_free, _ = greedy_decode(t, ids, mask, TARGET_CFG, 12,
                                  return_logits=False)
        eos = int(np.asarray(g_free)[0, 2])  # token row 0 emits at step 2
        g_ids, _ = greedy_decode(t, ids, mask, TARGET_CFG, 12,
                                 eos_token_id=eos, return_logits=False)
        s_ids, _ = speculative_decode(t, TARGET_CFG, d, DRAFT_CFG, ids, mask,
                                      12, gamma=3, eos_token_id=eos,
                                      return_logits=False)
        np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(g_ids))
        # the eos row really is padded after its stop
        row = np.asarray(g_ids)[0]
        stop = int(np.argmax(row == eos))
        assert (row[stop:] == eos).all()

    def test_no_logits_path(self, models, rng):
        t, d = models
        ids, mask = _prompts(rng, b=2, t=8)
        s_ids, s_lg = speculative_decode(t, TARGET_CFG, d, DRAFT_CFG,
                                         ids, mask, 9, gamma=4,
                                         return_logits=False)
        g_ids, _ = greedy_decode(t, ids, mask, TARGET_CFG, 9,
                                 return_logits=False)
        assert s_lg is None
        np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(g_ids))

    def test_segmented_resume_matches_greedy(self, models, rng):
        # start + uneven resumes reproduce the greedy stream exactly; rounds
        # overshooting a segment must buffer surplus tokens, not drop them
        t, d = models
        ids, mask = _prompts(rng)
        total = 16
        g_ids, _ = greedy_decode(t, ids, mask, TARGET_CFG, total,
                                 return_logits=False)
        first, st = speculative_start(t, TARGET_CFG, d, DRAFT_CFG, ids, mask,
                                      total, gamma=4)
        got = [np.asarray(first)]
        for n in (3, 5, 7):  # 1 + 3 + 5 + 7 == total
            seg, st = speculative_resume(t, TARGET_CFG, d, DRAFT_CFG, st, n,
                                         total, gamma=4)
            got.append(np.asarray(seg))
        np.testing.assert_array_equal(np.concatenate(got, axis=1),
                                      np.asarray(g_ids))

    def test_segmented_resume_with_eos(self, models, rng):
        t, d = models
        ids, mask = _prompts(rng)
        total = 12
        g_free, _ = greedy_decode(t, ids, mask, TARGET_CFG, total,
                                  return_logits=False)
        eos = int(np.asarray(g_free)[1, 3])
        g_ids, _ = greedy_decode(t, ids, mask, TARGET_CFG, total,
                                 eos_token_id=eos, return_logits=False)
        first, st = speculative_start(t, TARGET_CFG, d, DRAFT_CFG, ids, mask,
                                      total, gamma=3, eos_token_id=eos)
        got = [np.asarray(first)]
        for n in (4, 4, 3):
            seg, st = speculative_resume(t, TARGET_CFG, d, DRAFT_CFG, st, n,
                                         total, gamma=3, eos_token_id=eos)
            got.append(np.asarray(seg))
        np.testing.assert_array_equal(np.concatenate(got, axis=1),
                                      np.asarray(g_ids))

    def test_max_new_one(self, models, rng):
        t, d = models
        ids, mask = _prompts(rng, b=2, t=8)
        s_ids, _ = speculative_decode(t, TARGET_CFG, d, DRAFT_CFG,
                                      ids, mask, 1, gamma=4,
                                      return_logits=False)
        g_ids, _ = greedy_decode(t, ids, mask, TARGET_CFG, 1,
                                 return_logits=False)
        np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(g_ids))


class TestBackendIntegration:
    """JaxLlamaBackend with a draft dispatches greedy/start/resume to the
    speculative path and keeps the plain-backend stream."""

    def _backends(self, models):
        from kirag_tpu.models.llm import JaxLlamaBackend

        t, d = models
        plain = JaxLlamaBackend(t, TARGET_CFG, eos_token_id=999,
                                compute_dtype=jnp.float32,
                                prompt_buckets=(16,))
        spec = JaxLlamaBackend(t, TARGET_CFG, eos_token_id=999,
                               compute_dtype=jnp.float32,
                               prompt_buckets=(16,),
                               draft_params=d, draft_config=DRAFT_CFG,
                               spec_gamma=3)
        return plain, spec

    def test_greedy_dispatch(self, models, rng):
        plain, spec = self._backends(models)
        ids, mask = _prompts(rng)
        p_ids, p_lg = plain.greedy(np.asarray(ids), np.asarray(mask), 10)
        s_ids, s_lg = spec.greedy(np.asarray(ids), np.asarray(mask), 10)
        np.testing.assert_array_equal(s_ids, p_ids)
        np.testing.assert_allclose(s_lg, p_lg, rtol=1e-4, atol=1e-4)

    def test_segmented_dispatch(self, models, rng):
        plain, spec = self._backends(models)
        ids, mask = _prompts(rng)
        p1, _, pst = plain.greedy_start(np.asarray(ids), np.asarray(mask),
                                        9, return_logits=False)
        s1, _, sst = spec.greedy_start(np.asarray(ids), np.asarray(mask),
                                       9, return_logits=False)
        assert isinstance(sst, tuple) and "served" in sst[0]  # spec state
        np.testing.assert_array_equal(s1, p1)
        for n in (4, 4):
            pseg, _, pst = plain.greedy_resume(pst, n, return_logits=False)
            sseg, _, sst = spec.greedy_resume(sst, n, return_logits=False)
            np.testing.assert_array_equal(sseg, pseg)

    def test_logits_segmented_falls_back_to_plain(self, models, rng):
        _, spec = self._backends(models)
        ids, mask = _prompts(rng)
        s1, lg, st = spec.greedy_start(np.asarray(ids), np.asarray(mask),
                                       5, return_logits=True)
        assert lg is not None and not isinstance(st, tuple)
        seg, lg2, _ = spec.greedy_resume(st, 4, return_logits=True)
        assert lg2.shape[:2] == seg.shape


class TestScriptedDraftAndStats:
    """Controllable-agreement draft scripting + acceptance accounting
    (VERDICT r4 #7): draft_script overrides PROPOSALS only — the stream
    stays bit-identical to greedy at ANY script, and the acceptance
    histogram reflects exactly the scripted agreement."""

    def _greedy_stream(self, t, ids, mask, n):
        g, _ = greedy_decode(t, ids, mask, TARGET_CFG, n, return_logits=False)
        return np.asarray(g)

    def test_perfect_script_accepts_everything(self, models, rng):
        t, d = models
        ids, mask = _prompts(rng)
        n, gamma = 16, 4
        g = self._greedy_stream(t, ids, mask, n)
        # script = the target's own stream -> every proposal accepted
        s_ids, _, hist = speculative_decode(
            t, TARGET_CFG, d, DRAFT_CFG, ids, mask, n, gamma=gamma,
            return_logits=False, draft_script=jnp.asarray(g),
            return_stats=True)
        np.testing.assert_array_equal(np.asarray(s_ids), g)
        hist = np.asarray(hist)
        # every round of every row accepts all gamma-1 proposals
        assert hist[:gamma - 1].sum() == 0 and hist[gamma - 1] > 0

    def test_flip_script_controls_acceptance(self, models, rng):
        t, d = models
        ids, mask = _prompts(rng)
        n, gamma = 24, 4
        g = self._greedy_stream(t, ids, mask, n)
        # flip every 3rd proposal to a guaranteed-wrong token
        script = g.copy()
        flip = (np.arange(n)[None, :] % 3 == 2)
        script = np.where(flip, (g + 1) % TARGET_CFG.vocab_size, g)
        s_ids, _, hist = speculative_decode(
            t, TARGET_CFG, d, DRAFT_CFG, ids, mask, n, gamma=gamma,
            return_logits=False, draft_script=jnp.asarray(script),
            return_stats=True)
        # bit-identity holds under ANY script
        np.testing.assert_array_equal(np.asarray(s_ids), g)
        hist = np.asarray(hist)
        # flips at every 3rd slot mean no round can accept 3 in a row
        assert hist[gamma - 1] == 0 and hist.sum() > 0
        # measured acceptance rate ~ 2/3 (flip pattern), never higher
        accepted = (hist * np.arange(gamma)).sum()
        proposed = accepted + hist[: gamma - 1].sum()  # rejections end rounds
        assert accepted / proposed <= 2 / 3 + 1e-9

    def test_negative_entries_keep_real_argmax(self, models, rng):
        # all -1 script == no script at all
        t, d = models
        ids, mask = _prompts(rng, b=2, t=8)
        none_ids, _, h0 = speculative_decode(
            t, TARGET_CFG, d, DRAFT_CFG, ids, mask, 12, gamma=3,
            return_logits=False, return_stats=True)
        neg = -np.ones((2, 12), np.int32)
        neg_ids, _, h1 = speculative_decode(
            t, TARGET_CFG, d, DRAFT_CFG, ids, mask, 12, gamma=3,
            return_logits=False, draft_script=jnp.asarray(neg),
            return_stats=True)
        np.testing.assert_array_equal(np.asarray(none_ids),
                                      np.asarray(neg_ids))
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))

    def test_backend_accumulates_hist_and_scripts(self, models, rng):
        from kirag_tpu.models.llm import JaxLlamaBackend

        t, d = models
        ids, mask = _prompts(rng)
        n = 12
        plain = JaxLlamaBackend(t, TARGET_CFG, eos_token_id=999,
                                compute_dtype=jnp.float32,
                                prompt_buckets=(16,))
        g, _ = plain.greedy(np.asarray(ids), np.asarray(mask), n,
                            return_logits=False)
        spec = JaxLlamaBackend(t, TARGET_CFG, eos_token_id=999,
                               compute_dtype=jnp.float32,
                               prompt_buckets=(16,),
                               draft_params=d, draft_config=DRAFT_CFG,
                               spec_gamma=3)
        spec.draft_script_fn = lambda i, m: g  # perfect agreement
        s, _ = spec.greedy(np.asarray(ids), np.asarray(mask), n,
                           return_logits=False)
        np.testing.assert_array_equal(s, g)
        assert spec.spec_acc_hist.sum() > 0
        assert spec.spec_acc_hist[:2].sum() == 0  # all rounds accept 2/2

        # segmented path accumulates deltas across resumes
        spec2 = JaxLlamaBackend(t, TARGET_CFG, eos_token_id=999,
                                compute_dtype=jnp.float32,
                                prompt_buckets=(16,),
                                draft_params=d, draft_config=DRAFT_CFG,
                                spec_gamma=3)
        spec2.draft_script_fn = lambda i, m: g
        s1, _, st = spec2.greedy_start(np.asarray(ids), np.asarray(mask), n,
                                       return_logits=False)
        segs = [s1]
        for k in (5, 6):
            seg, _, st = spec2.greedy_resume(st, k, return_logits=False)
            segs.append(seg)
        np.testing.assert_array_equal(np.concatenate(segs, axis=1), g)
        assert spec2.spec_acc_hist.sum() > 0
        assert spec2.spec_acc_hist[:2].sum() == 0
