"""Tests for the data loader, optimizer guards, and aligner training loop."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kirag_tpu.data import E5Collator
from kirag_tpu.models import BertConfig, init_bert_params
from kirag_tpu.training import AlignerTrainer, DataLoader, TrainerConfig
from kirag_tpu.training.trainer import make_optimizer

from tests.helpers import make_tokenizer


class TestDataLoader:
    def setup_method(self):
        self.dataset = list(range(23))

    def test_epoch_determinism(self):
        dl = DataLoader(self.dataset, batch_size=4, shuffle=True, seed=1)
        dl.set_epoch(0)
        a = [b for b in dl]
        dl.set_epoch(0)
        b = [b for b in dl]
        assert [x for batch in a for x in batch] == [x for batch in b for x in batch]
        dl.set_epoch(1)
        c = [x for batch in dl for x in batch]
        assert c != [x for batch in a for x in batch]  # reshuffled
        assert sorted(c) == list(range(23))

    def test_process_sharding_covers_dataset(self):
        shards = []
        for p in range(4):
            dl = DataLoader(self.dataset, batch_size=4, shuffle=False, process_index=p,
                            process_count=4)
            shards.append([x for b in dl for x in b])
        lengths = {len(s) for s in shards}
        assert len(lengths) == 1  # equal batch counts per process
        assert set(range(23)) <= set(x for s in shards for x in s)

    def test_iter_from_resume(self):
        dl = DataLoader(self.dataset, batch_size=4, shuffle=True, seed=3)
        dl.set_epoch(2)
        full = list(dl)
        resumed = list(dl.iter_from(3))
        assert [x for b in resumed for x in b] == [x for b in full[3:] for x in b]


class TestOptimizerGuards:
    def test_nan_grads_skipped(self):
        config = TrainerConfig(learning_rate=0.1, accumulation_steps=1, warmup_ratio=0.0)
        opt = make_optimizer(config, total_steps=100)
        params = {"w": jnp.ones((4,))}
        state = opt.init(params)
        bad = {"w": jnp.full((4,), jnp.nan)}
        updates, state = opt.update(bad, state, params)
        new_params = optax.apply_updates(params, updates)
        np.testing.assert_array_equal(np.asarray(new_params["w"]), np.ones(4))
        assert int(state.notfinite_count) == 1
        good = {"w": jnp.ones((4,))}
        # two good updates: step 0 of the schedule has lr == 0 by construction
        updates, state = opt.update(good, state, params)
        params = optax.apply_updates(params, updates)
        updates, state = opt.update(good, state, params)
        params = optax.apply_updates(params, updates)
        assert not np.allclose(np.asarray(params["w"]), 1.0)
        assert int(state.notfinite_count) == 0  # reset after a finite step

    def test_warmup_schedule(self):
        config = TrainerConfig(learning_rate=1.0, warmup_ratio=0.5)
        opt = make_optimizer(config, total_steps=10)
        params = {"w": jnp.ones(())}
        state = opt.init(params)
        g = {"w": jnp.ones(())}
        # first step: lr ~ 0 => negligible change beyond weight decay
        updates, state = opt.update(g, state, params)
        assert abs(float(updates["w"])) < 0.05


def _training_setup(tmp_path, batch_size=4, num_negatives=3, eval_too=True, **cfg_kw):
    tok = make_tokenizer(tmp_path)
    config = BertConfig(vocab_size=tok.vocab_size, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64)
    params = init_bert_params(jax.random.key(0), config)
    collator = E5Collator(tokenizer=tok, query_maxlength=32, doc_maxlength=32)

    rng = np.random.RandomState(0)
    examples = []
    for i in range(24):
        w = f"w{i}"
        negs = [f"w{j} w{j + 50}" for j in rng.choice(100, size=num_negatives) if j != i]
        while len(negs) < num_negatives:
            negs.append("omega psi")
        examples.append({
            "index": i,
            "question": f"{w} question",
            "answers": [],
            "positive_passage": f"{w} w{i + 50}",
            "negative_passages": negs[:num_negatives],
        })

    train_loader = DataLoader(examples, batch_size=batch_size, shuffle=True,
                              collate_fn=collator, seed=0)
    eval_loader = DataLoader(examples[:8], batch_size=batch_size, shuffle=False,
                             collate_fn=collator) if eval_too else None
    cfg_kw.setdefault("eval_steps", 1000)
    cfg_kw.setdefault("log_steps", 1000)
    tcfg = TrainerConfig(learning_rate=3e-4, save_dir=str(tmp_path / "run"),
                         num_train_epochs=2, **cfg_kw)
    trainer = AlignerTrainer(params, config, tcfg, train_loader, eval_loader,
                             temperature=0.05)
    return trainer


class TestAlignerTraining:
    def test_loss_decreases_and_mrr_improves(self, tmp_path):
        trainer = _training_setup(tmp_path)
        mrr_before = trainer.evaluate(trainer.params, trainer.eval_loader)
        losses = []
        trainer.train_loader.set_epoch(0)
        for _ in range(3):
            for batch in trainer.train_loader:
                losses.append(trainer.training_step(batch)["loss"])
        mrr_after = trainer.evaluate(trainer.params, trainer.eval_loader)
        assert np.mean(losses[-4:]) < np.mean(losses[:4])
        assert mrr_after >= mrr_before

    def test_checkpoint_resume_roundtrip(self, tmp_path):
        trainer = _training_setup(tmp_path)
        for batch in trainer.train_loader:
            trainer.training_step(batch)
            break
        trainer.save_checkpoint(metric=0.5)
        w_before = np.asarray(jax.tree.leaves(trainer.params)[0])
        step_before = trainer.step

        trainer2 = _training_setup(tmp_path)
        assert trainer2.resume_training()
        assert trainer2.step == step_before
        np.testing.assert_array_equal(np.asarray(jax.tree.leaves(trainer2.params)[0]), w_before)

    def test_resume_mid_epoch_identical_trajectory(self, tmp_path):
        """Interrupt mid-epoch, resume, and the per-step losses must match an
        uninterrupted run exactly (loader fast-forward + full state restore)."""
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        full = _training_setup(tmp_path / "a", log_steps=1, eval_too=False)
        full.train()
        full_losses = {r["step"]: r["loss"] for r in full.history if "loss" in r}
        assert len(full_losses) >= 8

        interrupted = _training_setup(tmp_path / "b", log_steps=1, eval_too=False)
        interrupted.train_loader.set_epoch(0)
        for i, batch in enumerate(interrupted.train_loader):
            interrupted.training_step(batch)
            if i == 3:  # stop mid-epoch (6 steps per epoch)
                break
        interrupted.save_checkpoint()

        resumed = _training_setup(tmp_path / "b", log_steps=1, eval_too=False)
        resumed.train(resume=True)
        resumed_losses = {r["step"]: r["loss"] for r in resumed.history if "loss" in r}
        for step, loss in resumed_losses.items():
            np.testing.assert_allclose(loss, full_losses[step], rtol=1e-6,
                                       err_msg=f"divergence at step {step}")
        assert min(resumed_losses) == 5  # picked up right after the interrupt

    def test_metrics_jsonl_and_grad_stats(self, tmp_path):
        import json as _json

        trainer = _training_setup(tmp_path, log_steps=1, eval_too=False)
        trainer.train_loader.set_epoch(0)
        batch = next(iter(trainer.train_loader))
        stats = trainer.training_step(batch)
        for key in ("grad_norm", "grad_min", "grad_max", "grad_mean"):
            assert key in stats and np.isfinite(stats[key])
        assert stats["grad_min"] <= stats["grad_mean"] <= stats["grad_max"]
        trainer.log(stats)
        metrics_file = tmp_path / "run" / "metrics.jsonl"
        assert metrics_file.exists()
        rec = _json.loads(metrics_file.read_text().splitlines()[-1])
        assert rec["step"] == 1 and "loss" in rec and "time" in rec

    def test_steps_per_sec_resets_after_resume(self, tmp_path, monkeypatch):
        """steps_per_sec counts SESSION steps, not the restored global step
        (round-1 bug: step/wall gave ~3x inflated rates after resume)."""
        import types

        import kirag_tpu.training.trainer as trainer_mod

        trainer = _training_setup(tmp_path, log_steps=2, eval_too=False,
                                  max_steps=4)
        trainer.train()

        trainer2 = _training_setup(tmp_path, log_steps=2, eval_too=False,
                                   max_steps=6)
        clock = iter(range(10_000))
        monkeypatch.setattr(trainer_mod, "time",
                            types.SimpleNamespace(time=lambda: float(next(clock))))
        trainer2.train(resume=True)
        rates = [r["steps_per_sec"] for r in trainer2.history if "steps_per_sec" in r]
        assert rates, "expected a steps_per_sec log record"
        # fake clock: start=0s, log at global step 6 reads 1s -> 2 session
        # steps / 1s. The buggy global formula would report 6.0.
        assert rates[-1] == pytest.approx(2.0)

    def test_tracker_hook_receives_records(self, tmp_path):
        """Pluggable experiment trackers (the reference's wandb role,
        base_trainer.py:426-432) get every log record after the built-in
        history/file sinks."""
        seen = []
        trainer = _training_setup(tmp_path, log_steps=1)
        trainer.trackers.append(seen.append)
        for batch in trainer.train_loader:
            trainer.training_step(batch)
            trainer.log({"loss": 0.5})
            break
        assert seen and seen[0]["loss"] == 0.5 and "step" in seen[0]
        assert seen == trainer.history[-len(seen):]

    def test_best_checkpoint_retention(self, tmp_path):
        trainer = _training_setup(tmp_path, keep_top_k=2)
        for metric in (0.1, 0.5, 0.3, 0.9):
            trainer.step += 1
            trainer.save_checkpoint(metric=metric)
        assert trainer.best_checkpoint_step() is not None
        best, _ = trainer._managers()
        assert len(best.all_steps()) <= 2  # top-k retention evicts the rest

    def test_save_encoder_feeds_retrieval(self, tmp_path):
        from kirag_tpu.models.encoders import Encoder

        trainer = _training_setup(tmp_path, eval_too=False)
        out = str(tmp_path / "encoder")
        trainer.save_encoder(out)
        enc = Encoder.load(out)
        assert enc.encoder_type == "e5"
        emb = np.asarray(enc(np.ones((1, 8), np.int32), np.ones((1, 8), np.int32)))
        assert emb.shape == (1, 32)


class TestCorpusMRR:
    def test_corpus_mrr_bounded(self, tmp_path):
        trainer = _training_setup(tmp_path)
        mrr = trainer.evaluate_corpus_mrr(trainer.params, trainer.eval_loader)
        assert 0.0 < mrr <= 1.0
        # corpus-wide MRR is never easier than per-block MRR
        block = trainer.evaluate(trainer.params, trainer.eval_loader)
        assert mrr <= block + 1e-6


class TestComputeLogits:
    def test_shape_dispatch(self, rng, tmp_path):
        from kirag_tpu.retrieval import DenseRetriever

        q1, d1 = rng.randn(8).astype(np.float32), rng.randn(8).astype(np.float32)
        assert np.isscalar(float(DenseRetriever.compute_logits(q1, d1)))
        assert DenseRetriever.compute_logits(q1, rng.randn(5, 8)).shape == (5,)
        assert DenseRetriever.compute_logits(rng.randn(3, 8), rng.randn(3, 4, 8)).shape == (3, 4)
        assert DenseRetriever.compute_logits(rng.randn(3, 8), rng.randn(5, 8)).shape == (3, 5)
        with pytest.raises(ValueError):
            DenseRetriever.compute_logits(rng.randn(2, 3, 8), rng.randn(5, 8))


class TestTPTraining:
    def test_tp_training_matches_replicated(self, tmp_path, mesh8):
        """2x4 (data, model) TP training must track the replicated run."""
        from kirag_tpu.parallel import create_mesh

        trainer_a = _training_setup(tmp_path, batch_size=8)
        mesh = create_mesh(data=2, model=4)
        tmp2 = tmp_path / "tp"
        tmp2.mkdir()
        # rebuild with the mesh: AlignerTrainer shards params over 'model'
        trainer_b = _training_setup(tmp2, batch_size=8)
        from kirag_tpu.training import AlignerTrainer

        trainer_b = AlignerTrainer(
            trainer_a.params, trainer_b.bert_config, trainer_b.config,
            trainer_b.train_loader, trainer_b.eval_loader,
            temperature=0.05, mesh=mesh)
        trainer_a.train_loader.set_epoch(0)
        trainer_b.train_loader.set_epoch(0)
        loss_a = trainer_a.training_step(next(iter(trainer_a.train_loader)))["loss"]
        loss_b = trainer_b.training_step(next(iter(trainer_b.train_loader)))["loss"]
        assert abs(loss_a - loss_b) < 1e-3
        pa = np.asarray(jax.tree.leaves(trainer_a.params)[0])
        pb = np.asarray(jax.tree.leaves(trainer_b.params)[0])
        np.testing.assert_allclose(pa, pb, rtol=1e-3, atol=1e-4)


class TestShardedTraining:
    def test_dp_training_matches_single_device(self, tmp_path, mesh8):
        """Batch sharded over the data axis must produce the same loss/grad
        path as unsharded (GSPMD global-batch semantics)."""
        from jax.sharding import NamedSharding, PartitionSpec

        trainer_a = _training_setup(tmp_path, batch_size=8)
        tmp2 = tmp_path / "b"
        tmp2.mkdir()
        trainer_b = _training_setup(tmp2, batch_size=8)
        trainer_b.batch_sharding = NamedSharding(mesh8, PartitionSpec("data"))

        trainer_a.train_loader.set_epoch(0)
        trainer_b.train_loader.set_epoch(0)
        batch_a = next(iter(trainer_a.train_loader))
        batch_b = next(iter(trainer_b.train_loader))
        loss_a = trainer_a.training_step(batch_a)["loss"]
        loss_b = trainer_b.training_step(batch_b)["loss"]
        assert abs(loss_a - loss_b) < 1e-4
        pa = np.asarray(jax.tree.leaves(trainer_a.params)[0])
        pb = np.asarray(jax.tree.leaves(trainer_b.params)[0])
        np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-5)


class TestRemat:
    def test_remat_gradients_match(self):
        """jax.checkpoint in the contrastive loss must be gradient-identical
        (it exists so e5-large training fits one chip's HBM: measured 17.8G
        without remat vs 15.75G capacity)."""
        import jax
        import jax.numpy as jnp

        from kirag_tpu.models import BertConfig, init_bert_params
        from kirag_tpu.training import in_batch_contrastive_loss

        cfg = BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=64)
        params = init_bert_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        batch = {
            "query_args": {
                "input_ids": jnp.asarray(rng.randint(1, 100, (4, 16)), jnp.int32),
                "attention_mask": jnp.ones((4, 16), jnp.int32)},
            "doc_args": {
                "input_ids": jnp.asarray(rng.randint(1, 100, (16, 8)), jnp.int32),
                "attention_mask": jnp.ones((16, 8), jnp.int32)},
            "positive_doc_indices": jnp.arange(4, dtype=jnp.int32) * 4,
        }

        def loss(p, remat):
            return in_batch_contrastive_loss(p, batch, cfg, "e5", 0.05,
                                             remat=remat)[0]

        g1 = jax.grad(lambda p: loss(p, False))(params)
        for mode in (True, "dots"):  # full remat and dots_saveable policy
            g2 = jax.grad(lambda p: loss(p, mode))(params)
            diffs = jax.tree.map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2)
            assert max(jax.tree.leaves(diffs)) < 1e-5, mode


class TestWandbTracker:
    """The shipped wandb adapter for the tracker seam (VERDICT r4 #9) —
    exercised against a fake in-process wandb module (zero egress here)."""

    class _FakeWandb:
        def __init__(self):
            self.inits, self.logs, self.finished = [], [], 0

        def init(self, **kw):
            self.inits.append(kw)
            return object()

        def log(self, metrics, step=None):
            self.logs.append((dict(metrics), step))

        def finish(self):
            self.finished += 1

    def test_records_route_to_wandb_log(self):
        from kirag_tpu.utils.wandb_tracker import WandbTracker

        fake = self._FakeWandb()
        t = WandbTracker(project="kirag", name="run1",
                         config={"lr": 2e-5}, wandb_module=fake)
        assert fake.inits == [{"project": "kirag", "name": "run1",
                               "config": {"lr": 2e-5}}]
        t({"step": 3, "epoch": 0, "loss": 1.5, "note": "text dropped"})
        assert fake.logs == [({"epoch": 0, "loss": 1.5}, 3)]
        t.finish()
        t({"step": 4, "loss": 1.0})  # after finish: dropped, not crashed
        assert fake.finished == 1 and len(fake.logs) == 1

    def test_rides_the_trainer_seam(self, tmp_path):
        # the adapter is just a callable: BaseTrainer.log fans records out
        from kirag_tpu.utils.wandb_tracker import WandbTracker

        fake = self._FakeWandb()
        t = WandbTracker(project="p", wandb_module=fake)
        t({"step": 0, "loss": 2.0})
        t({"step": 1, "loss": 1.0, "grad_norm": 0.5})
        assert [s for _, s in fake.logs] == [0, 1]
        assert fake.logs[1][0] == {"loss": 1.0, "grad_norm": 0.5}

    def test_missing_wandb_raises_clear_error(self, monkeypatch):
        import builtins

        from kirag_tpu.utils.wandb_tracker import WandbTracker

        real_import = builtins.__import__

        def no_wandb(name, *a, **kw):
            if name == "wandb":
                raise ImportError("No module named 'wandb'")
            return real_import(name, *a, **kw)

        monkeypatch.setattr(builtins, "__import__", no_wandb)
        with pytest.raises(ImportError, match="requires the `wandb` package"):
            WandbTracker(project="p")


class TestPackedForward:
    """Query+doc packing into one encoder forward (docs/DESIGN.md §7's last
    MFU lever): per-doc math must be identical to the two-call form — packing
    only changes the batching, via restarted positions + segment-confined
    attention (`bert_encode` position_ids/segment_ids)."""

    def _batch(self, rng, ragged=True):
        import jax.numpy as jnp
        q_mask = np.ones((4, 16), np.int32)
        d_mask = np.ones((16, 8), np.int32)
        if ragged:
            # trailing padding per row (collators pin right padding)
            for i in range(4):
                q_mask[i, 16 - (i % 3):] = 0
            for i in range(16):
                d_mask[i, 8 - (i % 4):] = 0
        ids_q = rng.randint(1, 100, (4, 16)).astype(np.int32) * q_mask
        ids_d = rng.randint(1, 100, (16, 8)).astype(np.int32) * d_mask
        return {
            "query_args": {"input_ids": jnp.asarray(ids_q),
                           "attention_mask": jnp.asarray(q_mask)},
            "doc_args": {"input_ids": jnp.asarray(ids_d),
                         "attention_mask": jnp.asarray(d_mask)},
            "positive_doc_indices": jnp.arange(4, dtype=jnp.int32) * 4,
        }

    def _cfg(self):
        from kirag_tpu.models import BertConfig
        return BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=64)

    @pytest.mark.parametrize("encoder_type", ["e5", "bge", "contriever"])
    def test_packed_embeddings_match_two_call(self, encoder_type):
        import jax
        from kirag_tpu.models import init_bert_params
        from kirag_tpu.training.aligner import _embed, _embed_packed

        cfg = self._cfg()
        params = init_bert_params(jax.random.PRNGKey(0), cfg)
        batch = self._batch(np.random.RandomState(1))
        q_ref = _embed(params, batch["query_args"], cfg, encoder_type,
                       jnp.float32)
        d_ref = _embed(params, batch["doc_args"], cfg, encoder_type,
                       jnp.float32)
        q_p, d_p = _embed_packed(params, batch["query_args"],
                                 batch["doc_args"], cfg, encoder_type,
                                 jnp.float32)
        np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref),
                                   rtol=2e-4, atol=2e-5)

    def test_packed_loss_and_grads_match(self):
        import jax
        from kirag_tpu.models import init_bert_params
        from kirag_tpu.training import in_batch_contrastive_loss

        cfg = self._cfg()
        params = init_bert_params(jax.random.PRNGKey(0), cfg)
        batch = self._batch(np.random.RandomState(2))

        def loss(p, packed, remat=False):
            return in_batch_contrastive_loss(p, batch, cfg, "e5", 0.05,
                                             remat=remat, packed=packed)[0]

        l0 = float(loss(params, False))
        l1 = float(loss(params, True))
        assert abs(l0 - l1) < 1e-4, (l0, l1)
        g0 = jax.grad(lambda p: loss(p, False))(params)
        for remat in (False, "dots", True):
            g1 = jax.grad(lambda p: loss(p, True, remat))(params)
            diffs = jax.tree.map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
            assert max(jax.tree.leaves(diffs)) < 2e-4, remat

    def test_unpackable_geometry_falls_back(self):
        # q_len not a multiple of d_len -> the two-call path, same API
        import jax
        from kirag_tpu.models import init_bert_params
        from kirag_tpu.training import in_batch_contrastive_loss

        cfg = self._cfg()
        params = init_bert_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(3)
        batch = {
            "query_args": {
                "input_ids": jnp.asarray(rng.randint(1, 100, (4, 15)), jnp.int32),
                "attention_mask": jnp.ones((4, 15), jnp.int32)},
            "doc_args": {
                "input_ids": jnp.asarray(rng.randint(1, 100, (16, 8)), jnp.int32),
                "attention_mask": jnp.ones((16, 8), jnp.int32)},
            "positive_doc_indices": jnp.arange(4, dtype=jnp.int32) * 4,
        }
        l0 = float(in_batch_contrastive_loss(params, batch, cfg, "e5", 0.05,
                                             packed=False)[0])
        l1 = float(in_batch_contrastive_loss(params, batch, cfg, "e5", 0.05,
                                             packed=True)[0])
        assert l0 == l1
