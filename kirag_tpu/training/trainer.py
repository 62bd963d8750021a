"""Base trainer: optax AdamW, grad accumulation, NaN-step skip, orbax
checkpoints with top-k retention and full resume.

The TPU re-design of the reference's `BaseTrainer` (`trainer/base_trainer.py`):

===========================  =================================================
reference mechanism           TPU-native equivalent
===========================  =================================================
DDP wrap + manual all_reduce  pjit/GSPMD: batch sharded over mesh ``data``
of grads (:495-515)           axis; gradients of a global-batch loss are
                              reduced by XLA automatically
AMP fp16/bf16 + GradScaler    bf16 compute dtype in the model; grads/optimizer
(:421-422, 497-508)           in f32 (no scaler needed for bf16)
NaN/Inf grad detect + skip    ``optax.apply_if_finite`` around the optimizer
(:531-538, 742-772)           (skips poisoned steps, counts them)
AdamW + linear warmup         ``optax.adamw`` + warmup/constant schedule
(:668-740)
top-k best-val ckpt queue     orbax ``CheckpointManager`` with ``best_fn`` +
(:308-336)                    ``max_to_keep`` plus a separate "latest" slot
full resume (:338-364)        restore params/opt_state/step and fast-forward
                              the loader via ``DataLoader.iter_from``
===========================  =================================================
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    warmup_ratio: float = 0.1
    num_train_epochs: int = 10
    accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    eval_steps: int = 200
    log_steps: int = 50
    keep_top_k: int = 2
    save_dir: str = "checkpoint/run"
    seed: int = 42
    metric_mode: str = "max"  # higher is better
    max_steps: Optional[int] = None


def make_optimizer(config: TrainerConfig, total_steps: int) -> optax.GradientTransformation:
    """AdamW with linear warmup then constant LR, grad clip, NaN-step skip.

    ``total_steps`` counts MICRO batches; under gradient accumulation the
    schedule inside ``optax.MultiSteps`` only advances once per accumulated
    update, so warmup is sized in optimizer updates.
    """
    num_updates = max(1, total_steps // max(1, config.accumulation_steps))
    warmup_steps = max(1, int(num_updates * config.warmup_ratio))
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, config.learning_rate, warmup_steps),
            optax.constant_schedule(config.learning_rate),
        ],
        boundaries=[warmup_steps],
    )
    inner = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(schedule, weight_decay=config.weight_decay),
    )
    if config.accumulation_steps > 1:
        inner = optax.MultiSteps(inner, every_k_schedule=config.accumulation_steps)
    # skip (don't apply) non-finite updates, like the reference's grad sanitizer
    return optax.apply_if_finite(inner, max_consecutive_errors=10_000)


class BaseTrainer:
    """Functional training loop around a user-supplied loss function.

    Subclasses implement :meth:`loss_fn` (pure: (params, batch) -> scalar) and
    :meth:`evaluate` ((params, eval_loader) -> metric float).
    """

    def __init__(self, params, config: TrainerConfig, train_loader, eval_loader=None,
                 mesh=None, batch_sharding=None, trackers=()):
        self.config = config
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.mesh = mesh
        self.batch_sharding = batch_sharding
        # pluggable experiment trackers (the wandb role in the reference,
        # trainer/base_trainer.py:426-432 — this rig has zero egress, so the
        # remote sink is injected): each callable receives every log record
        # after the built-in history/file/stream sinks.
        self.trackers = list(trackers)

        steps_per_epoch = max(1, len(train_loader))
        self.total_steps = config.max_steps or steps_per_epoch * config.num_train_epochs
        self.optimizer = make_optimizer(config, self.total_steps)

        self.params = params
        self.opt_state = self.optimizer.init(params)
        self.step = 0
        self.epoch = 0
        self.history: list = []

        os.makedirs(config.save_dir, exist_ok=True)
        with open(os.path.join(config.save_dir, "configs.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)
        self._ckpt_managers = None
        self._jit_update = jax.jit(self._update, donate_argnums=(0, 1))

    # -- to be provided by subclasses ----------------------------------------

    def loss_fn(self, params, batch) -> jnp.ndarray:
        raise NotImplementedError

    def evaluate(self, params, eval_loader) -> float:
        raise NotImplementedError

    # -- core update ----------------------------------------------------------

    def _update(self, params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(self._loss_with_aux, has_aux=True)(params, batch)
        leaves = jax.tree.leaves(grads)
        # grad min/max/mean observability (reference `base_trainer.py:550-589`)
        gstats = {
            "grad_norm": optax.global_norm(grads),
            "grad_min": jnp.min(jnp.stack([jnp.min(g) for g in leaves])),
            "grad_max": jnp.max(jnp.stack([jnp.max(g) for g in leaves])),
            "grad_mean": (sum(jnp.sum(g) for g in leaves)
                          / sum(g.size for g in leaves)),
        }
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gstats, aux

    def _loss_with_aux(self, params, batch):
        out = self.loss_fn(params, batch)
        if isinstance(out, tuple):
            return out
        return out, {}

    def device_put_batch(self, batch):
        if self.batch_sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), self.batch_sharding), batch)
        return jax.tree.map(jnp.asarray, batch)

    def training_step(self, batch) -> Dict[str, float]:
        batch = self.device_put_batch(batch)
        self.params, self.opt_state, loss, gstats, aux = self._jit_update(
            self.params, self.opt_state, batch)
        self.step += 1
        stats = {"loss": float(loss)}
        stats.update({k: float(v) for k, v in gstats.items()})
        for k, v in (aux or {}).items():
            stats[k] = float(v)
        return stats

    # -- checkpointing ----------------------------------------------------------

    def _managers(self):
        if self._ckpt_managers is None:
            import orbax.checkpoint as ocp

            best_dir = os.path.join(os.path.abspath(self.config.save_dir), "best")
            latest_dir = os.path.join(os.path.abspath(self.config.save_dir), "latest")
            best = ocp.CheckpointManager(
                best_dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.config.keep_top_k,
                    best_fn=lambda m: m["metric"],
                    best_mode=self.config.metric_mode,
                ),
            )
            latest = ocp.CheckpointManager(
                latest_dir, options=ocp.CheckpointManagerOptions(max_to_keep=1),
            )
            self._ckpt_managers = (best, latest)
        return self._ckpt_managers

    def _state_tree(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
            "epoch": self.epoch,
        }

    def save_checkpoint(self, metric: Optional[float] = None) -> None:
        import orbax.checkpoint as ocp

        best, latest = self._managers()
        args = ocp.args.StandardSave(self._state_tree())
        latest.save(self.step, args=args)
        if metric is not None:
            best.save(self.step, args=args, metrics={"metric": float(metric)})
        latest.wait_until_finished()
        best.wait_until_finished()

    def resume_training(self) -> bool:
        """Restore the latest checkpoint if present; True when resumed."""
        import orbax.checkpoint as ocp

        _, latest = self._managers()
        step = latest.latest_step()
        if step is None:
            return False
        restored = latest.restore(
            step, args=ocp.args.StandardRestore(self._state_tree()))
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.step = int(restored["step"])
        self.epoch = int(restored["epoch"])
        logger.info(f"Resumed from step {self.step} (epoch {self.epoch})")
        return True

    def best_checkpoint_step(self) -> Optional[int]:
        best, _ = self._managers()
        return best.best_step()

    # -- loop -------------------------------------------------------------------

    def log(self, record: Dict[str, Any]) -> None:
        record = {"step": self.step, "epoch": self.epoch, **record}
        self.history.append(record)
        logger.info(" ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in record.items()))
        # persist per-step metrics so an operator can tail/plot a run
        with open(os.path.join(self.config.save_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"time": time.time(), **record}) + "\n")
        for tracker in self.trackers:
            tracker(record)

    def train(self, resume: bool = False) -> Dict[str, Any]:
        if resume:
            self.resume_training()
        steps_per_epoch = max(1, len(self.train_loader))
        start_time = time.time()
        session_start_step = self.step  # steps_per_sec must not count pre-resume steps
        last_metric = None

        while self.epoch < self.config.num_train_epochs and self.step < self.total_steps:
            done_in_epoch = self.step - self.epoch * steps_per_epoch
            if done_in_epoch >= steps_per_epoch:  # resumed at an epoch boundary
                self.epoch += 1
                continue
            self.train_loader.set_epoch(self.epoch)
            iterator = (self.train_loader.iter_from(done_in_epoch)
                        if 0 < done_in_epoch else iter(self.train_loader))
            epoch_completed = True
            for batch in iterator:
                stats = self.training_step(batch)
                if self.step % self.config.log_steps == 0:
                    stats["steps_per_sec"] = ((self.step - session_start_step)
                                              / max(time.time() - start_time, 1e-9))
                    self.log(stats)
                if self.eval_loader is not None and self.step % self.config.eval_steps == 0:
                    last_metric = float(self.evaluate(self.params, self.eval_loader))
                    self.log({"eval_metric": last_metric})
                    self.save_checkpoint(metric=last_metric)
                if self.step >= self.total_steps:
                    # max_steps hit MID-epoch: the epoch did not finish, so the
                    # counter must not advance (a resume with a higher
                    # max_steps continues from the right batch)
                    epoch_completed = self.step - self.epoch * steps_per_epoch >= steps_per_epoch
                    break
            if epoch_completed:
                self.epoch += 1

        if self.eval_loader is not None:
            last_metric = float(self.evaluate(self.params, self.eval_loader))
            self.log({"eval_metric": last_metric})
        self.save_checkpoint(metric=last_metric)
        return {"final_metric": last_metric, "steps": self.step}
