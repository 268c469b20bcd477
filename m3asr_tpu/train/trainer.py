"""Training harness: epoch loop, validation, checkpoint/resume,
divergence recovery.

Rebuilds the reference trainer skeleton
(bk/train_conformer_aed_fmoe_localComm_bmuf_domain_acc_hier.py):
 * epoch loop over the threaded loader (:512-692)
 * periodic validation + best-model tracking
 * checkpoint dict {epoch, best_model, recent_models, global_step,
   optim, resume_skip, bmuf} saved by master (:480-493), resume
   restores optimizer/LR, reloads the latest model, and skips
   `resume_skip` utterances in the data stream (:435-461, 533-543)
 * divergence recovery: non-finite loss (or BMUF STOP) -> reload best
   model, halve LR, bump an early-stop counter (:764-774)

Single-controller JAX: data parallelism is the jit mesh's job (the
train step is sharded by the caller); this class owns the host-side
control flow only.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from m3asr_tpu.train.metrics import (MetricStat, ScalarWriter,
                                     TensorBoardWriter, ThroughputMeter,
                                     set_logger)


class Trainer:
    def __init__(self, model_cfg, params, optimizer, train_step,
                 make_loader: Callable[[int], Iterable],
                 valid_loader: Optional[Callable[[], Iterable]] = None,
                 save_dir: str = "exp", log_period: int = 100,
                 save_period: Optional[int] = None,
                 max_epochs: int = 20, early_stop_count: int = 5,
                 keep_recent: int = 5, logger=None,
                 step_takes_rng: bool = False, seed: int = 0,
                 scalar_dir: Optional[str] = None,
                 batch_keys: Tuple[str, ...] = ("data", "lens", "target",
                                                "target_lens"),
                 ckpt_format: str = "pickle", bmuf=None,
                 opt_state=None):
        self.model_cfg = model_cfg
        self.params = params
        self.optimizer = optimizer
        # BMUF mode passes a pre-stacked opt_state (per-replica); plain
        # mode initializes from params
        self.opt_state = (opt_state if opt_state is not None
                          else optimizer.init(params))
        self.train_step = train_step
        self.make_loader = make_loader
        self.valid_loader = valid_loader
        self.save_dir = save_dir
        self.log_period = log_period
        # crash-recovery granularity is its own knob — round-1 coupling
        # to log_period made operators discover it the hard way
        self.save_period = save_period if save_period else log_period
        self.max_epochs = max_epochs
        self.early_stop_limit = early_stop_count
        self.keep_recent = keep_recent
        self.logger = logger or set_logger("m3asr.train")

        self.epoch = 0
        self.global_step = 0
        self.resume_skip = 0
        self.best_valid = float("inf")
        self.best_params = params
        self.best_opt_state = self.opt_state
        self.early_stop = 0
        self.recent_models: list = []
        self.lr_scale = 1.0
        self.step_takes_rng = step_takes_rng
        self.batch_keys = tuple(batch_keys)
        assert ckpt_format in ("pickle", "orbax"), ckpt_format
        self.ckpt_format = ckpt_format
        # BMUF mode (train.py --bmuf): params/opt_state carry a leading
        # dp axis, train_step is vmapped over it, `bmuf` is a
        # train.bmuf.BmufRecipe driving the periodic sync
        # (bk/..._hier.py:599-614)
        self.bmuf = bmuf
        self.rng = jax.random.PRNGKey(seed)
        # scalar observability: JSONL + TensorBoard event files
        # (bk/..._hier.py:190-193,622-623)
        self.writers = []
        if scalar_dir:
            self.writers = [
                ScalarWriter(os.path.join(scalar_dir, "scalars.jsonl")),
                TensorBoardWriter(scalar_dir)]

    # ------------------------------------------------------------------
    # checkpointing (bk/..._hier.py:435-506)
    # ------------------------------------------------------------------
    def _ckpt_path(self, tag: str) -> str:
        suffix = ".pkl" if self.ckpt_format == "pickle" else ".orbax"
        return os.path.join(self.save_dir, f"checkpoint_{tag}{suffix}")

    def _gather_state(self):
        return {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "resume_skip": self.resume_skip,
            "best_valid": self.best_valid,
            "early_stop": self.early_stop,
            "lr_scale": self.lr_scale,
            "params": jax.tree.map(np.asarray, self.params),
            "best_params": jax.tree.map(np.asarray, self.best_params),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                self.opt_state),
            "best_opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                self.best_opt_state),
            # BMUF buffers ride the checkpoint like the reference's
            # {..., 'bmuf'} dict (bk/..._hier.py:480-493)
            "bmuf": (jax.tree.map(np.asarray, self.bmuf.state_dict())
                     if self.bmuf is not None else None),
        }

    def _apply_state(self, state):
        self.epoch = int(state["epoch"])
        self.global_step = int(state["global_step"])
        self.resume_skip = int(state["resume_skip"])
        self.best_valid = float(state["best_valid"])
        self.early_stop = int(state["early_stop"])
        self.lr_scale = float(state.get("lr_scale", 1.0))
        def as_jnp(x):
            return jnp.asarray(x) if isinstance(x, np.ndarray) else x
        self.params = jax.tree.map(as_jnp, state["params"])
        self.best_params = jax.tree.map(as_jnp, state["best_params"])
        self.opt_state = jax.tree.map(as_jnp, state["opt_state"])
        self.best_opt_state = jax.tree.map(
            as_jnp, state.get("best_opt_state", state["opt_state"]))
        if self.bmuf is not None and state.get("bmuf") is not None:
            self.bmuf.load_state_dict(state["bmuf"])

    def save_checkpoint(self, tag: str = "last"):
        os.makedirs(self.save_dir, exist_ok=True)
        state = self._gather_state()
        path = self._ckpt_path(tag)
        if self.ckpt_format == "orbax":
            # TPU-native path: multi-host-aware, per-array files
            import shutil
            import orbax.checkpoint as ocp
            tmp = os.path.abspath(path) + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(tmp, state)
            ckptr.wait_until_finished()
            shutil.rmtree(path, ignore_errors=True)
            os.replace(tmp, path)
        else:
            with open(path + ".tmp", "wb") as f:
                pickle.dump(state, f)
            os.replace(path + ".tmp", path)
        if tag == "last":
            self.recent_models.append(self.global_step)
            while len(self.recent_models) > self.keep_recent:
                self.recent_models.pop(0)

    def load_checkpoint(self, tag: str = "last") -> bool:
        path = self._ckpt_path(tag)
        if not os.path.exists(path):
            return False
        if self.ckpt_format == "orbax":
            import orbax.checkpoint as ocp
            target = self._gather_state()  # structure/dtype template
            ckptr = ocp.StandardCheckpointer()
            state = ckptr.restore(os.path.abspath(path), target)
        else:
            with open(path, "rb") as f:
                state = pickle.load(f)
        self._apply_state(state)
        self.logger.info(
            f"resumed epoch={self.epoch} step={self.global_step} "
            f"skip={self.resume_skip}")
        return True

    # ------------------------------------------------------------------
    # divergence recovery (bk/..._hier.py:764-774)
    # ------------------------------------------------------------------
    def _recover_from_divergence(self):
        from m3asr_tpu.train.lr_scheduler import set_lr_scale
        self.logger.warning(
            "non-finite loss: reload best model, halve lr, early-stop "
            f"counter {self.early_stop + 1}/{self.early_stop_limit}")
        self.params = self.best_params
        self.lr_scale *= 0.5
        # restore the optimizer state saved with the best model (the
        # reference restores the checkpointed optim dict, not a fresh
        # Adam) and fold the halved LR into it — lr_scale lives in the
        # optax state (inject_hyperparams), so no retrace
        self.opt_state = set_lr_scale(self.best_opt_state, self.lr_scale)
        self.early_stop += 1

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------
    def _batch_args(self, batch):
        """Batch tensors in step-argument order; BMUF mode reshapes the
        leading batch axis to (dp, B/dp) for the vmapped local step."""
        vals = tuple(batch[k] for k in self.batch_keys)
        if self.bmuf is None:
            return vals
        dp = self.bmuf.dp
        out = []
        for v in vals:
            assert v.shape[0] % dp == 0, \
                f"batch {v.shape[0]} not divisible by dp={dp} " \
                "(use loader drop_last)"
            out.append(v.reshape((dp, v.shape[0] // dp) + v.shape[1:]))
        return tuple(out)

    def train_one_epoch(self) -> Dict[str, float]:
        # tags come from the recipe's metrics dict on the first batch so
        # every recipe metric (aed_loss_*, domain/acc CE + hit, router
        # aux, grad_norm) reaches the log line and the scalar writers —
        # the reference's MetricStat logs all its tags the same way
        # (loss/loss_compute.py:6-54, bk/..._hier.py:617-632)
        stat = None
        meter = ThroughputMeter()
        for i, batch in enumerate(self.make_loader(self.resume_skip)):
            args = (self.params, self.opt_state) + self._batch_args(batch)
            if self.step_takes_rng:
                # per-batch chunk-size sample (dynamic-chunk training)
                key = jax.random.fold_in(self.rng, self.global_step)
                if self.bmuf is not None:
                    key = jax.random.split(key, self.bmuf.dp)
                args += (key,)
            self.params, self.opt_state, metrics = self.train_step(*args)
            scalars = {k: float(np.mean(v)) for k, v in metrics.items()}
            loss = scalars["loss"]
            if not np.isfinite(loss):
                self._recover_from_divergence()
                if self.early_stop >= self.early_stop_limit:
                    raise RuntimeError("early stop: too many divergences")
                continue
            self.global_step += 1
            if self.bmuf is not None and \
                    self.global_step % self.bmuf.sync_period == 0:
                self.params, ok = self.bmuf.sync(self.params)
                if not ok:  # STOP: non-finite delta (NaN guard)
                    self._recover_from_divergence()
                    if self.early_stop >= self.early_stop_limit:
                        raise RuntimeError(
                            "early stop: too many divergences")
                    continue
            self.resume_skip += int(batch["data"].shape[0])
            if stat is None:
                # 'loss' leads the line; the rest alphabetical
                stat = MetricStat(["loss"] + sorted(k for k in scalars
                                                    if k != "loss"))
            stat.update_stat([scalars.get(t, 0.0) for t in stat.tags],
                             [1] * len(stat.tags))
            meter.update(int(np.sum(batch["lens"])))
            if (i + 1) % self.log_period == 0:
                avg = stat.log_stat()
                line = " ".join(f"{t} {v:.4f}"
                                for t, v in zip(stat.tags, avg))
                self.logger.info(
                    f"epoch {self.epoch} step {self.global_step} "
                    f"{line} {meter.rate():.0f} frames/s")
                for w in self.writers:
                    for tag, v in zip(stat.tags, avg):
                        w.add_scalar(f"train/{tag}", v, self.global_step)
                    w.add_scalar("train/frames_per_s", meter.rate(),
                                 self.global_step)
            if (i + 1) % self.save_period == 0:
                self.save_checkpoint("last")
        if stat is None:  # empty loader / every batch diverged
            return {}
        return dict(zip(stat.tags, stat.summary_stat()))

    def validate(self, valid_step) -> float:
        assert self.valid_loader is not None
        params = self.params
        if self.bmuf is not None:
            # validate the synced model (replica 0 == every replica
            # right after a sync; mid-block, replica 0's local model)
            params = jax.tree.map(lambda x: x[0], params)
        total, count = 0.0, 0
        for batch in self.valid_loader():
            loss = float(valid_step(params, batch["data"],
                                    batch["lens"], batch["target"],
                                    batch["target_lens"]))
            total += loss
            count += 1
        return total / max(count, 1)

    def run(self, valid_step=None):
        while self.epoch < self.max_epochs:
            summary = self.train_one_epoch()
            self.logger.info(f"epoch {self.epoch} done: {summary}")
            self.resume_skip = 0
            if valid_step is not None and self.valid_loader is not None:
                cv = self.validate(valid_step)
                self.logger.info(f"epoch {self.epoch} valid loss {cv:.4f}")
                for w in self.writers:
                    w.add_scalar("valid/loss", cv, self.global_step)
                if cv < self.best_valid:
                    self.best_valid = cv
                    self.best_params = self.params
                    self.best_opt_state = self.opt_state
                    self.early_stop = 0
                    self.save_checkpoint("best")
                else:
                    self.early_stop += 1
                    if self.early_stop >= self.early_stop_limit:
                        self.logger.info("early stopping")
                        break
            else:
                self.best_params = self.params
                self.best_opt_state = self.opt_state
            self.epoch += 1
            self.save_checkpoint("last")
        return self.params
