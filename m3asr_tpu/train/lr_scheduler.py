"""Learning-rate schedules + optimizer factory.

Rebuilds trainer_3m_fix/utils/lr_scheduler.py:18-314 on optax. The
seven reference schedule families keep their names and semantics:

  constant        hold lr (floored at min_lr)
  period_adjust   multiply by lr_decay every decay_period steps
  cv_adjust       multiply by lr_decay after lr_decay_count validations
                  without improvement (stateful; step = validation count)
  warmup_linear   linear up over warmup*total, linear down to total
  warmup_cosine   linear up, cosine down (cycle 0.5)
  warmup_plateau  linear up to t_step, hold to d_step, exponential decay
                  to 1% at f_step
  warmup_noam     lr * warmup^0.5 * min(step^-0.5, step*warmup^-1.5)

Each returns an optax schedule step->lr; `build_optimizer` combines one
with grad clipping, Adam/AdamW/SGD, per-path no-decay masks (the
reference's name_nodecay list), and a `half_learning_rate` scale knob
(used by divergence recovery, bk/..._hier.py:764-774) implemented as a
mutable scale box read inside the schedule.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def lr_scale_transform() -> optax.GradientTransformation:
    """Runtime-adjustable LR multiplier (the reference's
    half_learning_rate, bk/..._hier.py:764-774). The scale lives in the
    optimizer *state* (inject_hyperparams), so halving it between steps
    needs no retrace: mutate with `set_lr_scale(opt_state, value)`."""
    return optax.inject_hyperparams(
        lambda lr_scale: optax.scale(lr_scale))(lr_scale=1.0)


def _map_hyperparam(opt_state, name: str, fn):
    """Rebuild opt_state with hyperparams[name] = fn(old) in every
    InjectHyperparamsState found (optax states are NamedTuples)."""
    if hasattr(opt_state, "hyperparams") and name in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        hp[name] = fn(hp[name])
        return opt_state._replace(hyperparams=hp)
    if hasattr(opt_state, "_fields"):
        return type(opt_state)(*[_map_hyperparam(getattr(opt_state, f),
                                                 name, fn)
                                 for f in opt_state._fields])
    if isinstance(opt_state, tuple):
        return tuple(_map_hyperparam(s, name, fn) for s in opt_state)
    return opt_state


def set_lr_scale(opt_state, value: float):
    import jax.numpy as _jnp
    # keep the leaf's shape: in BMUF mode the opt_state is stacked over
    # a leading dp axis and every leaf must keep it for the vmapped step
    return _map_hyperparam(
        opt_state, "lr_scale",
        lambda old: _jnp.full(_jnp.shape(old), value, _jnp.float32))


def get_lr_scale(opt_state) -> float:
    import numpy as _np
    found = []
    # reshape(-1)[0]: BMUF-mode opt_states stack the hyperparam over a
    # leading dp axis (all replicas share one value)
    _map_hyperparam(
        opt_state, "lr_scale",
        lambda old: (found.append(float(_np.asarray(old).reshape(-1)[0])),
                     old)[1])
    return found[0] if found else 1.0


def constant_schedule(lr: float, min_lr: float = 1e-8, **_):
    return lambda step: jnp.maximum(lr, min_lr)


def period_schedule(lr: float, decay_period: int = 10000,
                    lr_decay: float = 0.8, min_lr: float = 1e-8, **_):
    def fn(step):
        n = step // decay_period
        return jnp.maximum(lr * lr_decay ** n, min_lr)
    return fn


def cv_schedule(lr: float, lr_decay: float = 0.5,
                lr_decay_count: int = 10, min_lr: float = 1e-8, **_):
    """step counts validations-without-improvement resets are the
    trainer's job (CVScheduleWrapper.reset_step)."""
    def fn(step):
        n = step // lr_decay_count
        return jnp.maximum(lr * lr_decay ** n, min_lr)
    return fn


def warmup_linear_schedule(lr: float, warmup: float = 0.02,
                           total_steps: int = 100000,
                           min_lr: float = 1e-8, **_):
    w = round(total_steps * warmup)

    def fn(step):
        up = lr * step / max(w, 1)
        down = lr * (step - total_steps) / (w - total_steps)
        return jnp.maximum(jnp.where(step <= w, up, down), min_lr)
    return fn


def warmup_cosine_schedule(lr: float, warmup: float = 0.02,
                           total_steps: int = 100000,
                           min_lr: float = 1e-8, **_):
    w = round(total_steps * warmup)

    def fn(step):
        up = lr * step / max(w, 1)
        progress = (step - w) / max(total_steps - w, 1)
        down = lr * 0.5 * (1 + jnp.cos(math.pi * progress))
        return jnp.maximum(jnp.where(step <= w, up, down), min_lr)
    return fn


def warmup_plateau_schedule(lr: float, t_step: int = 1000,
                            d_step: int = 20000, f_step: int = 80000,
                            min_lr: float = 1e-8, **_):
    assert t_step < d_step < f_step
    decay = (0.01) ** (1.0 / (f_step - d_step))

    def fn(step):
        up = lr * step / t_step
        expo = lr * decay ** (jnp.minimum(step, f_step) - d_step)
        out = jnp.where(step <= t_step, up,
                        jnp.where(step <= d_step, lr, expo))
        return jnp.maximum(out, min_lr)
    return fn


def warmup_noam_schedule(lr: float, warmup_steps: int = 25000,
                         min_lr: float = 1e-8, **_):
    def fn(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        out = lr * warmup_steps ** 0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5)
        return jnp.maximum(out, min_lr)
    return fn


SUPPORTED_SCHEDULER: Dict[str, Callable] = {
    "constant": constant_schedule,
    "cv_adjust": cv_schedule,
    "period_adjust": period_schedule,
    "warmup_linear": warmup_linear_schedule,
    "warmup_cosine": warmup_cosine_schedule,
    "warmup_plateau": warmup_plateau_schedule,
    "warmup_noam": warmup_noam_schedule,
}

OPTIMS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "adadelta": optax.adadelta,
}


def nodecay_mask(params, name_nodecay: Sequence[str]):
    """True where weight decay applies (path does NOT contain any of
    the no-decay substrings) — the reference's name_nodecay param
    groups (lr_scheduler.py:33-43)."""

    def decide(path, _):
        keys = "/".join(str(getattr(k, "key", getattr(k, "idx", "")))
                        for k in path)
        return not any(nd in keys for nd in name_nodecay)

    return jax.tree_util.tree_map_with_path(decide, params)


def build_optimizer(schedule_type: str, schedule_conf: Optional[dict],
                    lr: float, optim_type: str = "adam",
                    optim_conf: Optional[dict] = None,
                    max_grad_norm: float = -1.0,
                    weight_decay: float = 0.0,
                    name_nodecay: Optional[Sequence[str]] = None,
                    params=None) -> optax.GradientTransformation:
    """Reference build_optimizer (lr_scheduler.py:306-314) on optax."""
    if schedule_type not in SUPPORTED_SCHEDULER:
        raise NotImplementedError(
            f"Not supported schedule type: {schedule_type}")
    if optim_type not in OPTIMS:
        raise NotImplementedError(f"Not supported optim type: {optim_type}")
    schedule = SUPPORTED_SCHEDULER[schedule_type](lr, **(schedule_conf or {}))
    optim_conf = dict(optim_conf or {})

    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay > 0 and optim_type in ("adam", "adamw"):
        mask = (nodecay_mask(params, name_nodecay)
                if name_nodecay and params is not None else None)
        chain.append(optax.adamw(schedule, weight_decay=weight_decay,
                                 mask=mask, **optim_conf))
    else:
        chain.append(OPTIMS[optim_type](schedule, **optim_conf))
    chain.append(lr_scale_transform())
    return optax.chain(*chain)
