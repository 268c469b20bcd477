"""Training step for the MoE conformer (CTC objective).

The TPU-native successor of the reference trainers
(trainer_3m_fix/bk/train_conformer_aed_fmoe_localComm_bmuf_domain_acc_hier.py):
instead of DDP/BMUF process groups + fmoe_cuda all-to-alls, one jitted
step over a (dp, ep) mesh — gradients psum over 'dp', expert weights
and compute sharded over 'ep', all inserted by GSPMD from sharding
annotations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from m3asr_tpu.config import ModelConfig, MOE_HIER_PROTOS
from m3asr_tpu.models import conformer, moe_conformer
from m3asr_tpu.train import losses


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    warmup_steps: int = 25000
    weight_decay: float = 0.0
    grad_clip: float = 5.0
    ctc_weight: float = 1.0
    embed_ctc_weight: float = 0.0     # aux CTC on the embed encoder head
    router_l1_weight: float = 0.0
    router_importance_weight: float = 0.0
    blank_idx: int = 0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """WarmupNoam-style schedule + Adam (utils/lr_scheduler.py families;
    Noam = the conformer default)."""
    def noam(step):
        step = jnp.maximum(step, 1)
        return cfg.learning_rate * jnp.minimum(
            step ** -0.5, step * cfg.warmup_steps ** -1.5) * (
                cfg.warmup_steps ** 0.5)

    chain = [optax.clip_by_global_norm(cfg.grad_clip)]
    if cfg.weight_decay > 0:
        chain.append(optax.adamw(noam, weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(noam))
    return optax.chain(*chain)


def loss_fn(params, model_cfg: ModelConfig, tcfg: TrainConfig,
            feat, feat_len, targets, target_lens):
    is_moe = model_cfg.nnet_proto in MOE_HIER_PROTOS
    metrics = {}
    if is_moe:
        out, out_len, embed_out = moe_conformer.forward(
            params, model_cfg.encoder_conf, feat, feat_len,
            output_embed=True, moe_impl="dense")
    else:
        out, out_len = conformer.forward(params, model_cfg.encoder_conf,
                                         feat, feat_len)
        embed_out = None
    loss = tcfg.ctc_weight * losses.ctc_loss(
        out, out_len, targets, target_lens, tcfg.blank_idx)
    metrics["ctc_loss"] = loss
    if embed_out is not None and tcfg.embed_ctc_weight > 0:
        e_loss = losses.ctc_loss(embed_out, out_len, targets, target_lens,
                                 tcfg.blank_idx)
        metrics["embed_ctc_loss"] = e_loss
        loss = loss + tcfg.embed_ctc_weight * e_loss
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(model_cfg: ModelConfig, tcfg: TrainConfig,
                    optimizer: optax.GradientTransformation):
    """Returns step(params, opt_state, batch) -> (params, opt_state,
    metrics). jit/shard externally (see parallel.mesh +
    __graft_entry__.dryrun_multichip)."""

    def step(params, opt_state, feat, feat_len, targets, target_lens):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, model_cfg, tcfg, feat, feat_len,
                              targets, target_lens), has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return step
