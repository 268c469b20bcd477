"""Training losses.

Rebuilds trainer_3m_fix/loss/loss_compute.py and loss/balance_loss.py:
CTC loss (optax's native implementation replaces warp-ctc), label
smoothing (KLDiv form, loss_compute.py:149-227), and the MoE router
regularizers (SparseL1Loss + BalanceImportanceLoss,
balance_loss.py:58-126).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from m3asr_tpu.ops.masking import make_pad_mask, make_valid_mask


def ctc_loss(logits: jax.Array, logit_lens: jax.Array,
             targets: jax.Array, target_lens: jax.Array,
             blank_idx: int = 0) -> jax.Array:
    """Mean-over-batch CTC loss (CTCLoss, loss_compute.py:92-112).
    logits: (B, T, V) unnormalized; targets: (B, U) padded with any id.
    """
    logit_pad = make_pad_mask(logit_lens, logits.shape[1]).astype(jnp.float32)
    target_pad = make_pad_mask(target_lens, targets.shape[1]).astype(
        jnp.float32)
    per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad, targets,
                             target_pad, blank_id=blank_idx)
    return jnp.mean(per_seq)


def label_smoothing_loss(logits: jax.Array, targets: jax.Array,
                         padding_idx: int, smoothing: float = 0.1,
                         normalize_length: bool = False) -> jax.Array:
    """KL-div label smoothing loss (LabelSmoothingLoss,
    loss_compute.py:149-227). targets == padding_idx positions ignored;
    denominator = batch (default) or token count."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (V - 1)
    valid = (targets != padding_idx)
    tgt = jnp.where(valid, targets, 0)
    onehot = jax.nn.one_hot(tgt, V, dtype=jnp.float32)
    true_dist = low * (1.0 - onehot) + confidence * onehot
    kl = jnp.sum(true_dist * (jnp.log(true_dist + 1e-38) - logp), axis=-1)
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.sum(valid) if normalize_length else logits.shape[0]
    return jnp.sum(kl) / denom


def ce_loss(logits: jax.Array, targets: jax.Array, padding_idx: int,
            mean_in_frames: bool = False):
    """Frame-level CE with likelihood/hit metrics (CELoss,
    loss_compute.py:57-89). logits: (B, T, V); targets: (B, T) with
    padding_idx at ignored frames. Returns (loss, metrics, counts)."""
    V = logits.shape[-1]
    flat = logits.reshape(-1, V).astype(jnp.float32)
    tgt = targets.reshape(-1)
    valid = tgt != padding_idx
    safe_tgt = jnp.where(valid, tgt, 0)
    logp = jax.nn.log_softmax(flat, axis=-1)
    prob = jnp.exp(logp)
    nll = -jnp.take_along_axis(logp, safe_tgt[:, None], axis=-1)[:, 0]
    loss = jnp.sum(jnp.where(valid, nll, 0.0))
    frames = jnp.sum(valid)
    true_prob = jnp.take_along_axis(prob, safe_tgt[:, None], axis=-1)[:, 0]
    likely = jnp.sum(jnp.where(valid, true_prob, 0.0))
    hit = jnp.sum(valid & (jnp.argmax(prob, axis=-1) == tgt))
    metrics = (loss, likely, hit)
    counts = (frames, frames, frames)
    if mean_in_frames:
        loss = loss / jnp.maximum(frames, 1)
    return loss, metrics, counts


class MoELayerScaleAuxLoss:
    """Aux-loss combiner with dynamic scale annealing
    (MoELayerScaleAuxLoss, loss_compute.py:115-146): scale_i is annealed
    toward 0 as the aux metric approaches its target minimum."""

    def __init__(self, num_aux: int, aux_scale, loss_minimum=None):
        assert len(aux_scale) == num_aux
        if loss_minimum is not None:
            assert len(loss_minimum) == num_aux
        self.max_aux_scale = list(aux_scale)
        self.aux_scale = list(aux_scale)
        self.loss_minimum = loss_minimum

    def adjust_aux_scale(self, aux_metric):
        if self.loss_minimum is None:
            return self.aux_scale
        for i in range(len(aux_metric)):
            delta = (aux_metric[i] - self.loss_minimum[i]) \
                / self.loss_minimum[i] * 3
            self.aux_scale[i] = self.max_aux_scale[i] * min(delta, 1.0)
        return self.aux_scale

    def __call__(self, aux_loss):
        """aux_loss: list over layers of list over aux types of
        (loss_value, loss_metric). Returns (loss, metrics, counts)."""
        num_aux = len(aux_loss[0])
        total = 0.0
        sums = [0.0] * num_aux
        for per_layer in aux_loss:
            for j in range(num_aux):
                val, item = per_layer[j]
                total = total + self.aux_scale[j] * val
                sums[j] += float(item)
        return total, tuple(sums), tuple(1 for _ in range(num_aux))


def gshard_balance_loss(router_probs: jax.Array,
                        expert_mask: jax.Array,
                        num_experts: int) -> jax.Array:
    """GShard auxiliary load-balance loss (balance_loss.py:8-14):
    mean(f_e * p_e) * E^2 where f_e is the dispatch fraction and p_e
    the mean router probability. router_probs/expert_mask: (..., E)."""
    probs = router_probs.reshape(-1, router_probs.shape[-1])
    mask = expert_mask.reshape(-1, expert_mask.shape[-1]).astype(jnp.float32)
    f_mean = jnp.mean(mask, axis=0)
    p_mean = jnp.mean(probs.astype(jnp.float32), axis=0)
    return jnp.mean(f_mean * p_mean) * num_experts * num_experts


def expert_importance_loss(router_probs: jax.Array,
                           num_experts: int) -> jax.Array:
    """balance_loss.py:23-27: E * sum(mean_gate^2)."""
    mean_gate = jnp.mean(
        router_probs.reshape(-1, router_probs.shape[-1]).astype(jnp.float32),
        axis=0)
    return jnp.sum(mean_gate * mean_gate) * num_experts


def balance_metrics(gate_idx: jax.Array, num_experts: int):
    """Per-expert load statistics (fmoe/balance.py metrics):
    coefficient-variation, Lmax/Lmin, Lmax/Lmean of the token counts."""
    c_e = jnp.bincount(gate_idx.reshape(-1), length=num_experts).astype(
        jnp.float32)
    mean = jnp.mean(c_e)
    return {
        "coefficient-variation": jnp.std(c_e) / (mean + 1e-10),
        "Lmax-over-Lmin": (jnp.max(c_e) + 1) / (jnp.min(c_e) + 1),
        "Lmax-over-Lmean": jnp.max(c_e) / (mean + 1e-10),
    }


def router_l1_loss(router_probs: jax.Array,
                   lengths: Optional[jax.Array]) -> jax.Array:
    """SparseL1Loss (balance_loss.py:58-79): mean over tokens of the L2-
    normalized-then-L1 router probability rows (encourages sparsity)."""
    l2 = jnp.sqrt(jnp.sum(router_probs ** 2, axis=-1) + 1e-12)
    l1 = jnp.sum(jnp.abs(router_probs), axis=-1)
    ratio = l1 / l2
    if lengths is not None:
        valid = make_valid_mask(lengths, router_probs.shape[1])
        ratio = jnp.where(valid, ratio, 0.0)
        return jnp.sum(ratio) / jnp.maximum(jnp.sum(valid), 1)
    return jnp.mean(ratio)


def router_importance_loss(router_probs: jax.Array,
                           lengths: Optional[jax.Array]) -> jax.Array:
    """BalanceImportanceLoss (balance_loss.py:82-126): CV^2 of the
    per-expert importance (summed router prob mass)."""
    if lengths is not None:
        valid = make_valid_mask(lengths, router_probs.shape[1])
        router_probs = router_probs * valid[..., None]
    importance = jnp.sum(router_probs, axis=(0, 1))  # (E,)
    mean = jnp.mean(importance)
    var = jnp.var(importance)
    return var / (mean ** 2 + 1e-10)
