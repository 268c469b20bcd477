"""Training losses.

Rebuilds trainer_3m_fix/loss/loss_compute.py and loss/balance_loss.py:
CTC loss (optax's native implementation replaces warp-ctc), label
smoothing (KLDiv form, loss_compute.py:149-227), and the MoE router
regularizers (SparseL1Loss + BalanceImportanceLoss,
balance_loss.py:58-126).
"""

from __future__ import annotations

from typing import Optional, Tuple

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
