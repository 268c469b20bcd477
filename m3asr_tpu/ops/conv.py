"""Conformer convolution module.

TPU-native rebuild of trainer_3m_fix/layer/convolution.py:18-167 and the
Glu/MaskedFill plugins. Layout is (B, T, C) feature-last throughout — no
transposes, no 3d->4d shuffles; the pointwise convs are plain matmuls on
the MXU and the depthwise conv is a lax 1-D conv that XLA maps to the
VPU.

Pipeline (convolution.py:83-167):
    masked_fill(0) -> [causal left-pad] -> pointwise_conv1 (C -> 2C)
    -> GLU -> depthwise conv (k=15, groups=C) -> BN(folded)/LN -> SiLU
    -> pointwise_conv2 -> masked_fill(0)

BatchNorm is folded to scale/shift at checkpoint-conversion time
(inference mode), exactly like the reference folds it into a TRT scale
layer (torch_network_helper.py:113-176).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from m3asr_tpu.ops.common import layer_norm, linear, scale_shift, swish
from m3asr_tpu.ops.masking import masked_fill


def glu(x: jax.Array, axis: int = -1) -> jax.Array:
    """GLU: split in half along axis, a * sigmoid(b)
    (plugin/glu_plugin/glu_kernel.cu:25-62)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def depthwise_conv1d(p, x: jax.Array, lorder: int = 0) -> jax.Array:
    """Depthwise 1-D conv over time. x: (B, T, C); kernel: (K, C).

    Non-causal (lorder=0): SAME padding (K-1)//2 each side, matching
    nn.Conv1d(padding=(K-1)//2, groups=C). Causal: left-pad K-1 zeros
    (convolution.py:47-54,121-125).
    """
    K, C = p["kernel"].shape
    if lorder > 0:
        pad = (0, 0)  # input already left-padded (before pointwise_conv1)
    else:
        pad = ((K - 1) // 2, (K - 1) // 2)
    from m3asr_tpu.parallel.mesh import act_sharding_active
    if act_sharding_active():
        # Sequence-parallel training: jax 0.9.0's SPMD partitioner
        # miscomputes conv_general_dilated kernel gradients when a
        # time-sharding reaches the conv (even with both operands
        # pinned replicated, in full-model programs). A K-term
        # shift-and-add is the same VPU work and its transpose is all
        # pads/slices, which partition correctly.
        kern = p["kernel"].astype(x.dtype)
        xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
        T_out = x.shape[1] + pad[0] + pad[1] - K + 1
        y = xp[:, 0:T_out, :] * kern[0]
        for k in range(1, K):
            y = y + xp[:, k:k + T_out, :] * kern[k]
    else:
        # lax depthwise: kernel (K, 1, C), feature_group_count=C ('WIO')
        kern = p["kernel"].astype(x.dtype)[:, None, :]
        y = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1,), padding=[pad],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=C)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_module(p, x: jax.Array, lengths: Optional[jax.Array],
                use_layer_norm: bool = False, lorder: int = 0) -> jax.Array:
    """Full conformer conv module. x: (B, T, C) -> (B, T, C)."""
    if lengths is not None:
        x = masked_fill(x, lengths, 0.0)  # MaskedFillPluginDynamic
    if lorder > 0:
        # causal: left-pad BEFORE pointwise_conv1 so padded frames carry
        # glu(pw1-bias), matching convolution.py:121-125 pad placement
        x = jnp.pad(x, ((0, 0), (lorder, 0), (0, 0)))
    x = linear(p["pointwise_conv1"], x)   # (B, T, 2C) 1x1 conv == matmul
    x = glu(x, axis=-1)
    if lengths is not None and lorder == 0:
        # Padding invariance: after pointwise_conv1, padded positions
        # hold glu(pw1_bias) != 0 and the depthwise conv's receptive
        # field would read them — so a bucket-padded batch would differ
        # from an exact-length run. The reference (convolution.py:
        # masked_fill only at entry/exit) has the same leak for
        # shorter-than-batch-max utterances; masking here makes every
        # utterance behave like the reference's exact-length case
        # (true zeros beyond the valid region, as SAME-padding gives).
        x = masked_fill(x, lengths, 0.0)
    # sequence parallelism: the depthwise conv mixes positions, so it
    # runs on the gathered time axis — pinned on BOTH sides so the
    # partitioner cannot propagate a time-sharding into the conv's
    # operands or cotangents (jax 0.9.0 miscomputes conv kernel grads
    # under time sharding; see parallel.mesh.constrain_act_nosp). The
    # module exit re-applies the ambient sp sharding.
    from m3asr_tpu.parallel.mesh import constrain_act, constrain_act_nosp
    x = constrain_act_nosp(x)
    x = depthwise_conv1d(p["depthwise_conv"], x, lorder=lorder)
    x = constrain_act_nosp(x)
    if use_layer_norm:
        x = layer_norm(p["norm"], x)
    else:
        x = scale_shift(p["norm"], x)     # folded BatchNorm1d
    x = swish(x)
    x = linear(p["pointwise_conv2"], x)
    if lengths is not None:
        x = masked_fill(x, lengths, 0.0)
    return constrain_act(x)


def init_conv_module(key, channels: int, kernel_size: int = 15,
                     dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    bound1 = 1.0 / np.sqrt(channels)  # torch Conv1d k=1 fan_in = C
    p = {
        "pointwise_conv1": {
            "kernel": jax.random.uniform(ks[0], (channels, 2 * channels),
                                         dtype, -bound1, bound1),
            "bias": jnp.zeros((2 * channels,), dtype),
        },
        "depthwise_conv": {
            # torch depthwise fan_in = K (in_ch/groups * K)
            "kernel": jax.random.uniform(
                ks[1], (kernel_size, channels), dtype,
                -1.0 / np.sqrt(kernel_size), 1.0 / np.sqrt(kernel_size)),
            "bias": jnp.zeros((channels,), dtype),
        },
        "norm": {"scale": jnp.ones((channels,), dtype),
                 "bias": jnp.zeros((channels,), dtype)},
        "pointwise_conv2": {
            "kernel": jax.random.uniform(ks[2], (channels, channels),
                                         dtype, -bound1, bound1),
            "bias": jnp.zeros((channels,), dtype),
        },
    }
    return p
