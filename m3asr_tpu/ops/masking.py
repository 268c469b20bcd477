"""Length / padding mask utilities.

TPU-native replacements for the reference's mask machinery:

* make_pad_mask            — trainer_3m_fix/utils/mask.py:148-174
* masked_fill              — MaskedFillPluginDynamic
                             (plugin/masked_fill_plugin/masked_fill_kernel.cu:26-74)
* conv_subsampled_length   — MaskConv2dSamplePluginDynamic
                             (plugin/mask_conv2d_sample_plugin/mask_conv2d_sample_kernel.cu:25-50)
* subsequent_mask / chunk masks — utils/mask.py:7-145

All masks are computed from int32 lengths with broadcasted iota — no
boolean mask tensors cross the host/device boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True at PADDED positions (matches utils/mask.py:148-174).
    lengths: int32 (B,). Returns bool (B, max_len)."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos >= lengths[:, None]


def make_valid_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True at VALID positions. (B, max_len)."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def masked_fill(x: jax.Array, lengths: jax.Array, fill: float = 0.0,
                time_axis: int = 1) -> jax.Array:
    """Fill positions >= length with `fill` along `time_axis`.
    x: (B, ..., T, ...) with batch at axis 0."""
    T = x.shape[time_axis]
    valid = make_valid_mask(lengths, T)  # (B, T)
    shape = [1] * x.ndim
    shape[0] = x.shape[0]
    shape[time_axis] = T
    valid = valid.reshape(shape)
    return jnp.where(valid, x, jnp.asarray(fill, x.dtype))


def conv_subsampled_length(lengths: jax.Array, left_padding: int = 2,
                           stride: int = 2) -> jax.Array:
    """Output length after a valid strided conv:
    out = (len - left_padding - 1) // stride + 1
    (mask_conv2d_sample_kernel.cu:25-50; applied twice for
    Conv2dSubsampling4)."""
    return (lengths - left_padding - 1) // stride + 1


def subsampling4_length(lengths: jax.Array) -> jax.Array:
    """Length arithmetic of Conv2dSubsampling4 (two k=3 s=2 convs)."""
    l1 = conv_subsampled_length(lengths, 2, 2)
    return conv_subsampled_length(l1, 2, 2)


def subsampling6_length(lengths: jax.Array) -> jax.Array:
    """Conv2dSubsampling6: k=3 s=2 then k=5 s=3 (subsampling.py:148-188)."""
    l1 = conv_subsampled_length(lengths, 2, 2)
    return conv_subsampled_length(l1, 4, 3)


def subsampling8_length(lengths: jax.Array) -> jax.Array:
    """Conv2dSubsampling8: three k=3 s=2 convs (subsampling.py:189-232)."""
    l1 = conv_subsampled_length(lengths, 2, 2)
    l2 = conv_subsampled_length(l1, 2, 2)
    return conv_subsampled_length(l2, 2, 2)


def subsequent_mask(size: int, dtype=jnp.bool_) -> jax.Array:
    """Lower-triangular causal mask, True where attention is allowed
    (utils/mask.py:7-39). (size, size)."""
    i = jnp.arange(size)
    return (i[None, :] <= i[:, None]).astype(dtype)


def subsequent_chunk_mask(size: int, chunk_size: int,
                          num_left_chunks: int = -1) -> jax.Array:
    """Chunked streaming mask (utils/mask.py:42-79). True = attend."""
    pos = jnp.arange(size)
    chunk = pos // chunk_size
    ending = jnp.minimum((chunk[:, None] + 1) * chunk_size, size)
    allowed = pos[None, :] < ending
    if num_left_chunks >= 0:
        start = jnp.maximum((chunk[:, None] - num_left_chunks) * chunk_size, 0)
        allowed = allowed & (pos[None, :] >= start)
    return allowed
