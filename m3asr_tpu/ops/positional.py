"""Positional encodings.

Replaces the reference's PE modules (trainer_3m_fix/layer/
positional_encoding.py:18-149) and the RelPositionalEncoding plugin
(plugin/rel_positional_encoding_plugin/rel_positional_encoding_kernel.cu:61-160),
which fuses x*sqrt(d) with slicing pe[:, :T]. On TPU both are trivially
fused by XLA; the PE table is a compile-time constant.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_LEN = 5000  # positional_encoding.py:31


def sinusoid_table(d_model: int, max_len: int = MAX_LEN,
                   dtype=jnp.float32) -> jax.Array:
    """pe[p, 2i] = sin(p * w_i), pe[p, 2i+1] = cos(p * w_i) with
    w_i = exp(-2i * ln(10000)/d) (positional_encoding.py:40-48)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype)


def rel_positional_encoding(pe: jax.Array, x: jax.Array,
                            offset: int = 0) -> Tuple[jax.Array, jax.Array]:
    """x *= sqrt(d); pos_emb = pe[offset:offset+T] (the non-streaming
    plugin mode slices pe[:T] — rel_positional_encoding_kernel.cu:61-70).
    Returns (scaled x (B,T,D), pos_emb (T,D))."""
    d = x.shape[-1]
    T = x.shape[1]
    xscale = jnp.asarray(math.sqrt(d), x.dtype)
    pos_emb = jax.lax.dynamic_slice_in_dim(pe, offset, T, axis=0)
    return x * xscale, pos_emb.astype(x.dtype)


def abs_positional_encoding(pe: jax.Array, x: jax.Array,
                            offset: int = 0) -> Tuple[jax.Array, jax.Array]:
    """x = x*sqrt(d) + pe[offset:offset+T] (PositionalEncoding.forward,
    positional_encoding.py:50-67)."""
    d = x.shape[-1]
    T = x.shape[1]
    xscale = jnp.asarray(math.sqrt(d), x.dtype)
    pos_emb = jax.lax.dynamic_slice_in_dim(pe, offset, T, axis=0)
    pos_emb = pos_emb.astype(x.dtype)
    return x * xscale + pos_emb[None], pos_emb
