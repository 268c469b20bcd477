"""Input subsampling front-ends.

TPU-native rebuild of trainer_3m_fix/layer/subsampling.py:16-232.
Feature layout: inputs (B, T, F); convs run NHWC (T = H, F = W, the
in_ch "channel split" of the reference's trans_3d_to_4d becomes the
NHWC channel axis). Valid (no) padding, matching nn.Conv2d(k, s) with
padding=0.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from m3asr_tpu.ops.common import init_linear, layer_norm, linear
from m3asr_tpu.ops import masking
from m3asr_tpu.parallel.mesh import constrain_act_nosp


def _conv2d(p, x: jax.Array, stride: Tuple[int, int]) -> jax.Array:
    """x: (B, H, W, Cin); kernel: (kh, kw, Cin, Cout) [HWIO]."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride,
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype)


def _conv2d_im2col(p, x: jax.Array, stride: Tuple[int, int]) -> jax.Array:
    """Same conv as _conv2d, restructured as ONE MXU matmul: gather the
    kh*kw strided patch slices, concat on the channel axis, dot with
    the (kh*kw*Cin, Cout) flattened kernel. Patch order (i, j, cin)
    matches the HWIO kernel reshape, so weights are shared verbatim.

    MEASURED NEGATIVE on v5e (round-5, scripts/bench_subsample.py):
    the patch-concat materialization costs more than the deeper dot
    contraction buys — standalone 2048-frame stack bf16: XLA conv
    0.375 ms vs im2col-on-conv1 0.78 vs im2col-both 2.61. Kept (with
    exact CPU parity coverage) as the recorded non-lever."""
    kh, kw, cin, cout = p["kernel"].shape
    B, H, W, C = x.shape
    sh, sw = stride
    Ho = (H - kh) // sh + 1
    Wo = (W - kw) // sw + 1
    cols = [x[:, i:i + (Ho - 1) * sh + 1:sh,
              j:j + (Wo - 1) * sw + 1:sw, :]
            for i in range(kh) for j in range(kw)]
    patches = jnp.concatenate(cols, axis=-1)   # (B, Ho, Wo, kh*kw*Cin)
    w = p["kernel"].astype(x.dtype).reshape(kh * kw * cin, cout)
    y = jnp.dot(patches, w, preferred_element_type=x.dtype)
    return y + p["bias"].astype(x.dtype)


def _to_4d(x: jax.Array, in_ch: int) -> jax.Array:
    """(B, T, F) -> (B, T, F//in_ch, in_ch): the reference's channel
    split (subsampling.py:23-36) mapped to NHWC."""
    B, T, F = x.shape
    # reference: view(b, t, in_ch, f//in_ch) then channel-first; NHWC
    # wants channel-last, so keep the same grouping with in_ch leading
    # per-frame then move to the channel axis.
    return x.reshape(B, T, in_ch, F // in_ch).transpose(0, 1, 3, 2)


def conv2d_subsampling4(p, x: jax.Array, lengths: Optional[jax.Array],
                        in_ch: int = 1, impl: str = "auto"):
    """Two (k=3, s=2) convs + ReLU, then per-frame flatten + Linear
    (subsampling.py:77-145). Returns (y (B, T//4-ish, odim), out_lengths).

    impl: 'auto' == 'conv' (the XLA conv lowering) — MEASURED WINNER
    on v5e at every shape tried (2048-frame standalone stack bf16:
    conv 0.375 ms vs im2col-on-conv1 0.78 vs im2col-both 2.61,
    scripts/bench_subsample.py round-5 — the patch-concat
    materialization costs more than the deeper dot contraction buys;
    recorded so nobody re-tries it). 'im2col'/'im2col1' force the
    matmul form for both / for conv1 only."""
    x4 = _to_4d(constrain_act_nosp(x), in_ch)
    if impl == "auto":
        impl = "conv"
    c0 = _conv2d_im2col if impl == "im2col" else _conv2d
    c1 = _conv2d if impl == "conv" else _conv2d_im2col
    h = jax.nn.relu(c0(p["conv0"], x4, (2, 2)))
    h = jax.nn.relu(c1(p["conv1"], h, (2, 2)))
    # (B, T', F', C) -> (B, T', C*F'): torch flattens (C, F) with C
    # outermost (x.transpose(1,2).view(b,t,c*f)); NHWC gives (F', C), so
    # transpose the last two axes before flattening.
    B, Tp, Fp, C = h.shape
    h = h.transpose(0, 1, 3, 2).reshape(B, Tp, C * Fp)
    y = constrain_act_nosp(linear(p["out"], h))
    out_len = None if lengths is None else masking.subsampling4_length(lengths)
    return y, out_len


def conv2d_subsampling6(p, x: jax.Array, lengths: Optional[jax.Array],
                        in_ch: int = 1):
    """(k=3,s=2) then (k=5,s=3) (subsampling.py:148-188)."""
    x4 = _to_4d(constrain_act_nosp(x), in_ch)
    h = jax.nn.relu(_conv2d(p["conv0"], x4, (2, 2)))
    h = jax.nn.relu(_conv2d(p["conv1"], h, (3, 3)))
    B, Tp, Fp, C = h.shape
    h = h.transpose(0, 1, 3, 2).reshape(B, Tp, C * Fp)
    y = constrain_act_nosp(linear(p["out"], h))
    out_len = None if lengths is None else masking.subsampling6_length(lengths)
    return y, out_len


def conv2d_subsampling8(p, x: jax.Array, lengths: Optional[jax.Array],
                        in_ch: int = 1):
    """Three (k=3, s=2) convs (subsampling.py:189-232)."""
    x4 = _to_4d(constrain_act_nosp(x), in_ch)
    h = jax.nn.relu(_conv2d(p["conv0"], x4, (2, 2)))
    h = jax.nn.relu(_conv2d(p["conv1"], h, (2, 2)))
    h = jax.nn.relu(_conv2d(p["conv2"], h, (2, 2)))
    B, Tp, Fp, C = h.shape
    h = h.transpose(0, 1, 3, 2).reshape(B, Tp, C * Fp)
    y = constrain_act_nosp(linear(p["out"], h))
    out_len = None if lengths is None else masking.subsampling8_length(lengths)
    return y, out_len


def linear_no_subsampling(p, x: jax.Array, lengths: Optional[jax.Array]):
    """Linear + LayerNorm front-end (subsampling.py:39-75)."""
    y = layer_norm(p["norm"], linear(p["out"], x))
    return y, lengths


def _init_conv2d(key, kh, kw, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin * kh * kw)
    return {"kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype,
                                         -bound, bound),
            "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound)}


def init_conv2d_subsampling4(key, idim: int, odim: int, in_ch: int = 1,
                             dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    f_out = ((idim - 1) // 2 - 1) // 2
    return {
        "conv0": _init_conv2d(ks[0], 3, 3, in_ch, odim, dtype),
        "conv1": _init_conv2d(ks[1], 3, 3, odim, odim, dtype),
        "out": init_linear(ks[2], odim * f_out, odim, dtype=dtype),
    }


def init_conv2d_subsampling6(key, idim: int, odim: int, in_ch: int = 1,
                             dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    f_out = ((idim - 1) // 2 - 2) // 3
    return {
        "conv0": _init_conv2d(ks[0], 3, 3, in_ch, odim, dtype),
        "conv1": _init_conv2d(ks[1], 5, 5, odim, odim, dtype),
        "out": init_linear(ks[2], odim * f_out, odim, dtype=dtype),
    }


def init_conv2d_subsampling8(key, idim: int, odim: int, in_ch: int = 1,
                             dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    f_out = (((idim - 1) // 2 - 1) // 2 - 1) // 2
    return {
        "conv0": _init_conv2d(ks[0], 3, 3, in_ch, odim, dtype),
        "conv1": _init_conv2d(ks[1], 3, 3, odim, odim, dtype),
        "conv2": _init_conv2d(ks[2], 3, 3, odim, odim, dtype),
        "out": init_linear(ks[3], odim * f_out, odim, dtype=dtype),
    }
