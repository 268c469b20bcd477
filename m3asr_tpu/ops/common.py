"""Elementwise / dense primitives shared across the model zoo.

These replace the reference's torch_network_helper add* layer emitters
(TRTAPI++/python/trt_helper/torch_network_helper.py) and the LayerNorm
CUDA plugin (plugin/layer_norm_plugin/layer_norm_kernel.cu:33-162).
Everything is plain jnp so XLA fuses it into surrounding matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# LayerNorm epsilon used throughout the reference model zoo
# (e.g. trainer_3m_fix/layer/transformer.py:161-172: eps=1e-12).
LN_EPS = 1e-12


def linear(p, x: jax.Array) -> jax.Array:
    """y = x @ kernel + bias. kernel is stored (in, out) — the transpose
    of torch's nn.Linear weight, pre-transposed at conversion time like
    the reference does at TRT build time
    (torch_network_helper.py addLinear:573-614).

    kernel_q/kernel_scale (int8 + per-output-column f32, from
    ops.quant.quantize_dense_params) replaces kernel on dense-quant
    engines: the convert*scale dequant fuses into the dot's weight
    operand read, so HBM moves the int8 bytes."""
    kq = p.get("kernel_q")
    if kq is not None:
        w = kq.astype(x.dtype) * p["kernel_scale"].astype(x.dtype)
    else:
        w = p["kernel"].astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def layer_norm(p, x: jax.Array, eps: float = LN_EPS) -> jax.Array:
    """LayerNorm over the last dim with weights as data (mirrors the
    reference plugin's one-pass Var(X)=E(X^2)-E(X)^2 design, which XLA
    performs natively when fusing)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def scale_shift(p, x: jax.Array) -> jax.Array:
    """Per-channel affine — the folded inference form of BatchNorm1d
    (reference folds BN into a TRT scale layer,
    torch_network_helper.py:113-176)."""
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def swish(x: jax.Array) -> jax.Array:
    """Swish/SiLU = x * sigmoid(x) (utils/common.py:26-30; fused into the
    FMoE plugin's BiasSiluKernel, fmoe_expert_kernel.cu:130-160)."""
    return x * jax.nn.sigmoid(x)


_ACTIVATIONS = {
    "hardtanh": jax.nn.hard_tanh,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "swish": swish,
    "silu": swish,
    "gelu": jax.nn.gelu,
}


def get_activation(name: str):
    """Activation registry (utils/common.py:33-44)."""
    return _ACTIVATIONS[name]


def group_norm(p, x: jax.Array, num_groups: int,
               eps: float = 1e-5) -> jax.Array:
    """GroupNorm over the last dim (the reference's unfinished
    incomplete_plugin/group_norm)."""
    *lead, C = x.shape
    assert C % num_groups == 0
    xg = x.reshape(*lead, num_groups, C // num_groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=-1, keepdims=True)
    var = jnp.var(xg, axis=-1, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(*lead, C)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def mask_batch_norm(p, x: jax.Array, valid_mask: jax.Array,
                    train: bool = False, eps: float = 1e-8,
                    momentum: float = 0.99):
    """Masked-statistics BatchNorm (layer/norm.py MaskBatchNorm:6-77):
    statistics over VALID frames only. x: (N, D) flat frames;
    valid_mask: (N,) bool. Returns (y, new_running_stats).

    Train mode computes masked batch stats and updates the running
    (mean, var) with the reference's momentum convention
    (new = old * momentum + sample * (1 - momentum)); eval mode uses
    the running stats. p: {"scale","bias","running_mean","running_var"}.
    """
    xf = x.astype(jnp.float32)
    m = valid_mask.astype(jnp.float32)[:, None]
    if train:
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(xf * m, axis=0, keepdims=True) / n
        # torch.var default: unbiased (n-1 denominator)
        var = jnp.sum(jnp.square(xf - mean) * m, axis=0, keepdims=True) \
            / jnp.maximum(n - 1.0, 1.0)
        new_mean = p["running_mean"] * momentum + mean[0] * (1 - momentum)
        new_var = p["running_var"] * momentum + var[0] * (1 - momentum)
    else:
        mean = p["running_mean"][None].astype(jnp.float32)
        var = p["running_var"][None].astype(jnp.float32)
        new_mean, new_var = p["running_mean"], p["running_var"]
    y = (xf - mean) / jnp.sqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype), {"running_mean": new_mean,
                               "running_var": new_var}


def varlen_instance_norm_2d(p, x: jax.Array, lengths: jax.Array,
                            eps: float = 1e-8,
                            affine: bool = False) -> jax.Array:
    """Variable-length InstanceNorm2d (layer/norm.py:80-104):
    per-utterance statistics over (channel, valid-time, feat).
    x: (B, C, T, F); lengths: (B,)."""
    from m3asr_tpu.ops.masking import make_valid_mask
    B, C, T, F = x.shape
    valid = make_valid_mask(lengths, T).astype(jnp.float32)  # (B, T)
    m = valid[:, None, :, None]
    num_bins = (lengths.astype(jnp.float32) * F).reshape(B, 1, 1, 1)
    xm = x.astype(jnp.float32) * m
    mean = jnp.sum(xm, axis=(1, 2), keepdims=True) / num_bins
    var = jnp.sum(((xm - mean) ** 2) * m, axis=(1, 2),
                  keepdims=True) / num_bins
    y = (xm - mean) / jnp.sqrt(var + eps)
    if affine:
        y = y * p["scale"].reshape(1, -1, 1, 1) + \
            p["bias"].reshape(1, -1, 1, 1)
    return y.astype(x.dtype)


def dump_tensor(x: jax.Array, name: str = "") -> jax.Array:
    """Debug identity that prints the tensor — TPU equivalent of
    DumpTensorPluginDynamic (plugin/dump_tensor_plugin/)."""
    jax.debug.print(name + " shape={s} sum={v}\n{x}",
                    s=x.shape, v=jnp.sum(x), x=x)
    return x


def init_linear(key, d_in: int, d_out: int, bias: bool = True,
                dtype=jnp.float32):
    """Kaiming-uniform init matching torch.nn.Linear defaults, so
    synthetic-weight tests behave like reference checkpoints."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    p = {"kernel": jax.random.uniform(k1, (d_in, d_out), dtype,
                                      -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (d_out,), dtype, -bound, bound)
    return p


def init_layer_norm(d: int, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
