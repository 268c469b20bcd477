"""Subsampling 6/8 and multi-channel (in_ch>1) parity."""

import numpy as np
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.ops import masking, subsampling

from test_op_parity import allclose


def test_subsampling6_parity():
    torch.manual_seed(100)
    m = G.randomize_(G.Conv2dSubsampling6(20, 16), seed=101)
    x = torch.randn(2, 47, 20, generator=torch.Generator().manual_seed(102))
    with torch.no_grad():
        y_t = m(x)
    p = ckpt._to_jax(ckpt.convert_subsampling(StateDict(m.state_dict()),
                                              "conv2d6"))
    y_j, out_len = subsampling.conv2d_subsampling6(p, jnp.asarray(x.numpy()),
                                                   jnp.array([47, 47]))
    assert y_j.shape[1] == y_t.shape[1] == int(out_len[0])
    allclose(np.asarray(y_j), y_t.numpy())


def test_subsampling8_parity():
    torch.manual_seed(103)
    m = G.randomize_(G.Conv2dSubsampling8(20, 16), seed=104)
    x = torch.randn(1, 61, 20, generator=torch.Generator().manual_seed(105))
    with torch.no_grad():
        y_t = m(x)
    p = ckpt._to_jax(ckpt.convert_subsampling(StateDict(m.state_dict()),
                                              "conv2d8"))
    y_j, out_len = subsampling.conv2d_subsampling8(p, jnp.asarray(x.numpy()),
                                                   jnp.array([61]))
    assert y_j.shape[1] == y_t.shape[1] == int(out_len[0])
    allclose(np.asarray(y_j), y_t.numpy())


def test_subsampling4_multichannel_parity():
    """conv_subsample_in_ch=2: the feature dim splits into 2 conv
    channels (trans_3d_to_4d, subsampling.py:23-36)."""
    torch.manual_seed(106)
    m = G.randomize_(G.Conv2dSubsampling4(20, 16, in_ch=2), seed=107)
    x = torch.randn(2, 31, 40, generator=torch.Generator().manual_seed(108))
    with torch.no_grad():
        y_t, _ = m(x, torch.tensor([31, 31]))
    p = ckpt._to_jax(ckpt.convert_subsampling(StateDict(m.state_dict()),
                                              "conv2d"))
    y_j, _ = subsampling.conv2d_subsampling4(p, jnp.asarray(x.numpy()),
                                             jnp.array([31, 31]), in_ch=2)
    allclose(np.asarray(y_j), y_t.numpy())
