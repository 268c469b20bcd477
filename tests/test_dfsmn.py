"""DFSMN family parity tests."""

import numpy as np
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.models import dfsmn

from test_op_parity import allclose, valid_region


def test_cfsmn_layer_parity():
    torch.manual_seed(60)
    m = G.randomize_(G.CFSMNLayer(16, 24, 16, look_back=4, look_ahead=1,
                                  stride_left=2, stride_right=1,
                                  skip_connect=True, upper_bound=1.0),
                     seed=61)
    g = torch.Generator().manual_seed(62)
    x = torch.randn(2, 19, 16, generator=g)
    lengths = torch.tensor([19, 11])
    with torch.no_grad():
        y_t = m(x, lengths)
    p = ckpt._to_jax(ckpt.convert_cfsmn(StateDict(m.state_dict())))
    cfg = dfsmn.FsmnConfig(4, 1, 2, 1, upper_bound=1.0, skip_connect=True)
    y_j = dfsmn.cfsmn_layer(p, jnp.asarray(x.numpy()), jnp.array([19, 11]),
                            cfg)
    allclose(valid_region(y_j, [19, 11]), valid_region(y_t.numpy(), [19, 11]))


def test_attn_mem_layer_parity():
    torch.manual_seed(63)
    m = G.randomize_(G.AttnMemLayer(16, 4, memory_num=8), seed=64)
    g = torch.Generator().manual_seed(65)
    x = torch.randn(2, 9, 16, generator=g)
    lengths = torch.tensor([9, 5])
    with torch.no_grad():
        y_t = m(x, lengths)
    p = ckpt._to_jax(ckpt.convert_attn_mem(StateDict(m.state_dict())))
    y_j = dfsmn.attn_mem_layer(p, jnp.asarray(x.numpy()),
                               jnp.array([9, 5]), num_heads=4, memory_num=8)
    allclose(valid_region(y_j, [9, 5]), valid_region(y_t.numpy(), [9, 5]))


def test_dfsmn_san_net_parity():
    torch.manual_seed(66)
    m = G.randomize_(G.DfsmnSanNet(12, 7, num_block=2, fsmn_each_block=3,
                                   hidden_dim=24, memory_dim=16,
                                   num_head=4, num_memory=8), seed=67)
    g = torch.Generator().manual_seed(68)
    x = torch.randn(2, 23, 12, generator=g)
    lengths = torch.tensor([23, 14])
    with torch.no_grad():
        y_t, _ = m(x, lengths)
    p = ckpt.convert_dfsmn_san(StateDict(m.state_dict()), num_block=2,
                               fsmn_each_block=3)
    cfg = dfsmn.DfsmnSanConfig(num_block=2, fsmn_each_block=3,
                               hidden_dim=24, memory_dim=16, num_head=4,
                               num_memory=8)
    y_j, _ = dfsmn.dfsmn_san_forward(p, cfg, jnp.asarray(x.numpy()),
                                     jnp.array([23, 14]))
    allclose(valid_region(y_j, [23, 14]), valid_region(y_t.numpy(), [23, 14]))
