"""Spot-check parity at flagship dimensions (512-dim, 8 heads, 32
experts, 1024 hidden) — catches layout bugs that tiny dims can mask."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.config import EncoderConfig
from m3asr_tpu.models.layers import conformer_block

from test_op_parity import allclose, valid_region


@pytest.mark.slow
def test_flagship_dim_moe_block_parity():
    torch.manual_seed(120)
    m = G.randomize_(G.ConformerEncoderLayer(
        512, 8, 1024, moe=True, embed_dim=512, num_experts=32,
        moe_hidden=1024), seed=121)
    g = torch.Generator().manual_seed(122)
    x = torch.randn(1, 64, 512, generator=g)
    embed = torch.randn(1, 64, 512, generator=g)
    lengths = torch.tensor([51])
    pe = G.RelPositionalEncoding(512).pe[0, :64]
    with torch.no_grad():
        y_t = m(x, lengths, pe[None], embed=embed)
    cfg = EncoderConfig(attention_dim=512, attention_heads=8)
    p = ckpt._to_jax(ckpt.convert_block(StateDict(m.state_dict()), cfg,
                                        moe=True))
    for impl in ("dense", "ragged", "capacity"):
        y_j = conformer_block(p, jnp.asarray(x.numpy()), jnp.array([51]),
                              jnp.asarray(pe.numpy()), num_heads=8,
                              moe=True, moe_impl=impl,
                              embed=jnp.asarray(embed.numpy()))
        allclose(valid_region(y_j, [51]), valid_region(y_t.numpy(), [51]))
