"""Full-model parity: dense conformer encoder and the hier MoE
conformer vs the golden torch implementation (reference tolerance
rtol=1e-05, atol=1e-03 on the valid region — infer_helper.py:93)."""

import numpy as np
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.config import EncoderConfig, MoEEncoderConfig, MoEConfig
from m3asr_tpu.models import conformer, moe_conformer

from test_op_parity import allclose, valid_region


def small_dense_cfg():
    return EncoderConfig(attention_dim=32, attention_heads=4,
                         linear_units=48, num_blocks=2)


def test_dense_encoder_parity():
    torch.manual_seed(10)
    m = G.randomize_(G.DenseConformer(20, 11, attention_dim=32,
                                      attention_heads=4, linear_units=48,
                                      num_blocks=2), seed=20)
    g = torch.Generator().manual_seed(21)
    x = torch.randn(2, 53, 20, generator=g)
    lengths = torch.tensor([53, 31])
    with torch.no_grad():
        y_t, len_t, emb_t = m(x, lengths, output_embed=True)
    cfg = small_dense_cfg()
    p = ckpt.convert_dense_encoder(StateDict(m.state_dict()), cfg)
    y_j, len_j, emb_j = conformer.forward(p, cfg, jnp.asarray(x.numpy()),
                                          jnp.array([53, 31]),
                                          output_embed=True)
    assert list(np.asarray(len_j)) == list(len_t.numpy())
    lens = len_t.numpy()
    allclose(valid_region(y_j, lens), valid_region(y_t.numpy(), lens))
    allclose(valid_region(emb_j, lens), valid_region(emb_t.numpy(), lens))


def test_hier_moe_encoder_parity():
    torch.manual_seed(11)
    embed_conf = dict(attention_dim=24, attention_heads=4, linear_units=32,
                      num_blocks=2)
    m = G.randomize_(G.HierMoEConformer(
        20, 11, attention_dim=32, attention_heads=4, num_blocks=3,
        num_experts=4, moe_hidden=48, embed_conf=embed_conf), seed=22)
    # give the router real values (randomize_ already does) but verify a
    # spread of experts is used
    g = torch.Generator().manual_seed(23)
    x = torch.randn(2, 53, 20, generator=g)
    lengths = torch.tensor([53, 31])
    with torch.no_grad():
        y_t, len_t = m(x, lengths)

    cfg = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=3,
        embed_conf=EncoderConfig(attention_dim=24, attention_heads=4,
                                 linear_units=32, num_blocks=2),
        moe_conf=MoEConfig(num_experts=4, hidden_units=48))
    p = ckpt.convert_moe_encoder(StateDict(m.state_dict()), cfg)
    lens = len_t.numpy()
    for impl in ("dense", "ragged"):
        y_j, len_j = moe_conformer.forward(p, cfg, jnp.asarray(x.numpy()),
                                           jnp.array([53, 31]),
                                           moe_impl=impl)
        assert list(np.asarray(len_j)) == list(lens)
        allclose(valid_region(y_j, lens), valid_region(y_t.numpy(), lens))


def test_convert_encoder_with_aed_prefix():
    """builder.py loads the AED wrapper checkpoint and uses .encoder;
    convert_encoder must strip the prefix the same way."""
    torch.manual_seed(12)
    m = G.randomize_(G.DenseConformer(20, 11, attention_dim=32,
                                      attention_heads=4, linear_units=48,
                                      num_blocks=1), seed=24)
    sd = {f"encoder.{k}": v for k, v in m.state_dict().items()}
    sd["decoder.some.weight"] = torch.zeros(3)

    from m3asr_tpu.config import ModelConfig
    mc = ModelConfig()
    mc.encoder_conf = small_dense_cfg()
    mc.encoder_conf.num_blocks = 1
    p = ckpt.convert_encoder(sd, mc)
    g = torch.Generator().manual_seed(25)
    x = torch.randn(1, 23, 20, generator=g)
    with torch.no_grad():
        y_t, len_t = m(x, torch.tensor([23]))
    y_j, len_j = conformer.forward(p, mc.encoder_conf,
                                   jnp.asarray(x.numpy()), jnp.array([23]))
    allclose(valid_region(y_j, [int(len_t[0])]),
             valid_region(y_t.numpy(), [int(len_t[0])]))
