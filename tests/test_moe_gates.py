"""Top-k gates (fastmoe NaiveGate / NoisyGate) and the ExMarc variant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe


def _params(key, d, e, h, d_router):
    return moe.init_moe_ffn(key, d, d_router - d, e, h)


def test_naive_topk_gate_selects_best():
    p = {"kernel": jnp.asarray(np.eye(4, dtype=np.float32) * 3)}
    x = jnp.asarray(np.array([[[0.0, 2.0, 1.0, -1.0]]], np.float32))
    gate, idx = moe.naive_topk_gate(p, x, top_k=2)
    assert list(np.asarray(idx)[0, 0]) == [1, 2]
    g = np.asarray(gate)[0, 0]
    np.testing.assert_allclose(g.sum(), 1.0, rtol=1e-6)
    assert g[0] > g[1]


@pytest.mark.slow
def test_topk2_moe_matches_manual():
    key = jax.random.PRNGKey(0)
    p = _params(key, 8, 4, 16, 12)
    p["router"]["kernel"] = jax.random.normal(key, (12, 4)) * 0.5
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 5, 8), jnp.float32)
    embed = jnp.asarray(rng.randn(1, 5, 4), jnp.float32)
    lengths = jnp.array([5])
    y2 = moe.moe_ffn(p, x, embed, lengths, impl="dense", top_k=2)
    # manual: run each expert densely, combine with the topk-softmax gate
    gate, idx = moe.naive_topk_gate(
        p["router"], jnp.concatenate([embed, x], -1), 2, lengths)
    manual = np.zeros((1, 5, 8), np.float32)
    for k in range(2):
        yk = moe.moe_experts_dense(p, x, idx[..., k])
        manual += np.asarray(yk) * np.asarray(gate[..., k:k + 1])
    np.testing.assert_allclose(np.asarray(y2), manual, rtol=1e-5, atol=1e-5)
    # ragged dispatch agrees with dense
    y2r = moe.moe_ffn(p, x, embed, lengths, impl="ragged", top_k=2)
    np.testing.assert_allclose(np.asarray(y2r), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)


def test_noisy_gate_train_vs_eval():
    key = jax.random.PRNGKey(2)
    p = {"kernel": jax.random.normal(key, (8, 4)) * 0.5,
         "noise_kernel": jnp.zeros((8, 4))}
    x = jnp.asarray(np.random.RandomState(3).randn(2, 6, 8), jnp.float32)
    g_eval, i_eval, cv2 = moe.noisy_topk_gate(p, x, 2, key, train=False)
    g_tr, i_tr, cv2_tr = moe.noisy_topk_gate(p, x, 2, key, train=True)
    assert np.isfinite(float(cv2)) and np.isfinite(float(cv2_tr))
    # eval mode must equal the naive gate
    g_naive, i_naive = moe.naive_topk_gate({"kernel": p["kernel"]}, x, 2)
    np.testing.assert_array_equal(np.asarray(i_eval), np.asarray(i_naive))
    np.testing.assert_allclose(np.asarray(g_eval), np.asarray(g_naive),
                               rtol=1e-6)


@pytest.mark.slow
def test_exmarc_block_uses_moe_macaron():
    from m3asr_tpu.config import (EncoderConfig, MoEConfig,
                                  MoEEncoderConfig)
    from m3asr_tpu.models import moe_conformer
    cfg = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=2, exmarc=True,
        embed_conf=EncoderConfig(attention_dim=24, attention_heads=4,
                                 linear_units=32, num_blocks=1),
        moe_conf=MoEConfig(num_experts=4, hidden_units=48))
    params = moe_conformer.init(jax.random.PRNGKey(4), cfg, 20, 11)
    # the macaron FFN position must be an MoE tree
    mac = params["blocks"][0]["feed_forward_macaron"] \
        if isinstance(params["blocks"], list) else \
        params["blocks"]["feed_forward_macaron"]
    assert "w1" in mac and "router" in mac
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.randn(1, 40, 20), jnp.float32)
    out, out_len = moe_conformer.forward(params, cfg, feat,
                                         jnp.array([40]))
    assert np.isfinite(np.asarray(out)).all()


def test_exmarc_proto_flag():
    from m3asr_tpu.config import model_config_from_dict
    cfg = model_config_from_dict({
        "nnet_proto": "conformer_aed_fmoeExMarc_localComm_catEmbed",
        "output_dim": 10, "model_conf": {"encoder_conf": {}}})
    assert cfg.encoder_conf.exmarc is True


def test_exmarc_block_parity():
    """ExMarc block (both FFN positions MoE) vs the golden torch twin."""
    import torch
    from golden import torch_ref as G
    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.checkpoint import StateDict
    from m3asr_tpu.config import MoEEncoderConfig
    from m3asr_tpu.models.layers import conformer_block
    from test_op_parity import allclose, valid_region

    torch.manual_seed(110)
    m = G.randomize_(G.ConformerEncoderLayer(
        32, 4, 64, moe=True, embed_dim=8, num_experts=4, moe_hidden=32,
        moe_macaron=True), seed=111)
    g = torch.Generator().manual_seed(112)
    x = torch.randn(2, 15, 32, generator=g)
    embed = torch.randn(2, 15, 8, generator=g)
    lengths = torch.tensor([15, 10])
    pe = G.RelPositionalEncoding(32).pe[0, :15]
    with torch.no_grad():
        y_t = m(x, lengths, pe[None], embed=embed)
    cfg = MoEEncoderConfig(attention_dim=32, attention_heads=4,
                           exmarc=True)
    p = ckpt._to_jax(ckpt.convert_block(StateDict(m.state_dict()), cfg,
                                        moe=True))
    y_j = conformer_block(p, jnp.asarray(x.numpy()), jnp.array([15, 10]),
                          jnp.asarray(pe.numpy()), num_heads=4, moe=True,
                          moe_macaron=True,
                          embed=jnp.asarray(embed.numpy()))
    allclose(valid_region(y_j, [15, 10]), valid_region(y_t.numpy(), [15, 10]))
