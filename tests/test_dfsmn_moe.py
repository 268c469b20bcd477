"""MoE-DFSMN layer parity + san-MoE net smoke."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.models import dfsmn

from test_op_parity import allclose, valid_region


def test_cfsmn_moe_layer_parity():
    torch.manual_seed(70)
    m = G.randomize_(G.CFSMNMoELayer(16, 8, 24, num_experts=4), seed=71)
    g = torch.Generator().manual_seed(72)
    x = torch.randn(2, 19, 16, generator=g)
    embed = torch.randn(2, 19, 8, generator=g)
    lengths = torch.tensor([19, 11])
    with torch.no_grad():
        y_t = m(x, embed, lengths)
    p = ckpt._to_jax(ckpt.convert_cfsmn_moe(StateDict(m.state_dict())))
    cfg = dfsmn.FsmnConfig(4, 1, 2, 1, upper_bound=1.0, skip_connect=True)
    for impl in ("dense", "ragged"):
        y_j = dfsmn.cfsmn_moe_layer(p, jnp.asarray(x.numpy()),
                                    jnp.asarray(embed.numpy()),
                                    jnp.array([19, 11]), cfg,
                                    moe_impl=impl)
        allclose(valid_region(y_j, [19, 11]),
                 valid_region(y_t.numpy(), [19, 11]))


@pytest.mark.slow
def test_dfsmn_san_moe_forward_smoke():
    """Full MoE-DFSMN net: init synthetic params matching the converter
    tree, run, check finiteness + shapes."""
    cfg = dfsmn.DfsmnSanMoEConfig(
        num_block=2, fsmn_each_block=2, hidden_dim=24, memory_dim=16,
        num_head=4, num_memory=8, num_experts=4, embed_dim=16,
        embed_conf=dfsmn.DfsmnSanConfig(num_block=1, fsmn_each_block=2,
                                        hidden_dim=24, memory_dim=16,
                                        num_head=4, num_memory=8))
    torch.manual_seed(73)
    embed_net = G.randomize_(G.DfsmnSanNet(
        12, 7, num_block=1, fsmn_each_block=2, hidden_dim=24,
        memory_dim=16, num_head=4, num_memory=8), seed=74)
    embed_p = ckpt.convert_dfsmn_san(StateDict(embed_net.state_dict()), 1, 2)

    key = jax.random.PRNGKey(7)
    blocks_sw = []
    for i in range(2):
        fsmn = []
        for j in range(2):
            if i == 0 and j == 0:
                lay = G.randomize_(G.CFSMNLayer(12, 24, 16, skip_connect=False),
                                   seed=75)
                fsmn.append(ckpt._to_jax(
                    ckpt.convert_cfsmn(StateDict(lay.state_dict()))))
            else:
                lay = G.randomize_(G.CFSMNMoELayer(16, 16, 24, 4),
                                   seed=76 + i * 2 + j)
                fsmn.append(ckpt._to_jax(
                    ckpt.convert_cfsmn_moe(StateDict(lay.state_dict()))))
        attn_net = G.randomize_(G.AttnMemLayer(16, 4, 8), seed=80 + i)
        ln = {"scale": jnp.ones(16), "bias": jnp.zeros(16)}
        blocks_sw.append({
            "fsmn_layers": fsmn,
            "attn_layer": {"attn_layer": ckpt._to_jax(ckpt.convert_attn_mem(
                StateDict(attn_net.state_dict()))), "ln_layer": ln}})
    params = {"embed": embed_p, "blocks_sw": blocks_sw,
              "out_linear_sw": {"kernel": jnp.zeros((16, 7)),
                                "bias": jnp.zeros(7)}}
    x = jnp.asarray(np.random.RandomState(8).randn(2, 23, 12), jnp.float32)
    out, embed_out, lens = dfsmn.dfsmn_san_moe_forward(
        params, cfg, x, jnp.array([23, 14]))
    assert out.shape == (2, 23, 7)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(embed_out)).all()


def _moe_net_params(seed=7):
    """Synthetic full MoE-DFSMN param tree (converter layout)."""
    torch.manual_seed(73)
    embed_net = G.randomize_(G.DfsmnSanNet(
        12, 7, num_block=1, fsmn_each_block=2, hidden_dim=24,
        memory_dim=16, num_head=4, num_memory=8), seed=74)
    embed_p = ckpt.convert_dfsmn_san(StateDict(embed_net.state_dict()),
                                     1, 2)
    blocks_sw = []
    for i in range(2):
        fsmn = []
        for j in range(2):
            if i == 0 and j == 0:
                lay = G.randomize_(
                    G.CFSMNLayer(12, 24, 16, skip_connect=False), seed=75)
                fsmn.append(ckpt._to_jax(
                    ckpt.convert_cfsmn(StateDict(lay.state_dict()))))
            else:
                lay = G.randomize_(G.CFSMNMoELayer(16, 16, 24, 4),
                                   seed=76 + i * 2 + j)
                fsmn.append(ckpt._to_jax(
                    ckpt.convert_cfsmn_moe(StateDict(lay.state_dict()))))
        attn_net = G.randomize_(G.AttnMemLayer(16, 4, 8), seed=80 + i)
        ln = {"scale": jnp.ones(16), "bias": jnp.zeros(16)}
        blocks_sw.append({
            "fsmn_layers": fsmn,
            "attn_layer": {"attn_layer": ckpt._to_jax(
                ckpt.convert_attn_mem(StateDict(attn_net.state_dict()))),
                "ln_layer": ln}})
    rng = np.random.RandomState(seed)
    return {"embed": embed_p, "blocks_sw": blocks_sw,
            "out_linear_sw": {
                "kernel": jnp.asarray(rng.randn(16, 7) * 0.3, jnp.float32),
                "bias": jnp.zeros(7)}}


@pytest.mark.slow
def test_dfsmn_moe_int8_engine():
    """int8 expert quantization for the DFSMN-MoE layout: the engine
    quantizes every cfsmn-MoE layer's expert tensors and runs the quant
    dispatch; logits stay close to the fp32 engine's."""
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    raw = {
        "nnet_proto": "dfsmn_san_fmoe_localComm_catEmbed",
        "input_dim": 12, "output_dim": 7,
        "model_conf": {
            "num_block": 2, "fsmn_each_block": 2,
            "fsmn_conf": {"hidden_dim": 24, "memory_dim": 16},
            "san_conf": {"num_head": 4, "num_memory": 8},
            "moe_conf": {"num_experts": 4},
            "embed_conf": {"num_block": 1, "fsmn_each_block": 2,
                           "hidden_dim": 24, "memory_dim": 16,
                           "num_head": 4, "num_memory": 8},
        },
    }
    cfg = model_config_from_dict(raw)
    params = _moe_net_params()
    ecfg = EngineConfig(bucket_lengths=(32,), bucket_batches=(2,),
                        donate_input=False)
    f32 = Engine(cfg, params, ecfg)
    i8 = Engine(cfg, params,
                EngineConfig(dtype="int8", bucket_lengths=(32,),
                             bucket_batches=(2,), donate_input=False))
    # the MoE layers got quantized, the dense first layer did not
    q_layer = i8.params["blocks_sw"][0]["fsmn_layers"][1]
    assert "w1_q" in q_layer and np.asarray(q_layer["w1_q"]).dtype == np.int8
    assert "w1" not in q_layer
    assert "w1_q" not in str(sorted(i8.params["embed"].keys()))

    feat = np.random.RandomState(8).randn(2, 23, 12).astype(np.float32)
    lens = np.array([23, 14], np.int32)
    o32, l32 = f32.infer(feat, lens)
    o8, l8 = i8.infer(feat, lens)
    assert list(l32) == list(l8) == [23, 14]
    for b, n in enumerate([23, 14]):
        ref, got = o32[b, :n], o8[b, :n]
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        assert rel < 0.08, rel


def test_dfsmn_moe_w8a8_engine():
    """act_quant composes with the DFSMN-MoE family: the auto policy's
    quant_a8 impl flows through the per-layer moe_ffn dispatch."""
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    raw = {
        "nnet_proto": "dfsmn_san_fmoe_localComm_catEmbed",
        "input_dim": 12, "output_dim": 7,
        "model_conf": {
            "num_block": 2, "fsmn_each_block": 2,
            "fsmn_conf": {"hidden_dim": 24, "memory_dim": 16},
            "san_conf": {"num_head": 4, "num_memory": 8},
            "moe_conf": {"num_experts": 4},
            "embed_conf": {"num_block": 1, "fsmn_each_block": 2,
                           "hidden_dim": 24, "memory_dim": 16,
                           "num_head": 4, "num_memory": 8},
        },
    }
    cfg = model_config_from_dict(raw)
    params = _moe_net_params()
    i8 = Engine(cfg, params,
                EngineConfig(dtype="int8", bucket_lengths=(32,),
                             bucket_batches=(2,), donate_input=False))
    a8 = Engine(cfg, params,
                EngineConfig(dtype="int8", act_quant=True,
                             bucket_lengths=(32,), bucket_batches=(2,),
                             donate_input=False))
    assert a8._moe_impl_for(2, 32) == "quant_a8"
    feat = np.random.RandomState(9).randn(2, 23, 12).astype(np.float32)
    lens = np.array([23, 14], np.int32)
    o8, l8 = i8.infer(feat, lens)
    oa, la = a8.infer(feat, lens)
    assert list(l8) == list(la)
    for b, n in enumerate([23, 14]):
        rel = np.abs(oa[b, :n] - o8[b, :n]).max() / (
            np.abs(o8[b, :n]).max() + 1e-6)
        assert rel < 0.08, rel


def test_cfsmn_moe_layer_quant4_pallas():
    """The packed-int4 Pallas kernel's relu + upper_bound epilogue (the
    DFSMN expert) matches the XLA q4 dequant path (interpret on CPU)."""
    torch.manual_seed(74)
    m = G.randomize_(G.CFSMNMoELayer(16, 8, 24, num_experts=4), seed=75)
    g = torch.Generator().manual_seed(76)
    x = torch.randn(2, 19, 16, generator=g)
    embed = torch.randn(2, 19, 8, generator=g)
    p = ckpt._to_jax(ckpt.convert_cfsmn_moe(StateDict(m.state_dict())))
    from m3asr_tpu.ops.quant import quantize_moe_params
    qp = dict(p)
    qp.update(quantize_moe_params(
        {k: p[k] for k in ("w1", "w2", "b1", "b2") if k in p}, bits=4))
    cfg = dfsmn.FsmnConfig(4, 1, 2, 1, upper_bound=1.0, skip_connect=True)
    args = (jnp.asarray(x.numpy()), jnp.asarray(embed.numpy()),
            jnp.array([19, 11]), cfg)
    ref = dfsmn.cfsmn_moe_layer(qp, *args, moe_impl="quant")
    got = dfsmn.cfsmn_moe_layer(qp, *args, moe_impl="quant4_pallas")
    np.testing.assert_allclose(
        np.asarray(valid_region(got, [19, 11])),
        np.asarray(valid_region(ref, [19, 11])), rtol=1e-3, atol=2e-4)
