"""Per-op parity tests: m3asr_tpu ops vs the golden torch implementation.

Parity standard = the reference's own check:
allclose(rtol=1e-05, atol=1e-03) (trt_helper/infer_helper.py:93).
Each test builds a randomized torch module, converts its state_dict via
m3asr_tpu.checkpoint, and compares fp32 forwards on the valid region.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.ops import attention, conv, masking, moe, positional, subsampling

RTOL, ATOL = 1e-5, 1e-3


def allclose(a, b, rtol=RTOL, atol=ATOL):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    ok = np.allclose(a, b, rtol=rtol, atol=atol)
    if not ok:
        diff = np.abs(a - b)
        raise AssertionError(
            f"max abs diff {diff.max():.3e} at {np.unravel_index(diff.argmax(), diff.shape)}")
    return True


def valid_region(x, lengths):
    """Concatenate valid frames of a (B, T, ...) array."""
    return np.concatenate([np.asarray(x)[b, :l] for b, l in
                           enumerate(np.asarray(lengths))], axis=0)


def rand(*shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def test_subsampled_lengths():
    for n in range(7, 300, 13):
        lengths = torch.tensor([n])
        t = torch.zeros(1, n, 20)
        m = G.randomize_(G.Conv2dSubsampling4(20, 16))
        with torch.no_grad():
            y, out_len = m(t, lengths)
        jl = masking.subsampling4_length(jnp.array([n]))
        assert int(jl[0]) == int(out_len[0]) == y.shape[1]


def test_conv2d_subsampling4_parity():
    torch.manual_seed(0)
    m = G.randomize_(G.Conv2dSubsampling4(20, 16))
    x = rand(2, 37, 20)
    lengths = torch.tensor([37, 25])
    with torch.no_grad():
        y_t, len_t = m(x, lengths)
    p = ckpt.convert_subsampling(StateDict(m.state_dict()), "conv2d")
    p = ckpt._to_jax(p)
    y_j, len_j = subsampling.conv2d_subsampling4(p, jnp.asarray(x.numpy()),
                                                 jnp.array([37, 25]))
    assert list(np.asarray(len_j)) == list(len_t.numpy())
    allclose(valid_region(y_j, len_j), valid_region(y_t.numpy(), len_t))


def test_rel_positional_encoding_parity():
    m = G.RelPositionalEncoding(16)
    x = rand(2, 9, 16)
    with torch.no_grad():
        y_t, pos_t = m(x)
    pe = positional.sinusoid_table(16)
    y_j, pos_j = positional.rel_positional_encoding(pe, jnp.asarray(x.numpy()))
    allclose(y_j, y_t.numpy())
    allclose(pos_j, pos_t.numpy()[0])


def test_rel_mha_parity():
    torch.manual_seed(1)
    m = G.randomize_(G.RelPositionMultiHeadedAttention(4, 32), seed=1)
    x = rand(2, 11, 32, seed=2)
    lengths = torch.tensor([11, 7])
    pe_m = G.RelPositionalEncoding(32)
    pos_emb = pe_m.pe[:, :11]
    with torch.no_grad():
        y_t = m(x, pos_emb, lengths)
    p = ckpt._to_jax(ckpt.convert_attention(StateDict(m.state_dict())))
    y_j = attention.rel_mha(p, jnp.asarray(x.numpy()),
                            jnp.asarray(pos_emb[0].numpy()),
                            jnp.array([11, 7]), num_heads=4)
    allclose(valid_region(y_j, [11, 7]), valid_region(y_t.numpy(), [11, 7]))


@pytest.mark.parametrize("norm", ["batch_norm", "layer_norm"])
@pytest.mark.parametrize("causal", [False, True])
def test_conv_module_parity(norm, causal):
    torch.manual_seed(2)
    m = G.randomize_(G.ConvolutionModule(32, 15, norm, causal), seed=3)
    x = rand(2, 21, 32, seed=4)
    lengths = torch.tensor([21, 13])
    with torch.no_grad():
        y_t = m(x, lengths)
    p = ckpt._to_jax(ckpt.convert_conv_module(StateDict(m.state_dict()), norm))
    y_j = conv.conv_module(p, jnp.asarray(x.numpy()), jnp.array([21, 13]),
                           use_layer_norm=(norm == "layer_norm"),
                           lorder=14 if causal else 0)
    allclose(valid_region(y_j, [21, 13]), valid_region(y_t.numpy(), [21, 13]))


def test_moe_gate_parity():
    torch.manual_seed(3)
    m = G.randomize_(G.LocalFmoeCatEmbedFeedForward(16, 8, 4, 32), seed=5)
    x = rand(2, 9, 16, seed=6)
    embed = rand(2, 9, 8, seed=7)
    lengths = jnp.array([9, 5])
    p = ckpt._to_jax(ckpt.convert_moe_ffn(StateDict(m.state_dict())))
    router_in = jnp.concatenate([jnp.asarray(embed.numpy()),
                                 jnp.asarray(x.numpy())], axis=-1)
    gv, gi = moe.softmax_top1_gate(p["router"], router_in, lengths)
    with torch.no_grad():
        logits = torch.einsum("btj,jk->btk",
                              torch.cat([embed, x], -1), m.router_weights)
        probs = torch.softmax(logits, -1)
        v_t, i_t = probs.max(-1)
    allclose(valid_region(gv[..., 0], [9, 5]), valid_region(v_t.numpy(), [9, 5]))
    assert (valid_region(gi, [9, 5]) == valid_region(i_t.numpy(), [9, 5])).all()


@pytest.mark.parametrize("impl", ["dense", "ragged"])
def test_moe_ffn_parity(impl):
    torch.manual_seed(4)
    m = G.randomize_(G.LocalFmoeCatEmbedFeedForward(16, 8, 4, 32), seed=8)
    x = rand(2, 9, 16, seed=9)
    embed = rand(2, 9, 8, seed=10)
    lengths = torch.tensor([9, 5])
    with torch.no_grad():
        y_t = m(x, embed, lengths)
    p = ckpt._to_jax(ckpt.convert_moe_ffn(StateDict(m.state_dict())))
    y_j = moe.moe_ffn(p, jnp.asarray(x.numpy()), jnp.asarray(embed.numpy()),
                      jnp.array([9, 5]), impl=impl)
    allclose(valid_region(y_j, [9, 5]), valid_region(y_t.numpy(), [9, 5]))


def test_moe_empty_expert_and_single_expert_edge():
    """Edge cases the reference plugin handles with `if m==0 continue`
    (fmoe_expert_plugin.cpp:86): some experts receive zero tokens."""
    torch.manual_seed(5)
    m = G.randomize_(G.LocalFmoeCatEmbedFeedForward(8, 4, 6, 16), seed=11)
    # bias router so only expert 2 is ever selected
    with torch.no_grad():
        m.router_weights.zero_()
        m.router_weights[0, 2] = 10.0
    x = rand(1, 5, 8, seed=12)
    embed = torch.ones(1, 5, 4)
    with torch.no_grad():
        y_t = m(x, embed, torch.tensor([5]))
    p = ckpt._to_jax(ckpt.convert_moe_ffn(StateDict(m.state_dict())))
    for impl in ("dense", "ragged"):
        y_j = moe.moe_ffn(p, jnp.asarray(x.numpy()),
                          jnp.asarray(embed.numpy()), jnp.array([5]),
                          impl=impl)
        allclose(valid_region(y_j, [5]), valid_region(y_t.numpy(), [5]))


@pytest.mark.parametrize("moe_block", [False, True])
def test_conformer_block_parity(moe_block):
    from m3asr_tpu.models.layers import conformer_block
    from m3asr_tpu.config import EncoderConfig
    torch.manual_seed(6)
    kw = dict(moe=True, embed_dim=8, num_experts=4, moe_hidden=32) \
        if moe_block else {}
    m = G.randomize_(G.ConformerEncoderLayer(32, 4, 64, **kw), seed=13)
    x = rand(2, 15, 32, seed=14)
    embed = rand(2, 15, 8, seed=15)
    lengths = torch.tensor([15, 10])
    pe_m = G.RelPositionalEncoding(32)
    pos_emb = pe_m.pe[0, :15]
    with torch.no_grad():
        y_t = m(x, lengths, pos_emb[None],
                embed=embed if moe_block else None)
    cfg = EncoderConfig(attention_dim=32, attention_heads=4, linear_units=64)
    p = ckpt._to_jax(ckpt.convert_block(StateDict(m.state_dict()), cfg,
                                        moe=moe_block))
    y_j = conformer_block(p, jnp.asarray(x.numpy()), jnp.array([15, 10]),
                          jnp.asarray(pos_emb.numpy()), num_heads=4,
                          moe=moe_block,
                          embed=jnp.asarray(embed.numpy()) if moe_block
                          else None)
    allclose(valid_region(y_j, [15, 10]), valid_region(y_t.numpy(), [15, 10]))


def test_subsampling4_impl_variants_parity():
    """The im2col-matmul forms of conv2d_subsampling4 equal the XLA
    conv lowering exactly (recorded non-lever, round-5 — kept behind
    impl= so the measurement is reproducible)."""
    import jax
    import jax.numpy as jnp
    from m3asr_tpu.ops import subsampling as sub
    p = sub.init_conv2d_subsampling4(jax.random.PRNGKey(0), 40, 64)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 57, 40), jnp.float32)
    lens = jnp.asarray([57, 31], jnp.int32)
    ref, ref_len = sub.conv2d_subsampling4(p, x, lens, impl="conv")
    for impl in ("im2col", "im2col1", "auto"):
        got, got_len = sub.conv2d_subsampling4(p, x, lens, impl=impl)
        assert (np.asarray(got_len) == np.asarray(ref_len)).all()
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_fuse_defuse_qkv_roundtrip():
    """defuse_qkv_params is the exact inverse of fuse_qkv_params —
    serve.py relies on it to hand streaming sessions the separate
    q/k/v weights from a fused engine."""
    import jax
    import jax.numpy as jnp
    from m3asr_tpu.ops.attention import (defuse_qkv_params,
                                         fuse_qkv_params, init_rel_mha,
                                         rel_mha)
    p = {"self_attn": init_rel_mha(jax.random.PRNGKey(0), 32, 4)}
    fused = fuse_qkv_params(p)
    assert "linear_qkv" in fused["self_attn"]
    back = defuse_qkv_params(fused)
    for n in ("linear_q", "linear_k", "linear_v"):
        np.testing.assert_array_equal(
            np.asarray(back["self_attn"][n]["kernel"]),
            np.asarray(p["self_attn"][n]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(back["self_attn"][n]["bias"]),
            np.asarray(p["self_attn"][n]["bias"]))
    # and the fused forward == the plain forward
    x = jnp.asarray(np.random.RandomState(1).randn(1, 9, 32), jnp.float32)
    pos = jnp.asarray(np.random.RandomState(2).randn(9, 32), jnp.float32)
    lens = jnp.asarray([9], jnp.int32)
    ref = rel_mha(p["self_attn"], x, pos, lens, 4)
    got = rel_mha(fused["self_attn"], x, pos, lens, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dense_quant_dequant_roundtrip():
    """dequantize_dense_params reconstructs exactly the weights the
    quantized engine computes with (q * scale) — serve.py's streaming
    path equivalence."""
    import jax
    import jax.numpy as jnp
    from m3asr_tpu.ops.common import init_linear, linear
    from m3asr_tpu.ops.quant import (dequantize_dense_params,
                                     quantize_dense_params)
    p = {"lin": init_linear(jax.random.PRNGKey(3), 64, 48)}
    q = quantize_dense_params(p)
    assert "kernel_q" in q["lin"]
    back = dequantize_dense_params(q, jnp.float32)
    assert "kernel" in back["lin"] and "kernel_q" not in back["lin"]
    x = jnp.asarray(np.random.RandomState(4).randn(5, 64), jnp.float32)
    # identical to what linear() computes on the quantized node
    np.testing.assert_allclose(np.asarray(linear(back["lin"], x)),
                               np.asarray(linear(q["lin"], x)),
                               rtol=1e-6, atol=1e-6)
