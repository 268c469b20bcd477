"""DFSMN streaming: exact FIR chunking + windowed-attention parity
with a chunk-causal-masked full forward."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.checkpoint import StateDict
from m3asr_tpu.models import dfsmn, dfsmn_streaming as S

from test_op_parity import allclose


def test_stream_cfsmn_exact_with_lookahead():
    """Chunked cFSMN == full cfsmn_layer, delay-aligned (rctx > 0)."""
    torch.manual_seed(90)
    m = G.randomize_(G.CFSMNLayer(16, 24, 16, look_back=4, look_ahead=1,
                                  stride_left=2, stride_right=1,
                                  skip_connect=True, upper_bound=1.0),
                     seed=91)
    p = ckpt._to_jax(ckpt.convert_cfsmn(StateDict(m.state_dict())))
    fcfg = dfsmn.FsmnConfig(4, 1, 2, 1, upper_bound=1.0, skip_connect=True)
    rctx = 1
    lctx = 8
    T, C = 24, 6
    x = jnp.asarray(np.random.RandomState(92).randn(2, T, 16), jnp.float32)

    full = dfsmn.cfsmn_layer(p, x, None, fcfg)          # (2, T, 16)

    cache = jnp.zeros((2, lctx + rctx, 16), jnp.float32)
    outs = []
    for k in range(T // C):
        o, cache = S._stream_cfsmn(p, x[:, k * C:(k + 1) * C], cache, fcfg)
        outs.append(np.asarray(o))
    stream = np.concatenate(outs, axis=1)
    # stream frame j is full frame j - rctx; first rctx frames warm-up
    np.testing.assert_allclose(stream[:, rctx:], np.asarray(full)[:, :T - rctx],
                               rtol=1e-5, atol=1e-5)


def _causal_cfg():
    return dict(num_block=2, fsmn_each_block=3, hidden_dim=32,
                memory_dim=16, look_back=4, look_ahead=0, stride_left=2,
                stride_right=1, num_head=4, num_memory=8)


@pytest.mark.slow
def test_dfsmn_streaming_matches_chunk_masked_full_forward():
    torch.manual_seed(93)
    kw = _causal_cfg()
    m = G.randomize_(G.DfsmnSanNet(16, 9, **kw), seed=94)
    p = ckpt.convert_dfsmn_san(StateDict(m.state_dict()), num_block=2,
                               fsmn_each_block=3)
    cfg = dfsmn.DfsmnSanConfig(**kw)
    assert S.stream_delay(cfg) == 0

    T, C, B = 24, 6, 2
    x = jnp.asarray(np.random.RandomState(95).randn(B, T, 16), jnp.float32)

    # reference: full forward where each frame attends to everything up
    # to the end of its own chunk (what windowed streaming computes)
    pos = np.arange(T)
    mask = jnp.asarray(pos[None, :] < ((pos[:, None] // C) + 1) * C)
    full, _ = dfsmn.dfsmn_san_forward(p, cfg, x, None, attn_mask=mask)

    state = S.init_state(cfg, B, cache_T=T)  # window covers everything
    step = jax.jit(lambda c, s: S.forward_chunk(p, cfg, c, s))
    outs = []
    for k in range(T // C):
        o, state = step(x[:, k * C:(k + 1) * C], state)
        outs.append(np.asarray(o))
    stream = np.concatenate(outs, axis=1)
    allclose(stream, np.asarray(full), atol=1e-4)
    assert int(state.offset) == T


def test_dfsmn_streaming_one_compilation():
    kw = _causal_cfg()
    torch.manual_seed(96)
    m = G.randomize_(G.DfsmnSanNet(16, 9, **kw), seed=97)
    p = ckpt.convert_dfsmn_san(StateDict(m.state_dict()), num_block=2,
                               fsmn_each_block=3)
    cfg = dfsmn.DfsmnSanConfig(**kw)
    step = jax.jit(lambda c, s: S.forward_chunk(p, cfg, c, s))
    state = S.init_state(cfg, 1, cache_T=12)
    chunk = jnp.zeros((1, 6, 16), jnp.float32)
    for _ in range(4):
        _, state = step(chunk, state)
    assert step._cache_size() == 1


@pytest.mark.slow
def test_dfsmn_streaming_session_causal_exact():
    """Session (look_ahead=0) emits exactly the chunk-masked full
    forward over arbitrary push sizes + finish()."""
    from m3asr_tpu.runtime.streaming_session import DfsmnStreamingSession
    kw = _causal_cfg()
    torch.manual_seed(98)
    m = G.randomize_(G.DfsmnSanNet(16, 9, **kw), seed=99)
    p = ckpt.convert_dfsmn_san(StateDict(m.state_dict()), num_block=2,
                               fsmn_each_block=3)
    cfg = dfsmn.DfsmnSanConfig(**kw)
    T, C = 26, 6
    x = np.random.RandomState(100).randn(1, T, 16).astype(np.float32)

    pos = np.arange(T)
    # finish() pads the tail chunk with zeros, which the full forward
    # must see too for exactness: pad to the chunk multiple
    Tp = ((T + C - 1) // C) * C
    xp = np.zeros((1, Tp, 16), np.float32)
    xp[:, :T] = x
    posp = np.arange(Tp)
    mask = jnp.asarray(posp[None, :] < ((posp[:, None] // C) + 1) * C)
    full, _ = dfsmn.dfsmn_san_forward(p, cfg, jnp.asarray(xp), None,
                                      attn_mask=mask)

    sess = DfsmnStreamingSession(p, cfg, chunk_size=C, cache_T=Tp)
    outs = sess.push(x[:, :7]) + sess.push(x[:, 7:20]) \
        + sess.push(x[:, 20:]) + sess.finish()
    stream = np.concatenate(outs, axis=1)
    assert stream.shape[1] == T
    allclose(stream, np.asarray(full)[:, :T], atol=1e-4)


def test_dfsmn_streaming_session_lookahead_delay_bookkeeping():
    """With look-ahead the session drops warm-up frames and still emits
    exactly T matured frames."""
    from m3asr_tpu.runtime.streaming_session import DfsmnStreamingSession
    kw = dict(_causal_cfg(), look_ahead=1)
    torch.manual_seed(101)
    m = G.randomize_(G.DfsmnSanNet(16, 9, **kw), seed=102)
    p = ckpt.convert_dfsmn_san(StateDict(m.state_dict()), num_block=2,
                               fsmn_each_block=3)
    cfg = dfsmn.DfsmnSanConfig(**kw)
    from m3asr_tpu.models.dfsmn_streaming import stream_delay
    assert stream_delay(cfg) == 6  # 2 blocks x 3 fsmn x rctx 1
    T = 23
    x = np.random.RandomState(103).randn(1, T, 16).astype(np.float32)
    sess = DfsmnStreamingSession(p, cfg, chunk_size=8, cache_T=64)
    outs = sess.push(x) + sess.finish()
    stream = np.concatenate(outs, axis=1)
    assert stream.shape[1] == T


def test_dfsmn_streaming_session_buffer_stays_bounded():
    """Long-lived streams must not accumulate the whole history."""
    from m3asr_tpu.runtime.streaming_session import DfsmnStreamingSession
    kw = _causal_cfg()
    torch.manual_seed(104)
    m = G.randomize_(G.DfsmnSanNet(16, 9, **kw), seed=105)
    p = ckpt.convert_dfsmn_san(StateDict(m.state_dict()), num_block=2,
                               fsmn_each_block=3)
    cfg = dfsmn.DfsmnSanConfig(**kw)
    sess = DfsmnStreamingSession(p, cfg, chunk_size=8, cache_T=16)
    x = np.zeros((1, 8, 16), np.float32)
    for _ in range(50):
        sess.push(x)
    assert sess._buf.shape[1] < 16  # trimmed, not 400 frames
    assert sess._fed == 400


def _causal_moe_net():
    """Causal (look_ahead=0) MoE-DFSMN params + config."""
    la = dict(look_ahead=0)
    torch.manual_seed(110)
    embed_net = G.randomize_(G.DfsmnSanNet(
        12, 7, num_block=1, fsmn_each_block=2, hidden_dim=24,
        memory_dim=16, num_head=4, num_memory=8, **la), seed=111)
    embed_p = ckpt.convert_dfsmn_san(StateDict(embed_net.state_dict()),
                                     1, 2)
    blocks_sw = []
    for i in range(2):
        fsmn = []
        for j in range(2):
            if i == 0 and j == 0:
                lay = G.randomize_(G.CFSMNLayer(
                    12, 24, 16, skip_connect=False, **la), seed=112)
                fsmn.append(ckpt._to_jax(
                    ckpt.convert_cfsmn(StateDict(lay.state_dict()))))
            else:
                lay = G.randomize_(G.CFSMNMoELayer(16, 16, 24, 4, **la),
                                   seed=113 + i * 2 + j)
                fsmn.append(ckpt._to_jax(
                    ckpt.convert_cfsmn_moe(StateDict(lay.state_dict()))))
        attn_net = G.randomize_(G.AttnMemLayer(16, 4, 8), seed=118 + i)
        ln = {"scale": jnp.ones(16), "bias": jnp.zeros(16)}
        blocks_sw.append({
            "fsmn_layers": fsmn,
            "attn_layer": {"attn_layer": ckpt._to_jax(
                ckpt.convert_attn_mem(StateDict(attn_net.state_dict()))),
                "ln_layer": ln}})
    rng = np.random.RandomState(9)
    params = {"embed": embed_p, "blocks_sw": blocks_sw,
              "out_linear_sw": {
                  "kernel": jnp.asarray(rng.randn(16, 7) * 0.3,
                                        jnp.float32),
                  "bias": jnp.zeros(7)}}
    cfg = dfsmn.DfsmnSanMoEConfig(
        num_block=2, fsmn_each_block=2, hidden_dim=24, memory_dim=16,
        num_head=4, num_memory=8, num_experts=4, embed_dim=16,
        look_ahead=0,
        embed_conf=dfsmn.DfsmnSanConfig(
            num_block=1, fsmn_each_block=2, hidden_dim=24,
            memory_dim=16, num_head=4, num_memory=8, look_ahead=0))
    return params, cfg


@pytest.mark.slow
def test_dfsmn_moe_streaming_causal_exact():
    """Causal MoE-DFSMN session (embed substream + catEmbed router
    alignment) emits exactly the chunk-masked offline forward."""
    from m3asr_tpu.runtime.streaming_session import DfsmnMoeStreamingSession
    params, cfg = _causal_moe_net()
    T, C = 22, 6
    x = np.random.RandomState(120).randn(1, T, 12).astype(np.float32)
    Tp = ((T + C - 1) // C) * C
    xp = np.zeros((1, Tp, 12), np.float32)
    xp[:, :T] = x
    posp = np.arange(Tp)
    mask = jnp.asarray(posp[None, :] < ((posp[:, None] // C) + 1) * C)
    full, _, _ = dfsmn.dfsmn_san_moe_forward(params, cfg, jnp.asarray(xp),
                                             None, attn_mask=mask)

    sess = DfsmnMoeStreamingSession(params, cfg, chunk_size=C,
                                    cache_T=Tp)
    outs = sess.push(x[:, :5]) + sess.push(x[:, 5:16]) \
        + sess.push(x[:, 16:]) + sess.finish()
    stream = np.concatenate(outs, axis=1)
    assert stream.shape[1] == T
    allclose(stream, np.asarray(full)[:, :T], atol=1e-4)


def test_dfsmn_moe_streaming_lookahead_bookkeeping():
    """With FIR look-ahead the embed stream lags behind the router's
    needs; the input delay buffer keeps alignment and the session still
    emits exactly T matured frames."""
    from test_dfsmn_moe import _moe_net_params
    from m3asr_tpu.runtime.streaming_session import DfsmnMoeStreamingSession
    from m3asr_tpu.models.dfsmn_streaming import moe_stream_delay

    params = _moe_net_params()
    cfg = dfsmn.DfsmnSanMoEConfig(
        num_block=2, fsmn_each_block=2, hidden_dim=24, memory_dim=16,
        num_head=4, num_memory=8, num_experts=4, embed_dim=16,
        embed_conf=dfsmn.DfsmnSanConfig(
            num_block=1, fsmn_each_block=2, hidden_dim=24,
            memory_dim=16, num_head=4, num_memory=8))
    # embed look-ahead total D_e = 2 > per-layer rctx 1 -> B = 1;
    # session delay = B + 4 fsmn layers * rctx
    assert moe_stream_delay(cfg, 8) == 1 + 4
    T = 21
    x = np.random.RandomState(121).randn(1, T, 12).astype(np.float32)
    sess = DfsmnMoeStreamingSession(params, cfg, chunk_size=8,
                                    cache_T=64)
    outs = sess.push(x) + sess.finish()
    stream = np.concatenate(outs, axis=1)
    assert stream.shape[1] == T
    assert np.isfinite(stream).all()


def test_dfsmn_moe_streaming_int8():
    """moe_impl='quant' streams the int8-quantized expert tensors and
    stays close to the float stream."""
    from m3asr_tpu.ops.quant import quantize_moe_params
    from m3asr_tpu.runtime.streaming_session import DfsmnMoeStreamingSession
    params, cfg = _causal_moe_net()

    def q(node):
        if isinstance(node, dict):
            if "w1" in node and "w2" in node and "router" in node:
                return quantize_moe_params(node)
            return {k: q(v) for k, v in node.items()}
        if isinstance(node, list):
            return [q(v) for v in node]
        return node

    qparams = q(params)
    T = 18
    x = np.random.RandomState(122).randn(1, T, 12).astype(np.float32)

    f32 = DfsmnMoeStreamingSession(params, cfg, chunk_size=6, cache_T=24)
    i8 = DfsmnMoeStreamingSession(qparams, cfg, chunk_size=6, cache_T=24,
                                  moe_impl="quant")
    s32 = np.concatenate(f32.push(x) + f32.finish(), axis=1)
    s8 = np.concatenate(i8.push(x) + i8.finish(), axis=1)
    assert s8.shape == s32.shape == (1, T, 7)
    rel = np.abs(s8 - s32).max() / (np.abs(s32).max() + 1e-6)
    assert rel < 0.08, rel
