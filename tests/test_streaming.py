"""Streaming chunk decode == full-utterance forward with the matching
chunk attention mask (for a causal-conv model) — the property the
reference's dormant cat_split_cache / att_stream_softmax plugins were
built to deliver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.config import EncoderConfig, MoEConfig, MoEEncoderConfig
from m3asr_tpu.models import conformer, moe_conformer, streaming

from test_op_parity import allclose

CHUNK = 4           # post-subsample chunk size
LEFT_CHUNKS = 2
CACHE_T = CHUNK * LEFT_CHUNKS


def _stream_all(params, cfg, feat, n_chunks, moe=False):
    B = feat.shape[0]
    state = streaming.init_state(cfg, B, CACHE_T)
    if moe:
        e_state = streaming.init_state(cfg.embed_conf, B, CACHE_T)
    outs = []
    for i in range(n_chunks):
        w = feat[:, 4 * CHUNK * i: 4 * CHUNK * i + 4 * CHUNK + 3]
        if moe:
            out, state, e_state = streaming.forward_chunk_moe(
                params, cfg, jnp.asarray(w), state, e_state)
        else:
            out, state = streaming.forward_chunk(params, cfg,
                                                 jnp.asarray(w), state)
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1)


@pytest.mark.slow
def test_dense_streaming_matches_chunked_full_forward():
    cfg = EncoderConfig(attention_dim=32, attention_heads=4,
                        linear_units=48, num_blocks=2, causal=True,
                        cnn_module_norm="layer_norm")
    params = conformer.init(jax.random.PRNGKey(3), cfg, 20, 11)
    n_chunks = 3
    T_out = CHUNK * n_chunks
    T_raw = 4 * T_out + 3
    feat = np.random.RandomState(4).randn(2, T_raw, 20).astype(np.float32)

    mask = conformer.chunk_attention_mask(T_out, CHUNK, LEFT_CHUNKS)
    full, out_len = conformer.forward(params, cfg, jnp.asarray(feat),
                                      jnp.array([T_raw, T_raw]),
                                      chunk_mask=mask)
    assert int(out_len[0]) == T_out
    got = _stream_all(params, cfg, feat, n_chunks)
    allclose(got, np.asarray(full), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_moe_streaming_matches_chunked_full_forward():
    cfg = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=2, causal=True,
        cnn_module_norm="layer_norm",
        embed_conf=EncoderConfig(attention_dim=24, attention_heads=4,
                                 linear_units=32, num_blocks=1,
                                 causal=True,
                                 cnn_module_norm="layer_norm"),
        moe_conf=MoEConfig(num_experts=4, hidden_units=48))
    params = moe_conformer.init(jax.random.PRNGKey(5), cfg, 20, 11)
    n_chunks = 3
    T_out = CHUNK * n_chunks
    T_raw = 4 * T_out + 3
    feat = np.random.RandomState(6).randn(1, T_raw, 20).astype(np.float32)

    mask = conformer.chunk_attention_mask(T_out, CHUNK, LEFT_CHUNKS)
    full = moe_conformer.forward(params, cfg, jnp.asarray(feat),
                                 jnp.array([T_raw]), chunk_mask=mask)[0]
    got = _stream_all(params, cfg, feat, n_chunks, moe=True)
    allclose(got, np.asarray(full), rtol=1e-4, atol=1e-4)
