"""Host-side StreamingSession: incremental pushes == one-shot forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.config import EncoderConfig
from m3asr_tpu.models import conformer
from m3asr_tpu.runtime.streaming_session import StreamingSession

from test_op_parity import allclose


@pytest.mark.slow
def test_session_incremental_matches_chunked_forward():
    cfg = EncoderConfig(attention_dim=32, attention_heads=4,
                        linear_units=48, num_blocks=2, causal=True,
                        cnn_module_norm="layer_norm")
    params = conformer.init(jax.random.PRNGKey(9), cfg, 20, 11)
    CHUNK, LEFT = 4, 2
    n_chunks = 3
    T_out = CHUNK * n_chunks
    T_raw = 4 * T_out + 3
    feat = np.random.RandomState(10).randn(1, T_raw, 20).astype(np.float32)

    mask = conformer.chunk_attention_mask(T_out, CHUNK, LEFT)
    full, _ = conformer.forward(params, cfg, jnp.asarray(feat),
                                jnp.array([T_raw]), chunk_mask=mask)

    sess = StreamingSession(params, cfg, chunk_size=CHUNK,
                            num_left_chunks=LEFT)
    outs = []
    # push in awkward pieces (7 frames at a time)
    for i in range(0, T_raw, 7):
        outs += sess.push(feat[:, i:i + 7])
    outs += sess.finish()
    got = np.concatenate(outs, axis=1)
    # the session emits all full windows; the tail may add partial
    # frames beyond the chunk-mask comparison — compare the full chunks
    allclose(got[:, :T_out], np.asarray(full)[:, :T_out], rtol=1e-4,
             atol=1e-4)
