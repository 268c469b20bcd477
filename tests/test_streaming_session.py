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


@pytest.mark.slow
def test_int4_streaming_session_matches_offline(monkeypatch):
    """int4 engines stream (round-2 VERDICT item 8): a StreamingSession
    over int4-quantized expert tensors matches the offline chunk-masked
    forward on the same quant params — for both the XLA dequant twin
    ('quant', what CPU serving uses) and the packed-nibble Pallas
    kernel ('quant4_pallas', interpret mode here; what TPU serving
    selects at chunk token counts)."""
    from m3asr_tpu.config import MoEConfig, MoEEncoderConfig
    from m3asr_tpu.models import moe_conformer
    from m3asr_tpu.ops.quant import quantize_moe_params

    cfg = MoEEncoderConfig(
        attention_dim=32, attention_heads=4, num_blocks=2, causal=True,
        cnn_module_norm="layer_norm",
        embed_conf=EncoderConfig(attention_dim=24, attention_heads=4,
                                 linear_units=32, num_blocks=1,
                                 causal=True,
                                 cnn_module_norm="layer_norm"),
        moe_conf=MoEConfig(num_experts=4, hidden_units=48))
    params = moe_conformer.init(jax.random.PRNGKey(11), cfg, 20, 11)
    qparams = dict(params)
    blocks = dict(qparams["blocks"])
    blocks["feed_forward"] = quantize_moe_params(blocks["feed_forward"],
                                                 bits=4)
    qparams["blocks"] = blocks

    CHUNK, LEFT = 16, 2
    n_chunks = 3
    T_out = CHUNK * n_chunks
    T_raw = 4 * T_out + 3
    feat = np.random.RandomState(12).randn(1, T_raw, 20).astype(np.float32)

    mask = conformer.chunk_attention_mask(T_out, CHUNK, LEFT)
    full, _ = moe_conformer.forward(qparams, cfg, jnp.asarray(feat),
                                    jnp.array([T_raw]), chunk_mask=mask,
                                    moe_impl="quant")

    for impl, tol in (("quant", 1e-4), ("quant4_pallas", 2e-3)):
        sess = StreamingSession(qparams, cfg, chunk_size=CHUNK,
                                num_left_chunks=LEFT, moe=True,
                                moe_impl=impl)
        outs = sess.push(feat) + sess.finish()
        got = np.concatenate(outs, axis=1)
        allclose(got[:, :T_out], np.asarray(full)[:, :T_out], rtol=tol,
                 atol=tol)

    # float run-length kernel (round 5) through the same
    # keep-weights-out-of-scan streaming path, vs the dense offline
    # forward on the ORIGINAL float params
    full_f, _ = moe_conformer.forward(params, cfg, jnp.asarray(feat),
                                      jnp.array([T_raw]),
                                      chunk_mask=mask, moe_impl="dense")
    sess = StreamingSession(params, cfg, chunk_size=CHUNK,
                            num_left_chunks=LEFT, moe=True,
                            moe_impl="runs_f")
    outs = sess.push(feat) + sess.finish()
    got = np.concatenate(outs, axis=1)
    allclose(got[:, :T_out], np.asarray(full_f)[:, :T_out], rtol=1e-4,
             atol=1e-4)

    # serve.py's streaming impl selection engages the Pallas kernel on
    # TPU and the XLA twin elsewhere
    import serve as serve_mod

    class _Eng:
        int8_experts = True
        quant_bits = 4

        class cfg:
            act_quant = False

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert serve_mod._stream_moe_impl(_Eng(), 8) == "quant4_pallas"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert serve_mod._stream_moe_impl(_Eng(), 8) == "quant"

    class _FloatEng:
        int8_experts = False

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert serve_mod._stream_moe_impl(_FloatEng(), 1) == "runs_f"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert serve_mod._stream_moe_impl(_FloatEng(), 1) == "dense"
