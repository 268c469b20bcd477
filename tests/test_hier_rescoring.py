"""Hier attention rescoring: engine tap emission + 3-decoder scoring."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import (DecoderConfig, ModelConfig, EncoderConfig,
                              model_config_from_dict)
from m3asr_tpu.models import aed, moe_conformer
from m3asr_tpu.runtime.engine import Engine, EngineConfig

from test_runtime import golden_model, small_yaml


def _engine_with_taps():
    m = golden_model()
    cfg = model_config_from_dict(small_yaml())
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    ecfg = EngineConfig(bucket_lengths=(64,), bucket_batches=(2,),
                        donate_input=False, return_taps=True)
    return Engine(cfg, params, ecfg), cfg, params


@pytest.mark.slow
def test_engine_emits_hier_taps():
    eng, cfg, params = _engine_with_taps()
    rng = np.random.RandomState(0)
    feat = rng.randn(1, 53, 20).astype(np.float32)
    res = eng.infer(feat, np.array([53]))
    assert len(res) == 5
    out, out_lens, h6, h12, hf = res

    # reference: direct model forward with hier_taps
    pad = np.zeros((2, 64, 20), np.float32)
    pad[0, :53] = feat[0]
    with jax.default_matmul_precision("highest"):
        r = moe_conformer.forward(eng.params, cfg.encoder_conf,
                                  jnp.asarray(pad),
                                  jnp.asarray([53, 0], jnp.int32),
                                  hier_taps=True)
    _, rlen, r6, r12, rf = r
    n = int(out_lens[0])
    for got, ref in ((h6, r6), (h12, r12), (hf, rf)):
        np.testing.assert_allclose(got[0, :n], np.asarray(ref)[0, :n],
                                   rtol=1e-5, atol=1e-4)
    # tap order sanity: h_final is the normalized final hidden, distinct
    # from the earlier taps in a 2-block model (tap indices clamp to
    # blocks 1 and 2)
    assert not np.allclose(h6[0, :n], hf[0, :n])


def _three_decoders(d_model=32, vocab=11):
    dcfg = DecoderConfig(attention_heads=4, linear_units=48, num_blocks=1)
    decs = {}
    for i, name in enumerate(("decoder", "decoder_1", "decoder_2")):
        decs[name] = aed.init(jax.random.PRNGKey(60 + i), dcfg, vocab,
                              d_model)
    return dcfg, decs


@pytest.mark.slow
def test_hier_rescoring_picks_from_nbest():
    dcfg, decs = _three_decoders()
    rng = np.random.RandomState(1)
    taps = tuple(jnp.asarray(rng.randn(1, 9, 32), jnp.float32)
                 for _ in range(3))
    nbest = [((1, 2, 3), -1.0), ((4, 5), -2.0), ((6,), -3.0)]
    hyp, score = aed.hier_attention_rescoring(
        decs, dcfg, nbest, taps, 9, sos=10, eos=10, ignore_id=0)
    assert tuple(hyp) in {h for h, _ in nbest}
    assert np.isfinite(score)


@pytest.mark.slow
def test_hier_rescoring_single_decoder_matches_plain():
    dcfg, decs = _three_decoders()
    rng = np.random.RandomState(2)
    taps = tuple(jnp.asarray(rng.randn(1, 9, 32), jnp.float32)
                 for _ in range(3))
    nbest = [((1, 2, 3), -1.0), ((4, 5), -2.0)]
    only = {"decoder": decs["decoder"]}
    h_hier, s_hier = aed.hier_attention_rescoring(
        only, dcfg, nbest, taps, 9, sos=10, eos=10, ignore_id=0)
    h_plain, s_plain = aed.attention_rescoring(
        decs["decoder"], dcfg, nbest, taps[2], 9, sos=10, eos=10,
        ignore_id=0)
    assert h_hier == h_plain
    np.testing.assert_allclose(s_hier, s_plain, rtol=1e-6)


@pytest.mark.slow
def test_hier_rescoring_uses_each_tap():
    # scoring must differ when a tap memory changes (each decoder reads
    # its own memory)
    dcfg, decs = _three_decoders()
    rng = np.random.RandomState(3)
    taps = tuple(jnp.asarray(rng.randn(1, 9, 32), jnp.float32)
                 for _ in range(3))
    nbest = [((1, 2, 3), -1.0), ((4, 5), -2.0)]
    _, s0 = aed.hier_attention_rescoring(
        decs, dcfg, nbest, taps, 9, sos=10, eos=10, ignore_id=0)
    taps2 = (jnp.asarray(rng.randn(1, 9, 32), jnp.float32),) + taps[1:]
    _, s1 = aed.hier_attention_rescoring(
        decs, dcfg, nbest, taps2, 9, sos=10, eos=10, ignore_id=0)
    assert abs(s0 - s1) > 1e-9
