"""int8 engine mode: close to fp32 logits, survives save/load."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import numpy as np
import torch

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import model_config_from_dict
from m3asr_tpu.runtime.engine import Engine, EngineConfig

from test_runtime import golden_model, small_yaml


def test_int8_engine_and_roundtrip(tmp_path):
    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)

    g = torch.Generator().manual_seed(90)
    feat = torch.randn(1, 53, 20, generator=g).numpy()
    fl = np.array([53])

    fp32 = Engine(cfg, params,
                  EngineConfig(bucket_lengths=(64,), bucket_batches=(1,),
                               donate_input=False))
    ref, ref_len = fp32.infer(feat, fl)

    q = Engine(cfg, params,
               EngineConfig(dtype="int8", bucket_lengths=(64,),
                            bucket_batches=(1,), donate_input=False))
    # expert tensors must actually be int8
    ff = q.params["blocks"]["feed_forward"]
    assert "w1_q" in ff and ff["w1_q"].dtype == np.int8
    out, out_len = q.infer(feat, fl)
    assert (out_len == ref_len).all()
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.08, rel  # bf16 activations + int8 experts

    # engine dir round trip keeps int8 tensors + scales
    q.save(str(tmp_path / "eng"), raw_yaml=raw)
    q2 = Engine.load(str(tmp_path / "eng"))
    out2, _ = q2.infer(feat, fl)
    np.testing.assert_allclose(out2, out, rtol=2e-2, atol=2e-2)


def test_act_quant_engine_and_roundtrip(tmp_path):
    """w8a8 mode: s8 x s8 expert einsums, close to the weight-only int8
    engine, survives save/load; rejected without int8 weights."""
    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)

    g = torch.Generator().manual_seed(91)
    feat = torch.randn(1, 53, 20, generator=g).numpy()
    fl = np.array([53])

    q = Engine(cfg, params,
               EngineConfig(dtype="int8", bucket_lengths=(64,),
                            bucket_batches=(1,), donate_input=False))
    ref, ref_len = q.infer(feat, fl)

    a8 = Engine(cfg, params,
                EngineConfig(dtype="int8", act_quant=True,
                             bucket_lengths=(64,), bucket_batches=(1,),
                             donate_input=False))
    assert a8._moe_impl_for(1, 64) == "quant_a8"
    out, out_len = a8.infer(feat, fl)
    assert (out_len == ref_len).all()
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.08, rel

    a8.save(str(tmp_path / "eng_a8"), raw_yaml=raw)
    a82 = Engine.load(str(tmp_path / "eng_a8"))
    assert a82.cfg.act_quant
    out2, _ = a82.infer(feat, fl)
    np.testing.assert_allclose(out2, out, rtol=2e-2, atol=2e-2)

    with pytest.raises(ValueError, match="act_quant"):
        Engine(cfg, params,
               EngineConfig(dtype="float32", act_quant=True,
                            bucket_lengths=(64,), bucket_batches=(1,)))
