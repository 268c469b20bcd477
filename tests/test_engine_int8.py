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


def test_dense_quant_engine_and_roundtrip(tmp_path):
    """dense_quant (round-4 VERDICT #2): weight-only int8 on the
    NON-expert weights too — attention/FFN/pointwise/out_linear
    kernels become kernel_q + per-column kernel_scale, consumed
    transparently by ops.common.linear. Close to the unquantized
    engine, actually shrinks the dense bytes, survives save/load,
    refuses ep/tp until split rules exist."""
    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)

    g = torch.Generator().manual_seed(92)
    feat = torch.randn(2, 53, 20, generator=g).numpy()
    fl = np.array([53, 31])

    ecfg = dict(bucket_lengths=(64,), bucket_batches=(2,),
                donate_input=False)
    ref, ref_len = Engine(cfg, params,
                          EngineConfig(**ecfg)).infer(feat, fl)

    dq = Engine(cfg, params, EngineConfig(dense_quant=True, **ecfg))
    # attention kernels must actually be int8 (+ scale), router float
    sa = dq.params["blocks"]["self_attn"]["linear_q"]
    assert sa["kernel_q"].dtype == np.int8 and "kernel" not in sa
    assert sa["kernel_scale"].shape == (sa["kernel_q"].shape[0], 1,
                                        sa["kernel_q"].shape[2])
    assert "kernel" in dq.params["blocks"]["feed_forward"]["router"]
    out, out_len = dq.infer(feat, fl)
    assert (out_len == ref_len).all()
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert 0 < rel < 0.08, rel

    # composes with int8 experts (the serving combination)
    q = Engine(cfg, params,
               EngineConfig(dtype="int8", dense_quant=True, **ecfg))
    out_q, _ = q.infer(feat, fl)
    rel_q = np.abs(out_q - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel_q < 0.1, rel_q

    # round trip
    q.save(str(tmp_path / "eng"), raw_yaml=raw)
    q2 = Engine.load(str(tmp_path / "eng"))
    assert q2.cfg.dense_quant
    out2, _ = q2.infer(feat, fl)
    np.testing.assert_allclose(out2, out_q, rtol=2e-2, atol=2e-2)

    # refuses sharded serving until kernel_q split rules exist
    import jax
    if len(jax.devices()) >= 2:
        with pytest.raises(NotImplementedError, match="dense_quant"):
            Engine(cfg, params,
                   EngineConfig(dense_quant=True, ep=2, **ecfg))


def test_fuse_qkv_engine_parity(tmp_path):
    """fuse_qkv: one (D, 3D) qkv matmul + one 2*Dk-contraction rel-pos
    score dot per block — numerics identical to the unfused engine up
    to fp accumulation order (tight tolerance), survives save/load,
    composes with dense_quant, refuses flash."""
    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)

    g = torch.Generator().manual_seed(93)
    feat = torch.randn(2, 53, 20, generator=g).numpy()
    fl = np.array([53, 29])

    ecfg = dict(bucket_lengths=(64,), bucket_batches=(2,),
                donate_input=False)
    ref, ref_len = Engine(cfg, params,
                          EngineConfig(**ecfg)).infer(feat, fl)

    fq = Engine(cfg, params, EngineConfig(fuse_qkv=True, **ecfg))
    sa = fq.params["blocks"]["self_attn"]
    assert "linear_qkv" in sa and "linear_q" not in sa
    out, out_len = fq.infer(feat, fl)
    assert (out_len == ref_len).all()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # + dense_quant: the FUSED kernel quantizes per-column
    both = Engine(cfg, params,
                  EngineConfig(fuse_qkv=True, dense_quant=True, **ecfg))
    assert both.params["blocks"]["self_attn"]["linear_qkv"][
        "kernel_q"].dtype == np.int8
    out_b, _ = both.infer(feat, fl)
    rel = np.abs(out_b - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.08, rel

    both.save(str(tmp_path / "eng"), raw_yaml=raw)
    eng2 = Engine.load(str(tmp_path / "eng"))
    out2, _ = eng2.infer(feat, fl)
    np.testing.assert_allclose(out2, out_b, rtol=2e-2, atol=2e-2)

    with pytest.raises(NotImplementedError, match="flash"):
        Engine(cfg, params,
               EngineConfig(fuse_qkv=True, attn_impl="flash", **ecfg))
