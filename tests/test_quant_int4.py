"""int4 weight-only expert quantization (group-wise scales).

The reference never shipped a working low-precision path at all
(builder.py:43 int8 `assert 0`, fmoe_expert_plugin.cpp:264 fp16
`assert(0)`); int8 already beats it, int4 halves the HBM-bound MoE
weight bytes again. These tests pin the numerics on CPU; the on-chip
latency A/B rides bench.py --dtype int4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.ops import moe
from m3asr_tpu.ops.quant import (INT4_GROUP, _deq, quantize_moe_params,
                                 quantize_tensor)


def _rand_w(shape, seed=0, scale=0.1):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape) * scale).astype(np.float32)


def test_int4_group_quant_roundtrip_beats_per_column():
    """Group-wise scales must recover the tensor better than one scale
    per output column (the int8 layout) at the same 15-level grid."""
    w = _rand_w((4, 256, 64), seed=1)
    # inject per-group magnitude skew along the contraction dim — the
    # regime group scales exist for
    w[:, :32] *= 8.0
    qg, sg = quantize_tensor(w, bits=4, group_size=32)
    qc, sc = quantize_tensor(w, bits=4, group_size=None)
    from m3asr_tpu.ops.quant import pack_int4
    deq_g = np.asarray(_deq({"w_q4": jnp.asarray(pack_int4(qg)),
                             "w_scale": jnp.asarray(sg)}, "w", jnp.float32))
    deq_c = np.asarray(_deq({"w_q4": jnp.asarray(pack_int4(qc)),
                             "w_scale": jnp.asarray(sc)}, "w", jnp.float32))
    # the skewed group saturates both layouts' grids identically; the
    # win is everywhere else, so compare RMS, and max error on the
    # unskewed region
    rms_g = np.sqrt(np.mean((deq_g - w) ** 2))
    rms_c = np.sqrt(np.mean((deq_c - w) ** 2))
    assert rms_g < rms_c * 0.5, (rms_g, rms_c)
    err_g_plain = np.abs(deq_g - w)[:, 32:].max()
    err_c_plain = np.abs(deq_c - w)[:, 32:].max()
    assert err_g_plain < err_c_plain * 0.25, (err_g_plain, err_c_plain)
    # and the grouped grid is accurate in absolute terms: per-group
    # max error is group-amax/(2*7)
    assert np.abs(deq_g - w).max() <= np.abs(w).max() / 14 + 1e-6


def test_int4_group_size_fallback():
    """A contraction dim the group does not divide falls back to
    whole-axis (per-column) scales instead of failing."""
    q, s = quantize_tensor(_rand_w((2, 24, 8)), bits=4, group_size=16)
    assert s.shape == (2, 1, 8)
    q, s = quantize_tensor(_rand_w((2, 64, 8)), bits=4, group_size=16)
    assert s.shape == (2, 4, 1, 8)


def _moe_setup(seed=0, d=32, h=64, E=4, B=2, T=12):
    key = jax.random.PRNGKey(seed)
    p = moe.init_moe_ffn(key, d, 0, E, h, jnp.float32)
    p.pop("router")
    rng = np.random.RandomState(seed + 7)
    x = jnp.asarray(rng.randn(B, T, d).astype(np.float32))
    gate_idx = jnp.asarray(rng.randint(0, E, (B, T)), jnp.int32)
    return p, x, gate_idx


def test_int4_dense_matches_manual_dequant():
    """moe_experts_dense_q on int4 params == the float dense path on
    the explicitly dequantized weights (same math, so near-exact)."""
    p, x, gate_idx = _moe_setup()
    q = quantize_moe_params(p, bits=4, group_size=16)
    # nibble-packed storage: int8 bytes, half the output columns
    assert q["w1_q4"].dtype == jnp.int8 and q["w1_scale"].ndim == 4
    assert q["w1_q4"].shape[-1] == p["w1"].shape[-1] // 2
    assert "w1_q" not in q

    from m3asr_tpu.ops.quant import moe_experts_dense_q
    out_q = jax.jit(lambda qq: moe_experts_dense_q(qq, x, gate_idx))(q)

    deq = dict(p)
    deq["w1"] = _deq(q, "w1", jnp.float32)
    deq["w2"] = _deq(q, "w2", jnp.float32)
    ref = moe.moe_experts_dense(deq, x, gate_idx)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and int4 stays close to the float experts
    full = moe.moe_experts_dense(p, x, gate_idx)
    rel = np.abs(np.asarray(out_q) - np.asarray(full)).max() / \
        (np.abs(np.asarray(full)).max() + 1e-9)
    assert rel < 0.15, rel


def test_int4_tiled_and_capacity_match_dense():
    p, x, gate_idx = _moe_setup(seed=3)
    q = quantize_moe_params(p, bits=4, group_size=16)
    from m3asr_tpu.ops.quant import (moe_experts_capacity_q,
                                     moe_experts_dense_q,
                                     moe_experts_tiled_q)
    ref = moe_experts_dense_q(q, x, gate_idx)
    tiled = jax.jit(lambda qq: moe_experts_tiled_q(qq, x, gate_idx,
                                                   tile=8))(q)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    cap = jax.jit(lambda qq: moe_experts_capacity_q(qq, x, gate_idx))(q)
    np.testing.assert_allclose(np.asarray(cap), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_int4_default_group_is_awq_128():
    p, _, _ = _moe_setup(d=256, h=128)
    q = quantize_moe_params(p, bits=4)
    # w1 (E, 256, 128): 256/INT4_GROUP groups; w2 (E, 128, 256): 128
    # == INT4_GROUP -> degenerates to per-column (one whole-axis group)
    assert q["w1_scale"].shape == (4, 256 // INT4_GROUP, 1, 128)
    assert q["w2_scale"].shape == (4, 1, 256)


def test_int4_pack_roundtrip():
    """pack_int4/unpack_int4 are exact inverses over the full int4
    range, and unpacked values dequantize identically to the raw q."""
    from m3asr_tpu.ops.quant import pack_int4, unpack_int4
    rng = np.random.RandomState(4)
    q = rng.randint(-8, 8, (3, 16, 10)).astype(np.int8)
    packed = pack_int4(q)
    assert packed.dtype == np.int8 and packed.shape == (3, 16, 5)
    un = np.asarray(unpack_int4(jnp.asarray(packed), jnp.int32))
    np.testing.assert_array_equal(un, q)


def test_int4_npz_roundtrip():
    """Packed int4 leaves are plain int8 and round-trip npz untouched;
    LEGACY engine dirs (unpacked s4 leaves tagged __i4) load as the
    packed layout."""
    from m3asr_tpu.runtime.engine import _flatten, _unflatten
    p, _, _ = _moe_setup()
    q = quantize_moe_params(p, bits=4, group_size=16)
    flat = _flatten({"ff": q})
    assert not any(k.endswith("__i4") for k in flat)
    import io
    buf = io.BytesIO()
    np.savez(buf, **flat)
    buf.seek(0)
    tree = _unflatten(dict(np.load(buf)))
    np.testing.assert_array_equal(np.asarray(tree["ff"]["w1_q4"]),
                                  np.asarray(q["w1_q4"]))

    # legacy: an __i4-tagged unpacked leaf repacks on load
    from m3asr_tpu.ops.quant import pack_int4
    rng = np.random.RandomState(5)
    raw = rng.randint(-8, 8, (2, 8, 6)).astype(np.int8)
    tree = _unflatten({"ff/w1_q__i4": raw})
    np.testing.assert_array_equal(np.asarray(tree["ff"]["w1_q4"]),
                                  pack_int4(raw))


@pytest.mark.slow
def test_int4_engine_and_roundtrip(tmp_path):
    """dtype='int4' engine: close to fp32 logits, survives the engine
    dir round trip (the int8 test's int4 twin)."""
    import torch

    from m3asr_tpu import checkpoint as ckpt
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    from test_runtime import golden_model, small_yaml

    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)

    g = torch.Generator().manual_seed(91)
    feat = torch.randn(1, 53, 20, generator=g).numpy()
    fl = np.array([53])

    fp32 = Engine(cfg, params,
                  EngineConfig(bucket_lengths=(64,), bucket_batches=(1,),
                               donate_input=False))
    ref, ref_len = fp32.infer(feat, fl)

    q = Engine(cfg, params,
               EngineConfig(dtype="int4", bucket_lengths=(64,),
                            bucket_batches=(1,), donate_input=False))
    ff = q.params["blocks"]["feed_forward"]
    assert "w1_q4" in ff and str(ff["w1_q4"].dtype) == "int8"
    out, out_len = q.infer(feat, fl)
    assert (out_len == ref_len).all()
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.15, rel  # bf16 activations + int4 experts

    q.save(str(tmp_path / "eng"), raw_yaml=raw)
    q2 = Engine.load(str(tmp_path / "eng"))
    assert str(q2.params["blocks"]["feed_forward"]["w1_q4"].dtype) == "int8"
    out2, _ = q2.infer(feat, fl)
    np.testing.assert_allclose(out2, out, rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_cli_build_int4(tmp_path):
    """build.py --int4 produces an int4 engine dir that infer.py
    decodes (the CLI twin of the reference's never-working int8
    builder path)."""
    import json
    import os
    import subprocess
    import sys

    import torch
    import yaml

    from test_runtime import REPO, golden_model, small_yaml

    m = golden_model()
    sd = {f"encoder.{k}": v for k, v in m.state_dict().items()}
    torch.save(sd, tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    g = torch.Generator().manual_seed(92)
    np.save(tmp_path / "feat.npy",
            torch.randn(1, 40, 20, generator=g).numpy())

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64", "--int4",
         "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    with open(tmp_path / "eng" / "engine.json") as f:
        assert json.load(f)["dtype"] == "int4"

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "infer.py"),
         "-p", str(tmp_path / "eng"), "-i", str(tmp_path / "feat.npy"),
         "-d", "greedy"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "hyp:" in r.stdout


def test_int4_pallas_impl_maps_to_q4_kernel():
    """int4 + moe_impl='pallas'/'quant_pallas' maps onto the packed q4
    kernel (quant4_pallas on TPU, XLA quant off-TPU) instead of the
    pre-round-9 NotImplementedError."""
    from m3asr_tpu.runtime.engine import moe_auto_impl

    for req in ("pallas", "quant_pallas"):
        impl = moe_auto_impl("bfloat16", 64, int8=True, requested=req,
                             int4=True)
        # CPU test backend -> XLA fallback; the explicit-name contract
        # is covered in test_w4a8_auto_policy
        assert impl in ("quant4_pallas", "quant")


def test_repack_int4_tp_roundtrip():
    """repack_int4_tp -> unpack_int4_tp equals the plain unpack for
    every tp that divides the column count: the tp-chunked layout is a
    pure re-pairing of nibbles, values and order unchanged (the tp x
    int4 sharded-serving layout, quant.repack_int4_tp)."""
    import numpy as np
    import jax.numpy as jnp
    from m3asr_tpu.ops.quant import (pack_int4, repack_int4_tp,
                                     unpack_int4, unpack_int4_tp)

    rng = np.random.RandomState(7)
    vals = rng.randint(-8, 8, (3, 5, 24), dtype=np.int8)
    q4 = pack_int4(vals)
    want = np.asarray(unpack_int4(jnp.asarray(q4), jnp.float32))
    np.testing.assert_array_equal(want, vals.astype(np.float32))
    for tp in (1, 2, 3, 4, 6, 12):
        q4c = repack_int4_tp(q4, tp)
        assert q4c.shape == (3, 5, tp, 12 // tp)
        got = np.asarray(unpack_int4_tp(jnp.asarray(q4c), jnp.float32))
        np.testing.assert_array_equal(got, want)
