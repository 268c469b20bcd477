"""jax.export engine serialization — the true .plan analogue.

The reference serializes a TRT plan (builder_helper.py:146-167) that
deserializes and runs with no model code. Engine dirs replicate that
with per-bucket jax.export StableHLO artifacts: Engine.load prefers
them (no Python retracing of the model), and falls back to
retrace+compile when the artifact does not fit the running backend or
jax version.
"""

import logging
import os

import numpy as np
import pytest
import torch

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import model_config_from_dict
from m3asr_tpu.runtime.engine import Engine, EngineConfig

from test_runtime import golden_model, small_yaml


def _setup():
    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    g = torch.Generator().manual_seed(93)
    feat = torch.randn(2, 53, 20, generator=g).numpy()
    fl = np.array([53, 31])
    return raw, cfg, params, feat, fl


def test_exported_engine_matches_retraced(tmp_path):
    raw, cfg, params, feat, fl = _setup()
    ecfg = EngineConfig(bucket_lengths=(64,), bucket_batches=(2,),
                        donate_input=False)
    eng = Engine(cfg, params, ecfg)
    ref, ref_len = eng.infer(feat, fl)

    # export targets the current (cpu) platform in this test env
    eng.save(str(tmp_path / "eng"), raw_yaml=raw,
             export_platforms=("cpu",))
    assert os.path.exists(tmp_path / "eng" / "exported" / "2x64.jaxexp")

    eng2 = Engine.load(str(tmp_path / "eng"))
    # the bucket fn must come from the artifact, not a retrace
    assert eng2._exported_fn(2, 64) is not None
    out, out_len = eng2.infer(feat, fl)
    assert (out_len == ref_len).all()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_exported_engine_platform_fallback(tmp_path, caplog):
    """An artifact for a platform we are not running on is skipped
    with a warning and the engine retraces — never fails."""
    raw, cfg, params, feat, fl = _setup()
    ecfg = EngineConfig(bucket_lengths=(64,), bucket_batches=(2,),
                        donate_input=False)
    eng = Engine(cfg, params, ecfg)
    ref, _ = eng.infer(feat, fl)
    eng.save(str(tmp_path / "eng"), raw_yaml=raw,
             export_platforms=("tpu",))  # not runnable on CPU

    eng2 = Engine.load(str(tmp_path / "eng"))
    with caplog.at_level(logging.WARNING, logger="m3asr"):
        assert eng2._exported_fn(2, 64) is None
    assert any("retracing" in r.message for r in caplog.records)
    out, _ = eng2.infer(feat, fl)   # falls back transparently
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_exported_engine_corrupt_blob_falls_back(tmp_path):
    raw, cfg, params, feat, fl = _setup()
    ecfg = EngineConfig(bucket_lengths=(64,), bucket_batches=(2,),
                        donate_input=False)
    eng = Engine(cfg, params, ecfg)
    ref, _ = eng.infer(feat, fl)
    eng.save(str(tmp_path / "eng"), raw_yaml=raw,
             export_platforms=("cpu",))
    blob = tmp_path / "eng" / "exported" / "2x64.jaxexp"
    blob.write_bytes(b"garbage not a stablehlo artifact")
    eng2 = Engine.load(str(tmp_path / "eng"))
    out, _ = eng2.infer(feat, fl)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_export_sharded_engine_roundtrip(tmp_path):
    """ep x tp-sharded engines export WITH their shardings (round-4
    VERDICT #8): the artifact records the GSPMD partitioning; on load
    the engine rebuilds the same-shape mesh from engine.json's ep/tp,
    re-shards params, and runs the exported call with no retracing.
    Outputs must equal the single-device engine's."""
    raw, cfg, params, feat, fl = _setup()
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual mesh")
    ecfg = dict(bucket_lengths=(64,), bucket_batches=(2,),
                donate_input=False)
    ref, ref_len = Engine(cfg, params, EngineConfig(**ecfg)).infer(feat, fl)
    eng = Engine(cfg, params, EngineConfig(ep=2, tp=2, **ecfg))
    eng.save(str(tmp_path / "eng"), raw_yaml=raw,
             export_platforms=("cpu",))
    assert os.path.exists(tmp_path / "eng" / "exported" / "2x64.jaxexp")

    eng2 = Engine.load(str(tmp_path / "eng"))
    assert eng2.mesh is not None  # rebuilt from engine.json ep/tp
    assert eng2._exported_fn(2, 64) is not None
    out, out_len = eng2.infer(feat, fl)
    assert (out_len == ref_len).all()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_cli_build_export_and_infer(tmp_path):
    """build.py --export writes exported/ blobs; infer.py on the loaded
    dir produces the same logits as the torch golden model."""
    import subprocess
    import sys

    import yaml

    from test_runtime import REPO

    m = golden_model()
    sd = {f"encoder.{k}": v for k, v in m.state_dict().items()}
    torch.save(sd, tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    g = torch.Generator().manual_seed(94)
    feat = torch.randn(1, 40, 20, generator=g)
    np.save(tmp_path / "feat.npy", feat.numpy())
    with torch.no_grad():
        y_t, _ = m(feat, torch.tensor([40]))
    np.save(tmp_path / "ref_out.npy", y_t.numpy())

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64",
         "--export", "--export_platforms", "cpu", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(tmp_path / "eng" / "exported" / "1x64.jaxexp")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "infer.py"),
         "-p", str(tmp_path / "eng"), "-i", str(tmp_path / "feat.npy"),
         "-o", str(tmp_path / "ref_out.npy"), "-d", "greedy"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "allclose(rtol=1e-05, atol=1e-03): True" in r.stdout, r.stdout
