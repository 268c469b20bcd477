"""recognize.py -d attention: standalone AED beam-search decode through
the CLI (engine dir + decoders.npz -> hypotheses)."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import os
import subprocess
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import DecoderConfig, model_config_from_dict
from m3asr_tpu.io.kaldi_io import ArkWriter
from m3asr_tpu.models import aed
from m3asr_tpu.runtime.engine import Engine, EngineConfig, _flatten

from test_runtime import golden_model, small_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_recognize_attention_mode(tmp_path):
    m = golden_model()
    raw = small_yaml()
    raw["model_conf"]["decoder_conf"] = {
        "attention_heads": 4, "linear_units": 48, "num_blocks": 1}
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    eng = Engine(cfg, params,
                 EngineConfig(bucket_lengths=(64,), bucket_batches=(2,),
                              donate_input=False))
    eng.save(str(tmp_path / "eng"), raw_yaml=raw)

    dec = aed.init(jax.random.PRNGKey(7), cfg.decoder_conf,
                   cfg.output_dim, cfg.encoder_conf.attention_dim)
    np.savez(tmp_path / "eng" / "decoders.npz",
             **_flatten({"decoder": dec}))

    rng = np.random.RandomState(5)
    with ArkWriter(str(tmp_path / "feats.ark")) as w:
        for i in range(3):
            w.write(f"utt{i}", rng.randn(40 + 8 * i, 20)
                    .astype(np.float32))

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "recognize.py"),
         "-p", str(tmp_path / "eng"), "-i", str(tmp_path / "feats.ark"),
         "-d", "attention", "-b", "3", "--feat_dim", "20",
         "--batch_size", "2"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l.startswith("utt")]
    assert len(lines) == 3
    eos = cfg.eos
    for line in lines:
        toks = [int(t) for t in line.split()[1:]]
        assert all(0 <= t < cfg.output_dim and t != eos for t in toks)
