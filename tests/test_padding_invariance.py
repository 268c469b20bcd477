"""Bucket-padding invariance: valid-region outputs must not depend on
how much padding the serving system appends (the property TRT gets from
true dynamic shapes; we get it from complete masking)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from golden import torch_ref as G

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import model_config_from_dict
from m3asr_tpu.models import moe_conformer

from test_op_parity import allclose
from test_runtime import golden_model, small_yaml


@pytest.mark.slow
def test_valid_region_invariant_to_padding():
    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    g = torch.Generator().manual_seed(40)
    feat = torch.randn(1, 40, 20, generator=g).numpy()
    fl = np.array([40], np.int32)

    outs = []
    for T in (40, 64, 128):
        pad = np.zeros((1, T, 20), np.float32)
        pad[:, :40] = feat
        out, out_len = moe_conformer.forward(params, cfg.encoder_conf,
                                             jnp.asarray(pad),
                                             jnp.asarray(fl))
        outs.append(np.asarray(out)[0, : int(out_len[0])])
    allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
    allclose(outs[0], outs[2], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_batch_invariance():
    """An utterance's output must not depend on its batch neighbors."""
    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    g = torch.Generator().manual_seed(41)
    a = torch.randn(1, 40, 20, generator=g).numpy()
    b = torch.randn(1, 40, 20, generator=g).numpy()

    out_a, len_a = moe_conformer.forward(params, cfg.encoder_conf,
                                         jnp.asarray(a),
                                         jnp.array([40]))
    both = np.concatenate([a, b], axis=0)
    out_ab, len_ab = moe_conformer.forward(params, cfg.encoder_conf,
                                           jnp.asarray(both),
                                           jnp.array([40, 25]))
    allclose(np.asarray(out_ab)[0, : int(len_a[0])],
             np.asarray(out_a)[0, : int(len_a[0])], rtol=1e-5, atol=1e-5)
