"""Expert-shard gather/slice round trip + engine prior / log_softmax
output modes."""

import numpy as np
import pytest
import torch

from m3asr_tpu import checkpoint as ckpt
from m3asr_tpu.config import model_config_from_dict
from m3asr_tpu.runtime.engine import Engine, EngineConfig
from m3asr_tpu.utils.prior import read_prior

from test_runtime import golden_model, small_yaml


def test_expert_shard_roundtrip():
    rng = np.random.RandomState(0)
    full = {
        "blocks.0.feed_forward.experts.w_1.weight":
            rng.randn(8, 6, 4).astype(np.float32),
        "blocks.0.norm.weight": rng.randn(4).astype(np.float32),
    }
    shards = [ckpt.shard_experts(full, r, 4) for r in range(4)]
    assert shards[1]["blocks.0.feed_forward.experts.w_1.weight"].shape == \
        (2, 6, 4)
    # non-expert tensors are replicated
    np.testing.assert_array_equal(shards[2]["blocks.0.norm.weight"],
                                  full["blocks.0.norm.weight"])
    back = ckpt.gather_expert_shards(shards)
    for k in full:
        np.testing.assert_array_equal(back[k], full[k])


@pytest.mark.slow
def test_read_prior_and_engine_prior(tmp_path):
    # prior file: first entry dropped, zeros smoothed
    np.savetxt(tmp_path / "prior.txt", np.array([9.0, 2.0, 0.0, 6.0, 2.0]))
    prior = read_prior(str(tmp_path / "prior.txt"))
    assert prior.shape == (4,)
    assert prior.min() > 0
    np.testing.assert_allclose(prior.sum(), 1.0)

    m = golden_model()
    raw = small_yaml()
    cfg = model_config_from_dict(raw)
    params = ckpt.convert_encoder(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    g = torch.Generator().manual_seed(91)
    feat = torch.randn(1, 40, 20, generator=g).numpy()
    fl = np.array([40])

    base = Engine(cfg, params, EngineConfig(bucket_lengths=(64,),
                                            bucket_batches=(1,),
                                            donate_input=False))
    out0, lens = base.infer(feat, fl)

    prior11 = np.full((11,), 1.0 / 11)
    prior11[0] = 2.0 / 12
    prior11 /= prior11.sum()
    eng = Engine(cfg, params,
                 EngineConfig(bucket_lengths=(64,), bucket_batches=(1,),
                              donate_input=False, use_prior=True),
                 prior=prior11)
    out1, _ = eng.infer(feat, fl)
    # out1 == out0 - log(prior) (builder.py:83-88)
    np.testing.assert_allclose(out1, out0 - np.log(prior11)[None, None],
                               rtol=1e-4, atol=1e-4)

    ls = Engine(cfg, params,
                EngineConfig(bucket_lengths=(64,), bucket_batches=(1,),
                             donate_input=False,
                             decode_output="log_softmax"))
    out2, _ = ls.infer(feat, fl)
    np.testing.assert_allclose(np.exp(out2).sum(-1), 1.0, rtol=1e-4)
