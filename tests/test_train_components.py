"""Tests for training-side components: LR schedules, BMUF, metrics,
losses, augmentation, data loader."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m3asr_tpu.train import bmuf, losses, metrics
from m3asr_tpu.train.lr_scheduler import (SUPPORTED_SCHEDULER,
                                          build_optimizer, nodecay_mask)


def test_noam_schedule_shape():
    fn = SUPPORTED_SCHEDULER["warmup_noam"](1e-3, warmup_steps=100)
    lrs = [float(fn(s)) for s in [1, 50, 100, 400]]
    assert lrs[0] < lrs[1] < lrs[2]          # warmup up
    assert lrs[3] < lrs[2]                    # decay after warmup
    np.testing.assert_allclose(lrs[2], 1e-3, rtol=1e-5)  # peak at warmup


def test_plateau_schedule_phases():
    fn = SUPPORTED_SCHEDULER["warmup_plateau"](1.0, t_step=10, d_step=20,
                                               f_step=30)
    assert float(fn(5)) == pytest.approx(0.5)
    assert float(fn(15)) == pytest.approx(1.0)
    assert float(fn(30)) == pytest.approx(0.01, rel=1e-3)


def test_build_optimizer_all_schedules():
    params = {"w": jnp.ones((3,)), "norm": {"bias": jnp.ones((3,))}}
    for name in SUPPORTED_SCHEDULER:
        opt = build_optimizer(name, {}, 1e-3, "adam", {}, max_grad_norm=5.0,
                              params=params)
        state = opt.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        up, state = opt.update(g, state, params)
        assert np.isfinite(float(jnp.sum(up["w"])))


def test_nodecay_mask():
    params = {"blocks": {"norm_ff": {"bias": jnp.ones(2)},
                         "w_1": {"kernel": jnp.ones(2)}}}
    m = nodecay_mask(params, ["bias", "norm"])
    assert m["blocks"]["norm_ff"]["bias"] is False
    assert m["blocks"]["w_1"]["kernel"] is True


def test_bmuf_block_momentum_math():
    g = {"w": jnp.array([1.0, 2.0])}
    state = bmuf.init_state(g)
    local = {"w": jnp.array([0.5, 1.5])}  # moved by -0.5 each
    m, blr = 0.5, 1.0
    state2, new_params, status = bmuf.bmuf_update(state, local, m, blr)
    assert int(status) == bmuf.SUCCESS
    # delta = g - local = 0.5; delta_prev = 0.5*0 + 1*(0.5)*0.5 = 0.25
    # new = g - 1.5*0.25 = g - 0.375
    np.testing.assert_allclose(np.asarray(new_params["w"]),
                               [0.625, 1.625], rtol=1e-6)


def test_bmuf_nan_stop():
    g = {"w": jnp.array([1.0])}
    state = bmuf.init_state(g)
    _, _, status = bmuf.bmuf_update(state, {"w": jnp.array([np.nan])},
                                    0.5, 1.0)
    assert int(status) == bmuf.STOP


def test_moe_bmuf_split_and_sync():
    params = {"blocks": {"feed_forward": {"w1": jnp.ones((2, 3)),
                                          "router": {"kernel":
                                                     jnp.ones((3, 2))}},
                         "norm": {"scale": jnp.ones(3)}}}
    calls = {"dp": 0, "world": 0}

    def mean_dp(x):
        calls["dp"] += 1
        return x

    def mean_world(x):
        calls["world"] += 1
        return x

    tr = bmuf.MoEBmufTrainer(params, 0.5, 1.0, mean_dp, mean_world)
    local = jax.tree.map(lambda x: x - 0.1, params)
    new_params, status = tr.update_and_sync(local)
    assert status == bmuf.SUCCESS
    assert calls["dp"] == 1      # only w1 is an expert tensor
    assert calls["world"] == 2   # router kernel + norm scale


def test_metric_stat_windows():
    ms = metrics.MetricStat(["loss", "acc"])
    ms.update_stat([10.0, 5.0], [2, 5])
    ms.update_stat([6.0, 5.0], [2, 5])
    assert ms.log_stat() == [4.0, 1.0]
    ms.update_stat([8.0, 0.0], [2, 10])
    assert ms.log_stat() == [4.0, 0.0]
    # summary over everything
    assert ms.summary_stat() == [4.0, 0.5]


def test_ce_loss_metrics():
    logits = jnp.asarray(np.array([[[5.0, 0, 0], [0, 5.0, 0], [0, 0, 5.0]]]))
    targets = jnp.asarray(np.array([[0, 1, 9]]))  # last is padding
    loss, (ls, likely, hit), (f1, f2, f3) = losses.ce_loss(
        logits, targets, padding_idx=9)
    assert int(f1) == 2 and int(hit) == 2
    assert float(loss) < 0.05


def test_label_smoothing_loss_positive():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 4, 8).astype(np.float32))
    targets = jnp.asarray(np.array([[1, 2, 3, -1], [4, -1, -1, -1]]))
    loss = losses.label_smoothing_loss(logits, targets, padding_idx=-1)
    assert float(loss) > 0


def test_moe_layer_scale_aux_loss():
    aux = [[(jnp.asarray(1.0), 1.0), (jnp.asarray(2.0), 2.0)],
           [(jnp.asarray(3.0), 3.0), (jnp.asarray(4.0), 4.0)]]
    comb = losses.MoELayerScaleAuxLoss(2, [0.1, 0.01],
                                       loss_minimum=[1.0, 1.0])
    loss, metric, count = comb(aux)
    np.testing.assert_allclose(float(loss), 0.1 * 4 + 0.01 * 6, rtol=1e-6)
    assert metric == (4.0, 6.0)
    # annealing: metric at the minimum -> scale 0; far above -> max
    scales = comb.adjust_aux_scale([1.0, 10.0])
    assert scales[0] == pytest.approx(0.0)
    assert scales[1] == pytest.approx(0.01)


def test_augment_shapes_and_determinism():
    import random
    from m3asr_tpu.frontend import augment
    x = np.random.RandomState(1).randn(120, 40).astype(np.float32)
    rng = random.Random(0)
    y = augment.spec_augmentation(x, warp_for_time=False, rng=rng)
    assert y.shape == x.shape
    assert (y == 0).sum() > (x == 0).sum()  # masks applied
    y2 = augment.spec_substitute(x, rng=random.Random(0))
    assert y2.shape == x.shape
    y3 = augment.spec_augmentation(x, warp_for_time=True, max_w=20,
                                   rng=random.Random(2))
    assert y3.shape == x.shape


def test_data_loader_roundtrip(tmp_path):
    from m3asr_tpu.io.kaldi_io import ArkWriter
    from m3asr_tpu.io.loader import DataLoader
    import struct

    rng = np.random.RandomState(3)
    with ArkWriter(str(tmp_path / "feats.ark")) as w:
        for i in range(5):
            w.write(f"utt{i}", rng.randn(10 + 3 * i, 8).astype(np.float32))
    # int-vector label ark (binary)
    with open(tmp_path / "labels.ark", "wb") as f:
        for i in range(5):
            f.write(f"utt{i} ".encode() + b"\x00B")
            lab = [1 + i, 2, 3]
            f.write(b"\x04" + struct.pack("<i", len(lab)))
            for x in lab:
                f.write(b"\x04" + struct.pack("<i", x))

    dl = DataLoader(str(tmp_path / "feats.ark"),
                    str(tmp_path / "labels.ark"),
                    loader_conf={"feat_dim": 8, "batch_size": 2})
    batches = list(dl(output_keys=True))
    assert len(batches) == 3
    b0 = batches[0]
    assert b0["data"].shape == (2, 13, 8)
    assert list(b0["lens"]) == [10, 13]
    assert list(b0["target"][0]) == [1, 2, 3]
    assert b0["keys"] == ["utt0", "utt1"]
    # resume skip
    skipped = list(dl(skip_num=4))
    assert len(skipped) == 1 and skipped[0]["data"].shape[0] == 1


def test_tensorboard_writer_roundtrip(tmp_path):
    """TB event file: valid TFRecord framing (CRC-checked) + scalar
    protos parse back with the right tags/steps/values."""
    from m3asr_tpu.train.metrics import TensorBoardWriter, read_tb_scalars
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("train/loss", 3.25, 10)
    w.add_scalar("train/ctc_loss", 1.5, 10)
    w.add_scalar("valid/loss", 2.0, 20)
    w.close()
    events = read_tb_scalars(w.path)
    assert events == [(10, "train/loss", 3.25),
                      (10, "train/ctc_loss", 1.5),
                      (20, "valid/loss", 2.0)]
