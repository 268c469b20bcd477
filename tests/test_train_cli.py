"""train.py CLI end-to-end: reference-style YAML + arks -> epochs run,
checkpoints + scalar/TB logs written (the L5 entry point,
bk/train_*.py:816-839)."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import glob
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import yaml

from m3asr_tpu.io.kaldi_io import ArkWriter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_train_yaml():
    return {
        "nnet_proto": "conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier",
        "input_dim": 12,
        "output_dim": 7,
        "model_conf": {
            "encoder_conf": {
                "attention_dim": 16, "attention_heads": 4, "num_blocks": 1,
                "embed_conf": {"attention_dim": 16, "attention_heads": 4,
                               "linear_units": 24, "num_blocks": 1},
                "moe_conf": {"num_experts": 2, "hidden_units": 24},
            },
        },
        "loader_conf": {"feat_dim": 12, "batch_size": 4},
        "collate_conf": {},
        "lr": 1e-3,
        "schedule_type": "warmup_noam",
        "schedule_conf": {"warmup_steps": 10},
        "max_epoch": 1,
        "log_period": 2,
    }


def test_train_cli_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    with ArkWriter(str(tmp_path / "tr.ark")) as w:
        for i in range(8):
            w.write(f"utt{i}", rng.randn(20 + i, 12).astype(np.float32))
    with open(tmp_path / "tr_labels.ark", "w") as f:
        for i in range(8):
            toks = " ".join(str(t) for t in rng.randint(1, 7, 3))
            f.write(f"utt{i} {toks}\n")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(tiny_train_yaml(), f)

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    out_dir = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", str(tmp_path / "cfg.yaml"),
         "--output_dir", str(out_dir),
         "--tr_rspecifier", str(tmp_path / "tr.ark"),
         "--tr_labels", str(tmp_path / "tr_labels.ark"),
         "--cv_rspecifier", str(tmp_path / "tr.ark"),
         "--cv_labels", str(tmp_path / "tr_labels.ark")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "training done" in r.stdout

    # checkpoints restore and carry finite state
    with open(out_dir / "checkpoint_final.pkl", "rb") as f:
        ckpt = pickle.load(f)
    assert ckpt["global_step"] > 0
    assert np.isfinite(ckpt["best_valid"])

    # scalar observability: JSONL + TB event file
    scalars = out_dir / "scalars"
    with open(scalars / "scalars.jsonl") as f:
        events = [json.loads(line) for line in f]
    assert any(e["tag"] == "train/loss" for e in events)
    assert any(e["tag"] == "valid/loss" for e in events)
    assert glob.glob(str(scalars / "events.out.tfevents.*"))


def test_train_cli_hier_aed_recipe(tmp_path):
    """--tr_aed_labels switches to the deployed CTC + hier AED recipe
    (3 decoders on taps 6/12/final)."""
    rng = np.random.RandomState(1)
    with ArkWriter(str(tmp_path / "tr.ark")) as w:
        for i in range(8):
            w.write(f"utt{i}", rng.randn(20 + i, 12).astype(np.float32))
    with open(tmp_path / "tr_labels.ark", "w") as f:
        for i in range(8):
            toks = " ".join(str(t) for t in rng.randint(1, 6, 3))
            f.write(f"utt{i} {toks}\n")
    with open(tmp_path / "aed_labels.ark", "w") as f:
        for i in range(8):
            toks = " ".join(str(t) for t in rng.randint(1, 6, 3))
            f.write(f"utt{i} {toks}\n")
    cfgd = tiny_train_yaml()
    cfgd["model_conf"]["decoder_conf"] = {
        "attention_heads": 4, "linear_units": 16, "num_blocks": 1}
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfgd, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    out_dir = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", str(tmp_path / "cfg.yaml"),
         "--output_dir", str(out_dir),
         "--tr_rspecifier", str(tmp_path / "tr.ark"),
         "--tr_labels", str(tmp_path / "tr_labels.ark"),
         "--tr_aed_labels", str(tmp_path / "aed_labels.ark")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    with open(out_dir / "checkpoint_final.pkl", "rb") as f:
        ckpt = pickle.load(f)
    # the AED wrapper layout trained: encoder + 3 decoders present
    for name in ("encoder", "decoder", "decoder_1", "decoder_2"):
        assert name in ckpt["params"], sorted(ckpt["params"])
    assert ckpt["global_step"] > 0


def test_train_cli_bmuf(tmp_path):
    """--bmuf runs the reference's deployed BMUF recipe end to end on
    the virtual 8-device mesh (dp=4 local replicas, block-momentum
    sync every batch): checkpoint carries the stacked params with all
    replicas identical after the final sync, plus the BMUF buffers
    (bk/..._hier.py:599-614, 480-493)."""
    rng = np.random.RandomState(3)
    with ArkWriter(str(tmp_path / "tr.ark")) as w:
        for i in range(8):
            w.write(f"utt{i}", rng.randn(20 + i, 12).astype(np.float32))
    with open(tmp_path / "tr_labels.ark", "w") as f:
        for i in range(8):
            toks = " ".join(str(t) for t in rng.randint(1, 7, 3))
            f.write(f"utt{i} {toks}\n")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(tiny_train_yaml(), f)

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "") +
               " --xla_force_host_platform_device_count=8")
    out_dir = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", str(tmp_path / "cfg.yaml"),
         "--output_dir", str(out_dir),
         "--tr_rspecifier", str(tmp_path / "tr.ark"),
         "--tr_labels", str(tmp_path / "tr_labels.ark"),
         "--bmuf", "--sync_period", "1"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "training done" in r.stdout
    with open(out_dir / "checkpoint_final.pkl", "rb") as f:
        ckpt = pickle.load(f)
    assert ckpt["global_step"] == 2      # 8 utts / batch 4 / 1 epoch
    assert ckpt["bmuf"] is not None
    leaves = [v for v in ckpt["params"].values()]
    # params carry the dp axis and every replica equals replica 0
    import jax
    for leaf in jax.tree.leaves(ckpt["params"]):
        assert leaf.shape[0] == 4, leaf.shape
        np.testing.assert_array_equal(leaf, np.broadcast_to(
            leaf[0:1], leaf.shape))
    # BMUF global matches the synced replicas
    for a, b in zip(jax.tree.leaves(ckpt["bmuf"]["global_params"]),
                    jax.tree.leaves(ckpt["params"])):
        np.testing.assert_allclose(a, b[0], rtol=1e-6, atol=1e-7)


def test_train_cli_bmuf_hier_domain_acc(tmp_path):
    """The reference's full deployed trainer in one invocation: hier
    CTC+AED recipe + domain/accent heads + BMUF periodic sync
    (bk/train_conformer_aed_fmoe_localComm_bmuf_domain_acc_hier.py)."""
    rng = np.random.RandomState(5)
    with ArkWriter(str(tmp_path / "tr.ark")) as w:
        for i in range(8):
            w.write(f"utt{i}", rng.randn(20 + i, 12).astype(np.float32))
    for name in ("tr_labels", "aed_labels"):
        with open(tmp_path / f"{name}.ark", "w") as f:
            for i in range(8):
                toks = " ".join(str(t) for t in rng.randint(1, 6, 3))
                f.write(f"utt{i} {toks}\n")
    with open(tmp_path / "domain.ark", "w") as f:
        for i in range(8):
            f.write(f"utt{i} {rng.randint(0, 6)}\n")
    with open(tmp_path / "acc.ark", "w") as f:
        for i in range(8):
            f.write(f"utt{i} {rng.randint(0, 8)}\n")
    cfgd = tiny_train_yaml()
    cfgd["model_conf"]["decoder_conf"] = {
        "attention_heads": 4, "linear_units": 16, "num_blocks": 1}
    cfgd["bmuf_conf"] = {"sync_period": 1, "block_momentum": 0.5}
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfgd, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "") +
               " --xla_force_host_platform_device_count=8")
    out_dir = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", str(tmp_path / "cfg.yaml"),
         "--output_dir", str(out_dir),
         "--tr_rspecifier", str(tmp_path / "tr.ark"),
         "--tr_labels", str(tmp_path / "tr_labels.ark"),
         "--tr_aed_labels", str(tmp_path / "aed_labels.ark"),
         "--tr_domain_labels", str(tmp_path / "domain.ark"),
         "--tr_acc_labels", str(tmp_path / "acc.ark"),
         "--bmuf"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr
    with open(out_dir / "checkpoint_final.pkl", "rb") as f:
        ckpt = pickle.load(f)
    assert ckpt["bmuf"] is not None
    import jax
    for name in ("encoder", "decoder", "decoder_1", "decoder_2",
                 "domain_head", "acc_head"):
        assert name in ckpt["params"], sorted(ckpt["params"])
    # every replica identical after the final per-batch sync
    for leaf in jax.tree.leaves(ckpt["params"]):
        assert leaf.shape[0] == 4, leaf.shape
        np.testing.assert_array_equal(
            leaf, np.broadcast_to(leaf[0:1], leaf.shape))


def test_train_cli_smbr_fake_runner(tmp_path):
    """--smbr_cmd drives the sMBR epoch loop end to end with a fake
    lattice tool: posterior ark out, transcript file out, gradient ark
    back in, params updated (bk/..._hier.py:560-595)."""
    rng = np.random.RandomState(4)
    with ArkWriter(str(tmp_path / "tr.ark")) as w:
        for i in range(4):
            w.write(f"utt{i}", rng.randn(20, 12).astype(np.float32))
    with open(tmp_path / "tr_labels.ark", "w") as f:
        for i in range(4):
            toks = " ".join(str(t) for t in rng.randint(1, 7, 3))
            f.write(f"utt{i} {toks}\n")
    with open(tmp_path / "trans.txt", "w") as f:
        for i in range(4):
            f.write(f"utt{i} some words {i}\n")
    cfgd = tiny_train_yaml()
    cfgd["nnet_proto"] = "conformer"   # sMBR posteriors from a dense net
    cfgd["model_conf"] = {"encoder_conf": {
        "attention_dim": 16, "attention_heads": 4, "linear_units": 24,
        "num_blocks": 1}}
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfgd, f)

    # fake lattice tool: asserts the transcript stream arrived, writes
    # softmax-minus-uniform gradients
    tool = tmp_path / "fake_tool.py"
    tool.write_text(
        "import sys, numpy as np\n"
        "sys.path.insert(0, %r)\n"
        "from m3asr_tpu.io.kaldi_io import read_ark, ArkWriter\n"
        "post, grad, trans = sys.argv[1:4]\n"
        "keys = [l.split()[0] for l in open(trans)]\n"
        "with ArkWriter(grad) as w:\n"
        "    for k, m in read_ark(post):\n"
        "        assert k in keys, (k, keys)\n"
        "        e = np.exp(m - m.max(-1, keepdims=True))\n"
        "        w.write(k, (e / e.sum(-1, keepdims=True) -\n"
        "                    1.0 / m.shape[-1]).astype(np.float32))\n"
        % REPO)

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    out_dir = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", str(tmp_path / "cfg.yaml"),
         "--output_dir", str(out_dir),
         "--tr_rspecifier", str(tmp_path / "tr.ark"),
         "--tr_labels", str(tmp_path / "tr_labels.ark"),
         "--tr_trans_file", str(tmp_path / "trans.txt"),
         "--smbr_cmd",
         f"{sys.executable} {tool} {{post}} {{grad}} {{trans}}"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "smbr training done: 1 batches" in r.stdout
    with open(out_dir / "smbr_epoch0.pkl", "rb") as f:
        params = pickle.load(f)
    assert all(np.isfinite(v).all()
               for v in __import__("jax").tree.leaves(params))


def test_train_cli_domain_acc_heads(tmp_path):
    """--tr_domain_labels/--tr_acc_labels activate the domain/accent
    classifier heads on top of the hier recipe (the reference's
    domain_acc recipe with the commented heads made functional)."""
    rng = np.random.RandomState(2)
    with ArkWriter(str(tmp_path / "tr.ark")) as w:
        for i in range(8):
            w.write(f"utt{i}", rng.randn(20 + i, 12).astype(np.float32))
    for name, hi in (("tr_labels", 6), ("aed_labels", 6)):
        with open(tmp_path / f"{name}.ark", "w") as f:
            for i in range(8):
                toks = " ".join(str(t) for t in rng.randint(1, hi, 3))
                f.write(f"utt{i} {toks}\n")
    with open(tmp_path / "domain.ark", "w") as f:
        for i in range(8):
            f.write(f"utt{i} {rng.randint(0, 6)}\n")
    with open(tmp_path / "acc.ark", "w") as f:
        for i in range(8):
            f.write(f"utt{i} {rng.randint(0, 8)}\n")
    cfgd = tiny_train_yaml()
    cfgd["model_conf"]["decoder_conf"] = {
        "attention_heads": 4, "linear_units": 16, "num_blocks": 1}
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfgd, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    out_dir = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", str(tmp_path / "cfg.yaml"),
         "--output_dir", str(out_dir),
         "--tr_rspecifier", str(tmp_path / "tr.ark"),
         "--tr_labels", str(tmp_path / "tr_labels.ark"),
         "--tr_aed_labels", str(tmp_path / "aed_labels.ark"),
         "--tr_domain_labels", str(tmp_path / "domain.ark"),
         "--tr_acc_labels", str(tmp_path / "acc.ark")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    with open(out_dir / "checkpoint_final.pkl", "rb") as f:
        ckpt = pickle.load(f)
    for name in ("encoder", "decoder", "domain_head", "acc_head"):
        assert name in ckpt["params"], sorted(ckpt["params"])
    assert ckpt["global_step"] > 0


def test_train_cli_dfsmn_domain_acc(tmp_path):
    """The DFSMN domain_acc recipe: --tr_domain_labels/--tr_acc_labels
    with dfsmn_san_res_embed_domain_acc train the proto's IN-MODEL
    pooled heads (dfsmn_san_res_embed_domain_acc.py:249-279) — no hier
    recipe, no add-on heads."""
    rng = np.random.RandomState(3)
    with ArkWriter(str(tmp_path / "tr.ark")) as w:
        for i in range(8):
            w.write(f"utt{i}", rng.randn(20 + i, 12).astype(np.float32))
    with open(tmp_path / "tr_labels.ark", "w") as f:
        for i in range(8):
            toks = " ".join(str(t) for t in rng.randint(1, 6, 3))
            f.write(f"utt{i} {toks}\n")
    with open(tmp_path / "domain.ark", "w") as f:
        for i in range(8):
            f.write(f"utt{i} {rng.randint(0, 3)}\n")
    with open(tmp_path / "acc.ark", "w") as f:
        for i in range(8):
            f.write(f"utt{i} {rng.randint(0, 2)}\n")
    cfgd = {
        "nnet_proto": "dfsmn_san_res_embed_domain_acc",
        "input_dim": 12, "output_dim": 7,
        "model_conf": {"num_block": 1, "fsmn_each_block": 2,
                       "fsmn_conf": {"hidden_dim": 16, "memory_dim": 16},
                       "san_conf": {"num_head": 4, "num_memory": 4},
                       "output_dim_domain": 3, "output_dim_acc": 2},
        "loader_conf": {"feat_dim": 12, "batch_size": 4},
        "collate_conf": {},
        "lr": 1e-3, "schedule_type": "warmup_noam",
        "schedule_conf": {"warmup_steps": 10},
        "max_epoch": 1, "log_period": 2,
    }
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfgd, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    out_dir = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", str(tmp_path / "cfg.yaml"),
         "--output_dir", str(out_dir),
         "--tr_rspecifier", str(tmp_path / "tr.ark"),
         "--tr_labels", str(tmp_path / "tr_labels.ark"),
         "--tr_domain_labels", str(tmp_path / "domain.ark"),
         "--tr_acc_labels", str(tmp_path / "acc.ark")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    with open(out_dir / "checkpoint_final.pkl", "rb") as f:
        ckpt = pickle.load(f)
    # heads are part of the model params (not add-on head subtrees)
    assert "domain_head" not in ckpt["params"]
    assert "out_linear_domain" in ckpt["params"], sorted(ckpt["params"])
    assert "out_linear_accent" in ckpt["params"]
    assert ckpt["global_step"] > 0
    # the domain/acc CE metrics reached the log
    with open(out_dir / "train.log") as f:
        log = f.read()
    assert "domain_loss" in log and "acc_loss" in log, log[-2000:]


def test_train_cli_tp_pp_mesh(tmp_path):
    """Beyond-reference parallelism through the CLI: --tp 2 --pp 2 on a
    pp2 x dp2 x tp2 virtual mesh (8 CPU devices) trains the 2-block MoE
    conformer end-to-end — Megatron weight splits + GPipe stages."""
    rng = np.random.RandomState(0)
    with ArkWriter(str(tmp_path / "tr.ark")) as w:
        for i in range(8):
            w.write(f"utt{i}", rng.randn(20 + i, 12).astype(np.float32))
    with open(tmp_path / "tr_labels.ark", "w") as f:
        for i in range(8):
            toks = " ".join(str(t) for t in rng.randint(1, 7, 3))
            f.write(f"utt{i} {toks}\n")
    cfg = tiny_train_yaml()
    cfg["model_conf"]["encoder_conf"]["num_blocks"] = 2  # 1 block/stage
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    out_dir = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", str(tmp_path / "cfg.yaml"),
         "--output_dir", str(out_dir),
         "--tr_rspecifier", str(tmp_path / "tr.ark"),
         "--tr_labels", str(tmp_path / "tr_labels.ark"),
         "--tp", "2", "--pp", "2", "--pp_microbatches", "2"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "training done" in r.stdout
    with open(out_dir / "checkpoint_final.pkl", "rb") as f:
        ckpt = pickle.load(f)
    assert ckpt["global_step"] > 0
