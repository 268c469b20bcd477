"""recognize.py end-to-end: ark features -> engine -> transcripts + CER."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import os
import struct
import subprocess
import sys

import numpy as np
import torch
import yaml

from m3asr_tpu.io.kaldi_io import ArkWriter

from test_runtime import REPO, golden_model, small_yaml


def test_recognize_pipeline(tmp_path):
    from golden import torch_ref as G
    # build a tiny engine via the CLI (encoder + AED decoder weights)
    m = golden_model()
    dec = G.randomize_(G.TransformerDecoder(11, 32, attention_heads=4,
                                            linear_units=48, num_blocks=1),
                       seed=99)
    sd = {f"encoder.{k}": v for k, v in m.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    # hier aux decoders (attend taps h6/h12) ride along like the
    # reference checkpoint's decoder_1/decoder_2
    for i, name in enumerate(("decoder_1", "decoder_2")):
        d = G.randomize_(G.TransformerDecoder(11, 32, attention_heads=4,
                                              linear_units=48,
                                              num_blocks=1), seed=100 + i)
        sd.update({f"{name}.{k}": v for k, v in d.state_dict().items()})
    torch.save(sd, tmp_path / "ckpt.pt")
    raw = small_yaml()
    raw["model_conf"]["decoder_conf"] = {
        "attention_heads": 4, "linear_units": 48, "num_blocks": 1}
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(raw, f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "2x64", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    # features + labels
    rng = np.random.RandomState(0)
    with ArkWriter(str(tmp_path / "feats.ark")) as w:
        for i in range(3):
            w.write(f"utt{i}", rng.randn(30 + 5 * i, 20).astype(np.float32))
    with open(tmp_path / "labels.ark", "wb") as f:
        for i in range(3):
            f.write(f"utt{i} ".encode() + b"\x00B")
            lab = [1 + i, 2]
            f.write(b"\x04" + struct.pack("<i", len(lab)))
            for x in lab:
                f.write(b"\x04" + struct.pack("<i", x))

    # context-biasing phrase file (token ids within the toy vocab)
    with open(tmp_path / "ctx.txt", "w") as f:
        f.write("1 2\n3\n")
    # symbol table: transcripts render as symbols instead of ids
    with open(tmp_path / "units", "w") as f:
        for i in range(11):
            f.write(f"u{i} {i}\n")
    # tiny integer-id ARPA LM for shallow fusion
    with open(tmp_path / "lm.arpa", "w") as f:
        f.write("\\data\\\nngram 1=4\n\n\\1-grams:\n"
                "-0.5 1 -0.3\n-0.7 2 -0.2\n-1.0 <s> -0.1\n-0.9 </s>\n"
                "\n\\end\\\n")
    for mode, extra in (("beam", []), ("rescore", []),
                        ("rescore", ["--hier_rescore"]),
                        ("beam", ["--timestamps", "--context_file",
                                  str(tmp_path / "ctx.txt"),
                                  "--context_bonus", "0.5"]),
                        ("beam", ["--lm", str(tmp_path / "lm.arpa"),
                                  "--lm_weight", "0.3"]),
                        ("rescore", ["--lm", str(tmp_path / "lm.arpa"),
                                     "--context_file",
                                     str(tmp_path / "ctx.txt")]),
                        ("greedy", ["--timestamps"]),
                        ("greedy", ["--units", str(tmp_path / "units")])):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "recognize.py"),
             "-p", str(tmp_path / "eng"), "-i", str(tmp_path / "feats.ark"),
             "-l", str(tmp_path / "labels.ark"), "--feat_dim", "20",
             "--batch_size", "2", "-d", mode, "-b", "4"] + extra,
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, (mode, extra, r.stderr)
        lines = [l for l in r.stdout.splitlines() if l.startswith("utt")]
        assert len(lines) == 3, (mode, r.stdout)
        assert '"cer"' in r.stderr and '"rtf"' in r.stderr

    # on-device decode outputs: engines built with --decode_output
    # argmax/topk ship (B,T) ids / (B,T,K) candidates instead of
    # (B,T,V) logits; transcripts must match the dense engine exactly
    # (greedy == argmax ids; beam over top-K == dense beam for
    # K >= beam_size)
    base = {}
    for mode, dflag in (("greedy", "logits"), ("beam", "logits"),
                        ("greedy", "argmax"), ("beam", "topk"),
                        ("greedy", "topk"), ("beam", "beam")):
        eng = tmp_path / f"eng_{dflag}"
        if not eng.exists():
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "build.py"),
                 "-c", str(tmp_path / "cfg.yaml"),
                 "-m", str(tmp_path / "ckpt.pt"),
                 "-o", str(eng), "--buckets", "2x64", "--skip-warmup",
                 "--decode_output", dflag, "--decode_topk", "4"],
                capture_output=True, text=True, env=env)
            assert r.returncode == 0, (dflag, r.stderr)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "recognize.py"),
             "-p", str(eng), "-i", str(tmp_path / "feats.ark"),
             "--feat_dim", "20", "--batch_size", "2", "-d", mode,
             "-b", "4"],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, (mode, dflag, r.stderr)
        lines = sorted(l for l in r.stdout.splitlines()
                       if l.startswith("utt"))
        if dflag == "logits":
            base[mode] = lines
        else:
            assert lines == base[mode], (mode, dflag, lines, base[mode])

    # long-form: an utterance beyond the 64-frame max bucket decodes
    # through windowed stitching (engine.infer_long)
    with ArkWriter(str(tmp_path / "long.ark")) as w:
        w.write("uttL", rng.randn(150, 20).astype(np.float32))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "recognize.py"),
         "-p", str(tmp_path / "eng"), "-i", str(tmp_path / "long.ark"),
         "--feat_dim", "20", "--batch_size", "1", "-d", "beam", "-b", "4",
         "--long_overlap", "16"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert any(l.startswith("uttL") for l in r.stdout.splitlines())
