"""End-to-end CER parity evidence (VERDICT r1 item 5).

No public 3M-ASR checkpoint is bundled with the reference, so make one:
train the golden torch twin of the hier MoE conformer on a synthetic
token->pattern task until greedy CER is low, export the checkpoint,
build an engine from it (build.py), decode a held-out ark through
recognize.py, and assert the engine's transcripts and CER match the
torch model's own decode exactly (the reference's parity philosophy,
trt_helper/infer_helper.py:93, taken to the end metric)."""

import pytest

pytestmark = pytest.mark.slow  # >90s: full training/CLI runs

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from golden import torch_ref as G

from m3asr_tpu.decode import native
from m3asr_tpu.io.kaldi_io import ArkWriter
from m3asr_tpu.utils.text import cer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = 7          # 0 = blank, tokens 1..6
FRAMES_PER_TOKEN = 8
FEAT_DIM = 16


def synth_utt(rng, n_tokens):
    """Each token paints a distinct feature column for 8 frames."""
    toks = rng.randint(1, VOCAB, n_tokens)
    T = n_tokens * FRAMES_PER_TOKEN
    feat = rng.randn(T, FEAT_DIM).astype(np.float32) * 0.1
    for i, t in enumerate(toks):
        feat[i * FRAMES_PER_TOKEN:(i + 1) * FRAMES_PER_TOKEN, t] += 4.0
    return feat, toks.astype(np.int32)


def make_corpus(rng, n, min_toks=4, max_toks=6):
    return [synth_utt(rng, rng.randint(min_toks, max_toks + 1))
            for _ in range(n)]


def pad_batch(utts):
    T = max(f.shape[0] for f, _ in utts)
    feats = np.zeros((len(utts), T, FEAT_DIM), np.float32)
    lens = np.zeros((len(utts),), np.int64)
    for i, (f, _) in enumerate(utts):
        feats[i, :f.shape[0]] = f
        lens[i] = f.shape[0]
    return torch.from_numpy(feats), torch.from_numpy(lens)


def tiny_twin():
    torch.manual_seed(80)
    return G.HierMoEConformer(
        FEAT_DIM, VOCAB, attention_dim=16, attention_heads=4, num_blocks=2,
        num_experts=2, moe_hidden=24,
        embed_conf=dict(attention_dim=16, attention_heads=4,
                        linear_units=24, num_blocks=1))


def small_yaml():
    return {
        "nnet_proto": "conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier",
        "input_dim": FEAT_DIM,
        "output_dim": VOCAB,
        "model_conf": {
            "encoder_conf": {
                "attention_dim": 16, "attention_heads": 4, "num_blocks": 2,
                "embed_conf": {"attention_dim": 16, "attention_heads": 4,
                               "linear_units": 24, "num_blocks": 1},
                "moe_conf": {"num_experts": 2, "hidden_units": 24},
            },
        },
    }


def torch_greedy(m, utts):
    m.eval()
    feats, lens = pad_batch(utts)
    with torch.no_grad():
        out, out_lens = m(feats, lens)
    return native.ctc_greedy_search(out.numpy(),
                                    out_lens.numpy().astype(np.int32))


def train_twin(m, corpus, max_steps=1500):
    """Adam + CTC until the twin solves the toy task (greedy CER < 10%)."""
    opt = torch.optim.Adam(m.parameters(), lr=2e-3)
    ctc = torch.nn.CTCLoss(blank=0, zero_infinity=True)
    rng = np.random.RandomState(1)
    m.train()
    for step in range(max_steps):
        batch = [corpus[i] for i in rng.choice(len(corpus), 8)]
        feats, lens = pad_batch(batch)
        out, out_lens = m(feats, lens)
        logp = out.log_softmax(-1).transpose(0, 1)  # (T, B, V)
        tgt = torch.cat([torch.from_numpy(t).long() for _, t in batch])
        tgt_lens = torch.tensor([len(t) for _, t in batch])
        loss = ctc(logp, tgt, out_lens.long(), tgt_lens)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (step + 1) % 100 == 0:
            hyps = torch_greedy(m, corpus[:16])
            c = cer([t for _, t in corpus[:16]], hyps)
            m.train()
            if c < 0.1:
                break
    m.eval()
    return m


@pytest.fixture(scope="module")
def trained():
    rng = np.random.RandomState(2)
    train_corpus = make_corpus(rng, 48)
    test_corpus = make_corpus(np.random.RandomState(3), 16)
    m = train_twin(tiny_twin(), train_corpus)
    t_hyps = torch_greedy(m, test_corpus)
    refs = [list(t) for _, t in test_corpus]
    return m, test_corpus, t_hyps, refs


def test_cer_parity_engine_vs_torch(tmp_path, trained):
    m, test_corpus, t_hyps, refs = trained
    t_cer = cer(refs, t_hyps)
    assert t_cer < 0.2, f"twin failed to learn the toy task: CER {t_cer}"

    # export checkpoint -> build engine via the CLI
    import yaml
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(small_yaml(), f)
    env = dict(os.environ, JAX_PLATFORMS="cpu", M3ASR_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "1x64,4x64",
         "--skip-warmup"], capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    # held-out features + labels as Kaldi archives
    with ArkWriter(str(tmp_path / "feats.ark")) as w:
        for i, (f, _) in enumerate(test_corpus):
            w.write(f"utt{i:03d}", f)
    with open(tmp_path / "labels.ark", "w") as f:
        for i, (_, t) in enumerate(test_corpus):
            f.write(f"utt{i:03d} {' '.join(map(str, t))}\n")

    # decode through recognize.py
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "recognize.py"),
         "-p", str(tmp_path / "eng"), "-i", str(tmp_path / "feats.ark"),
         "-l", str(tmp_path / "labels.ark"), "-d", "greedy",
         "--feat_dim", str(FEAT_DIM), "--batch_size", "4"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    e_hyps = {}
    for line in r.stdout.strip().splitlines():
        key, *ids = line.split()
        e_hyps[key] = [int(x) for x in ids]
    stats = json.loads(r.stderr.strip().splitlines()[-1])

    # transcript identity + CER equality, engine vs torch
    for i, th in enumerate(t_hyps):
        assert e_hyps[f"utt{i:03d}"] == list(th), f"utt{i:03d} differs"
    # recognize.py rounds its stats to 5 decimals
    assert stats["cer"] == pytest.approx(t_cer, abs=1e-5)
    assert stats["cer"] < 0.2


def test_quantized_engines_keep_cer(trained):
    """The fast serving modes decode the toy task as well as fp32 —
    quantization noise must not cost accuracy on this margin. Covers
    bf16, weight-only int8, w8a8 (act_quant), and the 15-level
    group-scaled int4 grid (the accuracy risk flagged in
    BENCHMARKS.md)."""
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models.registry import get_family
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    m, test_corpus, t_hyps, refs = trained
    t_cer = cer(refs, t_hyps)
    cfg = model_config_from_dict(small_yaml())
    params = get_family(cfg.nnet_proto).convert(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)
    modes = [("bfloat16", {}), ("int8", {}),
             ("int8", {"act_quant": True}), ("int4", {})]
    for dtype, extra in modes:
        eng = Engine(cfg, params,
                     EngineConfig(dtype=dtype, bucket_lengths=(64,),
                                  bucket_batches=(4,), donate_input=False,
                                  **extra))
        hyps = []
        for f, _ in test_corpus:
            out, out_len = eng.infer(f[None], np.array([f.shape[0]]))
            hyps.append(native.ctc_greedy_search(out, out_len)[0])
        q_cer = cer(refs, hyps)
        assert q_cer <= t_cer + 0.05, (dtype, extra, q_cer, t_cer)


def test_longform_beam_matches_offline_beam(trained):
    """Long-form beam (windowed topk + stitched host search) decodes an
    over-bucket utterance to the SAME transcript as the offline
    on-device beam on a bucket that fits it whole (round-2 VERDICT
    item 6) — on a trained model, window borders don't flip decisions."""
    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.models.registry import get_family
    from m3asr_tpu.runtime.engine import Engine, EngineConfig

    m, test_corpus, _, _ = trained
    cfg = model_config_from_dict(small_yaml())
    params = get_family(cfg.nnet_proto).convert(
        {f"encoder.{k}": v for k, v in m.state_dict().items()}, cfg)

    # one long utterance from 3 held-out ones (~96-144 frames > the
    # 64-frame long-form bucket, <= the 192-frame offline bucket)
    feat = np.concatenate([f for f, _ in test_corpus[:3]], axis=0)
    T = feat.shape[0]
    assert T > 64

    beam = 4
    ecfg = dict(decode_output="beam", decode_topk=beam,
                donate_input=False)
    offline = Engine(cfg, params, EngineConfig(
        bucket_lengths=(192,), bucket_batches=(1,), **ecfg))
    longform = Engine(cfg, params, EngineConfig(
        bucket_lengths=(64,), bucket_batches=(1,), **ecfg))

    o_ids, o_len, o_hlens, _ = offline.infer(feat[None], np.array([T]))
    l_ids, l_len, l_hlens, _ = longform.infer_long(feat, T)
    assert int(l_len[0]) <= int(o_len[0])
    best_off = list(o_ids[0, 0, :o_hlens[0, 0]])
    best_long = list(l_ids[0, 0, :l_hlens[0, 0]])
    assert best_long == best_off
