#!/usr/bin/env python3
"""Realistic-proxy CER benchmark across every serving mode.

The round-2 CER evidence rested on a toy task (vocab 7, feature columns
painted with the token id) that quantization could not realistically
fail. This benchmark scales the proxy until the int4/w4a8 grids are
actually stressed (round-2 VERDICT item 5):

  * vocab 200 + blank (a realistic CTC softmax width for the engine's
    decode reductions; the reference serves ~5000 — scaled to what a
    CPU-trainable model can learn in minutes),
  * raw 16 kHz waveforms -> the REAL frontend (frontend/fbank.py,
    80 mel bins, the reference's loader configuration
    loader/augment.py:229-236) -> global CMVN,
  * each token is a 3-partial "tone word" (random frequencies in
    300-3800 Hz drawn once per token identity) + noise, so class
    separation lives in the mel pattern, not in a painted column,
  * >= 500 held-out utterances, 15-35 tokens each (222-522 frames:
    crosses the 256 AND 512 engine buckets),
  * every serving mode decodes the same held-out set: fp32 / bf16 /
    int8 / w8a8 / int4 / w4a8 engines, long-form stitching, and
    chunked streaming (on a separately trained causal static-chunk
    model, the repo's streaming exactness contract).

Prints one JSON document; the BENCHMARKS.md "CER across serving modes"
table is generated from it. The slow test (tests/test_cer_realistic.py)
runs a reduced configuration of the same code.

Reference lineage: the parity philosophy of trt_helper/infer_helper.py:93
(engine vs torch allclose) taken to the end metric (CER), as the
round-1 VERDICT asked; extended to quantized modes the reference never
had.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000
VOCAB = 201                 # blank=0, tokens 1..200
N_TOKENS = VOCAB - 1
TOKEN_SEC = 0.12            # 12 feature frames per token
GAP_SEC = 0.03              # silence between tokens (CTC blank cue)
FEAT_DIM = 80


def make_token_bank(seed=7):
    """Per-token spectral signatures: 3 partials, frequencies uniform
    in 300-3800 Hz, amplitudes in [0.5, 1]. Drawn once per token
    identity — neighbouring tokens can share close partials, so
    confusions under quantization noise are possible (the point)."""
    rng = np.random.RandomState(seed)
    freqs = rng.uniform(300.0, 3800.0, (N_TOKENS, 3))
    amps = rng.uniform(0.5, 1.0, (N_TOKENS, 3))
    return freqs, amps


TOKEN_FREQS, TOKEN_AMPS = make_token_bank()


def set_vocab(vocab: int):
    """Scale the task's vocabulary (round-3 VERDICT #10: stress the
    int4 grid against a softmax wide enough that quantization can
    plausibly fail). Larger vocabs pack more token signatures into the
    same 300-3800 Hz band, so class margins shrink naturally."""
    global VOCAB, N_TOKENS, TOKEN_FREQS, TOKEN_AMPS
    VOCAB = vocab
    N_TOKENS = vocab - 1
    TOKEN_FREQS, TOKEN_AMPS = make_token_bank()


def synth_wave(rng, toks, noise=0.03):
    """Waveform for a token sequence on the Kaldi int16 scale."""
    tok_n = int(TOKEN_SEC * SR)
    gap_n = int(GAP_SEC * SR)
    t = np.arange(tok_n) / SR
    pieces = []
    for tok in toks:
        f = TOKEN_FREQS[tok - 1]
        a = TOKEN_AMPS[tok - 1] * rng.uniform(0.6, 1.0, 3)
        phase = rng.uniform(0, 2 * np.pi, 3)
        sig = (a[:, None] * np.sin(2 * np.pi * f[:, None] * t[None]
                                   + phase[:, None])).sum(0)
        # 10 ms raised-cosine edges so token boundaries are smooth
        edge = int(0.01 * SR)
        env = np.ones(tok_n)
        ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(edge) / edge)
        env[:edge], env[-edge:] = ramp, ramp[::-1]
        pieces.append(sig * env)
        pieces.append(np.zeros(gap_n))
    wave = np.concatenate(pieces[:-1])  # no trailing gap
    wave = wave + noise * rng.randn(wave.size)
    return (wave * 3000.0).astype(np.float32)  # int16-ish scale


def featurize(wave):
    from m3asr_tpu.frontend.fbank import fbank
    return fbank(wave, num_mel_bins=FEAT_DIM, dither=0.0)


def synth_utt(rng, n_tokens, noise=0.03):
    toks = rng.randint(1, VOCAB, n_tokens).astype(np.int32)
    return featurize(synth_wave(rng, toks, noise)), toks


def make_corpus(rng, n, min_toks=15, max_toks=35, noise=0.03,
                noise_range=None):
    """noise_range=(lo, hi) draws a per-utterance noise level — used
    for the TRAINING corpus so the model has a graceful degradation
    curve instead of a cliff (a model that only ever saw one noise
    level collapses to all-blanks a small step above it, and a CER
    of 1.0 for every mode carries no information)."""
    out = []
    for _ in range(n):
        lvl = (rng.uniform(*noise_range) if noise_range else noise)
        out.append(synth_utt(rng, rng.randint(min_toks, max_toks + 1),
                             lvl))
    return out


def cmvn_stats(corpus):
    allf = np.concatenate([f for f, _ in corpus], axis=0)
    return allf.mean(0), allf.std(0) + 1e-8


def apply_cmvn(corpus, mean, std):
    return [((f - mean) / std, t) for f, t in corpus]


# --- model configs ----------------------------------------------------------

def offline_model_cfg():
    """Small hier catEmbed MoE conformer — the flagship family
    (models/moe_conformer.py) at CPU-trainable dims with the realistic
    201-way softmax."""
    from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                                  MoEEncoderConfig)
    cfg = ModelConfig()
    cfg.nnet_proto = "conformer_fmoe_localComm_catEmbed"
    cfg.input_dim = FEAT_DIM
    cfg.output_dim = VOCAB
    cfg.encoder_conf = MoEEncoderConfig(
        attention_dim=64, attention_heads=4, num_blocks=N_BLOCKS,
        embed_conf=EncoderConfig(attention_dim=64, attention_heads=4,
                                 linear_units=96, num_blocks=1),
        moe_conf=MoEConfig(num_experts=N_EXPERTS, hidden_units=160))
    return cfg


N_BLOCKS = 3       # --blocks
N_EXPERTS = 8      # --experts


def streaming_model_cfg(chunk=16):
    """Causal static-chunk twin for the streaming row (the streaming
    exactness contract: causal convs + chunk-masked training =
    chunk-by-chunk decode matches the offline chunk-masked forward)."""
    from m3asr_tpu.config import (EncoderConfig, ModelConfig, MoEConfig,
                                  MoEEncoderConfig)
    cfg = ModelConfig()
    cfg.nnet_proto = "conformer_fmoe_localComm_catEmbed"
    cfg.input_dim = FEAT_DIM
    cfg.output_dim = VOCAB
    cfg.encoder_conf = MoEEncoderConfig(
        attention_dim=64, attention_heads=4, num_blocks=2, causal=True,
        cnn_module_norm="layer_norm", static_chunk_size=chunk,
        embed_conf=EncoderConfig(attention_dim=48, attention_heads=4,
                                 linear_units=64, num_blocks=1,
                                 causal=True,
                                 cnn_module_norm="layer_norm",
                                 static_chunk_size=chunk),
        moe_conf=MoEConfig(num_experts=4, hidden_units=96))
    return cfg


# --- training ---------------------------------------------------------------

def _pad_batch(utts, pad_T, pad_U):
    B = len(utts)
    feats = np.zeros((B, pad_T, FEAT_DIM), np.float32)
    lens = np.zeros((B,), np.int32)
    tgts = np.zeros((B, pad_U), np.int32)
    tlens = np.zeros((B,), np.int32)
    for i, (f, t) in enumerate(utts):
        feats[i, :f.shape[0]] = f
        lens[i] = f.shape[0]
        tgts[i, :len(t)] = t
        tlens[i] = len(t)
    return feats, lens, tgts, tlens


def train_model(cfg, corpus, steps=4000, batch=8, lr=2e-3,
                warmup=400, seed=0, eval_every=200, target_cer=0.02,
                log=print):
    """Adam + CTC on the m3asr_tpu training stack (train/step.py).
    Early-stops when greedy train-subset CER <= target_cer."""
    import jax

    from m3asr_tpu.decode import native
    from m3asr_tpu.models.registry import get_family
    from m3asr_tpu.train.step import TrainConfig, make_optimizer, \
        make_train_step
    from m3asr_tpu.utils.text import cer

    family = get_family(cfg.nnet_proto)
    params = family.init(jax.random.PRNGKey(seed), cfg)
    tcfg = TrainConfig(learning_rate=lr, warmup_steps=warmup,
                       grad_clip=5.0)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, tcfg, optimizer))

    fwd = jax.jit(lambda p, f, fl: family.forward(p, cfg, f, fl))

    pad_T = max(f.shape[0] for f, _ in corpus)
    pad_T = -(-pad_T // 32) * 32
    pad_U = max(len(t) for _, t in corpus)
    rng = np.random.RandomState(seed + 1)
    t0 = time.time()
    for it in range(steps):
        idx = rng.choice(len(corpus), batch, replace=False)
        feats, lens, tgts, tlens = _pad_batch([corpus[i] for i in idx],
                                              pad_T, pad_U)
        params, opt_state, metrics = step(params, opt_state, feats, lens,
                                          tgts, tlens)
        if (it + 1) % eval_every == 0:
            sub = corpus[:32]
            feats, lens, _, _ = _pad_batch(sub, pad_T, pad_U)
            out, out_len = fwd(params, feats, lens)
            hyps = native.ctc_greedy_search(np.asarray(out, np.float32),
                                            np.asarray(out_len, np.int32))
            c = cer([list(t) for _, t in sub], hyps)
            log(f"  step {it + 1}: loss={float(metrics['loss']):.3f} "
                f"train-CER={c:.4f} ({time.time() - t0:.0f}s)")
            if c <= target_cer:
                break
    return params


# --- evaluation -------------------------------------------------------------

ENGINE_MODES = (
    ("fp32", dict(dtype="float32")),
    ("bf16", dict(dtype="bfloat16")),
    ("int8", dict(dtype="int8")),
    ("w8a8", dict(dtype="int8", act_quant=True)),
    ("int4", dict(dtype="int4")),
    ("w4a8", dict(dtype="int4", act_quant=True)),
    # round-5 levers: int8 dense (non-expert) weights + the fused
    # qkv/score restructure, on the serving-relevant quant modes
    ("int8+dq", dict(dtype="int8", dense_quant=True)),
    ("int4+dq", dict(dtype="int4", dense_quant=True)),
    ("int4+dq+fq", dict(dtype="int4", dense_quant=True,
                        fuse_qkv=True)),
    ("w4a8+dq+fq", dict(dtype="int4", act_quant=True,
                        dense_quant=True, fuse_qkv=True)),
)


def eval_engine(cfg, params, corpus, ecfg_kwargs, batch=8,
                buckets=(256, 512, 544)):
    """Greedy CER of one Engine configuration over the held-out set.
    Utterances are bucketed by the engine exactly as serving would."""
    from m3asr_tpu.decode import native
    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    from m3asr_tpu.utils.text import cer

    eng = Engine(cfg, params, EngineConfig(
        bucket_lengths=tuple(buckets), bucket_batches=(batch,) * len(buckets),
        donate_input=False, **ecfg_kwargs))
    order = np.argsort([f.shape[0] for f, _ in corpus])
    hyps, refs = {}, {}
    for s in range(0, len(order), batch):
        idx = order[s:s + batch]
        utts = [corpus[i] for i in idx]
        T = max(f.shape[0] for f, _ in utts)
        feats = np.zeros((len(utts), T, FEAT_DIM), np.float32)
        lens = np.zeros((len(utts),), np.int32)
        for j, (f, _) in enumerate(utts):
            feats[j, :f.shape[0]] = f
            lens[j] = f.shape[0]
        out, out_len = eng.infer(feats, lens)
        for j, h in enumerate(native.ctc_greedy_search(
                np.asarray(out, np.float32),
                np.asarray(out_len, np.int32))):
            hyps[idx[j]] = h
            refs[idx[j]] = list(utts[j][1])
    keys = sorted(hyps)
    return cer([refs[k] for k in keys], [hyps[k] for k in keys])


def eval_longform(cfg, params, corpus, n=24, concat=3, dtype="float32",
                  overlap=None, control=False):
    """Long-form stitching CER: concatenate `concat` held-out
    utterances into one waveform-level utterance longer than the max
    bucket and decode via Engine.infer_long with `overlap` frames of
    acoustic context per window side (None = engine default).

    control=True decodes the SAME concatenated utterances in ONE
    offline pass through a bucket large enough to hold them (no
    windowing, no stitching) — the round-3 VERDICT #8 control that
    separates stitching loss from context-length distribution shift:
    if the control matches the stitched rows, the long-form CER gap is
    model-side (the model never saw concatenated inputs in training),
    not a stitching artifact."""
    from m3asr_tpu.decode import native
    from m3asr_tpu.runtime.engine import Engine, EngineConfig
    from m3asr_tpu.utils.text import cer

    rng = np.random.RandomState(99)
    picks = [rng.choice(len(corpus), concat, replace=False)
             for _ in range(n)]
    if control:
        max_T = max(sum(corpus[i][0].shape[0] for i in idx)
                    for idx in picks)
        big = -(-max_T // 64) * 64
        eng = Engine(cfg, params, EngineConfig(
            dtype=dtype, bucket_lengths=(big,), bucket_batches=(1,),
            donate_input=False))
    else:
        eng = Engine(cfg, params, EngineConfig(
            dtype=dtype, bucket_lengths=(256, 512),
            bucket_batches=(1, 1), donate_input=False))
    refs, hyps = [], []
    for idx in picks:
        feat = np.concatenate([corpus[i][0] for i in idx], axis=0)
        ref = np.concatenate([corpus[i][1] for i in idx]).tolist()
        if control:
            out, out_len = eng.infer(feat[None],
                                     np.array([feat.shape[0]], np.int32))
        else:
            out, out_len = eng.infer_long(feat, overlap=overlap)
        hyps.append(native.ctc_greedy_search(
            np.asarray(out, np.float32),
            np.asarray(out_len, np.int32))[0])
        refs.append(ref)
    return cer(refs, hyps)


def eval_streaming(cfg, params, corpus, moe_impl="dense", chunk=16,
                   quant_bits=0, act_quant=False):
    """Chunk-by-chunk streaming CER (StreamingSession, 2 left chunks of
    cache — deployment left-context truncation included). quant_bits
    8/4 quantizes the expert tensors first and uses the matching quant
    dispatch, mirroring serve.py's int8/int4 streaming wiring."""
    from m3asr_tpu.decode import native
    from m3asr_tpu.runtime.streaming_session import StreamingSession
    from m3asr_tpu.utils.text import cer

    p = params
    if quant_bits:
        from m3asr_tpu.ops.quant import quantize_moe_params
        p = dict(params)
        blocks = dict(p["blocks"])
        blocks["feed_forward"] = quantize_moe_params(
            blocks["feed_forward"], bits=quant_bits)
        p["blocks"] = blocks
    sess = StreamingSession(p, cfg.encoder_conf, chunk_size=chunk,
                            num_left_chunks=2, batch=1, moe=True,
                            moe_impl=moe_impl)
    refs, hyps = [], []
    for f, t in corpus:
        sess.reset()
        outs = sess.push(f[None]) + sess.finish()
        if not outs:
            hyps.append([])
        else:
            out = np.concatenate(outs, axis=1)
            hyps.append(native.ctc_greedy_search(
                out.astype(np.float32),
                np.array([out.shape[1]], np.int32))[0])
        refs.append(list(t))
    return cer(refs, hyps)


def main():
    global N_BLOCKS, N_EXPERTS
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_utts", type=int, default=600)
    ap.add_argument("--eval_utts", type=int, default=500)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--stream_steps", type=int, default=3000)
    ap.add_argument("--stream_eval_utts", type=int, default=200)
    ap.add_argument("--noise", type=float, default=0.03)
    ap.add_argument("--train_noise_hi", type=float, default=0.25,
                    help="training noise is drawn per-utterance from "
                         "[--noise, this] so degradation is graceful")
    ap.add_argument("--eval_noise", type=float, default=None,
                    help="additive-noise level of the second (hard) "
                         "eval split; default auto-calibrates so fp32 "
                         "CER lands in [0.02, 0.25], where mode deltas "
                         "are visible")
    ap.add_argument("--out", default=None, help="JSON output path")
    ap.add_argument("--skip_streaming", action="store_true")
    ap.add_argument("--vocab", type=int, default=VOCAB,
                    help="task vocabulary incl. blank (round-3 VERDICT "
                         "#10: >=1001 stresses the int4 softmax width)")
    ap.add_argument("--blocks", type=int, default=N_BLOCKS)
    ap.add_argument("--experts", type=int, default=N_EXPERTS)
    args = ap.parse_args()

    if args.vocab != VOCAB:
        set_vocab(args.vocab)
    N_BLOCKS, N_EXPERTS = args.blocks, args.experts

    import jax
    jax.config.update("jax_platforms", "cpu")

    print(f"generating corpus: {args.train_utts} train / "
          f"{args.eval_utts} eval utts, vocab {N_TOKENS}+blank, "
          f"{FEAT_DIM}-dim fbank via frontend/fbank.py ...")
    t0 = time.time()
    train_corpus = make_corpus(np.random.RandomState(10), args.train_utts,
                               noise_range=(args.noise, args.train_noise_hi))
    eval_corpus = make_corpus(np.random.RandomState(11), args.eval_utts,
                              noise=args.noise)
    mean, std = cmvn_stats(train_corpus)
    train_corpus = apply_cmvn(train_corpus, mean, std)
    eval_corpus = apply_cmvn(eval_corpus, mean, std)
    lens = [f.shape[0] for f, _ in eval_corpus]
    n_eval_tokens = sum(len(t) for _, t in eval_corpus)
    print(f"  frames per utt: min {min(lens)} max {max(lens)}; "
          f"{n_eval_tokens} eval tokens ({time.time() - t0:.0f}s)")

    cfg = offline_model_cfg()
    print(f"training offline model ({cfg.nnet_proto}, d=64, "
          f"{N_BLOCKS} blocks, {N_EXPERTS} experts, vocab {VOCAB}) ...")
    params = train_model(cfg, train_corpus, steps=args.steps)

    # a SECOND eval set at much higher additive noise: the trained
    # model sits near its decision margins there (fp32 CER is a few
    # percent, not zero), so quantization noise has room to move the
    # metric — without it every mode reads 0.0000 and the table can't
    # distinguish a harmless mode from a broken one. The level is
    # CALIBRATED on a small fp32 probe (the first level in the sweep
    # whose CER lands in [0.02, 0.25]) so the table stays informative
    # as the trained model changes.
    eval_noise = args.eval_noise
    if eval_noise is None:
        probe_rng = np.random.RandomState(13)
        best = None
        for lvl in (0.1, 0.16, 0.24, 0.35, 0.5, 0.7, 1.0, 1.5):
            probe = apply_cmvn(
                make_corpus(probe_rng, 64, noise=lvl), mean, std)
            c = eval_engine(cfg, params, probe, dict(dtype="float32"))
            print(f"  calibrating eval_noise: {lvl} -> fp32 CER {c:.4f}")
            if 0.02 <= c <= 0.3:
                best = lvl            # keep climbing inside the band
            if c > 0.3:
                break
        eval_noise = best if best is not None else 0.24
    noisy_corpus = apply_cmvn(
        make_corpus(np.random.RandomState(12), args.eval_utts,
                    noise=eval_noise), mean, std)

    results = {"task": {
        "vocab": VOCAB, "feat_dim": FEAT_DIM,
        "num_blocks": N_BLOCKS, "num_experts": N_EXPERTS,
        "eval_utts": len(eval_corpus), "eval_tokens": n_eval_tokens,
        "frames_min": int(min(lens)), "frames_max": int(max(lens)),
        "noise": args.noise, "eval_noise": eval_noise,
    }, "modes": {}, "modes_noisy": {}}

    for name, kw in ENGINE_MODES:
        t0 = time.time()
        c = eval_engine(cfg, params, eval_corpus, kw)
        cn = eval_engine(cfg, params, noisy_corpus, kw)
        results["modes"][name] = round(c, 5)
        results["modes_noisy"][name] = round(cn, 5)
        print(f"  {name}: CER {c:.4f} / noisy {cn:.4f} "
              f"({time.time() - t0:.0f}s)")

    t0 = time.time()
    c = eval_longform(cfg, params, eval_corpus)
    results["modes"]["longform_fp32"] = round(c, 5)
    print(f"  longform_fp32 (3x concat, windows over 512-bucket): "
          f"CER {c:.4f} ({time.time() - t0:.0f}s)")

    # round-3 VERDICT #8: overlap sweep + offline control on the SAME
    # concatenated utterances (RandomState(99) picks) — does the
    # long-form CER gap shrink with more stitching context (stitching
    # loss) or persist in a single no-window pass (model-side
    # distribution shift)?
    for O in (32, 64, 128, 192):
        t0 = time.time()
        c = eval_longform(cfg, params, eval_corpus, overlap=O)
        results["modes"][f"longform_fp32_ov{O}"] = round(c, 5)
        print(f"  longform_fp32_ov{O}: CER {c:.4f} "
              f"({time.time() - t0:.0f}s)")
    t0 = time.time()
    c = eval_longform(cfg, params, eval_corpus, control=True)
    results["modes"]["longform_fp32_offline_control"] = round(c, 5)
    print(f"  longform_fp32_offline_control (one big-bucket pass, no "
          f"stitching): CER {c:.4f} ({time.time() - t0:.0f}s)")

    if not args.skip_streaming:
        scfg = streaming_model_cfg()
        print("training causal static-chunk streaming model ...")
        sparams = train_model(scfg, train_corpus, steps=args.stream_steps,
                              seed=5)
        sub = eval_corpus[:args.stream_eval_utts]
        for name, impl, bits, aq in (
                ("stream_fp32", "dense", 0, False),
                ("stream_int8", "quant", 8, False),
                # "quant" dispatches the XLA dequant path, which reads
                # q4 params directly — same int4 grid as the TPU
                # kernel, CPU-runnable (the Pallas interpret mode is
                # needlessly slow for a 200-utt sweep)
                ("stream_int4", "quant", 4, False)):
            t0 = time.time()
            c = eval_streaming(scfg, sparams, sub, moe_impl=impl,
                               quant_bits=bits, act_quant=aq)
            results["modes"][name] = round(c, 5)
            print(f"  {name}: CER {c:.4f} ({time.time() - t0:.0f}s)")

    fp32 = results["modes"]["fp32"]
    results["deltas_vs_fp32"] = {
        k: round(v - fp32, 5) for k, v in results["modes"].items()
        if k != "fp32" and not k.startswith("stream")}
    nf32 = results["modes_noisy"]["fp32"]
    results["deltas_vs_fp32_noisy"] = {
        k: round(v - nf32, 5) for k, v in results["modes_noisy"].items()
        if k != "fp32"}
    doc = json.dumps(results, indent=2)
    print(doc)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc + "\n")


if __name__ == "__main__":
    main()
