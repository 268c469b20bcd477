"""Generate tests/fixtures/fbank_golden.npz — committed golden features
for the Kaldi fbank frontend (round-4 VERDICT #5).

torchaudio is not importable in this image, so exact parity vs
torchaudio.compliance.kaldi.fbank could never execute (the suite's one
skip). This script re-derives the SAME pipeline independently in torch
(strided framing + torch.hann_window(periodic=False)**0.85 +
torch.fft.rfft — a separate code path from the numpy implementation in
m3asr_tpu/frontend/fbank.py, written from the Kaldi/torchaudio spec:
torchaudio/compliance/kaldi.py fbank(), kaldi feature-window.cc /
mel-computations.cc) and commits its output. Two independent
derivations agreeing to float32 tolerance is the parity evidence; the
committed fixture then asserts on EVERY host with no optional imports.
If torchaudio is available somewhere, test_torchaudio_parity_if_available
additionally cross-checks both against the real thing.
"""

import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def mel_banks_torch(num_bins: int, padded: int, sf: float,
                    low: float = 20.0, high: float = 0.0) -> torch.Tensor:
    """Kaldi MelBanks (mel-computations.cc:87-150): triangular filters
    over FFT bins 0..padded/2-1."""
    nfft = padded // 2
    if high <= 0.0:
        high = 0.5 * sf + high
    mel = lambda f: 1127.0 * torch.log1p(torch.as_tensor(f) / 700.0)
    ml, mh = mel(low).double(), mel(high).double()
    d = (mh - ml) / (num_bins + 1)
    i = torch.arange(num_bins, dtype=torch.float64)[:, None]
    left, center, right = ml + i * d, ml + (i + 1) * d, ml + (i + 2) * d
    fft_mel = mel(sf / padded * torch.arange(nfft, dtype=torch.float64))
    up = (fft_mel[None] - left) / (center - left)
    down = (right - fft_mel[None]) / (right - center)
    return torch.clamp(torch.minimum(up, down), min=0.0).float()


def kaldi_fbank_torch(wave: np.ndarray, num_mel_bins: int,
                      frame_length: float = 25.0, frame_shift: float = 10.0,
                      sample_frequency: float = 16000.0,
                      preemphasis: float = 0.97,
                      remove_dc_offset: bool = True) -> np.ndarray:
    """torchaudio.compliance.kaldi.fbank semantics, dither=0,
    energy_floor=0, use_energy=False, snip_edges=True."""
    w = torch.as_tensor(np.asarray(wave, np.float32))
    size = int(sample_frequency * frame_length / 1000)
    shift = int(sample_frequency * frame_shift / 1000)
    if w.numel() < size:
        return np.zeros((0, num_mel_bins), np.float32)
    m = 1 + (w.numel() - size) // shift
    frames = w.as_strided((m, size), (shift, 1)).clone()
    if remove_dc_offset:
        frames = frames - frames.mean(dim=1, keepdim=True)
    if preemphasis != 0.0:
        prev = torch.cat([frames[:, :1], frames[:, :-1]], dim=1)
        frames = frames - preemphasis * prev
    frames = frames * torch.hann_window(size, periodic=False).pow(0.85)
    padded = 1 << (size - 1).bit_length()
    power = torch.fft.rfft(frames, n=padded).abs().pow(2.0)[:, :padded // 2]
    mel = power @ mel_banks_torch(num_mel_bins, padded,
                                  sample_frequency).T
    eps = torch.finfo(torch.float32).eps
    return torch.log(torch.clamp(mel, min=eps)).numpy()


def main():
    rng = np.random.RandomState(20260821)
    sr = 16000
    t = np.arange(int(sr * 0.43)) / sr
    waves = {
        # int16-scale noise — exercises every FFT bin
        "noise": (rng.randn(int(sr * 0.37)) * 6000).astype(np.float32),
        # multi-tone + noise floor — structured spectrum
        "tones": (8000 * np.sin(2 * np.pi * 340.0 * t)
                  + 4000 * np.sin(2 * np.pi * 1725.0 * t)
                  + 1500 * np.sin(2 * np.pi * 5100.0 * t)
                  + 50 * rng.randn(t.shape[0])).astype(np.float32),
        # int16-quantized speech-scale ramp (what wav files store)
        "quantized": (rng.randn(int(sr * 0.11)) * 900).astype(np.int16)
        .astype(np.float32),
    }
    out = {}
    for name, wave in waves.items():
        out[f"wave_{name}"] = wave
        for bins in (40, 80):
            out[f"feat_{name}_{bins}"] = kaldi_fbank_torch(wave, bins)

    # cross-check vs the numpy frontend before committing
    from m3asr_tpu.frontend import fbank as F
    worst = 0.0
    for name, wave in waves.items():
        for bins in (40, 80):
            ours = F.fbank(wave, num_mel_bins=bins, sample_frequency=sr)
            ref = out[f"feat_{name}_{bins}"]
            err = float(np.abs(ours - ref).max())
            worst = max(worst, err)
            print(f"{name}/{bins}: shape {ref.shape} maxerr {err:.2e}")
    assert worst < 1e-3, worst

    path = os.path.join(REPO, "tests", "fixtures", "fbank_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)} bytes), "
          f"worst independent-derivation maxerr {worst:.2e}")


if __name__ == "__main__":
    main()
