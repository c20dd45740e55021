"""Mel frontend vs a literal numpy transcription of the reference's Rust
pipeline (src/models/onnx.rs:167-320): Slaney filterbank, reflect padding
edge cases, Hann window, sqrt(|X|^2+1e-9), ln(max(mel,1e-5))."""

import numpy as np
import pytest

from qwen3_tts_tpu.core.config import MelConfig
from qwen3_tts_tpu.models import mel as mel_mod

CFG = MelConfig()


def oracle_mel(audio: np.ndarray) -> np.ndarray:
    """Direct transcription of the Rust compute_mel."""
    SR, N_FFT, HOP, N_MELS = 24000.0, 1024, 256, 128
    FMIN, FMAX = 0.0, 12000.0

    def hz_to_mel(f):
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return (min_log_mel + np.log(f / min_log_hz) / logstep
                if f >= min_log_hz else f / f_sp)

    def mel_to_hz(m):
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return (min_log_hz * np.exp(logstep * (m - min_log_mel))
                if m >= min_log_mel else f_sp * m)

    n_bins = N_FFT // 2 + 1
    mel_min, mel_max = hz_to_mel(FMIN), hz_to_mel(FMAX)
    edges = [mel_to_hz(mel_min + (mel_max - mel_min) * i / (N_MELS + 1))
             for i in range(N_MELS + 2)]
    freqs = np.arange(n_bins) * SR / N_FFT
    fb = np.zeros((N_MELS, n_bins))
    for m in range(N_MELS):
        fl, fc, fr = edges[m], edges[m + 1], edges[m + 2]
        norm = 2.0 / (fr - fl)
        for k, f in enumerate(freqs):
            if fl <= f <= fc:
                w = (f - fl) / (fc - fl)
            elif fc < f <= fr:
                w = (fr - f) / (fr - fc)
            else:
                w = 0.0
            fb[m, k] = w * norm

    padding = (N_FFT - HOP) // 2
    n = len(audio)
    head = [audio[i] if i < n else 0.0 for i in range(padding, 0, -1)]
    tail = []
    for i in range(1, padding + 1):
        idx = n - 1 - i
        tail.append(audio[idx] if 0 <= idx < n else 0.0)
    padded = np.concatenate([head, audio, tail])

    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    n_frames = (len(padded) - N_FFT) // HOP + 1
    out = []
    for t in range(n_frames):
        fr = padded[t * HOP:t * HOP + N_FFT] * hann
        spec = np.fft.rfft(fr)
        mag = np.sqrt(np.abs(spec) ** 2 + 1e-9)
        melv = fb @ mag
        out.append(np.log(np.maximum(melv, 1e-5)))
    return np.asarray(out, np.float32)


def test_mel_matches_reference_oracle():
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=24000) * 0.1).astype(np.float32)  # 1 s
    got = mel_mod.compute_mel(audio, CFG)
    want = oracle_mel(audio)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mel_shapes():
    audio = np.zeros(24000, np.float32)
    m = mel_mod.compute_mel(audio, CFG)
    padding = (CFG.n_fft - CFG.hop) // 2
    expect_frames = (24000 + 2 * padding - CFG.n_fft) // CFG.hop + 1
    assert m.shape == (expect_frames, 128)
    # silence -> log floor
    np.testing.assert_allclose(m, np.log(1e-5), atol=1e-4)


def test_mel_short_signal_edge():
    """Shorter than the pad width: the reference zero-fills its quirky
    reflect edges — must not crash and must match the oracle."""
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=500) * 0.1).astype(np.float32)
    got = mel_mod.compute_mel(audio, CFG)
    want = oracle_mel(audio)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mel_empty():
    assert mel_mod.compute_mel(np.zeros(0, np.float32), CFG).shape[1] == 128
