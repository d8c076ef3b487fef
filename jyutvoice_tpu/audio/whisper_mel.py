"""Whisper-style 128-bin log-mel (speech tokenizer frontend).

Re-implements whisper.log_mel_spectrogram as used by the reference's
speech-token extraction (infer.py:98-145): n_fft=400, hop=160, hann window,
slaney mel, log10 with 8-dB dynamic-range clamp and (x+4)/4 scaling.
Host-side numpy (prep-time only).
"""

from __future__ import annotations

import functools

import numpy as np

from jyutvoice_tpu.audio.mel import mel_filterbank


@functools.lru_cache(maxsize=2)
def _hann(n: int) -> np.ndarray:
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float64)


def whisper_log_mel(
    audio16k: np.ndarray, n_mels: int = 128, n_fft: int = 400, hop: int = 160
) -> np.ndarray:
    """(num_samples,) 16 kHz float -> (n_mels, T) log-mel, whisper semantics."""
    wav = np.asarray(audio16k, dtype=np.float64)
    pad = n_fft // 2
    wav = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(wav) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = wav[idx] * _hann(n_fft)[None, :]
    spec = np.fft.rfft(frames, axis=1)
    power = (spec.real**2 + spec.imag**2)[:-1]  # whisper drops the last frame

    fb = mel_filterbank(16000, n_fft, n_mels, 0.0, None)  # slaney, norm slaney
    mel = power @ fb.T  # (T, n_mels)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T.astype(np.float32)  # (n_mels, T)
