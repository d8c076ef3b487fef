"""Jittable log-mel spectrogram (matmul-DFT form).

Matches the reference mel frontend (jyutvoice/utils/audio.py:18-63):
  * reflect-pad by (n_fft - hop)/2 on both sides,
  * torch.stft(center=False) with a hann window,
  * magnitude = sqrt(re^2 + im^2 + 1e-9),
  * slaney-scale, slaney-normalized mel filterbank (librosa defaults),
  * log(clamp(min=1e-5)).

TPU-first design: instead of an FFT primitive, frames are extracted with a
strided gather and projected through precomputed windowed DFT cos/sin
matrices — two large matmuls that map straight onto the MXU, fusing the
window multiply into the weights. The mel projection is a third matmul.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Slaney mel filterbank (librosa.filters.mel defaults: htk=False, norm=slaney)
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(
        log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels
    )
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: Optional[float]
) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) slaney-normalized triangular filterbank."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_min, mel_max = _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax)
    mel_f = _mel_to_hz_slaney(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Framed STFT as matmul
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _windowed_dft(n_fft: int, win_length: int):
    """(n_fft, n_bins) cos and -sin DFT matrices with the hann window folded in."""
    n_bins = 1 + n_fft // 2
    # torch.hann_window(periodic=True)
    n = np.arange(win_length)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * t * k / n_fft
    cos_m = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_m = (-np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


def frame_signal(y: Array, n_fft: int, hop: int) -> Array:
    """(B, L) -> (B, T, n_fft) frames with stride `hop` (no padding).

    Framing is a reshape + R shifted slices (R = ceil(n_fft/hop)) — never a
    gather, which TPUs execute poorly. When hop does not divide n_fft the
    frames are built ceil-width and sliced back to n_fft (the zero
    right-pad this may add is only ever read into the sliced-off columns).
    """
    b, length = y.shape
    n_frames = 1 + (length - n_fft) // hop
    r = -(-n_fft // hop)  # ceil
    need = hop * (n_frames - 1 + r)
    if need > length:
        y = jnp.pad(y, ((0, 0), (0, need - length)))
    ph = y[:, :need].reshape(b, n_frames - 1 + r, hop)
    wide = jnp.concatenate(
        [ph[:, k : k + n_frames, :] for k in range(r)], axis=-1
    )
    return wide if wide.shape[-1] == n_fft else wide[:, :, :n_fft]


def stft_magnitude(y: Array, n_fft: int, hop: int, win_length: int) -> Array:
    """(B, L) -> (B, T, n_bins) magnitude, torch.stft(center=False) semantics."""
    frames = frame_signal(y, n_fft, hop)
    cos_m, sin_m = _windowed_dft(n_fft, win_length)
    re = jnp.dot(frames, jnp.asarray(cos_m), preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(sin_m), preferred_element_type=jnp.float32)
    return jnp.sqrt(re * re + im * im + 1e-9)


class MelSpec:
    """Configured log-mel extractor; `__call__` is jittable.

    Input (B, L) float32 in [-1, 1]; output (B, T, n_mels) channels-last.
    """

    def __init__(
        self,
        sr: int = 24000,
        n_fft: int = 1920,
        hop: int = 480,
        win_length: int = 1920,
        n_mels: int = 80,
        fmin: float = 0.0,
        fmax: Optional[float] = 8000.0,
    ):
        self.sr, self.n_fft, self.hop, self.win_length = sr, n_fft, hop, win_length
        self.n_mels, self.fmin, self.fmax = n_mels, fmin, fmax
        self.mel_weights = jnp.asarray(
            mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T
        )  # (n_bins, n_mels)

    def __call__(self, y: Array) -> Array:
        pad = (self.n_fft - self.hop) // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        return self.from_padded(y)

    def from_padded(self, y: Array) -> Array:
        """Log-mel of an already reflect-padded signal.

        Batched prompt extraction pads each row host-side (per-row reflect
        of the row's own tail — a device-side pad of the zero-padded batch
        buffer would reflect the wrong samples for short rows) and calls
        this on the bucketed buffer; rows are exact up to their own frame
        count.
        """
        spec = stft_magnitude(y, self.n_fft, self.hop, self.win_length)
        mel = jnp.dot(spec, self.mel_weights, preferred_element_type=jnp.float32)
        return jnp.log(jnp.clip(mel, min=1e-5))

    def num_frames(self, num_samples: int) -> int:
        return num_samples // self.hop
