"""Kaldi-compatible log-mel filterbank (for the campplus speaker embedder).

Re-implements torchaudio.compliance.kaldi.fbank with the arguments the
reference uses (infer.py:148-163): num_mel_bins=80, dither=0,
sample_frequency=16000 — 25 ms povey-windowed frames, 10 ms shift,
snip_edges, DC-offset removal, preemphasis 0.97, HTK-scale mel banks on a
512-point FFT, natural log. Output (T, 80), later mean-normalized.
"""

from __future__ import annotations

import functools

import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _hz_to_mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=4)
def _kaldi_mel_banks(num_bins: int, window_size_padded: int, sample_freq: float):
    """Kaldi MelBanks: triangular filters in mel space over FFT bins
    (low_freq=20, high_freq=nyquist)."""
    nyquist = 0.5 * sample_freq
    low_freq, high_freq = 20.0, nyquist
    fft_bins = window_size_padded // 2
    fft_bin_width = sample_freq / window_size_padded
    mel_low = _hz_to_mel_htk(low_freq)
    mel_high = _hz_to_mel_htk(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, fft_bins), dtype=np.float32)
    fft_freqs = fft_bin_width * np.arange(fft_bins)
    mel_freqs = _hz_to_mel_htk(fft_freqs)
    for i in range(num_bins):
        left = mel_low + i * mel_delta
        center = mel_low + (i + 1) * mel_delta
        right = mel_low + (i + 2) * mel_delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        bins[i] = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    return bins


@functools.lru_cache(maxsize=4)
def _povey_window(n: int) -> np.ndarray:
    a = 2.0 * np.pi / (n - 1)
    hann = 0.5 - 0.5 * np.cos(a * np.arange(n))
    return (hann**0.85).astype(np.float64)


def kaldi_fbank(
    waveform: np.ndarray,
    num_mel_bins: int = 80,
    sample_frequency: float = 16000.0,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    energy_floor: float = 1.0,
) -> np.ndarray:
    """(num_samples,) float32 in kaldi scaling -> (T, num_mel_bins) log-mel.

    Input is expected in the torchaudio convention (waveform * 32768 gives
    kaldi's int16 scaling; the campplus embedding is scale-sensitive only
    through the log offset, and the reference feeds [-1, 1] floats —
    replicate that: pass the float waveform directly).
    """
    wav = np.asarray(waveform, dtype=np.float64)
    win = int(sample_frequency * frame_length_ms / 1000)  # 400
    shift = int(sample_frequency * frame_shift_ms / 1000)  # 160
    padded = _next_pow2(win)  # 512
    if len(wav) < win:
        return np.zeros((0, num_mel_bins), np.float32)
    n_frames = 1 + (len(wav) - win) // shift

    idx = np.arange(n_frames)[:, None] * shift + np.arange(win)[None, :]
    frames = wav[idx]
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        first = frames[:, :1]
        frames = np.concatenate(
            [first - preemphasis_coefficient * first,
             frames[:, 1:] - preemphasis_coefficient * frames[:, :-1]],
            axis=1,
        )
    frames = frames * _povey_window(win)[None, :]
    frames = np.pad(frames, ((0, 0), (0, padded - win)))
    spec = np.fft.rfft(frames, axis=1)
    power = (spec.real**2 + spec.imag**2)[:, : padded // 2]

    banks = _kaldi_mel_banks(num_mel_bins, padded, sample_frequency)
    mel = power @ banks.T
    return np.log(np.maximum(mel, 1.1920928955078125e-07)).astype(np.float32)


# ---------------------------------------------------------------------------
# Jittable batched variant (device-side DSP for fused prompt extraction)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _fbank_dft(win: int, padded: int):
    """(win, padded//2) cos/sin DFT matrices (bins 0..padded//2-1, matching
    the numpy path's `[: padded // 2]` power slice)."""
    n_bins = padded // 2
    t = np.arange(win)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * t * k / padded
    return (
        np.cos(angle).astype(np.float32),
        (-np.sin(angle)).astype(np.float32),
    )


def kaldi_fbank_batch(y, wav_len, num_mel_bins: int = 80):
    """Jittable batched kaldi fbank: (B, L) zero-padded rows -> (B, T, bins).

    Same semantics as `kaldi_fbank` (25 ms povey frames, 10 ms shift,
    snip_edges, DC removal, preemphasis 0.97, HTK mel banks on a 512-point
    FFT, natural log) vectorized over a batch; frames past each row's
    `1 + (wav_len - 400) // 160` count are garbage to be masked downstream
    (the CAM++ apply fn consumes the returned t_len). Framing rides the
    reshape+shifted-slice path — no gathers.
    """
    import jax.numpy as jnp

    from jyutvoice_tpu.audio.mel import frame_signal

    win, shift = 400, 160
    padded = _next_pow2(win)
    frames = frame_signal(y, win, shift)  # (B, T, 400)
    frames = frames - frames.mean(axis=-1, keepdims=True)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * prev
    frames = frames * jnp.asarray(_povey_window(win), jnp.float32)
    cos_m, sin_m = _fbank_dft(win, padded)
    re = jnp.dot(frames, jnp.asarray(cos_m), preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(sin_m), preferred_element_type=jnp.float32)
    power = re * re + im * im
    banks = _kaldi_mel_banks(num_mel_bins, padded, 16000.0)
    mel = jnp.dot(power, jnp.asarray(banks.T), preferred_element_type=jnp.float32)
    feat = jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))
    t_len = jnp.where(wav_len >= win, 1 + (wav_len - win) // shift, 0)
    return feat, t_len.astype(jnp.int32)
