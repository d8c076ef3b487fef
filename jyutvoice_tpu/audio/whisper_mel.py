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


# ---------------------------------------------------------------------------
# Jittable batched variant (device-side DSP for fused prompt extraction)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=2)
def _whisper_dft(n_fft: int):
    """(n_fft, n_fft//2+1) cos/sin DFT matrices with the hann window folded."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * t * k / n_fft
    w = _hann(n_fft)[:, None]
    return (
        (np.cos(angle) * w).astype(np.float32),
        (-np.sin(angle) * w).astype(np.float32),
    )


def whisper_log_mel_batch(y_padded, wav_len, n_mels: int = 128,
                          n_fft: int = 400, hop: int = 160):
    """Jittable batched whisper log-mel.

    `y_padded` is (B, Lp) with each row host-reflect-padded by n_fft//2 on
    BOTH sides of its own samples (per-row tail reflection cannot be done
    on a zero-padded batch buffer device-side), rows zero-padded to a
    common Lp. Returns ((B, T, n_mels) time-major, t_len) where
    t_len = wav_len // hop (whisper's dropped-last-frame count). The 8 dB
    dynamic-range clamp uses each row's masked max — padding garbage never
    enters it; frames past t_len are garbage to be masked downstream.
    """
    import jax.numpy as jnp

    from jyutvoice_tpu.audio.mel import frame_signal

    frames = frame_signal(y_padded, n_fft, hop)  # (B, T, n_fft)
    cos_m, sin_m = _whisper_dft(n_fft)
    re = jnp.dot(frames, jnp.asarray(cos_m), preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(sin_m), preferred_element_type=jnp.float32)
    power = re * re + im * im
    fb = mel_filterbank(16000, n_fft, n_mels, 0.0, None)
    mel = jnp.dot(power, jnp.asarray(fb.T), preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    t_len = (wav_len // hop).astype(jnp.int32)
    valid = jnp.arange(log_spec.shape[1])[None, :] < t_len[:, None]
    row_max = jnp.max(
        jnp.where(valid[..., None], log_spec, -jnp.inf), axis=(1, 2),
        keepdims=True,
    )
    log_spec = jnp.maximum(log_spec, row_max - 8.0)
    return (log_spec + 4.0) / 4.0, t_len
