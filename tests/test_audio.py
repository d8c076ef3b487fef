"""Mel frontend parity tests vs torch.stft and the reference math."""

import numpy as np
import pytest
import torch

from jyutvoice_tpu.audio.mel import MelSpec, mel_filterbank, stft_magnitude
import jax.numpy as jnp


def _torch_mel(y, mel_weights, n_fft=1920, hop=480, win=1920):
    """Reference mel_spectrogram (utils/audio.py:18-63) with the filterbank
    injected (librosa itself is unavailable in this environment)."""
    yt = torch.from_numpy(y)
    yt = torch.nn.functional.pad(
        yt.unsqueeze(1), (int((n_fft - hop) / 2), int((n_fft - hop) / 2)), mode="reflect"
    ).squeeze(1)
    spec = torch.view_as_real(
        torch.stft(
            yt,
            n_fft,
            hop_length=hop,
            win_length=win,
            window=torch.hann_window(win),
            center=False,
            pad_mode="reflect",
            normalized=False,
            onesided=True,
            return_complex=True,
        )
    )
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    spec = torch.matmul(torch.from_numpy(mel_weights), spec)
    return torch.log(torch.clamp(spec, min=1e-5)).numpy()  # (B, n_mels, T)


def test_stft_magnitude_matches_torch():
    rng = np.random.default_rng(1)
    y = rng.uniform(-1, 1, (2, 1920 * 4)).astype(np.float32)
    out = np.asarray(stft_magnitude(jnp.asarray(y), 1920, 480, 1920))
    ref = torch.stft(
        torch.from_numpy(y),
        1920,
        hop_length=480,
        win_length=1920,
        window=torch.hann_window(1920),
        center=False,
        return_complex=True,
    ).abs()
    np.testing.assert_allclose(out, ref.numpy().transpose(0, 2, 1), atol=2e-3, rtol=1e-4)


def test_mel_spectrogram_matches_reference_math():
    rng = np.random.default_rng(2)
    sec = 1.2
    y = (rng.uniform(-1, 1, (1, int(24000 * sec)))).astype(np.float32) * 0.8
    fb = mel_filterbank(24000, 1920, 80, 0.0, 8000.0)
    ref = _torch_mel(y, fb)  # (B, 80, T)
    mel = MelSpec()
    out = np.asarray(mel(jnp.asarray(y)))  # (B, T, 80)
    assert out.shape == (1, ref.shape[2], 80)
    np.testing.assert_allclose(out.transpose(0, 2, 1), ref, atol=2e-3, rtol=1e-3)


def test_mel_frame_rate_50fps():
    mel = MelSpec()
    y = jnp.zeros((1, 24000))  # 1 second
    out = mel(y)
    assert out.shape[1] == 50  # 50 mel fps (SURVEY §0)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 1920, 80, 0.0, 8000.0)
    assert fb.shape == (80, 961)
    assert np.all(fb >= 0)
    # filters above fmax=8000Hz must be zero: bin freq > 8000 -> col index
    freqs = np.linspace(0, 12000, 961)
    assert fb[:, freqs > 8000.01].sum() == 0
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()
