"""Resampler parity: our numpy windowed-sinc == torchaudio's algorithm.

torchaudio itself is not installed here, so the check runs against a
line-faithful torch re-implementation of the torchaudio kernel
(`_get_sinc_resample_kernel` / `_apply_sinc_resample_kernel`, public
source; reference uses torchaudio.transforms.Resample defaults,
infer.py:370-380) — the same refshim pattern the other parity tests use.
Also bounds the delta the OLD scipy.resample_poly path injected into
prompt features (VERDICT r3 missing #4).
"""

import math

import numpy as np
import pytest

from jyutvoice_tpu.audio.resample import resample_sinc


def _torch_resample(x: np.ndarray, orig_freq: int, new_freq: int,
                    lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """Faithful torchaudio functional.resample (sinc_interp_hann)."""
    import torch

    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    if orig == new:
        return x
    base = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base)
    idx = torch.arange(-width, width + orig, dtype=torch.float64)[None, None] / orig
    t = torch.arange(0, -new, -1, dtype=torch.float64)[:, None, None] / new + idx
    t *= base
    t = t.clamp_(-lowpass_filter_width, lowpass_filter_width)
    window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    scale = base / orig
    kernels = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64),
                          t.sin() / t)
    kernels *= window * scale

    wav = torch.as_tensor(x, dtype=torch.float64)[None]
    length = wav.shape[-1]
    wav = torch.nn.functional.pad(wav, (width, width + orig))
    out = torch.nn.functional.conv1d(wav[:, None], kernels, stride=orig)
    out = out.transpose(1, 2).reshape(1, -1)
    target = int(math.ceil(new * length / orig))
    return out[0, :target].numpy()


SIGNALS = {}


def _signal(n=48000 * 2, sr=48000, seed=0):
    key = (n, sr, seed)
    if key not in SIGNALS:
        rng = np.random.default_rng(seed)
        t = np.arange(n) / sr
        # speech-band chirp + tone + broadband noise
        x = (
            0.5 * np.sin(2 * np.pi * (200 + 1500 * t) * t)
            + 0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(n)
        ).astype(np.float32)
        SIGNALS[key] = x
    return SIGNALS[key]


@pytest.mark.parametrize(
    "sr_in,sr_out",
    [(48000, 24000), (48000, 16000), (44100, 24000), (44100, 16000),
     (22050, 24000), (16000, 24000), (8000, 16000)],
)
def test_matches_torchaudio_algorithm(sr_in, sr_out):
    x = _signal(sr=sr_in, n=sr_in)  # 1 s
    ours = resample_sinc(x, sr_in, sr_out)
    ref = _torch_resample(x, sr_in, sr_out)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref.astype(np.float32), atol=2e-6)


def test_identity_and_length():
    x = _signal()
    np.testing.assert_array_equal(resample_sinc(x, 24000, 24000), x)
    for sr_in, sr_out in [(48000, 24000), (44100, 16000), (11025, 24000)]:
        y = resample_sinc(x, sr_in, sr_out)
        assert y.shape[-1] == math.ceil(sr_out / sr_in * x.shape[-1]) \
            or y.shape[-1] == math.ceil(
                (sr_out // math.gcd(sr_in, sr_out))
                * x.shape[-1] / (sr_in // math.gcd(sr_in, sr_out)))


def test_tone_preservation():
    """A mid-band tone passes through with near-unity gain."""
    sr_in, sr_out = 48000, 24000
    n = sr_in
    t = np.arange(n) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample_sinc(x, sr_in, sr_out)
    # compare against the analytically resampled tone (skip edges)
    t2 = np.arange(y.shape[-1]) / sr_out
    ref = np.sin(2 * np.pi * 1000 * t2)
    core = slice(200, -200)
    assert np.abs(y[core] - ref[core]).max() < 5e-3


def test_poly_vs_sinc_delta_bounded_through_mel():
    """The scipy->sinc switch moves prompt mels by less than the parity
    budget: bounds the delta the old path injected (VERDICT r3 #4)."""
    from scipy.signal import resample_poly

    from jyutvoice_tpu.audio.mel import MelSpec

    x = _signal(n=48000 * 2, sr=48000)
    a = resample_sinc(x, 48000, 24000)
    g = math.gcd(48000, 24000)
    b = resample_poly(x, 24000 // g, 48000 // g).astype(np.float32)
    n = min(a.shape[-1], b.shape[-1])
    # waveform-level: same signal, different anti-aliasing filters
    assert np.abs(a[:n] - b[:n]).mean() < 5e-3

    mel = MelSpec()
    ma = np.asarray(mel(a[None, :n]))
    mb = np.asarray(mel(b[None, :n]))
    mae = float(np.abs(ma - mb).mean())
    assert mae < 5e-2, mae  # log-mel delta well under the 1e-1 audible range
