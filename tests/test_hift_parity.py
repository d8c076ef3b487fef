"""Parity: JAX HiFT vocoder vs reference torch HiFTGenerator.

The reference draws untracked RNG in SineGen (random initial phase + noise,
generator.py:155-171); for parity we monkeypatch those to zero on the torch
side and run ours with deterministic=True.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import refshim

refshim.install()

import jax.numpy as jnp

from jyutvoice_tpu.config import HiFTConfig
from jyutvoice_tpu.models.hift import (
    apply_f0_predictor,
    hift_inference,
    small_istft,
    small_stft,
)
from jyutvoice_tpu.weights.torch_convert import convert_hift

CFG = HiFTConfig()


def _build_ref_hift():
    from jyutvoice.hifigan.f0_predictor import ConvRNNF0Predictor
    from jyutvoice.hifigan.generator import HiFTGenerator

    torch.manual_seed(0)
    f0p = ConvRNNF0Predictor(num_class=1, in_channels=80, cond_channels=512)
    gen = HiFTGenerator(
        in_channels=CFG.in_channels,
        base_channels=CFG.base_channels,
        nb_harmonics=CFG.nb_harmonics,
        sampling_rate=CFG.sampling_rate,
        nsf_alpha=CFG.nsf_alpha,
        nsf_sigma=CFG.nsf_sigma,
        nsf_voiced_threshold=CFG.nsf_voiced_threshold,
        upsample_rates=list(CFG.upsample_rates),
        upsample_kernel_sizes=list(CFG.upsample_kernel_sizes),
        istft_params={"n_fft": CFG.istft_n_fft, "hop_len": CFG.istft_hop_len},
        resblock_kernel_sizes=list(CFG.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in CFG.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(CFG.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[
            list(d) for d in CFG.source_resblock_dilation_sizes
        ],
        lrelu_slope=CFG.lrelu_slope,
        audio_limit=CFG.audio_limit,
        f0_predictor=f0p,
    )
    gen.eval()
    return gen


@pytest.fixture(scope="module")
def ref_gen():
    return _build_ref_hift()


@pytest.fixture(scope="module")
def params(ref_gen):
    sd = {k: v.detach().numpy() for k, v in ref_gen.state_dict().items()}
    return convert_hift(sd, CFG)


def test_small_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 480 * 7), dtype=np.float32)
    re, im = small_stft(jnp.asarray(x), 16, 4)
    ref = torch.stft(
        torch.from_numpy(x), 16, 4, 16, window=torch.hann_window(16),
        return_complex=True,
    )
    np.testing.assert_allclose(
        np.asarray(re), ref.real.numpy().transpose(0, 2, 1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(im), ref.imag.numpy().transpose(0, 2, 1), atol=1e-4
    )


def test_small_istft_matches_torch():
    rng = np.random.default_rng(1)
    t_frames = 121
    mag = np.abs(rng.standard_normal((2, t_frames, 9))).astype(np.float32)
    ph = rng.standard_normal((2, t_frames, 9)).astype(np.float32)
    re, im = mag * np.cos(ph), mag * np.sin(ph)
    out = small_istft(jnp.asarray(re), jnp.asarray(im), 16, 4)
    ref = torch.istft(
        torch.complex(
            torch.from_numpy(re.transpose(0, 2, 1)),
            torch.from_numpy(im.transpose(0, 2, 1)),
        ),
        16, 4, 16, window=torch.hann_window(16),
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_f0_predictor_parity(ref_gen, params):
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 25, 80), dtype=np.float32)
    with torch.no_grad():
        ref = ref_gen.f0_predictor(torch.from_numpy(mel.transpose(0, 2, 1)))
    out = apply_f0_predictor(params["f0_predictor"], jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4, rtol=1e-3)


def test_hift_inference_parity(ref_gen, params, monkeypatch):
    """End-to-end mel -> waveform with RNG zeroed on both sides."""
    # zero the torch randomness: uniform phase -> 0, noise randn -> 0
    class _ZeroUniform:
        def __init__(self, low, high):
            pass

        def sample(self, sample_shape):
            return torch.zeros(sample_shape)

    import jyutvoice.hifigan.generator as ref_mod

    monkeypatch.setattr(ref_mod, "Uniform", _ZeroUniform)
    monkeypatch.setattr(
        torch, "randn_like", lambda x: torch.zeros_like(x), raising=True
    )

    rng = np.random.default_rng(3)
    t = 20
    mel = (rng.standard_normal((1, t, 80)) * 1.5).astype(np.float32)
    with torch.no_grad():
        ref_wav, ref_src = ref_gen.inference(
            torch.from_numpy(mel.transpose(0, 2, 1))
        )
    wav, src = hift_inference(params, CFG, jnp.asarray(mel), deterministic=True)
    assert wav.shape == (1, t * 480)
    np.testing.assert_allclose(
        np.asarray(src)[:, :, 0], ref_src.numpy()[:, 0, :], atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(wav), ref_wav.numpy(), atol=2e-3, rtol=1e-2)


def test_windowed_vocode_matches_full():
    """hift_inference_windowed (overlapping-window batch, interiors kept)
    must reproduce the full decode: convs are translation-equivariant and
    the reflect-pad dup shifts each window exactly as it shifts the full
    stream, so with a halo covering the conv receptive field the match is
    fp-exact (measured 5e-9 max on CPU at halo=32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models import hift as H

    cfg = JyutVoiceConfig().hift
    p = H.init_hift(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 300, 80)) * 0.1, jnp.float32)
    full, _ = H.hift_inference(p, cfg, mel, deterministic=True)
    win, _ = H.hift_inference_windowed(
        p, cfg, mel, window=64, halo=32, deterministic=True
    )
    assert win.shape == full.shape
    np.testing.assert_allclose(
        np.asarray(win), np.asarray(full), atol=1e-6
    )
    # short inputs fall back to the plain decode (identity check)
    short, _ = H.hift_inference_windowed(
        p, cfg, mel[:, :100], window=64, halo=32, deterministic=True
    )
    ref, _ = H.hift_inference(p, cfg, mel[:, :100], deterministic=True)
    np.testing.assert_array_equal(np.asarray(short), np.asarray(ref))
    # auto dispatch: batch-1 long -> windowed; batched -> plain
    auto, _ = H.hift_vocode_auto(p, cfg, mel)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(full), atol=1e-6)
