"""Streaming synthesis: chunked CFM with overlap caches + HiFT source cache."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from tests.test_pipeline import TINY
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.pipeline.streaming import OVERLAP, StreamingSynthesizer


@pytest.fixture(scope="module")
def setup():
    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    return params, params_hift


def test_stream_chunks(setup):
    params, params_hift = setup
    rng = np.random.default_rng(0)
    t_total = 130
    mu_y = rng.standard_normal((t_total, 80)).astype(np.float32)
    spk = rng.standard_normal(80).astype(np.float32)

    ss = StreamingSynthesizer(TINY, params, params_hift, chunk_frames=50)
    chunks = list(ss.stream(mu_y, spk))
    assert len(chunks) == 3  # 50 + 50 + 30
    total = np.concatenate(chunks)
    assert total.shape[0] == t_total * 480
    assert np.isfinite(total).all()
    assert np.abs(total).max() <= 0.99 + 1e-6


def test_stream_deterministic(setup):
    params, params_hift = setup
    rng = np.random.default_rng(1)
    mu_y = rng.standard_normal((80, 80)).astype(np.float32)
    spk = rng.standard_normal(80).astype(np.float32)
    ss = StreamingSynthesizer(TINY, params, params_hift, chunk_frames=50)
    a = np.concatenate(list(ss.stream(mu_y, spk)))
    b = np.concatenate(list(ss.stream(mu_y, spk)))
    np.testing.assert_array_equal(a, b)


def test_stream_with_prompt(setup):
    params, params_hift = setup
    rng = np.random.default_rng(2)
    mu_y = rng.standard_normal((60, 80)).astype(np.float32)
    spk = rng.standard_normal(80).astype(np.float32)
    p = 32
    prompt_feat = rng.standard_normal((p, 80)).astype(np.float32)
    prompt_h = rng.standard_normal((p, 80)).astype(np.float32)
    ss = StreamingSynthesizer(
        TINY, params, params_hift, chunk_frames=50, prompt_frames=p
    )
    out = np.concatenate(list(ss.stream(mu_y, spk, prompt_feat, prompt_h)))
    assert out.shape[0] == 60 * 480
    assert np.isfinite(out).all()


def test_pipeline_synthesize_streaming(setup):
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    params, params_hift = setup
    synth = Synthesizer(TINY, params, params_hift)
    chunks = list(
        synth.synthesize_streaming(
            "佢 係邊 個", lang="yue", phone="keoi5 hai6 bin1 go3",
            chunk_frames=50,
        )
    )
    assert len(chunks) >= 1
    wav = np.concatenate(chunks)
    assert wav.shape[0] % 1 == 0 and np.isfinite(wav).all()
    # matches the non-streamed length for the same text
    res = synth.synthesize(
        "佢 係邊 個", lang="yue", phone="keoi5 hai6 bin1 go3", n_timesteps=2
    )
    assert wav.shape[0] == res.mel_frames * 480


def test_pipeline_synthesize_streaming_with_prompt(setup):
    """End-to-end streaming with a cloning prompt; repeated calls reuse the
    cached StreamingSynthesizer (same (chunk, p_len) key)."""
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    params, params_hift = setup
    synth = Synthesizer(TINY, params, params_hift)
    rng = np.random.default_rng(3)
    p = 24
    kw = dict(
        lang="yue", phone="keoi5 hai6 bin1 go3", chunk_frames=50,
        spk_embed=rng.standard_normal(192).astype(np.float32),
        prompt_feat=rng.standard_normal((p, 80)).astype(np.float32),
        prompt_h=rng.standard_normal((p, 80)).astype(np.float32),
    )
    wav1 = np.concatenate(list(synth.synthesize_streaming("佢 係邊 個", **kw)))
    assert np.isfinite(wav1).all() and len(wav1) % 480 == 0
    key = ("stream_ss", 50, p, 10)
    assert key in synth._mel_fns
    ss = synth._mel_fns[key]
    wav2 = np.concatenate(list(synth.synthesize_streaming("佢 係邊 個", **kw)))
    assert synth._mel_fns[key] is ss  # reused, not re-created
    np.testing.assert_array_equal(wav1, wav2)
