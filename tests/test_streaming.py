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
    # prompt lengths are BUCKETED (one compiled chunk graph per bucket, not
    # per distinct cloning-prompt length): p=24 -> bucket 64
    from jyutvoice_tpu.pipeline import buckets as bkt

    key = ("stream_ss", 50, bkt.pick_bucket(p, bkt.PROMPT_BUCKETS[1:]), 10)
    assert key in synth._mel_fns
    ss = synth._mel_fns[key]
    wav2 = np.concatenate(list(synth.synthesize_streaming("佢 係邊 個", **kw)))
    assert synth._mel_fns[key] is ss  # reused, not re-created
    np.testing.assert_array_equal(wav1, wav2)


def test_stream_chunk_must_exceed_overlap(setup):
    """chunk_frames <= OVERLAP would silently disable the crossfade for the
    whole stream (every chunk takes the emit-everything branch) — the
    constructor must refuse."""
    params, params_hift = setup
    with pytest.raises(ValueError, match="overlap"):
        StreamingSynthesizer(TINY, params, params_hift, chunk_frames=OVERLAP)


def test_stream_prompt_bucket_matches_exact(setup):
    """A prompt shorter than the bucket (right-aligned, prefix masked)
    must produce the same audio as an exact-length prompt graph: the
    estimator zero-masks every conv input, so the masked prefix is
    equivalent to the tight layout's implicit left padding."""
    params, params_hift = setup
    rng = np.random.default_rng(7)
    mu_y = rng.standard_normal((60, 80)).astype(np.float32)
    spk = rng.standard_normal(80).astype(np.float32)
    p_valid = 32
    prompt_feat = rng.standard_normal((p_valid, 80)).astype(np.float32)
    prompt_h = rng.standard_normal((p_valid, 80)).astype(np.float32)

    exact = StreamingSynthesizer(
        TINY, params, params_hift, chunk_frames=50, prompt_frames=p_valid
    )
    bucketed = StreamingSynthesizer(
        TINY, params, params_hift, chunk_frames=50, prompt_frames=64
    )
    a = np.concatenate(list(exact.stream(mu_y, spk, prompt_feat, prompt_h)))
    b = np.concatenate(list(bucketed.stream(mu_y, spk, prompt_feat, prompt_h)))
    assert a.shape == b.shape
    # not bit-identical (different segment shapes reduce in different
    # orders) but numerically the same decode
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_multistream_rejects_empty_session(setup):
    """A 0-frame session would never be dispatched nor delivered, leaking
    the slot and spinning run_all forever — open() must refuse."""
    from jyutvoice_tpu.pipeline.streaming import MultiStreamSynthesizer

    params, params_hift = setup
    ms = MultiStreamSynthesizer(
        TINY, params, params_hift, max_sessions=2, chunk_frames=50
    )
    with pytest.raises(ValueError, match="empty"):
        ms.open(np.zeros((0, 80), np.float32), np.zeros(80, np.float32))


def test_stream_content_matches_nonstreamed(setup):
    """CONTENT assertion: the streamed mel must correlate strongly with the
    non-streamed decode of the same prior (a broken crossfade constant or
    cache update fails this, not just shape checks)."""
    from jyutvoice_tpu.models import cfm as cfm_mod
    from jyutvoice_tpu.weights.noise import rand_noise

    params, params_hift = setup
    rng = np.random.default_rng(4)
    t_total = 130
    mu_y = rng.standard_normal((t_total, 80)).astype(np.float32)
    spk = rng.standard_normal(80).astype(np.float32)

    ss = StreamingSynthesizer(TINY, params, params_hift, chunk_frames=50)
    mel_chunks = [m for _w, m in ss.stream(mu_y, spk, emit_mel=True)]
    streamed = np.concatenate(mel_chunks, axis=0)
    assert streamed.shape == (t_total, 80)

    # non-streamed decode of the same prior with the same noise
    mask = jnp.ones((1, t_total, 1))
    t_span = cfm_mod.cosine_t_span(10)
    full = np.asarray(
        cfm_mod.solve_euler_cfg(
            params["decoder"], TINY.tts.cfm,
            jnp.asarray(rand_noise(t_total)), t_span,
            jnp.asarray(mu_y[None]), mask, jnp.asarray(spk[None]),
            jnp.zeros((1, t_total, 80)),
        )
    )[0]
    # not bit-identical: the non-streamed decode attends over the whole
    # utterance while each streamed segment only sees its own window — but
    # the content must correlate strongly (a broken crossfade or cache
    # kills this)
    corr = np.corrcoef(streamed.ravel(), full.ravel())[0, 1]
    assert corr > 0.95, corr


def test_multistream_mixed_prompt_sessions(setup):
    """Prompt-capable multi-stream graph: a cloning session and a
    prompt-FREE session co-tick in one dispatch, and each matches its
    single-stream output on the same prompt-capable graph (the prompt-free
    session's whole prompt region is masked via p_start)."""
    from jyutvoice_tpu.pipeline.streaming import MultiStreamSynthesizer

    params, params_hift = setup
    rng = np.random.default_rng(9)
    p_cap = 64
    pf = rng.standard_normal((24, 80)).astype(np.float32)  # shorter than cap
    ph = rng.standard_normal((24, 80)).astype(np.float32)
    mu1 = rng.standard_normal((130, 80)).astype(np.float32)
    mu2 = rng.standard_normal((80, 80)).astype(np.float32)
    s1 = rng.standard_normal(80).astype(np.float32)
    s2 = rng.standard_normal(80).astype(np.float32)

    single = StreamingSynthesizer(
        TINY, params, params_hift, chunk_frames=50, prompt_frames=p_cap
    )
    want1 = np.concatenate(list(single.stream(mu1, s1, pf, ph)))
    want2 = np.concatenate(list(single.stream(mu2, s2)))  # prompt-free

    ms = MultiStreamSynthesizer(
        TINY, params, params_hift, max_sessions=2, chunk_frames=50,
        prompt_frames=p_cap,
    )
    got = ms.run_all([(mu1, s1, pf, ph), (mu2, s2)])
    np.testing.assert_allclose(got[0], want1, atol=1e-5)
    np.testing.assert_allclose(got[1], want2, atol=1e-5)


def test_multistream_prompt_without_capacity_is_loud(setup):
    from jyutvoice_tpu.pipeline.streaming import MultiStreamSynthesizer

    params, params_hift = setup
    ms = MultiStreamSynthesizer(
        TINY, params, params_hift, max_sessions=2, chunk_frames=50
    )
    with pytest.raises(ValueError, match="prompt_frames=0"):
        ms.open(
            np.zeros((10, 80), np.float32), np.zeros(80, np.float32),
            np.zeros((8, 80), np.float32), np.zeros((8, 80), np.float32),
        )


def test_stream_prompt_without_capacity_is_loud(setup):
    """StreamingSynthesizer.stream with prompt_frames=0 must raise when a
    cloning prompt IS passed — not silently produce un-cloned audio (the
    lane and multi-stream surfaces already guard this at submit/open)."""
    params, params_hift = setup
    ss = StreamingSynthesizer(
        TINY, params, params_hift, chunk_frames=50, prompt_frames=0
    )
    with pytest.raises(ValueError, match="without prompt capacity"):
        next(ss.stream(
            np.zeros((100, 80), np.float32), np.zeros(80, np.float32),
            np.zeros((8, 80), np.float32), np.zeros((8, 80), np.float32),
        ))


def test_stream_prompt_over_capacity_is_loud(setup):
    """A prompt longer than the compiled capacity must raise, never
    silently truncate to a degraded voice match — on BOTH direct surfaces
    (StreamingSynthesizer.stream and MultiStreamSynthesizer.open)."""
    from jyutvoice_tpu.pipeline.streaming import MultiStreamSynthesizer

    params, params_hift = setup
    pf = np.zeros((80, 80), np.float32)  # 80 frames > 64 capacity
    ph = np.zeros((80, 80), np.float32)
    mu = np.zeros((100, 80), np.float32)
    spk = np.zeros(80, np.float32)

    ss = StreamingSynthesizer(
        TINY, params, params_hift, chunk_frames=50, prompt_frames=64
    )
    with pytest.raises(ValueError, match="prompt capacity 64"):
        next(ss.stream(mu, spk, pf, ph))

    ms = MultiStreamSynthesizer(
        TINY, params, params_hift, max_sessions=2, chunk_frames=50,
        prompt_frames=64,
    )
    with pytest.raises(ValueError, match="prompt capacity 64"):
        ms.open(mu, spk, pf, ph)


def test_multistream_matches_single(setup):
    """MultiStreamSynthesizer: N lock-step sessions in one dispatch per
    tick produce EXACTLY the single-stream waveforms, including sessions of
    different lengths joining/leaving."""
    from jyutvoice_tpu.pipeline.streaming import MultiStreamSynthesizer

    params, params_hift = setup
    rng = np.random.default_rng(5)
    lens = [130, 80, 50]
    mus = [rng.standard_normal((t, 80)).astype(np.float32) for t in lens]
    spks = [rng.standard_normal(80).astype(np.float32) for _ in lens]

    single = StreamingSynthesizer(TINY, params, params_hift, chunk_frames=50)
    want = [np.concatenate(list(single.stream(m, s))) for m, s in zip(mus, spks)]

    ms = MultiStreamSynthesizer(
        TINY, params, params_hift, max_sessions=4, chunk_frames=50
    )
    got = ms.run_all([(m, s) for m, s in zip(mus, spks)])
    for i in range(len(lens)):
        assert got[i].shape == want[i].shape
        np.testing.assert_allclose(got[i], want[i], atol=1e-5)

    # slots freed: a new session can open immediately. Ticks are
    # double-buffered (delivery lags the dispatch by one tick)
    sid = ms.open(mus[1], spks[1])
    assert isinstance(sid, int)
    chunks, _ = ms.tick()
    if sid not in chunks:
        chunks, _ = ms.tick()
    assert sid in chunks


def test_stream_pcm16(setup):
    """pcm16=True yields int16 chunks matching the float path quantized."""
    params, params_hift = setup
    rng = np.random.default_rng(6)
    mu_y = rng.standard_normal((60, 80)).astype(np.float32)
    spk = rng.standard_normal(80).astype(np.float32)
    f = StreamingSynthesizer(TINY, params, params_hift, chunk_frames=50)
    q = StreamingSynthesizer(
        TINY, params, params_hift, chunk_frames=50, pcm16=True
    )
    wav_f = np.concatenate(list(f.stream(mu_y, spk)))
    wav_q = np.concatenate(list(q.stream(mu_y, spk)))
    assert wav_q.dtype == np.int16
    want = np.round(np.clip(wav_f, -1, 1) * 32767.0).astype(np.int16)
    #独立 compiled graphs: float rounding at the int16 boundary may differ
    # by 1 LSB
    assert np.max(np.abs(wav_q.astype(np.int32) - want.astype(np.int32))) <= 1
