"""Pipeline smoke tests: end-to-end text -> wav with random weights, bucket
cache behavior, prompt feature extraction fallbacks."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from jyutvoice_tpu.config import (
    CFMConfig,
    EstimatorConfig,
    JyutVoiceConfig,
    TextEncoderConfig,
    TTSConfig,
)
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.pipeline.buckets import MEL_BUCKETS, TEXT_BUCKETS, pick_bucket
from jyutvoice_tpu.pipeline.synthesize import Synthesizer

# small model so CPU jit stays quick
TINY = JyutVoiceConfig(
    tts=TTSConfig(
        encoder=TextEncoderConfig(n_layers=2, filter_channels=128),
        cfm=CFMConfig(estimator=EstimatorConfig(n_blocks=1, num_mid_blocks=2)),
    )
)


def test_pick_bucket():
    assert pick_bucket(1, TEXT_BUCKETS) == 32
    assert pick_bucket(33, TEXT_BUCKETS) == 64
    assert pick_bucket(15000, MEL_BUCKETS) == 15000
    with pytest.raises(ValueError):
        pick_bucket(15001, MEL_BUCKETS)


def test_pick_prompt_bucket_flash_alignment():
    from jyutvoice_tpu.pipeline.buckets import pick_prompt_bucket

    # short mel: plain bucket table, 64 allowed
    assert pick_prompt_bucket(50, 512) == 64
    assert pick_prompt_bucket(200, 512) == 256
    # long-form mel: any smaller bucket leaves prompt+mel not 512-aligned
    # (stock-flash ineligible; smaller blocks measured 0.29-0.92x) ->
    # promoted to the 512 bucket
    assert pick_prompt_bucket(50, 2048) == 512
    assert pick_prompt_bucket(129, 2048) == 512
    assert pick_prompt_bucket(512, 4096) == 512
    # the 15000 cap bucket is not 512-aligned: promotion can never make
    # the total flash-eligible, so keep the tight bucket
    assert pick_prompt_bucket(50, 15000) == 64
    # resulting totals are flash-eligible at every long mel bucket
    from jyutvoice_tpu.models.estimator import use_stock_flash

    for t_mel in (2048, 3072, 4096, 6144, 8192, 12288):
        for p_len in (1, 64, 65, 128, 300, 512):
            total = t_mel + pick_prompt_bucket(p_len, t_mel)
            assert use_stock_flash(total, 0), (t_mel, p_len, total)


@pytest.fixture(scope="module")
def synth():
    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    return Synthesizer(TINY, params, params_hift)


def test_long_text_buckets(synth):
    """Text past the interactive buckets (512 tokens ~ 25 s of speech)
    must encode in one dispatch — the long TEXT_BUCKETS tail is what lets
    synthesize_long cover the 15000-frame mel table (a 512-token cap
    contradicted it; found driving ~240 s text end-to-end)."""
    phone = "keoi5 hai6 bin1 go3 " * 40  # 160 syllables -> >512 tokens
    text = "佢係邊個 " * 40
    (x, *_), n, t_text = synth.prepare_text(
        text.strip(), "yue", phone.strip()
    )
    assert n > 512 and t_text == 1024
    res = synth.synthesize(
        text.strip(), lang="yue", phone=phone.strip(), n_timesteps=1
    )
    assert np.isfinite(res.wav).all() and res.mel_frames > 0


def test_synthesize_cantonese_with_phone(synth):
    res = synth.synthesize(
        "佢 係邊 個", lang="yue", phone="keoi5 hai6 bin1 go3", n_timesteps=2
    )
    assert res.wav.ndim == 1
    assert res.wav.shape[0] == res.mel_frames * 480
    assert res.mel.shape == (res.mel_frames, 80)
    assert np.all(np.abs(res.wav) <= 0.99 + 1e-6)
    assert res.timings["audio_seconds"] > 0


def test_synthesize_raw_text_no_phone(synth):
    """Raw hanzi input with NO --phone and no ToJyutping/pypinyin installed:
    the bundled reading tables carry the whole path (BASELINE config 3)."""
    res = synth.synthesize("佢係邊個", lang="yue", n_timesteps=2)
    assert res.wav.ndim == 1 and res.mel_frames > 0
    res_zh = synth.synthesize("我们是朋友", lang="zh", n_timesteps=2)
    assert res_zh.wav.ndim == 1 and res_zh.mel_frames > 0
    res_mix = synth.synthesize(
        "我今日去公園", lang="multilingual", n_timesteps=2
    )
    assert res_mix.wav.ndim == 1 and res_mix.mel_frames > 0


def test_synthesize_with_prompt_cloning(synth):
    rng = np.random.default_rng(0)
    res = synth.synthesize(
        "好",
        lang="yue",
        phone="hou2",
        spk_embed=rng.standard_normal(192).astype(np.float32),
        prompt_feat=rng.standard_normal((40, 80)).astype(np.float32),
        prompt_h=rng.standard_normal((40, 80)).astype(np.float32),
        n_timesteps=2,
    )
    assert res.wav.shape[0] == res.mel_frames * 480


def test_bucket_cache_reuse(synth):
    n_before = len(synth._mel_fns)
    synth.synthesize("佢", lang="yue", phone="keoi5", n_timesteps=2)
    n_mid = len(synth._mel_fns)
    synth.synthesize("好", lang="yue", phone="hou2", n_timesteps=2)
    assert len(synth._mel_fns) == n_mid  # same buckets -> no new compile


def test_prompt_extractor_fallbacks():
    from jyutvoice_tpu.pipeline.prompt import PromptExtractor, resample

    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)  # 1 s @ 16 kHz
    ex = PromptExtractor()  # no onnx models, no flow encoder
    feats = ex(audio, 16000)
    assert feats.prompt_feat.shape[1] == 80
    assert feats.prompt_feat.shape[0] == 50  # 1 s of audio -> 50 mel frames
    assert feats.spk_embed.shape == (192,)
    assert feats.prompt_h is None and feats.speech_tokens is None
    # resample round trip shape
    y = resample(audio, 16000, 24000)
    assert abs(len(y) - 24000) <= 2


def test_kaldi_fbank_shape_and_scale():
    from jyutvoice_tpu.audio.fbank import kaldi_fbank

    rng = np.random.default_rng(2)
    wav = rng.uniform(-1, 1, 16000).astype(np.float32)
    fb = kaldi_fbank(wav)
    assert fb.shape == ((16000 - 400) // 160 + 1, 80)
    assert np.isfinite(fb).all()
    # louder signal -> larger log energies
    fb2 = kaldi_fbank(wav * 4)
    assert fb2.mean() > fb.mean()


def test_whisper_mel_shape():
    from jyutvoice_tpu.audio.whisper_mel import whisper_log_mel

    rng = np.random.default_rng(3)
    wav = rng.uniform(-1, 1, 16000).astype(np.float32)
    mel = whisper_log_mel(wav)
    assert mel.shape == (128, 100)  # 100 frames/s, last frame dropped
    assert mel.max() <= 1.5 and np.isfinite(mel).all()


def test_provision_npz_roundtrip(tmp_path):
    from jyutvoice_tpu.weights.provision import load_pytree_npz, save_pytree_npz

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    path = str(tmp_path / "tts.npz")
    save_pytree_npz(path, params)
    loaded = load_pytree_npz(path)
    la, lb = jax.tree.leaves(params), jax.tree.leaves(loaded)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_synthesize_batch(synth):
    items = [
        {"text": "佢", "lang": "yue", "phone": "keoi5"},
        {"text": "好 啊", "lang": "yue", "phone": "hou2 aa3"},
    ]
    results = synth.synthesize_batch(items, n_timesteps=2)
    assert len(results) == 2
    for r in results:
        assert r.wav.shape[0] == r.mel_frames * 480
        assert r.mel.shape == (r.mel_frames, 80)


def test_synthesize_batch_empty(synth):
    """A dynamic-batching window can close empty — must return [], not
    IndexError from the padding-row logic."""
    assert synth.synthesize_batch([]) == []


def test_synthesize_batch_noise_capacity_guard(synth):
    """Prompt + mel past the deterministic noise buffer must fail with the
    TYPED NoiseBufferExceeded (the serving engine catches the type to fail
    only prompt-bearing culprits — never a message-text match), not an
    opaque broadcast error from inside the trace."""
    from jyutvoice_tpu.pipeline.synthesize import NoiseBufferExceeded

    small = Synthesizer(TINY, synth.params_tts, synth.params_hift)
    small.noise = small.noise[:, :192]  # shrink the buffer for the test
    items = [{
        "text": "佢", "lang": "yue", "phone": "keoi5",
        "prompt_feat": np.zeros((80, 80), np.float32),
        "prompt_h": np.zeros((80, 80), np.float32),
    }]
    with pytest.raises(NoiseBufferExceeded, match="noise buffer"):
        small.synthesize_batch(items, n_timesteps=2)


def test_prepare_stream_host_expand_matches_generate_path(synth):
    """prepare_stream's host-side duration->frame expansion (searchsorted
    over the duration cumsum) must reproduce the device formula
    (core.generate_path cumsum-threshold path einsum) EXACTLY, including
    fractional durations from a non-integer length_scale — and must cache
    no per-length expand graphs (the old per-(t_text, t_mel) jit family
    grew unboundedly past the mel bucket table)."""
    from jyutvoice_tpu.nn import core

    for ls in (1.0, 1.37):
        prepped = synth.prepare_text("佢 係邊 個", "yue", "keoi5 hai6 bin1 go3")
        mu_y, c, y_len = synth.prepare_stream(
            "佢 係邊 個", lang="yue", phone="keoi5 hai6 bin1 go3",
            length_scale=ls, prepped=prepped,
        )
        # recompute the expansion with the reference formula on the same
        # encoder outputs
        (x, tone, wp, sp, lang_ids), n, t_text = prepped
        import jax.numpy as jnp

        spk_raw = jnp.zeros((1, TINY.tts.spk_embed_dim), np.float32)
        w_ceil, mu, x_mask, _ = synth._stream_enc_fn(t_text)(
            synth.params_tts, x, jnp.asarray(n), lang_ids, tone, wp, sp,
            spk_raw, jnp.float32(ls),
        )
        w_np = np.asarray(w_ceil)
        assert y_len == int(max(w_np.sum(), 1.0))
        y_mask = np.ones((1, 1, y_len), np.float32)
        attn_mask = np.asarray(x_mask)[:, :, 0][:, :, None] * y_mask
        attn = np.asarray(core.generate_path(
            jnp.asarray(w_np[:, :, 0]), jnp.asarray(attn_mask)
        ))
        want = np.einsum("btm,btf->bmf", attn, np.asarray(mu))[0]
        # the host path accumulates the cumsum in f64 (exact real
        # arithmetic); the device path is an f32 scan that can misround a
        # partial sum across an integer at fractional length_scale,
        # shifting ONE boundary frame to the adjacent token (documented in
        # prepare_stream). Accept exactly that divergence and nothing else.
        mismatch = np.flatnonzero((mu_y != want).any(axis=1))
        if mismatch.size:
            cum = np.cumsum(w_np[0, :, 0], dtype=np.float64)
            idx = np.searchsorted(cum, mismatch.astype(np.float64), "right")
            mu_rows = np.asarray(mu)[0]
            for j, tok in zip(mismatch, idx):
                # host produced its own documented answer...
                np.testing.assert_array_equal(mu_y[j], mu_rows[tok])
                # ...and the device's differing answer is the neighbor
                assert (
                    (want[j] == mu_rows[max(tok - 1, 0)]).all()
                    or (want[j] == mu_rows[min(tok + 1, len(cum) - 1)]).all()
                ), f"frame {j}: device row is not a boundary neighbor"
            assert mismatch.size <= len(cum), "more ties than tokens"
    assert not any(
        k[0] == "stream_expand" for k in synth._mel_fns
    ), "host expand must not cache device expand graphs"


def test_length_scale_is_traced_not_static(synth):
    """Distinct per-call length_scale values must reuse ONE compiled graph
    (a static argname here cost a full recompile of the largest graph per
    value) while still changing the duration."""
    kw = dict(lang="yue", phone="keoi5 hai6 bin1 go3", n_timesteps=2)
    r1 = synth.synthesize("佢 係邊 個", length_scale=1.0, **kw)
    key = next(k for k in synth._mel_fns if k[0] == "fused")
    fn = synth._mel_fns[key]
    n0 = fn._cache_size()
    r2 = synth.synthesize("佢 係邊 個", length_scale=1.5, **kw)
    assert fn._cache_size() == n0, "length_scale change recompiled the graph"
    assert r2.mel_frames > r1.mel_frames


def test_serving_aot_and_export(tmp_path):
    """AOT compile + StableHLO export/reload produce identical outputs."""
    import jax.numpy as jnp
    from jyutvoice_tpu.pipeline import serving

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    t_text, t_mel, t_prompt = 32, 128, 0
    compiled = serving.aot_compile(
        TINY, params, params_hift,
        t_text=t_text, t_mel=t_mel, t_prompt=t_prompt, n_timesteps=2,
    )
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.integers(1, 97, (1, t_text)), jnp.int32),
        jnp.asarray([t_text], jnp.int32),
        jnp.asarray(rng.integers(0, 4, (1, t_text)), jnp.int32),
        jnp.asarray(rng.integers(0, 7, (1, t_text)), jnp.int32),
        jnp.asarray(rng.integers(0, 4, (1, t_text)), jnp.int32),
        jnp.asarray(rng.integers(0, 4, (1, t_text)), jnp.int32),
        jnp.asarray(rng.standard_normal((1, 192)), jnp.float32),
        jnp.zeros((1, t_prompt, 80), jnp.float32),
        jnp.zeros((1, t_prompt, 80), jnp.float32),
        jnp.asarray([0], jnp.int32),
    )
    wav, mel, lens = compiled(*args)
    assert np.isfinite(np.asarray(wav)).all()

    path = str(tmp_path / "tts_bucket.stablehlo")
    serving.export_stablehlo(
        TINY, params, params_hift, path,
        t_text=t_text, t_mel=t_mel, t_prompt=t_prompt, n_timesteps=2,
    )
    reloaded = serving.load_stablehlo(path)
    wav2, mel2, lens2 = reloaded(*args)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))


def test_infer_cli_smoke(tmp_path):
    """End-to-end CLI: text -> wav file on disk (random weights, tiny cfg)."""
    import wave

    from jyutvoice_tpu.cli.infer import main

    out = str(tmp_path / "out.wav")
    main(
        [
            "--text", "佢", "--lang", "yue", "--phone", "keoi5",
            "--output", out, "--n-timesteps", "2",
        ],
        cfg=TINY,
    )
    with wave.open(out, "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnframes() > 0


def test_infer_cli_raw_text(tmp_path):
    """CLI with raw hanzi and NO --phone: bundled word-seg + reading tables
    carry the whole frontend (the reference needs pydips + ToJyutping)."""
    import wave

    from jyutvoice_tpu.cli.infer import main

    out = str(tmp_path / "out_raw.wav")
    main(
        [
            "--text", "佢係邊個", "--lang", "yue",
            "--output", out, "--n-timesteps", "2",
        ],
        cfg=TINY,
    )
    with wave.open(out, "rb") as f:
        assert f.getnframes() > 0


def test_infer_cli_stream_smoke(tmp_path):
    """--stream: chunked synthesis writes a wav of the same length class."""
    import wave

    from jyutvoice_tpu.cli.infer import main

    out = str(tmp_path / "out_stream.wav")
    main(
        [
            "--text", "佢 係邊 個", "--lang", "yue",
            "--phone", "keoi5 hai6 bin1 go3",
            "--output", out, "--stream", "--chunk-frames", "50",
        ],
        cfg=TINY,
    )
    with wave.open(out, "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnframes() > 0


def test_infer_cli_batch_file(tmp_path):
    """--text-file batch mode: N lines -> N wavs via synthesize_batch."""
    import wave

    from jyutvoice_tpu.cli.infer import main

    tf = tmp_path / "lines.txt"
    tf.write_text(
        "佢|keoi5\n你好|nei5 hou2\n佢 係邊 個|keoi5 hai6 bin1 go3\n",
        encoding="utf-8",
    )
    out = str(tmp_path / "batch.wav")
    main(
        [
            "--text-file", str(tf), "--lang", "yue", "--output", out,
            "--n-timesteps", "2", "--batch-size", "2",
        ],
        cfg=TINY,
    )
    for i in range(3):
        with wave.open(str(tmp_path / f"batch_{i:04d}.wav"), "rb") as f:
            assert f.getframerate() == 24000
            assert f.getnframes() > 0


def test_prompt_extractor_flow_encoder_bucketed():
    """The extractor's bucketed exact_pad flow-encoder path equals the
    direct exact-length forward (tokenizer stubbed to fixed tokens)."""
    import jax
    import jax.numpy as jnp

    from jyutvoice_tpu.models.flow_encoder import (
        apply_flow_encoder,
        init_flow_encoder,
    )
    from jyutvoice_tpu.pipeline.prompt import PromptExtractor

    fe_params = init_flow_encoder(jax.random.PRNGKey(0), TINY.flow_encoder)
    ex = PromptExtractor(
        flow_encoder_params=fe_params, flow_encoder_cfg=TINY.flow_encoder
    )
    rng = np.random.default_rng(2)
    tokens = rng.integers(1, TINY.flow_encoder.vocab_size, 23).astype(np.int32)
    ex.tokenizer = lambda wav16: tokens  # stub: fixed token stream

    audio = rng.uniform(-0.5, 0.5, 24000).astype(np.float32)
    feats = ex(audio, 24000)
    assert feats.prompt_h is not None

    h, h_len = apply_flow_encoder(
        fe_params, TINY.flow_encoder, jnp.asarray(tokens[None]),
        jnp.asarray([len(tokens)], jnp.int32),
    )
    ref = np.asarray(h)[0, : int(np.asarray(h_len)[0])]
    t = min(len(ref), feats.prompt_h.shape[0])
    np.testing.assert_allclose(
        feats.prompt_h[:t], ref[:t], rtol=1e-5, atol=1e-5
    )


def test_warmup_compiles_bucketed_graphs(synth):
    """warmup() drives the dur/fused graph at batch 1 and the mel+vocoder
    pair at EVERY batch size (the engine dispatches singleton groups
    through the mel+vocoder pair at b_pad=1 — a different XLA program from
    the fused graph), caching them under the keys the serving paths will
    look up."""
    n = synth.warmup(
        text_buckets=(32,), mel_buckets=(128,), n_timesteps=(2,),
        batch_sizes=(1, 2), pcm16=True,
    )
    # b=1: dur + fused + mel/voc pair (two XLA programs) = 4;
    # b=2: dur + mel/voc pair = 3
    assert n == 7
    assert ("fused", 32, 128, 0, 2) in synth._mel_fns  # direct path (b=1)
    assert (32, 128, 0, 2) in synth._mel_fns  # engine mel graph (b=2)
    assert (128, True) in synth._voc_fns  # engine PCM16 vocoder
    assert 32 in synth._dur_fns
    # a warmed shape synthesizes fine afterwards (cache entries are live)
    res = synth.synthesize("佢", lang="yue", phone="keoi5", n_timesteps=2)
    assert res.mel_frames > 0


def test_synthesize_delegates_past_bucket_cap(synth, monkeypatch):
    """Prompt-free requests past the 15000-frame bucket table must
    delegate to synthesize_long (no 300 s cap) instead of raising."""
    called = {}

    def spy(self, text, **kw):
        called["yes"] = True
        return "SENTINEL"

    monkeypatch.setattr(type(synth), "synthesize_long", spy)
    out = synth.synthesize(
        "佢", lang="yue", phone="keoi5", n_timesteps=1,
        length_scale=100000.0,
    )
    assert called and out == "SENTINEL"


def test_warmup_long(synth):
    """warmup_long drives the long-form graph family (text-half encoder,
    long solve, vocoder) so a cold deployment's first long request does
    not pay the compiles; subsequent synthesize_long reuses the cache."""
    n = synth.warmup_long(
        mel_sizes=(128,), text_buckets=(64,), n_timesteps=(1,)
    )
    assert n == 2
    keys = set(synth._mel_fns)
    assert ("stream_enc", 64) in keys
    assert ("long_solve", 128, 1, "auto") in keys
    before = len(synth._mel_fns)
    res = synth.synthesize_long(
        "佢", lang="yue", phone="keoi5", n_timesteps=1
    )
    assert res.mel_frames > 0
    # the tiny utterance lands in already-warmed buckets -> no new graphs
    # beyond the text bucket its real length picks
    assert len(synth._mel_fns) <= before + 2


def test_warmup_long_attention_keys(synth):
    """warmup_long(attention=...) must warm the SAME _long_solve_fn keys
    the engine dispatches with long_attention — warming "auto" graphs for
    a --long-attention exact|banded server left the served solves cold
    (first long request paid the ~90 s compile the flag exists to avoid)."""
    before = set(synth._mel_fns)
    n = synth.warmup_long(
        mel_sizes=(128,), text_buckets=(), n_timesteps=(1,),
        attention="exact",
    )
    assert n == 1
    new = set(synth._mel_fns) - before
    assert ("long_solve", 128, 1, "exact") in synth._mel_fns
    # THIS warmup call must not have built any "auto"-keyed solve (the
    # synth fixture is shared — other tests may have warmed auto keys)
    assert not any(k[0] == "long_solve" and k[3] == "auto" for k in new)


def test_warmup_long_with_prompt(synth):
    """with_prompt=True additionally warms the cloning shapes (512-frame
    prompt head solve + strip) that synthesize_long(prompt_feat=...)
    picks."""
    n = synth.warmup_long(
        mel_sizes=(128,), text_buckets=(), n_timesteps=(1,),
        with_prompt=True,
    )
    assert n == 2  # plain 128 + prompt-headed 640
    assert ("long_solve", 640, 1, "auto") in synth._mel_fns
    assert ("long_strip", 640, 128) in synth._mel_fns


def test_warmup_long_sp_mesh(synth):
    """warmup_long(mesh=...) warms the SAME sequence-parallel solve graph
    synthesize_long(mesh=...) picks (and rejects mel sizes the mesh can't
    shard)."""
    import pytest

    from jyutvoice_tpu.dist.sp import make_sp_mesh

    mesh = make_sp_mesh(8)
    n = synth.warmup_long(
        mel_sizes=(128,), text_buckets=(64,), n_timesteps=(1,), mesh=mesh
    )
    assert n == 2
    # keyed on the Mesh OBJECT (id() could be reused after gc); the
    # decoder device copy is cached once per mesh, shared across steps
    assert ("long_sp", mesh, 1, "scores") in synth._mel_fns
    assert ("long_sp_dec", mesh) in synth._mel_fns
    with pytest.raises(ValueError, match="not divisible"):
        synth.warmup_long(
            mel_sizes=(130,), text_buckets=(), n_timesteps=(1,), mesh=mesh
        )


def test_synthesize_prompt_past_noise_buffer_extends(synth, monkeypatch):
    """A cloning prompt pushing a near-cap utterance past the 15000-frame
    noise buffer must extend the noise deterministically, not raise
    (weights/noise.py::rand_noise_extended is prefix-stable)."""
    import jax.numpy as jnp

    # shrink the buffer so a tiny utterance + prompt crosses it
    monkeypatch.setattr(synth, "noise", synth.noise[:, :32])
    rng = np.random.default_rng(0)
    res = synth.synthesize(
        "佢", lang="yue", phone="keoi5",
        prompt_feat=rng.standard_normal((40, 80)).astype(np.float32),
        prompt_h=rng.standard_normal((40, 80)).astype(np.float32),
        n_timesteps=1,
    )
    assert res.mel_frames > 0 and np.isfinite(res.wav).all()


def test_synthesize_rejects_half_prompt_pair(synth):
    """prompt_feat without prompt_h must raise, not silently fall through
    to the no-prompt branch and return UN-CLONED audio with success
    status (streaming._init_session raises on the same mistake)."""
    pf = np.zeros((8, 80), np.float32)
    with pytest.raises(ValueError, match="BOTH"):
        synth.synthesize("佢", lang="yue", phone="keoi5",
                         prompt_feat=pf, n_timesteps=1)
    with pytest.raises(ValueError, match="BOTH"):
        synth.synthesize("佢", lang="yue", phone="keoi5",
                         prompt_h=pf, n_timesteps=1)


def test_batch_dispatch_rejects_mismatched_prompt_pair(synth):
    """A batch item with prompt_feat but no prompt_h would write NaN rows
    silently (numpy converts None to NaN on assignment) — the dispatch
    must reject the item by index instead."""
    pf = np.zeros((8, 80), np.float32)
    good = dict(text="好", lang="yue", phone="hou2")
    with pytest.raises(ValueError, match=r"items \[1\].*mismatched"):
        synth.synthesize_batch_dispatch(
            [good, dict(text="佢", lang="yue", phone="keoi5",
                        prompt_feat=pf)],
            n_timesteps=1,
        )
    with pytest.raises(ValueError, match="mismatched"):
        synth.synthesize_batch_dispatch(
            [dict(text="佢", lang="yue", phone="keoi5", prompt_feat=pf,
                  prompt_h=np.zeros((9, 80), np.float32))],
            n_timesteps=1,
        )


def test_streaming_samples_per_frame_derived_from_config():
    """The streaming core's chunk slicing must key off the vocoder's
    actual samples-per-mel-frame (cfg.hift.total_upsample), never a
    literal 480 — a non-480 hift config would silently misalign emitted
    samples with mel frames."""
    from jyutvoice_tpu.pipeline.streaming import StreamingSynthesizer

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    ss = StreamingSynthesizer(TINY, params, params_hift, chunk_frames=50)
    assert ss.spf == TINY.hift.total_upsample == 480


def test_pick_prompt_bucket_zero_is_no_prompt_graph():
    """p_len=0 is the no-prompt graph: mapping it to the 64 bucket would
    compile a distinct (t_text, t_mel, 64, steps) graph for nothing."""
    from jyutvoice_tpu.pipeline.buckets import pick_prompt_bucket

    assert pick_prompt_bucket(0, 512) == 0
    assert pick_prompt_bucket(0, 2048) == 0


def test_long_text_prompt_validation_precedes_delegation(synth, monkeypatch):
    """A half-given prompt pair on a LONG text must raise like the short
    path does — not silently delegate to synthesize_long and return
    un-cloned audio with success status; a FULL pair delegates WITH the
    prompt args (long-form cloning, round 4)."""
    called = {}

    def spy(self, text, **kw):
        called["prompt_feat"] = kw.get("prompt_feat")
        called["prompt_h"] = kw.get("prompt_h")
        return "delegated"

    monkeypatch.setattr(type(synth), "synthesize_long", spy)
    pf = np.zeros((8, 80), np.float32)
    with pytest.raises(ValueError, match="BOTH"):
        synth.synthesize("佢", lang="yue", phone="keoi5", prompt_h=pf,
                         n_timesteps=1, length_scale=100000.0)
    assert not called
    out = synth.synthesize("佢", lang="yue", phone="keoi5", prompt_feat=pf,
                           prompt_h=pf, n_timesteps=1,
                           length_scale=100000.0)
    assert out == "delegated"
    assert called["prompt_feat"] is pf and called["prompt_h"] is pf


def test_long_form_timings_contract(synth):
    """synthesize_long results carry the same timings keys as
    synthesize() — callers reached via the transparent long-text
    delegation read timings['audio_seconds'] (weights/provision.py)."""
    res = synth.synthesize_long(
        "佢", lang="yue", phone="keoi5", n_timesteps=1
    )
    assert res.timings["audio_seconds"] > 0
    assert set(res.timings) >= {
        "frontend_and_duration", "mel", "vocoder", "total", "audio_seconds",
    }


def test_warmup_prompt_mel_combo_past_noise_buffer(synth, monkeypatch):
    """warmup must mirror synthesize(): a prompt+mel bucket combo past the
    noise buffer runs on the extended noise (the same input shape the
    runtime dispatches for that combo), instead of crashing inside the
    jit trace with an opaque broadcast error."""
    monkeypatch.setattr(synth, "noise", synth.noise[:, :32])
    n = synth.warmup(text_buckets=(32,), mel_buckets=(128,),
                     prompt_buckets=(64,), n_timesteps=(1,))
    assert n == 4  # dur + fused + mel/voc pair
