"""Batched prompt extraction (PromptExtractor.extract_batch) == row-at-a-time.

The batched path exists for dataset prep throughput: one fused device
dispatch + one readback per length-bucket group (mel + CAM++ + tokenizer →
flow-encoder chained on device) instead of 3-4 round trips per row. These
tests pin that it is numerically the same extraction.
"""

import numpy as np
import pytest

import jax.random as jr

from jyutvoice_tpu.config import FlowEncoderConfig
from jyutvoice_tpu.pipeline.prompt import PromptExtractor, PromptFeatures


def _extractor(with_aux: bool = True) -> PromptExtractor:
    ex = PromptExtractor()
    if with_aux:
        from jyutvoice_tpu.models.campplus import CampPlusConfig, init_campplus
        from jyutvoice_tpu.models.flow_encoder import init_flow_encoder
        from jyutvoice_tpu.models.s3_tokenizer import (
            S3TokenizerConfig,
            init_s3_tokenizer,
        )

        ex.embedder.cfg = CampPlusConfig()
        ex.embedder.params = init_campplus(jr.PRNGKey(0), ex.embedder.cfg)
        scfg = S3TokenizerConfig(
            n_mels=128, n_audio_ctx=512, n_audio_state=64, n_audio_head=4,
            n_audio_layer=2,
        )
        ex.tokenizer.cfg = scfg
        ex.tokenizer.params = init_s3_tokenizer(jr.PRNGKey(1), scfg)
        fecfg = FlowEncoderConfig(
            input_size=32, output_size=32, attention_heads=2,
            linear_units=64, num_blocks=1, num_up_blocks=1,
        )
        ex.flow_encoder_cfg = fecfg
        ex.flow_encoder_params = init_flow_encoder(jr.PRNGKey(2), fecfg)
    return ex


def _rows(seed: int = 0):
    rng = np.random.default_rng(seed)
    # mixed lengths: two rows share a bucket (b>1 group), one lands in a
    # larger bucket, one is not a multiple of the hop
    secs = [0.9, 1.1, 3.2, 1.03]
    audios = [
        rng.uniform(-0.4, 0.4, int(16000 * s)).astype(np.float32)
        for s in secs
    ]
    return audios, [16000] * len(audios)


def test_extract_batch_matches_single_full_aux():
    ex = _extractor(with_aux=True)
    audios, srs = _rows()
    batched = ex.extract_batch(audios, srs)
    for i, (a, sr) in enumerate(zip(audios, srs)):
        single = ex._extract_single(a, sr)
        got = batched[i]
        assert isinstance(got, PromptFeatures), got
        np.testing.assert_allclose(
            got.prompt_feat, single.prompt_feat, atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            got.spk_embed, single.spk_embed, atol=1e-4, rtol=1e-4
        )
        assert np.array_equal(got.speech_tokens, single.speech_tokens)
        np.testing.assert_allclose(
            got.prompt_h, single.prompt_h, atol=1e-4, rtol=1e-4
        )


def test_extract_batch_no_aux_zeros_spk():
    """Without aux models the batched path still extracts mels and the
    zeros speaker fallback, matching __call__."""
    ex = _extractor(with_aux=False)
    audios, srs = _rows(seed=1)
    batched = ex.extract_batch(audios, srs)
    for i, (a, sr) in enumerate(zip(audios, srs)):
        single = ex._extract_single(a, sr)
        got = batched[i]
        assert isinstance(got, PromptFeatures)
        np.testing.assert_allclose(
            got.prompt_feat, single.prompt_feat, atol=1e-4, rtol=1e-4
        )
        assert np.array_equal(got.spk_embed, np.zeros(192, np.float32))
        assert got.prompt_h is None and got.speech_tokens is None


def test_extract_batch_isolates_bad_rows():
    ex = _extractor(with_aux=False)
    audios, srs = _rows(seed=2)
    audios[1] = np.zeros(64, np.float32)  # too short for the mel frontend
    out = ex.extract_batch(audios, srs)
    assert isinstance(out[1], Exception)
    for i in (0, 2, 3):
        assert isinstance(out[i], PromptFeatures)
        single = ex._extract_single(audios[i], srs[i])
        np.testing.assert_allclose(
            out[i].prompt_feat, single.prompt_feat, atol=1e-4, rtol=1e-4
        )


def test_batched_dsp_matches_numpy():
    """The jittable kaldi-fbank / whisper-mel (matmul-DFT) match the host
    numpy implementations row-for-row on a zero-padded batch."""
    import jax.numpy as jnp

    from jyutvoice_tpu.audio.fbank import kaldi_fbank, kaldi_fbank_batch
    from jyutvoice_tpu.audio.whisper_mel import (
        whisper_log_mel,
        whisper_log_mel_batch,
    )

    rng = np.random.default_rng(5)
    lens = [7100, 16000]
    wavs = [rng.uniform(-0.5, 0.5, n).astype(np.float32) for n in lens]

    buf = np.zeros((2, max(lens)), np.float32)
    for j, w in enumerate(wavs):
        buf[j, : len(w)] = w
    fb, fb_len = kaldi_fbank_batch(jnp.asarray(buf), jnp.asarray(lens))
    fb, fb_len = np.asarray(fb), np.asarray(fb_len)
    for j, w in enumerate(wavs):
        ref = kaldi_fbank(w, num_mel_bins=80)
        assert fb_len[j] == ref.shape[0]
        np.testing.assert_allclose(
            fb[j, : ref.shape[0]], ref, atol=2e-3, rtol=1e-3
        )

    bufp = np.zeros((2, max(lens) + 400), np.float32)
    for j, w in enumerate(wavs):
        wp = np.pad(w, (200, 200), mode="reflect")
        bufp[j, : len(wp)] = wp
    wm, wm_len = whisper_log_mel_batch(jnp.asarray(bufp), jnp.asarray(lens))
    wm, wm_len = np.asarray(wm), np.asarray(wm_len)
    for j, w in enumerate(wavs):
        ref = whisper_log_mel(w).T  # (T, 128)
        assert wm_len[j] == ref.shape[0]
        np.testing.assert_allclose(
            wm[j, : ref.shape[0]], ref, atol=2e-3, rtol=1e-3
        )


def test_extract_batch_device_dsp_matches_host():
    """device_dsp=True (DSP inside the fused graph) == host-numpy DSP.

    Tokens may flip on FSQ rounding boundaries under f32-vs-f64 DSP noise;
    require near-total agreement rather than bit equality."""
    ex = _extractor(with_aux=True)
    audios, srs = _rows(seed=6)
    host = ex.extract_batch(audios, srs, device_dsp=False)
    dev = ex.extract_batch(audios, srs, device_dsp=True)
    for h, d in zip(host, dev):
        np.testing.assert_allclose(
            d.prompt_feat, h.prompt_feat, atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(d.spk_embed, h.spk_embed, atol=2e-3,
                                   rtol=2e-3)
        agree = np.mean(
            d.speech_tokens[: len(h.speech_tokens)] == h.speech_tokens
        )
        assert agree >= 0.95, agree


def test_call_routes_through_fused_graph():
    """__call__ (the serving/prep entry) is the single-row fused dispatch:
    same features as the per-component path, loud error on short clips."""
    ex = _extractor(with_aux=True)
    audios, srs = _rows(seed=4)
    got = ex(audios[0], srs[0])
    single = ex._extract_single(audios[0], srs[0])
    np.testing.assert_allclose(
        got.prompt_feat, single.prompt_feat, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        got.prompt_h, single.prompt_h, atol=1e-4, rtol=1e-4
    )
    with pytest.raises(ValueError, match="too short"):
        ex(np.zeros(64, np.float32), 24000)


def test_extract_batch_max_batch_chunks():
    """Groups larger than max_batch split into multiple padded dispatches."""
    ex = _extractor(with_aux=False)
    rng = np.random.default_rng(3)
    audios = [
        rng.uniform(-0.4, 0.4, 16000).astype(np.float32) for _ in range(5)
    ]
    out = ex.extract_batch(audios, [16000] * 5, max_batch=2)
    singles = [ex._extract_single(a, 16000) for a in audios]
    for got, single in zip(out, singles):
        np.testing.assert_allclose(
            got.prompt_feat, single.prompt_feat, atol=1e-4, rtol=1e-4
        )
