"""Banded (chunk-local, linear-in-T) attention correctness.

banded_sdpa's stacked-shift framing must equal dense SDPA under the
equivalent explicit band mask; the estimator's "banded" backend must be
a drop-in whose output matches the score path with the same mask.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jyutvoice_tpu.nn import attention, core


def _dense_band_reference(q, k, v, lengths, chunk, left, right=0):
    """Dense SDPA with the band encoded as an explicit additive bias."""
    b, h, t, d = q.shape
    qpos = np.arange(t)
    qc = qpos // chunk
    kc = qpos // chunk
    band = (kc[None, :] <= qc[:, None] + right) & (
        kc[None, :] >= qc[:, None] - left
    )
    keep = band[None] & (np.arange(t)[None, None, :] < np.asarray(lengths)[:, None, None])
    bias = jnp.asarray(np.where(keep, 0.0, -1e10), jnp.float32)[:, None]
    return attention.sdpa(q, k, v, bias)


@pytest.mark.parametrize(
    "t,chunk,left,right",
    [(256, 64, 1, 0), (384, 128, 2, 0), (512, 128, 0, 0),
     (256, 64, 1, 1), (384, 128, 2, 1), (512, 128, 3, 3)],
)
def test_banded_sdpa_matches_dense(t, chunk, left, right):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    lengths = jnp.asarray([t, t - 37], jnp.int32)

    got = attention.banded_sdpa(
        q, k, v, lengths, chunk=chunk, left=left, right=right
    )
    want = _dense_band_reference(q, k, v, lengths, chunk, left, right)
    # only valid QUERY rows are comparable (padded queries are masked
    # downstream; the dense reference renormalizes them differently)
    for i, ln in enumerate([t, t - 37]):
        np.testing.assert_allclose(
            np.asarray(got)[i, :, :ln], np.asarray(want)[i, :, :ln],
            atol=2e-5, rtol=1e-5,
        )


def test_banded_sdpa_padded_rows_finite():
    """Fully-masked query chunks (deep padding) must stay finite."""
    rng = np.random.default_rng(1)
    b, h, t, d = 1, 2, 512, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    out = attention.banded_sdpa(
        q, q, q, jnp.asarray([64], jnp.int32), chunk=128, left=1
    )
    assert np.isfinite(np.asarray(out)).all()


def test_use_banded_default_gate():
    """Default long-form gate (models/estimator.py::use_banded): on for
    full-attention 128-aligned T past banded_long_threshold; off below,
    off for streaming chunks, off when disabled."""
    from jyutvoice_tpu.config import EstimatorConfig
    from jyutvoice_tpu.models import estimator as E

    cfg = EstimatorConfig()
    # threshold 2048 since round 5 (vocoded-domain evidence,
    # scripts/eval_banded_vocoded.py: MCD flat 2048-12288, spk cosine at
    # the noise floor — claims the measured 1.23-1.57x at 2048-4096)
    assert cfg.banded_long_threshold == 2048
    assert E.use_banded(2048, 0, cfg)
    assert E.use_banded(2560, 0, cfg)  # prompted total 512+2048
    assert E.use_banded(8192, 0, cfg)
    assert E.use_banded(12288, 0, cfg)
    assert E.use_banded(12800, 0, cfg)  # prompted total 512+12288
    assert not E.use_banded(1536, 0, cfg)  # bf16 scores win below
    assert not E.use_banded(8192, 50, cfg)  # streaming chunk rule
    assert not E.use_banded(8200, 0, cfg)  # not 128-aligned
    import dataclasses

    off = dataclasses.replace(cfg, banded_long_threshold=0)
    assert not E.use_banded(12288, 0, off)


def test_cfm_loss_disables_banded_gate(monkeypatch):
    """Training must backprop EXACT attention: banded (unlike flash) is a
    different function, so cfm_loss zeroes banded_long_threshold in the
    estimator cfg it traces."""
    from jyutvoice_tpu.config import CFMConfig, EstimatorConfig
    from jyutvoice_tpu.models import cfm as cfm_mod
    from jyutvoice_tpu.models import estimator as E

    seen = {}
    orig = E.apply_estimator

    def spy(params, cfg, *a, **k):
        seen["thr"] = cfg.banded_long_threshold
        seen["backend"] = cfg.attention_backend
        return orig(params, cfg, *a, **k)

    monkeypatch.setattr(E, "apply_estimator", spy)
    cfg = CFMConfig(estimator=EstimatorConfig(n_blocks=1, num_mid_blocks=1))
    assert cfg.estimator.banded_long_threshold == 2048
    params = E.init_estimator(jax.random.PRNGKey(0), cfg.estimator)
    rng = np.random.default_rng(0)
    b, t = 2, 64
    x1 = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    spks = jnp.asarray(rng.standard_normal((b, 80)), jnp.float32)
    cond = jnp.zeros((b, t, 80), jnp.float32)
    loss, _ = cfm_mod.cfm_loss(
        params, cfg, jax.random.PRNGKey(1), x1, mask, mu, spks, cond
    )
    assert np.isfinite(float(loss))
    assert seen["thr"] == 0

    # an EXPLICIT "banded" serving backend must not silently train the
    # band either: cfm_loss rewrites it to exact attention
    import dataclasses

    cfg_b = dataclasses.replace(
        cfg, estimator=dataclasses.replace(
            cfg.estimator, attention_backend="banded"
        ),
    )
    seen.clear()
    loss, _ = cfm_mod.cfm_loss(
        params, cfg_b, jax.random.PRNGKey(1), x1, mask, mu, spks, cond
    )
    assert np.isfinite(float(loss))
    assert seen["backend"] == "xla" and seen["thr"] == 0


def test_synthesize_long_banded_option():
    """synthesize_long(attention='banded') runs the linear-band solve and
    produces output close to the full-attention solve at short T (where
    the band covers most of the sequence); unknown modes raise."""
    from tests.test_pipeline import TINY
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    kw = dict(lang="yue", phone="keoi5 hai6 bin1 go3", n_timesteps=2)
    full = synth.synthesize_long("佢 係邊 個", **kw)
    band = synth.synthesize_long("佢 係邊 個", attention="banded", **kw)
    assert band.mel_frames == full.mel_frames
    assert np.isfinite(band.mel).all()
    # T here is way below the band window: outputs should be close
    assert np.abs(band.mel - full.mel).mean() < 5e-2
    # "exact" forces full attention (== auto below the threshold)
    exact = synth.synthesize_long("佢 係邊 個", attention="exact", **kw)
    np.testing.assert_allclose(exact.mel, full.mel, atol=1e-6)
    with pytest.raises(ValueError, match="unknown long-form attention"):
        synth.synthesize_long("佢 係邊 個", attention="bogus", **kw)


def test_estimator_banded_backend_matches_masked_scores():
    """The 'banded' estimator backend == 'xla_scores' with the same band
    encoded via chunk_attn_mask-style bias (valid region only)."""
    import dataclasses

    from jyutvoice_tpu.config import EstimatorConfig
    from jyutvoice_tpu.models.estimator import apply_estimator, init_estimator

    cfg = EstimatorConfig(n_blocks=1, num_mid_blocks=1,
                          banded_chunk=64, banded_left=1)
    params = init_estimator(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    b, t = 2, 256
    x = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    lengths = np.array([t, t - 50])
    mask = jnp.asarray(
        (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    )
    tt = jnp.asarray([0.5, 0.5], jnp.float32)
    spks = jnp.asarray(rng.standard_normal((b, 80)), jnp.float32)
    cond = jnp.zeros((b, t, 80), jnp.float32)

    banded = apply_estimator(
        params, dataclasses.replace(cfg, attention_backend="banded"),
        x, mask, mu, tt, spks, cond,
    )

    # a band covering the whole sequence in BOTH directions degenerates to
    # full attention: the backend must then match the score path exactly
    full_band = apply_estimator(
        params,
        dataclasses.replace(
            cfg, attention_backend="banded",
            banded_chunk=64, banded_left=(t // 64) - 1,
            banded_right=(t // 64) - 1,
        ),
        x, mask, mu, tt, spks, cond,
    )
    full = apply_estimator(
        params, dataclasses.replace(cfg, attention_backend="xla_scores"),
        x, mask, mu, tt, spks, cond,
    )
    np.testing.assert_allclose(
        np.asarray(full_band), np.asarray(full), atol=5e-4, rtol=1e-4
    )
    # the narrow band is a different function — but finite and masked
    assert np.isfinite(np.asarray(banded)).all()
    np.testing.assert_array_equal(
        np.asarray(banded)[1, t - 50 :], 0.0
    )
