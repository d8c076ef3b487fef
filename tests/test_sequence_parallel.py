"""Sequence-parallel CFM decode over the 8-device CPU mesh: T-sharded
activations must reproduce the single-device solve exactly (GSPMD inserts
conv halos + attention K/V gathers), alone and composed with TP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_pipeline import TINY
from jyutvoice_tpu.dist.sp import (
    make_sp_mesh,
    seq_sharding,
    sp_cfm_solve,
    sp_param_shardings,
)
from jyutvoice_tpu.models.cfm import cfm_forward
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.weights.noise import rand_noise


@pytest.fixture(scope="module")
def setup():
    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    rng = np.random.default_rng(0)
    b, t = 1, 64
    mu = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    spks = jnp.asarray(rng.standard_normal((b, 80)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    noise = jnp.asarray(rand_noise(t))
    ref = jax.jit(
        lambda p, mu, mask, spks, cond: cfm_forward(
            p, TINY.tts.cfm, mu, mask, spks, cond,
            n_timesteps=2, rand_noise=noise,
        )
    )(params["decoder"], mu, mask, spks, cond)
    return params, (mu, mask, spks, cond), noise, np.asarray(ref)


def _run_sp(setup, mesh, streaming=False):
    params, (mu, mask, spks, cond), noise, ref = setup
    dec = jax.device_put(
        params["decoder"], sp_param_shardings(params["decoder"], mesh)
    )
    seq = seq_sharding(mesh)
    run = sp_cfm_solve(
        params["decoder"], TINY.tts.cfm, mesh,
        n_timesteps=2, streaming=streaming,
    )
    out = run(
        dec,
        jax.device_put(mu, seq),
        jax.device_put(mask, seq),
        spks,
        jax.device_put(cond, seq),
        noise,
    )
    return np.asarray(out), ref, out


def test_sp_matches_single_device(setup):
    mesh = make_sp_mesh(8)
    got, ref, out_dev = _run_sp(setup, mesh)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    # the result really is sequence-sharded across all 8 devices
    assert len(out_dev.sharding.device_set) == 8
    spec = out_dev.sharding.spec
    assert spec[1] == "seq"


def test_sp_streaming_chunk_masks(setup):
    """Chunk-masked (CausalConditionalCFM streaming) semantics under SP."""
    params, (mu, mask, spks, cond), noise, _ = setup
    ref = jax.jit(
        lambda p, mu, mask, spks, cond: cfm_forward(
            p, TINY.tts.cfm, mu, mask, spks, cond,
            n_timesteps=2, rand_noise=noise, streaming=True,
        )
    )(params["decoder"], mu, mask, spks, cond)
    got, _, _ = _run_sp(setup, make_sp_mesh(8), streaming=True)
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_sp_composes_with_tp(setup):
    """2-D ("model", "seq") mesh: TP weights x SP activations."""
    mesh = make_sp_mesh(n_seq=4, n_model=2)
    got, ref, out_dev = _run_sp(setup, mesh)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    assert len(out_dev.sharding.device_set) == 8
    # weights are genuinely model-sharded on this mesh
    params = setup[0]
    dec = jax.device_put(
        params["decoder"], sp_param_shardings(params["decoder"], mesh)
    )
    leaf = dec["mid"][0]["blocks"][0]["attn"]["q"]["w"]
    assert len(leaf.sharding.device_set) == 8


def test_sp_ring_matches_single_device(setup):
    """Ring attention (K/V ppermute + online softmax, dist/ring.py) must
    reproduce the dense single-device solve."""
    params, (mu, mask, spks, cond), noise, ref = setup
    mesh = make_sp_mesh(8)
    dec = jax.device_put(
        params["decoder"], sp_param_shardings(params["decoder"], mesh)
    )
    seq = seq_sharding(mesh)
    run = sp_cfm_solve(
        params["decoder"], TINY.tts.cfm, mesh, n_timesteps=2,
        attention="ring",
    )
    out = run(
        dec, jax.device_put(mu, seq), jax.device_put(mask, seq), spks,
        jax.device_put(cond, seq), noise,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
    assert len(out.sharding.device_set) == 8


def test_sp_ring_with_padding(setup):
    """Key-validity must travel with the rotating K/V blocks: a padded
    tail spanning several shards (41 valid of 64 over 8 shards) must
    match the dense solve with the same mask on the valid rows."""
    params, (mu, _, spks, cond), noise, _ = setup
    valid = 41
    mask = jnp.asarray(
        (np.arange(64) < valid).astype(np.float32)[None, :, None]
    )
    ref = jax.jit(
        lambda p, mu, mask, spks, cond: cfm_forward(
            p, TINY.tts.cfm, mu, mask, spks, cond,
            n_timesteps=2, rand_noise=noise,
        )
    )(params["decoder"], mu, mask, spks, cond)
    mesh = make_sp_mesh(8)
    dec = jax.device_put(
        params["decoder"], sp_param_shardings(params["decoder"], mesh)
    )
    seq = seq_sharding(mesh)
    run = sp_cfm_solve(
        params["decoder"], TINY.tts.cfm, mesh, n_timesteps=2,
        attention="ring",
    )
    out = run(
        dec, jax.device_put(mu, seq), jax.device_put(mask, seq), spks,
        jax.device_put(cond, seq), noise,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:, :valid], np.asarray(ref)[:, :valid],
        atol=2e-5, rtol=1e-4,
    )


def test_sp_ring_rejects_model_axis(setup):
    params, *_ = setup
    mesh = make_sp_mesh(n_seq=4, n_model=2)
    with pytest.raises(ValueError, match="1-D seq meshes"):
        sp_cfm_solve(
            params["decoder"], TINY.tts.cfm, mesh, n_timesteps=2,
            attention="ring",
        )


def test_sp_banded_matches_single_device(setup):
    """attention='banded' under SP: the chunk-band's slab slices crossing
    shard boundaries become GSPMD halo exchanges; the T-sharded result
    must equal the single-device banded solve."""
    import dataclasses

    params, (mu, mask, spks, cond), noise, _ = setup
    # band small enough to be non-degenerate at T=64 on 8 shards
    est = dataclasses.replace(
        TINY.tts.cfm.estimator, attention_backend="banded",
        banded_chunk=16, banded_left=1, banded_right=1,
    )
    cfm_banded = dataclasses.replace(TINY.tts.cfm, estimator=est)
    ref = jax.jit(
        lambda p, mu, mask, spks, cond: cfm_forward(
            p, cfm_banded, mu, mask, spks, cond,
            n_timesteps=2, rand_noise=noise,
        )
    )(params["decoder"], mu, mask, spks, cond)

    mesh = make_sp_mesh(8)
    dec = jax.device_put(
        params["decoder"], sp_param_shardings(params["decoder"], mesh)
    )
    seq = seq_sharding(mesh)
    # base cfg carries the banded geometry; sp_cfm_solve sets the backend
    cfg_geo = dataclasses.replace(
        TINY.tts.cfm,
        estimator=dataclasses.replace(
            TINY.tts.cfm.estimator,
            banded_chunk=16, banded_left=1, banded_right=1,
        ),
    )
    run = sp_cfm_solve(
        params["decoder"], cfg_geo, mesh, n_timesteps=2,
        attention="banded",
    )
    out = run(
        dec,
        jax.device_put(mu, seq),
        jax.device_put(mask, seq),
        spks,
        jax.device_put(cond, seq),
        noise,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    assert len(out.sharding.device_set) == 8

    with pytest.raises(ValueError, match="full attention only"):
        sp_cfm_solve(
            params["decoder"], cfg_geo, mesh, n_timesteps=2,
            attention="banded", streaming=True,
        )


def test_sp_rejects_indivisible_t(setup):
    params, (mu, mask, spks, cond), noise, _ = setup
    mesh = make_sp_mesh(8)
    run = sp_cfm_solve(params["decoder"], TINY.tts.cfm, mesh, n_timesteps=2)
    with pytest.raises(ValueError, match="not divisible"):
        run(params["decoder"], mu[:, :63], mask[:, :63], spks,
            cond[:, :63], noise[:, :63])


def test_synthesize_long_pipeline_matches_plain_and_sp():
    """Pipeline surface: synthesize_long == synthesize content (single
    device), and the SP-mesh decode == the single-device long path."""
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    kw = dict(lang="yue", phone="keoi5 hai6 bin1 go3", n_timesteps=2)

    plain = synth.synthesize("佢 係邊 個", **kw)
    single = synth.synthesize_long("佢 係邊 個", mesh=None, **kw)
    assert single.mel_frames == plain.mel_frames
    # the two paths compute the duration-expand at different padded lengths:
    # reduction-order f32 wobble (~1e-6 mel) is amplified by the vocoder's
    # cumsum sine phase, so mel compares tightly but wav by correlation
    np.testing.assert_allclose(single.mel, plain.mel, atol=1e-3)
    n = min(len(single.wav), len(plain.wav))
    corr = np.corrcoef(single.wav[:n], plain.wav[:n])[0, 1]
    assert corr > 0.999, corr

    sp = synth.synthesize_long("佢 係邊 個", mesh=make_sp_mesh(8), **kw)
    assert sp.mel_frames == single.mel_frames
    np.testing.assert_allclose(sp.mel, single.mel, atol=2e-5, rtol=1e-4)
    corr = np.corrcoef(sp.wav, single.wav)[0, 1]
    assert corr > 0.9999, corr


def test_synthesize_long_cloning_prompt_matches_plain():
    """Long-form cloning (round 4): the prompt grafts contiguously at the
    front exactly like synthesize()'s graft, so the same text+prompt must
    produce the same mel through both paths (the padded shapes differ —
    512-frame head vs pick_prompt_bucket — but the valid region is
    identical and the graphs are mask-invariant); also covers the SP mesh
    and ring attention with a prompt (suffix mask stays GSPMD-shardable)."""
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    rng = np.random.default_rng(5)
    pf = rng.standard_normal((24, 80)).astype(np.float32)
    ph = rng.standard_normal((24, 80)).astype(np.float32)
    kw = dict(lang="yue", phone="keoi5 hai6 bin1 go3", n_timesteps=2,
              prompt_feat=pf, prompt_h=ph)

    plain = synth.synthesize("佢 係邊 個", **kw)
    single = synth.synthesize_long("佢 係邊 個", mesh=None, **kw)
    assert single.mel_frames == plain.mel_frames
    np.testing.assert_allclose(single.mel, plain.mel, atol=1e-3)
    n = min(len(single.wav), len(plain.wav))
    corr = np.corrcoef(single.wav[:n], plain.wav[:n])[0, 1]
    assert corr > 0.999, corr
    # cloning actually changed the output vs prompt-free
    free = synth.synthesize_long(
        "佢 係邊 個", mesh=None, lang="yue",
        phone="keoi5 hai6 bin1 go3", n_timesteps=2,
    )
    assert np.abs(single.mel - free.mel).mean() > 1e-4

    for attn in ("scores", "ring"):
        sp = synth.synthesize_long(
            "佢 係邊 個", mesh=make_sp_mesh(8), sp_attention=attn, **kw
        )
        assert sp.mel_frames == single.mel_frames
        np.testing.assert_allclose(
            sp.mel, single.mel, atol=5e-4, rtol=1e-3,
            err_msg=f"sp_attention={attn}",
        )


def test_synthesize_long_prompt_validation():
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    pf = np.zeros((8, 80), np.float32)
    with pytest.raises(ValueError, match="BOTH"):
        synth.synthesize_long("佢", phone="keoi5", prompt_feat=pf)
    with pytest.raises(ValueError, match=r"\(T_p, 80\)"):
        synth.synthesize_long("佢", phone="keoi5",
                              prompt_feat=np.zeros((8, 81), np.float32),
                              prompt_h=pf)
    with pytest.raises(ValueError, match="lengths differ"):
        synth.synthesize_long("佢", phone="keoi5", prompt_feat=pf,
                              prompt_h=np.zeros((9, 80), np.float32))
    with pytest.raises(ValueError, match="largest prompt bucket"):
        synth.synthesize_long(
            "佢", phone="keoi5",
            prompt_feat=np.zeros((513, 80), np.float32),
            prompt_h=np.zeros((513, 80), np.float32),
        )


def test_synthesize_long_pcm16_matches_f32():
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), TINY.hift)
    synth = Synthesizer(TINY, params, params_hift)
    kw = dict(lang="yue", phone="keoi5 hai6 bin1 go3", n_timesteps=1)
    f32 = synth.synthesize_long("佢 係邊 個", **kw)
    q = synth.synthesize_long("佢 係邊 個", pcm16=True, **kw)
    assert q.wav.dtype == np.float32
    np.testing.assert_allclose(q.wav, f32.wav, atol=1.0 / 32767)


def test_long_frame_granule_divisible_by_any_mesh():
    from jyutvoice_tpu.pipeline.synthesize import long_frame_granule

    for n_seq in range(1, 33):
        g = long_frame_granule(n_seq)
        assert g % 32 == 0
        assert g % n_seq == 0, (n_seq, g)


def test_ring_attention_unit_vs_sdpa():
    """dist/ring.py::ring_attention vs the dense SDPA core directly:
    batched, multi-head, random per-row key-validity mask."""
    from jyutvoice_tpu.dist.ring import ring_attention
    from jyutvoice_tpu.nn import attention, core

    mesh = make_sp_mesh(8)
    rng = np.random.default_rng(7)
    b, h, t, d = 3, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    lens = jnp.asarray([t, 41, 17])  # tails span several shards
    valid = jnp.arange(t)[None, :] < lens[:, None]
    with mesh:
        got = ring_attention(q, k, v, valid, mesh, "seq")
    bias = core.mask_to_bias(valid)[:, None, None, :]  # keys only
    want = attention.sdpa(q, k, v, bias=bias)
    got, want = np.asarray(got), np.asarray(want)
    for i, n in enumerate([t, 41, 17]):
        np.testing.assert_allclose(
            got[i, :, :n], want[i, :, :n], atol=2e-6, rtol=1e-5
        )
