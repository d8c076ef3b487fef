"""Long-form stock-flash attention gate (models/estimator.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jyutvoice_tpu.models import estimator as E


def test_use_stock_flash_gate():
    # long-form full attention, block-aligned -> on (measured e2e wins
    # from T=2048 up; scripts/profile_stockflash_solve.py)
    assert E.use_stock_flash(2048, 0)
    assert E.use_stock_flash(4096, 0)
    assert E.use_stock_flash(8192, 0)
    assert E.use_stock_flash(12288, 0)
    # below threshold (XLA wins; launch-overhead-bound) -> off
    assert not E.use_stock_flash(512, 0)
    assert not E.use_stock_flash(1024, 0)
    assert not E.use_stock_flash(1536, 0)
    # streaming chunk rule stays on the measured paths -> off
    assert not E.use_stock_flash(4096, 50)
    # not 512-aligned -> off: smaller flash blocks measured 0.29-0.92x
    # (scripts/profile_stockflash_blocks.py), so these stay on bf16 scores
    # (the serving layer 512-aligns its totals instead)
    assert not E.use_stock_flash(15000, 0)
    assert not E.use_stock_flash(2112, 0)
    assert not E.use_stock_flash(2176, 0)
    assert not E.use_stock_flash(2304, 0)
    # 512-aligned prompted serving totals -> on
    assert E.use_stock_flash(2560, 0) and E._flash_block(2560) == 512
    assert E._flash_block(4096) == 512
    assert E._flash_block(15000) == 0
    assert E._flash_block(2176) == 0


def test_sp_solver_forces_scores_backend(monkeypatch):
    """sp_cfm_solve must trace with attention_backend='xla_scores' — the
    stock-flash gate would otherwise plant an unshardable pallas call in
    the GSPMD graph. Capture the cfg the solver actually passes down."""
    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.dist import sp as sp_mod

    seen = {}
    import jyutvoice_tpu.models.cfm as cfm_mod

    orig = cfm_mod.solve_euler_cfg

    def spy(params, cfm_cfg, *a, **k):
        seen["backend"] = cfm_cfg.estimator.attention_backend
        return orig(params, cfm_cfg, *a, **k)

    monkeypatch.setattr(cfm_mod, "solve_euler_cfg", spy)

    cfg = JyutVoiceConfig()
    assert cfg.tts.cfm.estimator.attention_backend == "xla"
    mesh = sp_mod.make_sp_mesh(n_seq=1)
    from tests.test_pipeline import TINY

    import jyutvoice_tpu.models.tts as tts_mod

    params = tts_mod.init_tts(jax.random.PRNGKey(0), TINY.tts)["decoder"]
    run = sp_mod.sp_cfm_solve(
        params, TINY.tts.cfm, mesh, n_timesteps=2
    )
    t = 32
    mu = jnp.zeros((1, t, 80), jnp.float32)
    mask = jnp.ones((1, t, 1), jnp.float32)
    spks = jnp.zeros((1, 80), jnp.float32)
    cond = jnp.zeros((1, t, 80), jnp.float32)
    from jyutvoice_tpu.weights.noise import rand_noise

    noise = jnp.asarray(rand_noise(t))
    dec = jax.device_put(params, sp_mod.sp_param_shardings(params, mesh))
    out = run(dec, mu, mask, spks, cond, noise)
    assert np.isfinite(np.asarray(out)).all()
    assert seen["backend"] == "xla_scores"


def test_stablehlo_export_forces_scores_backend(monkeypatch, tmp_path):
    """export_stablehlo must trace with attention_backend='xla_scores':
    the flash gate would embed a TPU-only pallas custom call in the
    serialized module, which foreign runtimes cannot execute."""
    import jyutvoice_tpu.models.cfm as cfm_mod
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.pipeline import serving
    from tests.test_pipeline import TINY

    seen = {}
    orig = cfm_mod.cfm_forward

    def spy(params, cfm_cfg, *a, **k):
        seen["backend"] = cfm_cfg.estimator.attention_backend
        return orig(params, cfm_cfg, *a, **k)

    monkeypatch.setattr("jyutvoice_tpu.models.tts.cfm_mod.cfm_forward", spy)
    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    params_h = init_hift(jax.random.PRNGKey(1), TINY.hift)
    assert TINY.tts.cfm.estimator.attention_backend == "xla"
    serving.export_stablehlo(
        TINY, params, params_h, str(tmp_path / "g.shlo"),
        t_text=16, t_mel=32, n_timesteps=1,
    )
    assert seen["backend"] == "xla_scores"


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="stock flash kernel is TPU-only"
)
def test_flash_stock_attend_matches_xla():
    """_attend's flash_stock branch vs the bias path on real TPU (the CI
    suite forces CPU and skips this; scripts/profile_stockflash_solve.py
    records the end-to-end evidence)."""
    from jyutvoice_tpu.nn import core

    rng = np.random.default_rng(0)
    b, t, dim, heads = 2, 512, 256, 8
    p = E.init_transformer_block(jax.random.PRNGKey(0), dim, heads, 64)["attn"]
    x = jnp.asarray(rng.standard_normal((b, t, dim)), jnp.float32)
    lengths = jnp.asarray([t, t - 100], jnp.int32)
    pad = jnp.arange(t)[None, :] < lengths[:, None]
    bias = core.mask_to_bias(pad[:, None, :] & pad[:, :, None])[:, None]
    out_flash = E._attend(
        p, x, {"backend": "flash_stock", "lengths": lengths}, heads
    )
    out_xla = E._attend(p, x, {"backend": "xla", "bias": bias}, heads)
    a = np.asarray(out_flash)[0]
    bx = np.asarray(out_xla)[0]
    np.testing.assert_allclose(a, bx, atol=5e-3, rtol=1e-2)
    a2 = np.asarray(out_flash)[1][:412]
    b2 = np.asarray(out_xla)[1][:412]
    np.testing.assert_allclose(a2, b2, atol=5e-3, rtol=1e-2)
