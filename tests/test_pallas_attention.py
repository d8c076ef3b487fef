"""Pallas flash attention correctness (interpret mode on CPU) vs the XLA
reference SDPA with the same pad/chunk masking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jyutvoice_tpu.nn import core
from jyutvoice_tpu.nn.attention import sdpa
from jyutvoice_tpu.nn.pallas.attention import flash_attention


def _reference(q, k, v, lengths, scale, chunk_size=0, num_left_chunks=-1):
    bh, t, d = q.shape
    pad = core.sequence_mask(lengths, t)  # (BH, T)
    attn_mask = core.chunk_attn_mask(pad, chunk_size, num_left_chunks)
    bias = core.mask_to_bias(attn_mask)[:, None, :, :]
    out = sdpa(q[:, None], k[:, None], v[:, None], bias, scale=scale)
    return out[:, 0]


@pytest.mark.parametrize(
    "t,lengths,chunk,left",
    [
        (256, [256, 200], 0, -1),
        (256, [130, 256], 0, -1),
        (256, [256, 256], 50, -1),
        (512, [400, 512], 100, 2),
    ],
)
def test_flash_attention_matches_sdpa(t, lengths, chunk, left):
    rng = np.random.default_rng(0)
    bh, d = 2, 64
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    scale = 1.0 / np.sqrt(d)

    ref = _reference(q, k, v, lens, scale, chunk, left)
    out = flash_attention(
        q, k, v, lens, scale=scale, chunk_size=chunk, num_left_chunks=left,
        interpret=True,
    )
    # only compare valid query rows (padded-query rows are masked downstream);
    # the kernel feeds the MXU bf16 inputs with f32 accumulation (the TPU
    # default matmul precision), so tolerance is bf16-level
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(out)[i, :L], np.asarray(ref)[i, :L], atol=5e-3, rtol=2e-2
        )


def test_estimator_pallas_backend_matches_xla(monkeypatch):
    """Exercise the estimator's pallas attention branch (interpret mode on
    CPU) against the default XLA path."""
    import dataclasses
    import functools

    from jyutvoice_tpu.config import EstimatorConfig
    from jyutvoice_tpu.models import estimator as est_mod
    from jyutvoice_tpu.nn.pallas import attention as pal

    cfg_x = EstimatorConfig(n_blocks=1, num_mid_blocks=1, attention_backend="xla")
    cfg_p = dataclasses.replace(cfg_x, attention_backend="pallas")
    params = est_mod.init_estimator(jax.random.PRNGKey(0), cfg_x)

    rng = np.random.default_rng(0)
    b, t = 1, 128  # block-aligned so the pallas branch engages
    x = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    tt = jnp.asarray([0.3], jnp.float32)
    spks = jnp.asarray(rng.standard_normal((b, 80)), jnp.float32)
    cond = jnp.zeros((b, t, 80), jnp.float32)

    ref = est_mod.apply_estimator(params, cfg_x, x, mask, mu, tt, spks, cond)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    orig = pal.flash_attention
    monkeypatch.setattr(
        pal, "flash_attention", functools.partial(orig, interpret=True)
    )
    out = est_mod.apply_estimator(params, cfg_p, x, mask, mu, tt, spks, cond)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=2e-2
    )


def test_int8_quantized_estimator_close_to_f32():
    """Quantized (int8 matmuls) estimator stays within quantization noise
    of the f32 path on random weights."""
    from jyutvoice_tpu.config import EstimatorConfig
    from jyutvoice_tpu.models import estimator as est_mod
    from jyutvoice_tpu.nn.quant import quantize_estimator, quantize_linear, linear_q
    from jyutvoice_tpu.nn import core

    # unit: single linear
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.standard_normal((64, 32)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal(32), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    ref = core.linear(p, x)
    out = linear_q(quantize_linear(p), x)
    rel = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.05, rel

    # whole estimator
    cfg = EstimatorConfig(n_blocks=1, num_mid_blocks=1)
    params = est_mod.init_estimator(jax.random.PRNGKey(0), cfg)
    qparams = quantize_estimator(params)
    b, t = 1, 64
    args = (
        jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        jnp.ones((b, t, 1), jnp.float32),
        jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        jnp.asarray([0.3], jnp.float32),
        jnp.asarray(rng.standard_normal((b, 80)), jnp.float32),
        jnp.zeros((b, t, 80), jnp.float32),
    )
    ref = est_mod.apply_estimator(params, cfg, *args)
    out = est_mod.apply_estimator(qparams, cfg, *args)
    err = np.abs(np.asarray(out - ref)).mean()
    scale = np.abs(np.asarray(ref)).mean()
    assert err / scale < 0.1, (err, scale)
