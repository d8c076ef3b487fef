"""Conditional flow matching: fixed-step Euler ODE solver with CFG.

TPU-native re-design of the reference CausalConditionalCFM
(jyutvoice/flow/flow_matching.py:145-401):

  * the 10-step Euler loop is a `lax.scan` over precomputed (t, dt) pairs —
    one compiled estimator body, no per-step retracing;
  * classifier-free guidance duplicates the batch (leading 2B axis): row
    block 0 conditioned, row block 1 with mu/spks/cond zeroed — a single
    estimator call per step keeps the MXU batch large;
  * the deterministic seed-0 noise buffer is passed in by the caller
    (weights/noise.py) so synthesis is bit-comparable with the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import CFMConfig
from jyutvoice_tpu.models import estimator as est

Array = jax.Array


def cosine_t_span(n_timesteps: int) -> jnp.ndarray:
    """t_span = 1 - cos(linspace(0,1)*pi/2) (reference flow_matching.py:387-389)."""
    t = jnp.linspace(0.0, 1.0, n_timesteps + 1, dtype=jnp.float32)
    return 1.0 - jnp.cos(t * 0.5 * jnp.pi)


def solve_euler_cfg(
    params,
    cfg: CFMConfig,
    z: Array,
    t_span: Array,
    mu: Array,
    mask: Array,
    spks: Array,
    cond: Array,
    streaming: bool = False,
) -> Array:
    """Euler integration with classifier-free guidance.

    z, mu, cond: (B, T, 80); mask: (B, T, 1); spks: (B, 80).
    reference flow_matching.py:215-265.
    """
    b = z.shape[0]
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)

    ts = t_span[:-1]
    dts = t_span[1:] - t_span[:-1]
    rate = cfg.inference_cfg_rate

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, dtype=x.dtype)
        dphi = est.apply_estimator(
            params, cfg.estimator, x2, mask2, mu2, t2, spks2, cond2, streaming
        )
        dphi_c, dphi_u = dphi[:b], dphi[b:]
        dphi = (1.0 + rate) * dphi_c - rate * dphi_u
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, z, (ts, dts))
    return x.astype(jnp.float32)


def cfm_forward(
    params,
    cfg: CFMConfig,
    mu: Array,
    mask: Array,
    spks: Array,
    cond: Array,
    *,
    n_timesteps: int,
    rand_noise: Array,
    temperature: float = 1.0,
    streaming: bool = False,
) -> Array:
    """Generate mel from the prior mean (reference flow_matching.py:356-401).

    rand_noise: (1, >=T, 80) fixed noise buffer (seed-0 parity artifact).
    """
    t = mu.shape[1]
    z = rand_noise[:, :t, :].astype(mu.dtype) * temperature
    z = jnp.broadcast_to(z, mu.shape)
    t_span = cosine_t_span(n_timesteps).astype(mu.dtype)
    return solve_euler_cfg(params, cfg, z, t_span, mu, mask, spks, cond, streaming)


def cfm_loss(
    params,
    cfg: CFMConfig,
    rng: Array,
    x1: Array,
    mask: Array,
    mu: Array,
    spks: Array,
    cond: Array,
    streaming: bool = False,
    t_override: Optional[Array] = None,
    z_override: Optional[Array] = None,
    cfg_keep_override: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Training flow-matching loss (reference flow_matching.py:299-340).

    x1 (target mel), mu, cond: (B, T, 80); mask (B, T, 1); spks (B, 80).
    Random timestep (cosine schedule), OT path, CFG dropout of conditioning.
    The *_override args inject fixed randomness for parity tests.
    """
    b = x1.shape[0]
    k_t, k_z, k_cfg = jax.random.split(rng, 3)
    if t_override is None:
        t = jax.random.uniform(k_t, (b, 1, 1), dtype=x1.dtype)
        if cfg.t_scheduler == "cosine":
            t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
    else:
        t = t_override.reshape(b, 1, 1)
    z = (
        jax.random.normal(k_z, x1.shape, dtype=x1.dtype)
        if z_override is None
        else z_override
    )

    y = (1.0 - (1.0 - cfg.sigma_min) * t) * z + t * x1
    u = x1 - (1.0 - cfg.sigma_min) * z

    if cfg.training_cfg_rate > 0:
        if cfg_keep_override is None:
            keep = (
                jax.random.uniform(k_cfg, (b,)) > cfg.training_cfg_rate
            ).astype(x1.dtype)
        else:
            keep = cfg_keep_override.astype(x1.dtype)
        mu = mu * keep[:, None, None]
        spks = spks * keep[:, None]
        cond = cond * keep[:, None, None]

    # the long-form stock-flash gate applies in training too: the stock
    # kernel's custom VJP compiles and the full grad step measures
    # 1.23x/1.09x/1.08x at b=2/4/8 T=2048 and 1.36x at b=2 T=4096 vs the
    # bf16-score path (never losing; /tmp recipe in
    # scripts/profile_stockflash_solve.py style, recorded docs/design.md).
    # Training masks are contiguous-prefix (fix_len_compatibility pads at
    # the end), so the flash suffix-length semantics hold.
    # The BANDED long-form gate does NOT: unlike flash (numerically
    # equivalent), the band changes the function being trained — training
    # batches must backprop exact full attention. Disable the gate AND
    # rewrite an explicit "banded" backend (a reused long-form serving
    # config must not silently train the band approximation; "xla" keeps
    # the numerically-equivalent flash gate).
    est_cfg = cfg.estimator
    import dataclasses

    if est_cfg.attention_backend == "banded":
        est_cfg = dataclasses.replace(
            est_cfg, attention_backend="xla", banded_long_threshold=0
        )
    elif est_cfg.banded_long_threshold and est_cfg.attention_backend == "xla":
        est_cfg = dataclasses.replace(est_cfg, banded_long_threshold=0)
    pred = est.apply_estimator(
        params, est_cfg, y, mask, mu, t[:, 0, 0], spks, cond, streaming
    )
    num = jnp.sum(jnp.square((pred - u) * mask))
    den = jnp.sum(mask) * u.shape[-1]
    return num / den, y
