"""Duration predictor (reference jyutvoice/models/duration_predictor.py:26-66).

Channels-last: x (B, T, C_in=576), returns log-durations (B, T, 1).
Input is gradient-stopped; the speaker embedding conditions via a 1x1 conv.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import DurationPredictorConfig
from jyutvoice_tpu.nn import core

Array = jax.Array


def init_duration_predictor(key, cfg: DurationPredictorConfig):
    ks = jax.random.split(key, 4)
    return {
        "conv1": core.conv1d_init(ks[0], cfg.in_channels, cfg.filter_channels, cfg.kernel_size),
        "norm1": core.layer_norm_init(cfg.filter_channels),
        "conv2": core.conv1d_init(ks[1], cfg.filter_channels, cfg.filter_channels, cfg.kernel_size),
        "norm2": core.layer_norm_init(cfg.filter_channels),
        "proj": core.conv1d_init(ks[2], cfg.filter_channels, 1, 1),
        "cond": core.conv1d_init(ks[3], cfg.gin_channels, cfg.in_channels, 1),
    }


def apply_duration_predictor(
    p,
    cfg: DurationPredictorConfig,
    x: Array,
    x_mask: Array,
    spk_embed: Array,
    *,
    rng: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """x: (B, T, 576); x_mask: (B, T, 1); spk_embed: (B, gin). -> (B, T, 1)."""
    x = jax.lax.stop_gradient(x)
    g = jax.lax.stop_gradient(spk_embed)[:, None, :].astype(x.dtype)  # (B, 1, gin)
    x = x + core.conv1d(p["cond"], g, padding="valid")
    x = core.conv1d(p["conv1"], x * x_mask, padding="same_torch")
    x = jax.nn.relu(x)
    x = core.channel_layer_norm(p["norm1"], x)
    if not deterministic and rng is not None:
        x = core.dropout(x, cfg.p_dropout, rng, False)
    x = core.conv1d(p["conv2"], x * x_mask, padding="same_torch")
    x = jax.nn.relu(x)
    x = core.channel_layer_norm(p["norm2"], x)
    if not deterministic and rng is not None:
        x = core.dropout(x, cfg.p_dropout, jax.random.fold_in(rng, 1), False)
    x = core.conv1d(p["proj"], x * x_mask, padding="valid")
    return x * x_mask


def duration_loss(logw: Array, logw_target: Array, lengths: Array) -> Array:
    """MSE in log domain, normalized by total length
    (reference duration_predictor.py:63-65)."""
    return jnp.sum(jnp.square(logw - logw_target)) / jnp.sum(lengths)
