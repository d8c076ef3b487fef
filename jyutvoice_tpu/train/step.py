"""Training step: transfer-learning fine-tune with a frozen flow decoder.

Replaces the reference's Lightning loop (models/baselightningmodule.py:22-305
+ configs/base.yaml:106-144) with an optax/pjit design:

  * AdamW + 100-step linear warmup (SequentialLR equivalent),
  * frozen parameter groups (decoder + spk affine when freeze_decoder, like
    jyutvoice_tts.py:61-72) via an optax mask — frozen leaves hold no
    optimizer state and receive zero updates,
  * global-norm gradient clipping (gradient_clip_val 1.0),
  * data parallelism: the step function is written for `jax.jit` over a
    Mesh with the batch sharded on its leading axis; XLA inserts the grad
    all-reduce (no hand-written collectives needed).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from jyutvoice_tpu.config import TrainConfig, TTSConfig
from jyutvoice_tpu.models import tts as tts_mod

Array = jax.Array


def trainable_mask(params, cfg: TTSConfig):
    """True = trainable. Mirrors reference freeze logic (jyutvoice_tts.py:51-72)."""

    def mask_tree(tree, flag):
        return jax.tree.map(lambda _: flag, tree)

    return {
        "encoder": mask_tree(params["encoder"], not cfg.freeze_encoder),
        "dp": mask_tree(params["dp"], True),
        "decoder": mask_tree(params["decoder"], not cfg.freeze_decoder),
        "spk_embed_affine_layer": mask_tree(
            params["spk_embed_affine_layer"], not cfg.freeze_decoder
        ),
    }


def warmup_schedule(lr: float, warmup_steps: int) -> optax.Schedule:
    """Linear warmup to lr over warmup_steps then constant (base.yaml:110).

    Starts at lr/warmup (like torch LinearLR with start_factor=1/warmup,
    reference baselightningmodule.py:23-81), not 0 — step 0 must update.
    """

    def sched(step):
        frac = jnp.minimum((step + 1) / jnp.maximum(warmup_steps, 1), 1.0)
        return lr * frac

    return sched


def lr_schedule(train_cfg: TrainConfig) -> optax.Schedule:
    """Warmup, optionally followed by a main schedule — the SequentialLR
    composition hook of the reference (baselightningmodule.py:38-60; the
    shipped config runs warmup-only, scheduler: null)."""
    warm = warmup_schedule(train_cfg.learning_rate, train_cfg.warmup_steps)
    kind = train_cfg.scheduler
    if kind in (None, "", "none"):
        return warm
    if kind == "cosine":
        main = optax.cosine_decay_schedule(
            train_cfg.learning_rate, train_cfg.scheduler_decay_steps
        )
    elif kind == "exponential":
        main = optax.exponential_decay(
            train_cfg.learning_rate,
            transition_steps=1,
            decay_rate=train_cfg.scheduler_gamma,
        )
    else:
        raise ValueError(f"unknown scheduler {kind!r}")
    return optax.join_schedules([warm, main], [train_cfg.warmup_steps])


def make_optimizer(params, tts_cfg: TTSConfig, train_cfg: TrainConfig):
    mask = trainable_mask(params, tts_cfg)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.gradient_clip_val),
        optax.adamw(
            learning_rate=lr_schedule(train_cfg),
            weight_decay=train_cfg.weight_decay,
        ),
    )
    # NOTE: optax.masked would pass raw gradients through for frozen leaves;
    # multi_transform + set_to_zero gives true freezing with no state.
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: Array


def init_train_state(params, tts_cfg: TTSConfig, train_cfg: TrainConfig):
    tx = make_optimizer(params, tts_cfg, train_cfg)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def loss_fn(params, tts_cfg: TTSConfig, train_cfg: TrainConfig, rng, batch,
            train_dropout: bool = True):
    losses = tts_mod.compute_losses(
        params,
        tts_cfg,
        rng,
        batch["x"],
        batch["x_lengths"],
        batch["y"],
        batch["y_lengths"],
        batch["lang"],
        batch["tone"],
        batch["word_pos"],
        batch["syllable_pos"],
        batch["spk_embed"],
        batch["decoder_h"],
        diff_loss_weight=train_cfg.diff_loss_weight,
        cond_prob=train_cfg.cond_prob,
        cond_max_ratio=train_cfg.cond_max_ratio,
        train_dropout=train_dropout,
    )
    metrics = {
        "dur_loss": losses.dur_loss,
        "prior_loss": losses.prior_loss,
        "diff_loss": losses.diff_loss,
        "loss": losses.total,
    }
    return losses.total, metrics


_jit_loss = None


def jit_loss_fn():
    """Process-wide jitted loss_fn (static cfgs + train_dropout flag).

    jax.jit caches by wrapper identity, so callers that build their own
    wrapper per epoch/invocation re-trace every time; share this one.
    """
    global _jit_loss
    if _jit_loss is None:
        _jit_loss = jax.jit(loss_fn, static_argnums=(1, 2, 5))
    return _jit_loss


def gspmd_safe_tts_cfg(tts_cfg: TTSConfig) -> TTSConfig:
    """TTS config safe to jit over a multi-device GSPMD mesh: rewrites
    pallas-capable attention backends ("xla" — whose long-form
    stock-flash gate fires at T >= 2048 in training graphs too — and
    "pallas") to the score path so no unshardable custom call lands in
    the batch-sharded step (dist/gspmd.py). Single-device training keeps
    the gate (measured grad-step speedups 1.08-1.36x at T=2048-4096,
    docs/design.md). train=True also rewrites "banded": cfm_loss would
    otherwise map a reused long-form serving config to "xla", re-enabling
    the stock-flash pallas call inside the sharded grad jit."""
    import dataclasses

    from jyutvoice_tpu.dist.gspmd import gspmd_safe_cfm_cfg

    cfm = gspmd_safe_cfm_cfg(tts_cfg.cfm, train=True)
    if cfm is tts_cfg.cfm:
        return tts_cfg
    return dataclasses.replace(tts_cfg, cfm=cfm)


def make_train_step(tts_cfg: TTSConfig, train_cfg: TrainConfig, tx,
                    train_dropout: bool = True):
    """Returns a jittable (state, rng, batch) -> (state, metrics) step.

    train_dropout=False disables the reference's training-time dropout
    (prenet 0.5 / encoder 0.1) — used by deterministic overfit tests."""

    sched = lr_schedule(train_cfg)

    def step(state: TrainState, rng: Array, batch) -> Tuple[TrainState, dict]:
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, tts_cfg, train_cfg, rng, batch, train_dropout)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # norm over TRAINABLE leaves only: value_and_grad still produces
        # frozen-decoder grads (the diff loss backprops through it) that
        # would dominate the logged norm, while the clip inside
        # multi_transform only ever sees trainable leaves — the metric
        # must describe what the clip acts on (the reference's frozen
        # params have requires_grad=False and contribute nothing)
        mask = trainable_mask(state.params, tts_cfg)
        metrics["grad_norm"] = optax.global_norm(
            jax.tree.map(
                lambda g, m: g if m else jnp.zeros((), g.dtype), grads, mask
            )
        )
        metrics["lr"] = sched(state.step)  # reference logs lr each step
        return TrainState(params, opt_state, state.step + 1), metrics

    return step
