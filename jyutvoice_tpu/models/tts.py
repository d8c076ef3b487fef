"""JyutVoiceTTS: the top-level acoustic model.

TPU-native re-design of the reference JyutVoiceTTS
(jyutvoice/models/jyutvoice_tts.py:23-364):

  * `synthesize_mel` — fully jittable inference graph with STATIC padded
    shapes: text bucket T_text, mel bucket T_mel, prompt bucket T_prompt.
    Dynamic lengths ride through masks and `lax.dynamic_update_slice` (the
    prompt graft writes mu_y at the traced offset prompt_len so frames stay
    contiguous, exactly like the reference's exact-shape concat).
  * `compute_losses` — training forward returning (dur, prior, diff) losses;
    MAS runs on-device via the jittable wavefront kernel by default.

The torch `ceil(w) * length_scale` quirk (fractional "durations" consumed by
cumsum, jyutvoice_tts.py:184-196) is replicated, not fixed.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from jyutvoice_tpu import align
from jyutvoice_tpu.config import TTSConfig
from jyutvoice_tpu.models import cfm as cfm_mod
from jyutvoice_tpu.models import duration as dur_mod
from jyutvoice_tpu.models import text_encoder as te_mod
from jyutvoice_tpu.nn import core

Array = jax.Array


def init_tts(key, cfg: TTSConfig):
    from jyutvoice_tpu.models import estimator as est_mod

    ks = jax.random.split(key, 4)
    return {
        "encoder": te_mod.init_text_encoder(ks[0], cfg.encoder),
        "dp": dur_mod.init_duration_predictor(ks[1], cfg.dp),
        "decoder": est_mod.init_estimator(ks[2], cfg.cfm.estimator),
        "spk_embed_affine_layer": core.linear_init(
            ks[3], cfg.spk_embed_dim, cfg.output_size
        ),
    }


def _l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class SynthesisOutput(NamedTuple):
    mel: Array  # (B, T_mel, 80) generated mel (prompt stripped)
    mel_lengths: Array  # (B,) valid frames
    encoder_mel: Array  # (B, T_mel, 80) encoder prior mu_y (pre-CFM)
    attn: Array  # (B, T_text, T_mel) alignment path
    durations: Array  # (B, T_text) frame durations


def synthesize_mel(
    params,
    cfg: TTSConfig,
    x_ids: Array,
    x_lengths: Array,
    lang: Array,
    tone: Array,
    word_pos: Array,
    syllable_pos: Array,
    spk_embed: Array,
    prompt_feat: Array,  # (B, T_prompt_pad, 80) mel of the reference audio
    prompt_h: Array,  # (B, T_prompt_pad, 80) flow-encoder hidden states
    prompt_lengths: Array,  # (B,)
    *,
    t_mel_max: int,
    n_timesteps: int,
    rand_noise: Array,
    temperature: float = 1.0,
    length_scale: float = 1.0,
) -> SynthesisOutput:
    """Text + voice-cloning prompt -> mel. Jittable with static buckets.

    reference jyutvoice_tts.py:108-253. Pass prompt_lengths of zeros (and
    zero prompt arrays) for the no-cloning path (conds = 0).
    """
    enc = te_mod.apply_text_encoder(
        params["encoder"], cfg.encoder, x_ids, x_lengths, lang, tone,
        word_pos, syllable_pos, spk_embed,
    )
    c = _l2_normalize(spk_embed, axis=1)
    c = core.linear(params["spk_embed_affine_layer"], c)  # (B, 80)

    logw = dur_mod.apply_duration_predictor(
        params["dp"], cfg.dp, enc.x, enc.x_mask, spk_embed
    )  # (B, T_text, 1)
    w = jnp.exp(logw) * enc.x_mask
    w_ceil = jnp.ceil(w) * length_scale  # torch quirk: scale AFTER ceil
    y_lengths = jnp.maximum(
        jnp.sum(w_ceil, axis=(1, 2)), 1.0
    ).astype(jnp.int32)  # (B,)

    b, t_text = x_ids.shape
    y_mask = core.sequence_mask(y_lengths, t_mel_max).astype(w.dtype)  # (B, T_mel)
    attn_mask = enc.x_mask[:, :, 0][:, :, None] * y_mask[:, None, :]
    attn = core.generate_path(w_ceil[:, :, 0], attn_mask)  # (B, T_text, T_mel)

    # mu_y = attn^T mu_x  (B, T_mel, 80)
    mu_y = jnp.einsum(
        "btm,btf->bmf", attn, enc.mu, preferred_element_type=enc.mu.dtype
    )

    # ---- prompt graft (reference jyutvoice_tts.py:213-229) ----
    t_prompt_pad = prompt_feat.shape[1]
    total = t_prompt_pad + t_mel_max
    mu = jnp.zeros((b, total, cfg.output_size), mu_y.dtype)
    conds = jnp.zeros((b, total, cfg.output_size), mu_y.dtype)
    # write prompt_h / prompt_feat at the head (padded region masked below)
    mu = jax.lax.dynamic_update_slice(mu, prompt_h.astype(mu.dtype), (0, 0, 0))
    conds = jax.lax.dynamic_update_slice(
        conds, prompt_feat.astype(mu.dtype), (0, 0, 0)
    )

    # write mu_y right after the true prompt length so frames are contiguous
    def _graft(mu_b, mu_y_b, plen):
        return jax.lax.dynamic_update_slice(mu_b, mu_y_b, (plen, 0))

    plens = prompt_lengths.astype(jnp.int32)
    mu = jax.vmap(_graft)(mu, mu_y, plens)

    total_lengths = plens + y_lengths
    mask = core.sequence_mask(total_lengths, total).astype(mu.dtype)[..., None]

    mel_full = cfm_mod.cfm_forward(
        params["decoder"], cfg.cfm, mu, mask, c, conds,
        n_timesteps=n_timesteps, rand_noise=rand_noise, temperature=temperature,
    )

    # strip prompt frames: take t_mel_max frames starting at plen
    def _strip(mel_b, plen):
        return jax.lax.dynamic_slice(mel_b, (plen, 0), (t_mel_max, cfg.output_size))

    mel = jax.vmap(_strip)(mel_full, plens)
    mel = mel * y_mask[..., None]
    return SynthesisOutput(
        mel=mel,
        mel_lengths=y_lengths,
        encoder_mel=mu_y * y_mask[..., None],
        attn=attn,
        durations=w_ceil[:, :, 0],
    )


class TrainLosses(NamedTuple):
    dur_loss: Array
    prior_loss: Array
    diff_loss: Array
    total: Array
    attn: Array


def compute_losses(
    params,
    cfg: TTSConfig,
    rng: Array,
    x_ids: Array,
    x_lengths: Array,
    y_mel: Array,  # (B, T_mel, 80) target mel
    y_lengths: Array,
    lang: Array,
    tone: Array,
    word_pos: Array,
    syllable_pos: Array,
    spk_embed: Array,
    decoder_h: Array,  # (B, T_mel, 80) frozen flow-encoder hidden states
    *,
    diff_loss_weight: float = 0.1,
    cond_prob: float = 0.5,
    cond_max_ratio: float = 0.3,
    cfm_overrides: Optional[dict] = None,
    train_dropout: bool = True,
) -> TrainLosses:
    """Training losses (reference jyutvoice_tts.py:255-364).

    Fully jittable: MAS uses the on-device wavefront kernel; the prefix
    teacher-forcing of conds uses the explicit PRNG key. `train_dropout`
    enables the reference's training-time dropout (prenet 0.5, encoder/DP
    0.1 incl. attention probs); parity tests pass False to compare with
    eval-mode torch modules.
    """
    k_cond, k_diff, k_drop = jax.random.split(rng, 3)

    c = _l2_normalize(spk_embed, axis=1)
    c = core.linear(params["spk_embed_affine_layer"], c)

    enc = te_mod.apply_text_encoder(
        params["encoder"], cfg.encoder, x_ids, x_lengths, lang, tone,
        word_pos, syllable_pos, spk_embed,
        rng=k_drop if train_dropout else None,
        deterministic=not train_dropout,
    )
    logw = dur_mod.apply_duration_predictor(
        params["dp"], cfg.dp, enc.x, enc.x_mask, spk_embed,
        rng=jax.random.fold_in(k_drop, 99) if train_dropout else None,
        deterministic=not train_dropout,
    )

    b, t_mel, n_feats = y_mel.shape
    y_mask = core.sequence_mask(y_lengths, t_mel).astype(enc.x_mask.dtype)
    attn_mask = enc.x_mask[:, :, 0][:, :, None] * y_mask[:, None, :]

    # ---- MAS alignment over the Gaussian log-prior (jyutvoice_tts.py:305-317)
    mu_x = jax.lax.stop_gradient(enc.mu)  # (B, T_text, 80)
    h = jax.lax.stop_gradient(decoder_h)  # (B, T_mel, 80)
    const = -0.5 * math.log(2 * math.pi) * n_feats
    h_sq = -0.5 * jnp.einsum("bmf->bm", jnp.square(h))[:, None, :]
    h_mu = jnp.einsum("btf,bmf->btm", mu_x, h)
    mu_sq = -0.5 * jnp.sum(jnp.square(mu_x), axis=-1)[:, :, None]
    log_prior = h_sq + h_mu + mu_sq + const  # (B, T_text, T_mel)
    attn = jax.lax.stop_gradient(
        align.maximum_path_jax(log_prior, attn_mask)
    )

    # ---- duration loss (jyutvoice_tts.py:319-322)
    logw_target = (
        jnp.log(1e-8 + jnp.sum(attn, axis=-1))[:, :, None] * enc.x_mask
    )
    dur_loss = dur_mod.duration_loss(logw, logw_target, x_lengths)

    # ---- prefix teacher-forcing conds (jyutvoice_tts.py:325-330)
    ku, ki = jax.random.split(k_cond)
    use_cond = jax.random.uniform(ku, (b,)) >= cond_prob  # 50% skip
    frac = jax.random.uniform(ki, (b,))
    cond_len = (frac * cond_max_ratio * y_lengths.astype(jnp.float32)).astype(
        jnp.int32
    )
    cond_len = jnp.where(use_cond, cond_len, 0)
    pos = jnp.arange(t_mel)
    cond_mask = (pos[None, :] < cond_len[:, None]).astype(y_mel.dtype)[..., None]
    conds = y_mel * cond_mask

    # ---- mu_y + diffusion loss (jyutvoice_tts.py:334-345)
    mu_y = jnp.einsum("btm,btf->bmf", attn, enc.mu)
    diff_loss, _ = cfm_mod.cfm_loss(
        params["decoder"], cfg.cfm, k_diff,
        y_mel, y_mask[..., None], mu_y, c, conds,
        **(cfm_overrides or {}),
    )

    # ---- prior loss (jyutvoice_tts.py:349-362)
    prior_loss = jnp.sum(
        0.5 * (jnp.square(decoder_h - mu_y) + math.log(2 * math.pi))
        * y_mask[..., None]
    )
    prior_loss = prior_loss / (jnp.sum(y_mask[..., None]) * n_feats)

    total = dur_loss + prior_loss + diff_loss_weight * diff_loss
    return TrainLosses(dur_loss, prior_loss, diff_loss, total, attn)
