"""Trainable text encoder: feature embeddings + prenet + RoPE transformer.

TPU-native re-design of the reference TextEncoder
(jyutvoice/models/text_encoder.py:340-451): channels-last, pure functions,
static shapes with explicit masks. Weight-compatible with the reference via
jyutvoice_tpu.weights converters.

Structure (live config, configs/base.yaml:51-67):
  sum(phone/tone/word_pos/syllable_pos embeddings) * sqrt(192)
  -> 3-layer ConvReluNorm prenet (k=5, residual, zero-init proj)
  -> concat [phoneme 192, tiled speaker 192, lang emb 192] = 576 channels
  -> 6-layer transformer (2 heads, partial RoPE, conv-FFN k=3, LN eps 1e-4)
  -> 1x1 proj to 80 mel channels (mu_x)
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import TextEncoderConfig
from jyutvoice_tpu.nn import attention, core

Array = jax.Array

# The reference text-encoder attention masks scores with -1e4
# (models/text_encoder.py:243), not -inf.
_ATTN_MASK_VALUE = -1e4


def init_prenet(key, channels: int, kernel_size: int = 5, n_layers: int = 3):
    ks = jax.random.split(key, n_layers + 1)
    convs = [
        core.conv1d_init(ks[i], channels, channels, kernel_size)
        for i in range(n_layers)
    ]
    norms = [core.layer_norm_init(channels) for _ in range(n_layers)]
    # zero-init projection (reference ConvReluNorm, text_encoder.py:71-73)
    proj = {"w": jnp.zeros((1, channels, channels)), "b": jnp.zeros((channels,))}
    return {"convs": convs, "norms": norms, "proj": proj}


def apply_prenet(
    p,
    x: Array,
    x_mask: Array,
    *,
    p_dropout: float = 0.5,
    rng: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """ConvReluNorm prenet with residual (reference text_encoder.py:32-82).

    x: (B, T, C); x_mask: (B, T, 1) float.
    """
    x_org = x
    for i, (conv, norm) in enumerate(zip(p["convs"], p["norms"])):
        x = core.conv1d(conv, x * x_mask, padding="same_torch")
        x = core.channel_layer_norm(norm, x)
        x = jax.nn.relu(x)
        if not deterministic and rng is not None:
            x = core.dropout(x, p_dropout, jax.random.fold_in(rng, i), False)
    x = x_org + core.conv1d(p["proj"], x, padding="valid")
    return x * x_mask


def init_encoder_layer(key, hidden: int, filter_channels: int, kernel_size: int):
    ks = jax.random.split(key, 4)
    return {
        "attn": attention.rope_mha_init(ks[0], hidden, hidden, n_heads=1),
        "norm1": core.layer_norm_init(hidden),
        "ffn": {
            "conv1": core.conv1d_init(ks[1], hidden, filter_channels, kernel_size),
            "conv2": core.conv1d_init(ks[2], filter_channels, hidden, kernel_size),
        },
        "norm2": core.layer_norm_init(hidden),
    }


def _apply_ffn(
    p,
    x: Array,
    x_mask: Array,
    *,
    p_dropout: float = 0.0,
    rng: Optional[Array] = None,
) -> Array:
    """conv k -> relu -> drop -> conv k, masked (reference text_encoder.py:257-281)."""
    x = core.conv1d(p["conv1"], x * x_mask, padding="same_torch")
    x = jax.nn.relu(x)
    if rng is not None and p_dropout > 0.0:
        x = core.dropout(x, p_dropout, rng, False)
    x = core.conv1d(p["conv2"], x * x_mask, padding="same_torch")
    return x * x_mask


def init_text_encoder(key, cfg: TextEncoderConfig):
    ks = jax.random.split(key, 8 + cfg.n_layers)
    c = cfg.n_channels
    params = {
        "emb": core.embedding_init(ks[0], cfg.n_vocab, c),
        "lang_emb": core.embedding_init(ks[1], cfg.n_lang, c),
        "tone_emb": core.embedding_init(ks[2], cfg.n_tone, c),
        "word_pos_emb": core.embedding_init(ks[3], cfg.n_word_pos, c),
        "syllable_pos_emb": core.embedding_init(ks[4], cfg.n_syllable_pos, c),
        "prenet": init_prenet(ks[5], c, kernel_size=5, n_layers=3),
        "layers": [
            init_encoder_layer(
                ks[8 + i], cfg.hidden_channels, cfg.filter_channels, cfg.kernel_size
            )
            for i in range(cfg.n_layers)
        ],
        "proj": core.conv1d_init(ks[6], cfg.hidden_channels, cfg.n_feats, 1),
    }
    return params


class TextEncoderOutput(NamedTuple):
    x: Array  # (B, T, hidden) encoder hidden states (DP input)
    mu: Array  # (B, T, n_feats) predicted prior mean
    x_mask: Array  # (B, T, 1) float mask


def apply_text_encoder(
    p,
    cfg: TextEncoderConfig,
    x_ids: Array,
    x_lengths: Array,
    lang: Array,
    tone: Array,
    word_pos: Array,
    syllable_pos: Array,
    spk_embed: Array,
    *,
    rng: Optional[Array] = None,
    deterministic: bool = True,
) -> TextEncoderOutput:
    """Forward pass. All id arrays are (B, T); spk_embed is (B, gin)."""
    b, t = x_ids.shape
    h = (
        core.embedding(p["emb"], x_ids)
        + core.embedding(p["tone_emb"], tone)
        + core.embedding(p["word_pos_emb"], word_pos)
        + core.embedding(p["syllable_pos_emb"], syllable_pos)
    ) * math.sqrt(cfg.n_channels)

    x_mask = core.sequence_mask(x_lengths, t)[..., None].astype(h.dtype)  # (B,T,1)
    h = apply_prenet(
        p["prenet"], h, x_mask, rng=rng, deterministic=deterministic
    )

    spk = jnp.broadcast_to(
        spk_embed[:, None, :].astype(h.dtype), (b, t, cfg.gin_channels)
    )
    lang_e = core.embedding(p["lang_emb"], lang).astype(h.dtype)
    h = jnp.concatenate([h, spk, lang_e], axis=-1)  # (B, T, hidden)

    # (B, 1, Tq, Tk) additive bias from the pad mask outer product
    pair = x_mask[:, :, 0][:, None, :] * x_mask[:, :, 0][:, :, None]
    attn_bias = ((1.0 - pair) * _ATTN_MASK_VALUE)[:, None, :, :]

    for i, layer in enumerate(p["layers"]):
        h = h * x_mask
        lrng = jax.random.fold_in(rng, i) if rng is not None else None
        train = not deterministic and lrng is not None
        y = attention.rope_mha(
            layer["attn"], h, attn_bias, cfg.n_heads,
            prob_dropout=cfg.p_dropout if train else 0.0,
            rng=jax.random.fold_in(lrng, 2) if train else None,
        )
        if train:
            y = core.dropout(y, cfg.p_dropout, lrng, False)
        h = core.channel_layer_norm(layer["norm1"], h + y)
        y = _apply_ffn(
            layer["ffn"], h, x_mask,
            p_dropout=cfg.p_dropout if train else 0.0,
            rng=jax.random.fold_in(lrng, 3) if train else None,
        )
        if train:
            y = core.dropout(y, cfg.p_dropout, jax.random.fold_in(lrng, 1), False)
        h = core.channel_layer_norm(layer["norm2"], h + y)
    h = h * x_mask

    mu = core.conv1d(p["proj"], h, padding="valid") * x_mask
    return TextEncoderOutput(x=h, mu=mu, x_mask=x_mask)
