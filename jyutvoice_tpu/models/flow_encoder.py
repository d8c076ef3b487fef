"""FlowEncoder: CosyVoice2 speech-token -> prompt hidden states.

TPU-native re-design of the reference FlowEncoder (infer.py:35-82) wrapping
an UpsampleConformerEncoder (transformer/upsample_encoder.py:140-514). Live
configuration: linear embed + ESPnet rel-pos, 3-token pre-lookahead conv,
6 conformer blocks (no macaron, no conv module), nearest x2 upsample + conv,
re-embed, 4 more blocks, final LayerNorm, 512 -> 80 projection.

Channels-last (B, T, C), static shapes + masks throughout.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import FlowEncoderConfig
from jyutvoice_tpu.nn import attention, core

Array = jax.Array


def init_conformer_layer(key, size: int, linear_units: int, n_heads: int):
    ks = jax.random.split(key, 3)
    return {
        "attn": attention.rel_mha_init(ks[0], size, n_heads),
        "norm_mha": core.layer_norm_init(size),
        "ff": {
            "w1": core.linear_init(ks[1], size, linear_units),
            "w2": core.linear_init(ks[2], linear_units, size),
        },
        "norm_ff": core.layer_norm_init(size),
    }


def apply_conformer_layer(
    p, x: Array, pos_emb: Array, attn_bias: Array, n_heads: int
) -> Array:
    """Pre-norm MHA + FF layer (reference encoder_layer.py:241-319; live
    config has no macaron / conv module). LayerNorm eps 1e-12."""
    res = x
    h = core.layer_norm(p["norm_mha"], x, eps=1e-12)
    h = attention.rel_mha(p["attn"], h, pos_emb, attn_bias, n_heads)
    x = res + h
    res = x
    h = core.layer_norm(p["norm_ff"], x, eps=1e-12)
    h = core.linear(p["ff"]["w1"], h)
    h = core.silu(h)  # swish activation (class_utils.py registry)
    h = core.linear(p["ff"]["w2"], h)
    return res + h


def init_flow_encoder(key, cfg: FlowEncoderConfig):
    ks = jax.random.split(key, 12)
    d = cfg.output_size
    return {
        "input_embedding": core.embedding_init(ks[0], cfg.vocab_size, cfg.input_size),
        "embed": {
            "linear": core.linear_init(ks[1], cfg.input_size, d),
            "norm": core.layer_norm_init(d),
        },
        "pre_lookahead": {
            "conv1": core.conv1d_init(ks[2], d, d, cfg.pre_lookahead_len + 1),
            "conv2": core.conv1d_init(ks[3], d, d, 3),
        },
        "encoders": [
            init_conformer_layer(
                jax.random.fold_in(ks[4], i), d, cfg.linear_units, cfg.attention_heads
            )
            for i in range(cfg.num_blocks)
        ],
        "up_conv": core.conv1d_init(ks[5], d, d, cfg.upsample_stride * 2 + 1),
        "up_embed": {
            "linear": core.linear_init(ks[6], cfg.input_size, d),
            "norm": core.layer_norm_init(d),
        },
        "up_encoders": [
            init_conformer_layer(
                jax.random.fold_in(ks[7], i), d, cfg.linear_units, cfg.attention_heads
            )
            for i in range(cfg.num_up_blocks)
        ],
        "after_norm": core.layer_norm_init(d),
        "encoder_proj": core.linear_init(ks[8], d, cfg.proj_size),
    }


def _embed(p, x: Array) -> Tuple[Array, Array]:
    """LinearNoSubsampling + EspnetRelPositionalEncoding
    (subsampling.py:70-115, embedding.py:201-302). Returns (x*sqrt(d), pos_emb)."""
    h = core.linear(p["linear"], x)
    h = core.layer_norm(p["norm"], h, eps=1e-5)
    d = h.shape[-1]
    h = h * math.sqrt(d)
    pos_emb = attention.espnet_rel_pos_emb(h.shape[1], d, dtype=h.dtype)
    return h, pos_emb


def _pre_lookahead(p, x: Array, pre_len: int) -> Array:
    """3-token lookahead conv + causal conv, residual
    (reference upsample_encoder.py:78-137)."""
    h = jnp.pad(x, ((0, 0), (0, pre_len), (0, 0)))
    h = core.conv1d(p["conv1"], h, padding="valid")
    h = core.leaky_relu(h, 0.01)
    h = core.conv1d(p["conv2"], h, padding="causal")
    return h + x


def _upsample(conv_p, x: Array, stride: int) -> Array:
    """nearest x2 repeat + left-padded conv (reference upsample_encoder.py:37-75)."""
    h = jnp.repeat(x, stride, axis=1)
    h = jnp.pad(h, ((0, 0), (stride * 2, 0), (0, 0)))
    return core.conv1d(conv_p, h, padding="valid")


def apply_flow_encoder(
    p,
    cfg: FlowEncoderConfig,
    tokens: Array,
    token_lengths: Array,
    streaming: bool = False,
) -> Tuple[Array, Array]:
    """tokens (B, T) int32 -> (h (B, 2T, 80), out_lengths (B,)).

    reference infer.py:62-82 + upsample_encoder.py:301-375.
    """
    b, t = tokens.shape
    mask = core.sequence_mask(token_lengths, t)  # (B, T) bool
    emb = core.embedding(p["input_embedding"], jnp.maximum(tokens, 0))
    emb = emb * mask[..., None].astype(emb.dtype)

    h, pos_emb = _embed(p["embed"], emb)
    attn_mask = core.chunk_attn_mask(
        mask, cfg.static_chunk_size if streaming else 0
    )
    attn_bias = core.mask_to_bias(attn_mask)[:, None, :, :]

    h = _pre_lookahead(p["pre_lookahead"], h, cfg.pre_lookahead_len)
    for layer in p["encoders"]:
        h = apply_conformer_layer(layer, h, pos_emb, attn_bias, cfg.attention_heads)

    h = _upsample(p["up_conv"], h, cfg.upsample_stride)
    up_lengths = token_lengths * cfg.upsample_stride
    t_up = h.shape[1]
    mask_up = core.sequence_mask(up_lengths, t_up)
    h, pos_emb_up = _embed(p["up_embed"], h)
    attn_mask_up = core.chunk_attn_mask(
        mask_up, cfg.static_chunk_size * cfg.upsample_stride if streaming else 0
    )
    attn_bias_up = core.mask_to_bias(attn_mask_up)[:, None, :, :]
    for layer in p["up_encoders"]:
        h = apply_conformer_layer(
            layer, h, pos_emb_up, attn_bias_up, cfg.attention_heads
        )

    h = core.layer_norm(p["after_norm"], h, eps=1e-5)
    h = core.linear(p["encoder_proj"], h)
    return h, up_lengths
