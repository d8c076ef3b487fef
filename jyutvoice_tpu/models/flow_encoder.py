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
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import FlowEncoderConfig
from jyutvoice_tpu.nn import attention, core

Array = jax.Array


def init_conv_module(key, size: int, kernel: int, norm: str):
    """Conformer ConvolutionModule (reference transformer/convolution.py:24-145):
    pointwise 1x1 -> GLU -> depthwise k -> BN/LN -> Swish -> pointwise 1x1."""
    ks = jax.random.split(key, 3)
    return {
        "pw1": core.linear_init(ks[0], size, 2 * size),  # 1x1 conv == linear
        "dw": core.depthwise_conv1d_init(ks[1], size, kernel),
        "norm": (
            core.batch_norm_init(size)
            if norm == "batch_norm"
            else core.layer_norm_init(size)
        ),
        "pw2": core.linear_init(ks[2], size, size),
    }


def apply_conv_module(
    p,
    x: Array,
    mask_pad: Array,
    kernel: int,
    norm: str,
    causal: bool,
    cache: Array = None,
) -> Tuple[Array, Array]:
    """x (B, T, C) -> (B, T, C). Mirrors reference convolution.py:90-145:
    pads are zeroed on entry, the input is left-padded (causal) or
    symmetric-padded BEFORE pointwise_conv1 (so the depthwise conv sees
    pw1(0)=bias values at boundaries, replicated on purpose), BN uses
    running stats (eval mode). `cache` (B, k-1, C) is the causal left
    context for streaming; returns (out, new_cache)."""
    x = x * mask_pad.astype(x.dtype)[..., None]
    lorder = kernel - 1 if causal else 0
    if lorder > 0:
        ctx = (
            jnp.zeros(x.shape[:1] + (lorder,) + x.shape[2:], x.dtype)
            if cache is None
            else cache.astype(x.dtype)
        )
        xp = jnp.concatenate([ctx, x], axis=1)
        new_cache = xp[:, -lorder:]
        pad = "valid"
    else:
        xp = x
        new_cache = jnp.zeros((0, 0, 0), x.dtype)
        pad = "same_torch"
    h = core.linear(p["pw1"], xp)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)  # GLU over the channel dim
    h = core.depthwise_conv1d(p["dw"], h, padding=pad)
    if norm == "batch_norm":
        h = core.batch_norm(p["norm"], h)
    else:
        h = core.layer_norm(p["norm"], h, eps=1e-5)
    h = core.silu(h)
    h = core.linear(p["pw2"], h)
    h = h * mask_pad.astype(h.dtype)[..., None]
    return h, new_cache


def init_conformer_layer(
    key, size: int, linear_units: int, n_heads: int, cfg: FlowEncoderConfig = None
):
    ks = jax.random.split(key, 5)

    def ff(k):
        return {
            "w1": core.linear_init(jax.random.fold_in(k, 0), size, linear_units),
            "w2": core.linear_init(jax.random.fold_in(k, 1), linear_units, size),
        }

    p = {
        "attn": attention.rel_mha_init(ks[0], size, n_heads),
        "norm_mha": core.layer_norm_init(size),
        "ff": ff(ks[1]),
        "norm_ff": core.layer_norm_init(size),
    }
    if cfg is not None and cfg.macaron_style:
        p["ff_macaron"] = ff(ks[2])
        p["norm_ff_macaron"] = core.layer_norm_init(size)
    if cfg is not None and cfg.use_cnn_module:
        p["conv"] = init_conv_module(
            ks[3], size, cfg.cnn_module_kernel, cfg.cnn_module_norm
        )
        p["norm_conv"] = core.layer_norm_init(size)
        p["norm_final"] = core.layer_norm_init(size)
    return p


def _apply_ff(ffp, x: Array) -> Array:
    h = core.linear(ffp["w1"], x)
    h = core.silu(h)  # swish activation (class_utils.py registry)
    return core.linear(ffp["w2"], h)


def apply_conformer_layer(
    p,
    x: Array,
    pos_emb: Array,
    attn_bias: Array,
    n_heads: int,
    cfg: FlowEncoderConfig = None,
    mask_pad: Array = None,
    cnn_cache: Array = None,
):
    """Full pre-norm conformer layer (reference encoder_layer.py:241-319):
    optional 0.5-weighted macaron FF, rel-pos MHA, optional ConvolutionModule,
    FF (0.5-weighted when macaron), final LayerNorm when the conv module is
    present. Params gate the optional branches (created only when the config
    enables them — the live FlowEncoder config has neither). LayerNorm eps
    1e-12. Returns x, or (x, new_cnn_cache) when a cache is passed."""
    ff_scale = 0.5 if "ff_macaron" in p else 1.0
    if "ff_macaron" in p:
        x = x + ff_scale * _apply_ff(
            p["ff_macaron"], core.layer_norm(p["norm_ff_macaron"], x, eps=1e-12)
        )
    res = x
    h = core.layer_norm(p["norm_mha"], x, eps=1e-12)
    h = attention.rel_mha(p["attn"], h, pos_emb, attn_bias, n_heads)
    x = res + h
    new_cnn_cache = None
    if "conv" in p:
        if mask_pad is None:
            mask_pad = jnp.ones(x.shape[:2], bool)
        h = core.layer_norm(p["norm_conv"], x, eps=1e-12)
        h, new_cnn_cache = apply_conv_module(
            p["conv"], h, mask_pad, cfg.cnn_module_kernel, cfg.cnn_module_norm,
            cfg.causal_cnn, cnn_cache,
        )
        x = x + h
    x = x + ff_scale * _apply_ff(
        p["ff"], core.layer_norm(p["norm_ff"], x, eps=1e-12)
    )
    if "conv" in p:
        x = core.layer_norm(p["norm_final"], x, eps=1e-12)
    if cnn_cache is not None:
        return x, new_cnn_cache
    return x


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
                jax.random.fold_in(ks[4], i), d, cfg.linear_units,
                cfg.attention_heads, cfg,
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
                jax.random.fold_in(ks[7], i), d, cfg.linear_units,
                cfg.attention_heads, cfg,
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
    exact_pad: bool = False,
) -> Tuple[Array, Array]:
    """tokens (B, T) int32 -> (h (B, 2T, 80), out_lengths (B,)).

    reference infer.py:62-82 + upsample_encoder.py:301-375.

    exact_pad=True re-zeros hidden states past each row's length at the two
    places padded garbage leaks into valid positions: after the embed
    (linear bias + LayerNorm make pad positions nonzero, which the
    lookahead conv then reads across the boundary) and before the upsample
    conv. With it, a zero-padded bucketed run equals the exact-length run
    (enables per-bucket jit for prompt extraction / batched prep). Default
    False matches the reference's own padded forward byte-for-byte (it
    re-masks at neither place, upsample_encoder.py:336-355), which is what
    the parity tests pin.
    """
    b, t = tokens.shape
    mask = core.sequence_mask(token_lengths, t)  # (B, T) bool
    emb = core.embedding(p["input_embedding"], jnp.maximum(tokens, 0))
    emb = emb * mask[..., None].astype(emb.dtype)

    h, pos_emb = _embed(p["embed"], emb)
    if exact_pad:
        h = h * mask[..., None].astype(h.dtype)
    attn_mask = core.chunk_attn_mask(
        mask, cfg.static_chunk_size if streaming else 0
    )
    attn_bias = core.mask_to_bias(attn_mask)[:, None, :, :]

    h = _pre_lookahead(p["pre_lookahead"], h, cfg.pre_lookahead_len)
    for layer in p["encoders"]:
        h = apply_conformer_layer(
            layer, h, pos_emb, attn_bias, cfg.attention_heads, cfg,
            mask_pad=mask,
        )

    if exact_pad:
        h = h * mask[..., None].astype(h.dtype)
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
            layer, h, pos_emb_up, attn_bias_up, cfg.attention_heads, cfg,
            mask_pad=mask_up,
        )

    h = core.layer_norm(p["after_norm"], h, eps=1e-5)
    h = core.linear(p["encoder_proj"], h)
    return h, up_lengths


# ---------------------------------------------------------------------------
# Incremental (KV-cached) streaming forward_chunk
# ---------------------------------------------------------------------------


class FlowEncoderStreamState(NamedTuple):
    """Fixed-shape streaming state: one compiled graph serves every chunk.

    The reference forward_chunk (upsample_encoder.py:399-514) carries
    dynamically growing torch.cat KV caches; under jit those change shape
    each call and recompile, so here keys/values live in pre-allocated
    (B, H, T_max, D) buffers indexed by `offset`, and the two conv caches
    are fixed-width rings of exactly the left context each conv needs.
    """

    offset: Array  # () int32 — tokens already consumed
    conv2_cache: Array  # (B, 2, d) pre-lookahead conv2 left context
    enc_kv: List[dict]  # per block {"k","v"}: (B, H, T_max, D)
    up_conv_cache: Array  # (B, 2*stride, d) repeated-signal left context
    up_kv: List[dict]  # per up block, capacity stride*T_max


def init_stream_state(
    cfg: FlowEncoderConfig,
    t_max: int,
    b: int = 1,
    dtype=jnp.float32,
    chunk: int = 0,
) -> FlowEncoderStreamState:
    """t_max = token capacity (total utterance tokens the state can hold).

    CAPACITY RULE: every chunk writes its FULL padded width (offset..offset+c)
    into the KV buffers, so capacity must be a multiple of the chunk size
    that covers the utterance — otherwise dynamic_update_slice CLAMPS the
    final partial chunk's write offset and silently corrupts the cache.
    Pass `chunk` to round t_max up to the next chunk multiple.
    """
    if chunk > 0:
        t_max = ((t_max + chunk - 1) // chunk) * chunk
    d = cfg.output_size
    h = cfg.attention_heads
    dk = d // h
    s = cfg.upsample_stride

    def kv(cap):
        return {
            "k": jnp.zeros((b, h, cap, dk), dtype),
            "v": jnp.zeros((b, h, cap, dk), dtype),
        }

    return FlowEncoderStreamState(
        offset=jnp.zeros((), jnp.int32),
        conv2_cache=jnp.zeros((b, 2, d), dtype),
        enc_kv=[kv(t_max) for _ in range(cfg.num_blocks)],
        up_conv_cache=jnp.zeros((b, 2 * s, d), dtype),
        up_kv=[kv(s * t_max) for _ in range(cfg.num_up_blocks)],
    )


def _chunk_conformer_stack(
    layers, h, pos_band, kv_caches, offset, attn_bias, n_heads
):
    new_kv = []
    for layer, cache in zip(layers, kv_caches):
        res = h
        y = core.layer_norm(layer["norm_mha"], h, eps=1e-12)
        y, cache = attention.rel_mha_chunk(
            layer["attn"], y, pos_band, cache, offset, attn_bias, n_heads
        )
        h = res + y
        res = h
        y = core.layer_norm(layer["norm_ff"], h, eps=1e-12)
        y = core.linear(layer["ff"]["w1"], y)
        y = core.silu(y)
        y = core.linear(layer["ff"]["w2"], y)
        h = res + y
        new_kv.append(cache)
    return h, new_kv


def apply_flow_encoder_chunk(
    p,
    cfg: FlowEncoderConfig,
    tokens: Array,
    chunk_len: Array,
    context: Array,
    context_len: Array,
    state: FlowEncoderStreamState,
) -> Tuple[Array, FlowEncoderStreamState]:
    """One streaming step: (B, c) tokens -> (B, c*stride, 80) hidden frames.

    TPU-native analog of reference forward_chunk
    (upsample_encoder.py:399-514): same math — lookahead conv fed with the
    next chunk's first pre_lookahead_len tokens, conv caches across chunk
    boundaries, full-left-context rel-pos attention — but with static
    shapes so the whole step jits once and costs O(chunk * T_max).

    tokens: (B, c) current chunk (pad the final partial chunk).
    chunk_len: () int32 valid tokens in this chunk (== c except the last).
    context: (B, pre_lookahead_len) the NEXT chunk's first tokens
      (reference passes `context`); zeros for the final chunk.
    context_len: () int32 valid context tokens (0 for the final chunk).

    Chained chunks of size cfg.static_chunk_size reproduce
    apply_flow_encoder(streaming=True) exactly (see parity test).
    """
    if cfg.use_cnn_module or cfg.macaron_style:
        raise NotImplementedError(
            "apply_flow_encoder_chunk supports the live FlowEncoder config "
            "(no conv module / macaron, reference infer.py:55-56); use "
            "apply_conformer_layer with cnn_cache for layer-level streaming "
            "of CosyVoice2-style conformer configs"
        )
    b, c = tokens.shape
    d = cfg.output_size
    s = cfg.upsample_stride
    pre = cfg.pre_lookahead_len
    t_max = state.enc_kv[0]["k"].shape[2]
    offset = state.offset

    valid = (jnp.arange(c) < chunk_len)[None, :, None]  # (1, c, 1)
    emb = core.embedding(p["input_embedding"], jnp.maximum(tokens, 0))
    emb = emb * valid.astype(emb.dtype)
    h = core.linear(p["embed"]["linear"], emb)
    h = core.layer_norm(p["embed"]["norm"], h, eps=1e-5) * math.sqrt(d)
    h = h * valid.astype(h.dtype)

    ctx_valid = (jnp.arange(pre) < context_len)[None, :, None]
    ctx = core.embedding(p["input_embedding"], jnp.maximum(context, 0))
    ctx = ctx * ctx_valid.astype(ctx.dtype)
    ctx = core.linear(p["embed"]["linear"], ctx)
    ctx = core.layer_norm(p["embed"]["norm"], ctx, eps=1e-5) * math.sqrt(d)
    ctx = ctx * ctx_valid.astype(ctx.dtype)

    # pre-lookahead: conv1 sees [chunk | next-chunk context], conv2 is causal
    # across chunks via its 2-frame cache (reference upsample_encoder.py:78-137)
    g = jnp.concatenate([h, ctx], axis=1)  # (B, c+pre, d)
    g = core.conv1d(p["pre_lookahead"]["conv1"], g, padding="valid")  # (B, c, d)
    g = core.leaky_relu(g, 0.01)
    g_ext = jnp.concatenate([state.conv2_cache.astype(g.dtype), g], axis=1)
    new_conv2_cache = g_ext[:, -2:]
    g = core.conv1d(p["pre_lookahead"]["conv2"], g_ext, padding="valid")
    h = g + h

    # token-stage conformers: queries see all cached keys + this chunk
    pos_band = attention.espnet_rel_pos_emb(t_max, d, dtype=h.dtype)
    key_ok = jnp.arange(t_max)[None, None, None, :] < (offset + chunk_len)
    attn_bias = core.mask_to_bias(key_ok)
    h, enc_kv = _chunk_conformer_stack(
        p["encoders"], h, pos_band, state.enc_kv, offset, attn_bias,
        cfg.attention_heads,
    )

    # upsample conv across chunk boundaries via the repeated-signal cache
    rep = jnp.repeat(h, s, axis=1)  # (B, c*s, d)
    ext = jnp.concatenate([state.up_conv_cache.astype(rep.dtype), rep], axis=1)
    new_up_conv_cache = ext[:, -2 * s :]
    hu = core.conv1d(p["up_conv"], ext, padding="valid")  # (B, c*s, d)

    hu = core.linear(p["up_embed"]["linear"], hu)
    hu = core.layer_norm(p["up_embed"]["norm"], hu, eps=1e-5) * math.sqrt(d)

    up_cap = state.up_kv[0]["k"].shape[2]
    up_offset = offset * s
    pos_band_up = attention.espnet_rel_pos_emb(up_cap, d, dtype=hu.dtype)
    key_ok_up = (
        jnp.arange(up_cap)[None, None, None, :] < (up_offset + chunk_len * s)
    )
    attn_bias_up = core.mask_to_bias(key_ok_up)
    hu, up_kv = _chunk_conformer_stack(
        p["up_encoders"], hu, pos_band_up, state.up_kv, up_offset,
        attn_bias_up, cfg.attention_heads,
    )

    hu = core.layer_norm(p["after_norm"], hu, eps=1e-5)
    hu = core.linear(p["encoder_proj"], hu)

    new_state = FlowEncoderStreamState(
        offset=offset + chunk_len.astype(jnp.int32),
        conv2_cache=new_conv2_cache,
        enc_kv=enc_kv,
        up_conv_cache=new_up_conv_cache,
        up_kv=up_kv,
    )
    return hu, new_state
