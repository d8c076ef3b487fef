"""Attention cores shared by all models.

One masked-SDPA kernel backs three flavors used across the system:
  * RoPE self-attention (text encoder, reference models/text_encoder.py:175-254)
  * ESPnet relative-position attention (flow encoder,
    reference transformer/attention.py:203-334)
  * plain diffusers-style attention (CFM estimator blocks,
    reference flow/transformer.py:148-443)

All operate on (B, T, C) with heads split internally; softmax runs in f32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from jyutvoice_tpu.nn import core

Array = jax.Array


def sdpa(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    scale: Optional[float] = None,
    compact_scores: bool = False,
) -> Array:
    """Scaled dot-product attention.

    q: (B, H, Tq, D), k/v: (B, H, Tk, D), bias: broadcastable to
    (B, H, Tq, Tk) additive (0 keep / -1e10 drop). Returns (B, H, Tq, D).

    compact_scores=True materializes scores/probs in bfloat16, halving the
    (B,H,Tq,Tk) HBM traffic (24% faster at 2B=16, T=512,
    scripts/profile_round2_experiments.py). NOT bit-identical: the f32
    path's matmuls use bf16 MXU passes but keep f32 ACCUMULATED outputs;
    rounding those to bf16 shifts this op's output by up to ~2e-4 abs
    (measured), i.e. well under the mel-parity budget but batch-dependent
    when gated by size (estimator._attend). Softmax still reduces in f32.
    Leave False on CPU parity paths.
    """
    d = q.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    score_t = jnp.bfloat16 if compact_scores else jnp.float32
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=score_t
    ) * jnp.asarray(scale, score_t)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if compact_scores:
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), preferred_element_type=v.dtype,
        )
    else:
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
            preferred_element_type=v.dtype,
        )
    return out


def split_heads(x: Array, n_heads: int) -> Array:
    b, t, c = x.shape
    return x.reshape(b, t, n_heads, c // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: Array) -> Array:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


# ---------------------------------------------------------------------------
# Partial RoPE (reference models/text_encoder.py:85-172)
# ---------------------------------------------------------------------------


def rope_cos_sin(t: int, d: int, base: float = 10_000.0, dtype=jnp.float32):
    """cos/sin tables for partial RoPE of width `d` (must be even).

    Matches the labml-style implementation the reference uses: rotation pairs
    are (i, i + d/2), theta_i = base^{-2i/d}.
    """
    theta = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    idx = jnp.arange(t, dtype=jnp.float32)[:, None] * theta[None, :]  # (T, d/2)
    idx2 = jnp.concatenate([idx, idx], axis=-1)  # (T, d)
    return jnp.cos(idx2).astype(dtype), jnp.sin(idx2).astype(dtype)


def apply_rope(x: Array, cos: Array, sin: Array, d: int) -> Array:
    """Rotate the first `d` features of each head. x: (B, H, T, Dh)."""
    x_rope, x_pass = x[..., :d], x[..., d:]
    half = d // 2
    neg_half = jnp.concatenate([-x_rope[..., half:], x_rope[..., :half]], axis=-1)
    x_rope = x_rope * cos[None, None] + neg_half * sin[None, None]
    return jnp.concatenate([x_rope, x_pass], axis=-1)


def rope_mha_init(key, channels: int, out_channels: int, n_heads: int):
    """Params for the glow-TTS MultiHeadAttention with partial RoPE.

    q/k/v/o are 1x1 convs in the reference == linears here. q,k,v use
    xavier_uniform weights (reference models/text_encoder.py:209-214).
    """
    ks = jax.random.split(key, 8)
    d = channels
    p = {}
    for i, name in enumerate(("q", "k", "v")):
        p[name] = {
            "w": core.xavier_uniform(ks[2 * i], (d, d)),
            "b": core.uniform_bias_torch(ks[2 * i + 1], (d,), d),
        }
    p["o"] = core.linear_init(ks[6], d, out_channels)
    return p


def rope_mha(
    p,
    x: Array,
    attn_bias: Optional[Array],
    n_heads: int,
    *,
    prob_dropout: float = 0.0,
    rng: Optional[Array] = None,
) -> Array:
    """Self-attention with partial RoPE on q and k.

    Rotary width = head_dim // 2 (reference text_encoder.py:203-204 passes
    k_channels * 0.5). `prob_dropout` applies dropout to the attention
    probabilities (reference MultiHeadAttention.drop, text_encoder.py:245).
    """
    b, t, c = x.shape
    head_dim = c // n_heads
    d_rope = int(head_dim * 0.5)
    if d_rope % 2:
        d_rope -= 1
    q = core.linear(p["q"], x)
    k = core.linear(p["k"], x)
    v = core.linear(p["v"], x)
    # reference reshapes (B, (H C), T) -> b h t c with einops 'b (h c) t'
    # on conv outputs; with our (B,T,C) linears that equals standard head split.
    q, k, v = (split_heads(a, n_heads) for a in (q, k, v))
    cos, sin = rope_cos_sin(t, d_rope, dtype=jnp.float32)
    q = apply_rope(q.astype(jnp.float32), cos, sin, d_rope).astype(x.dtype)
    k = apply_rope(k.astype(jnp.float32), cos, sin, d_rope).astype(x.dtype)
    # reference scales by 1/sqrt(k_channels) == 1/sqrt(head_dim)
    if prob_dropout > 0.0 and rng is not None:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / math.sqrt(head_dim))
        if attn_bias is not None:
            scores = scores + attn_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = core.dropout(probs, prob_dropout, rng, False)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
            preferred_element_type=v.dtype,
        )
    else:
        out = sdpa(q, k, v, attn_bias, scale=1.0 / math.sqrt(head_dim))
    # reference merges heads as (b, d, t) view over (h, c) — interleaved the
    # same way as merge_heads on channels-last.
    out = merge_heads(out)
    return core.linear(p["o"], out)


# ---------------------------------------------------------------------------
# ESPnet relative-position attention (flow encoder)
# ---------------------------------------------------------------------------


def espnet_rel_pos_emb(t: int, d_model: int, dtype=jnp.float32) -> Array:
    """Relative positional encodings for distances T-1 ... -(T-1).

    Returns (2T-1, d_model); row k encodes relative distance (T-1-k)
    (reference transformer/embedding.py:201-262).
    """
    pos = jnp.arange(t, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model)
    )
    pe_pos = jnp.zeros((t, d_model))
    pe_pos = pe_pos.at[:, 0::2].set(jnp.sin(pos * div))
    pe_pos = pe_pos.at[:, 1::2].set(jnp.cos(pos * div))
    pe_neg = jnp.zeros((t, d_model))
    pe_neg = pe_neg.at[:, 0::2].set(jnp.sin(-pos * div))
    pe_neg = pe_neg.at[:, 1::2].set(jnp.cos(-pos * div))
    pe = jnp.concatenate([jnp.flip(pe_pos, axis=0), pe_neg[1:]], axis=0)
    return pe.astype(dtype)


def rel_shift_gather(matrix_bd: Array, t_q: int, t_k: int) -> Array:
    """(B, H, Tq, W) -> (B, H, Tq, Tk) relative-position shift:
    out[i, j] = in[i, Tq-1-i+j].

    Same semantics as the ESPnet pad-reshape rel_shift trick (reference
    transformer/attention.py:227-247), generalized to any band width W and
    implemented as a flat reshape + static slice: row i's outputs are the
    contiguous run flat[i*(W-1) + Tq-1 + j], so one slice + reshape extracts
    the whole banded diagonal. TPU gathers (take_along_axis) measured ~20x
    slower at flow-encoder shapes (scripts/bench_prompt.py) — never gather.
    """
    b, h, tq, w = matrix_bd.shape
    assert tq == t_q
    # The flat reshape+slice is only valid while every row's band stays
    # inside its own input row: column tq-1-i+j must be <= w-1 even at
    # i=0, i.e. t_k <= w - tq + 1. The extracted band is also only w-1
    # wide, so t_k <= w - 1 is required too (the conditions differ exactly
    # at t_q == 1, where the flat path would yield a zero-width band).
    # Outside both, fall back to the gather so misuse can't silently read
    # cross-row values.
    if t_k > w - tq + 1 or t_k > w - 1:
        i = jnp.arange(t_q)[:, None]
        j = jnp.arange(t_k)[None, :]
        idx = (t_q - 1) - i + j
        return jnp.take_along_axis(
            matrix_bd,
            jnp.broadcast_to(idx, matrix_bd.shape[:2] + idx.shape),
            axis=-1,
        )
    flat = matrix_bd.reshape(b, h, tq * w)
    flat = jax.lax.slice_in_dim(flat, t_q - 1, t_q - 1 + tq * (w - 1), axis=2)
    return flat.reshape(b, h, tq, w - 1)[..., :t_k]


def rel_mha_init(key, n_feat: int, n_heads: int):
    ks = jax.random.split(key, 6)
    d_k = n_feat // n_heads
    return {
        "q": core.linear_init(ks[0], n_feat, n_feat),
        "k": core.linear_init(ks[1], n_feat, n_feat),
        "v": core.linear_init(ks[2], n_feat, n_feat),
        "o": core.linear_init(ks[3], n_feat, n_feat),
        "pos": {"w": core.kaiming_uniform_torch(ks[4], (n_feat, n_feat))},
        "pos_bias_u": core.xavier_uniform(
            ks[5], (n_heads, d_k), fan_in=n_heads, fan_out=d_k
        ),
        "pos_bias_v": core.xavier_uniform(
            jax.random.fold_in(ks[5], 1), (n_heads, d_k), fan_in=n_heads, fan_out=d_k
        ),
    }


def rel_mha(
    p,
    x: Array,
    pos_emb: Array,
    attn_bias: Optional[Array],
    n_heads: int,
) -> Array:
    """Transformer-XL style relative-position self-attention.

    x: (B, T, C); pos_emb: (2T-1, C).
    Reference: transformer/attention.py:203-334 (RelPositionMultiHeadedAttention).
    """
    b, t, c = x.shape
    d_k = c // n_heads
    q = split_heads(core.linear(p["q"], x), n_heads)  # (B,H,T,D)
    k = split_heads(core.linear(p["k"], x), n_heads)
    v = split_heads(core.linear(p["v"], x), n_heads)
    pe = core.linear(p["pos"], pos_emb[None])  # (1, 2T-1, C)
    pm = split_heads(pe, n_heads)  # (1, H, 2T-1, D)

    q_u = q + p["pos_bias_u"][None, :, None, :]
    q_v = q + p["pos_bias_v"][None, :, None, :]
    matrix_ac = jnp.einsum(
        "bhqd,bhkd->bhqk", q_u, k, preferred_element_type=jnp.float32
    )
    matrix_bd = jnp.einsum(
        "bhqd,bhkd->bhqk", q_v, pm, preferred_element_type=jnp.float32
    )  # (B, H, T, 2T-1)
    matrix_bd = rel_shift_gather(matrix_bd, t, t)
    scores = (matrix_ac + matrix_bd) / math.sqrt(d_k)
    if attn_bias is not None:
        scores = scores + attn_bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=v.dtype
    )
    return core.linear(p["o"], merge_heads(out))


def rel_mha_chunk(
    p,
    x: Array,
    pos_band: Array,
    kv_cache: dict,
    offset: Array,
    attn_bias: Optional[Array],
    n_heads: int,
):
    """Incremental rel-pos self-attention over a fixed-capacity KV cache.

    The TPU-native form of the reference's streaming attention
    (transformer/attention.py:186-192 + 298-334): instead of a growing
    torch.cat KV cache (dynamic shapes — recompiles under jit), keys/values
    live in a pre-allocated (B, H, T_max, D) buffer written in place with
    dynamic_update_slice, so every chunk reuses ONE compiled graph and costs
    O(chunk * T_max).

    x: (B, c, C) the current chunk at absolute positions [offset, offset+c).
    pos_band: (2*T_max-1, C) rel-pos encodings for distances
      T_max-1 ... -(T_max-1) (espnet_rel_pos_emb(T_max)).
    kv_cache: {"k": (B,H,T_max,D), "v": (B,H,T_max,D)}.
    offset: () int32 — tokens already cached.
    attn_bias: broadcastable to (B, H, c, T_max); caller masks keys at
      j >= offset + c.
    Returns (out (B, c, C), new kv_cache).

    Matrix-bd derivation: with query i at absolute offset+i and key j, the
    desired relative distance is d = offset+i-j. Band column l of
    q_v @ pos_band^T encodes d = T_max-1-l, so the (c, T_max) block starts
    at column T_max-c-offset — one dynamic_slice, then the standard
    rel_shift gather out[i, j] = band[i, (c-1)-i+j].
    """
    b, c_len, ch = x.shape
    d_k = ch // n_heads
    t_max = kv_cache["k"].shape[2]
    q = split_heads(core.linear(p["q"], x), n_heads)  # (B,H,c,D)
    k_new = split_heads(core.linear(p["k"], x), n_heads)
    v_new = split_heads(core.linear(p["v"], x), n_heads)
    zero = jnp.zeros((), offset.dtype)
    k_all = jax.lax.dynamic_update_slice(
        kv_cache["k"], k_new.astype(kv_cache["k"].dtype), (zero, zero, offset, zero)
    )
    v_all = jax.lax.dynamic_update_slice(
        kv_cache["v"], v_new.astype(kv_cache["v"].dtype), (zero, zero, offset, zero)
    )

    pe = core.linear(p["pos"], pos_band[None])  # (1, 2*T_max-1, C)
    pm = split_heads(pe, n_heads)  # (1, H, 2*T_max-1, D)
    q_u = q + p["pos_bias_u"][None, :, None, :]
    q_v = q + p["pos_bias_v"][None, :, None, :]
    matrix_ac = jnp.einsum(
        "bhqd,bhkd->bhqk", q_u, k_all, preferred_element_type=jnp.float32
    )  # (B,H,c,T_max)
    bd_full = jnp.einsum(
        "bhqd,bhkd->bhqk", q_v, pm, preferred_element_type=jnp.float32
    )  # (B,H,c,2*T_max-1)
    start = t_max - c_len - offset
    band = jax.lax.dynamic_slice_in_dim(
        bd_full, start, t_max + c_len - 1, axis=-1
    )
    matrix_bd = rel_shift_gather(band, c_len, t_max)
    scores = (matrix_ac + matrix_bd) / math.sqrt(d_k)
    if attn_bias is not None:
        scores = scores + attn_bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v_all.dtype), v_all,
        preferred_element_type=v_all.dtype,
    )
    return core.linear(p["o"], merge_heads(out)), {"k": k_all, "v": v_all}


# ---------------------------------------------------------------------------
# Plain attention (diffusers-style, CFM estimator)
# ---------------------------------------------------------------------------


def plain_mha_init(key, query_dim: int, n_heads: int, head_dim: int):
    """diffusers Attention: to_q/k/v bias-free, to_out with bias
    (reference flow/transformer.py:211-219)."""
    ks = jax.random.split(key, 4)
    inner = n_heads * head_dim
    return {
        "q": {"w": core.kaiming_uniform_torch(ks[0], (query_dim, inner))},
        "k": {"w": core.kaiming_uniform_torch(ks[1], (query_dim, inner))},
        "v": {"w": core.kaiming_uniform_torch(ks[2], (query_dim, inner))},
        "o": core.linear_init(ks[3], inner, query_dim),
    }


def plain_mha(
    p,
    x: Array,
    attn_bias: Optional[Array],
    n_heads: int,
    compact_scores: bool = False,
) -> Array:
    from jyutvoice_tpu.nn.quant import maybe_linear

    q = split_heads(maybe_linear(p["q"], x), n_heads)
    k = split_heads(maybe_linear(p["k"], x), n_heads)
    v = split_heads(maybe_linear(p["v"], x), n_heads)
    out = sdpa(q, k, v, attn_bias, compact_scores=compact_scores)
    return maybe_linear(p["o"], merge_heads(out))


def banded_sdpa(
    q: Array,  # (B, H, T, D)
    k: Array,
    v: Array,
    lengths: Array,  # (B,) valid key lengths (suffix mask)
    *,
    chunk: int,
    left: int,
    right: int = 0,
    compact_scores: bool = False,
) -> Array:
    """Banded (chunk-local) attention, LINEAR in T — pure dense XLA.

    Query chunk c attends to key chunks [c-left, c+right] (window
    w = (left+1+right)*chunk keys). right=0 is the reference's streaming
    chunk rule, banded (utils/mask.py:91-207, num_decoding_left_chunks
    >= 0); right>0 adds lookahead chunks — a closer approximation of the
    estimator's bidirectional full attention for the one-pass long-form
    gate. The band is computed SLAB-WISE from shifted views (reshape+
    slice only — TPU gathers are the measured slow path, CLAUDE.md; no
    banded K/V copy is ever materialized, see the body comment), so
    scores are (B,H,nc,chunk,w) instead of (B,H,T,T): both FLOPs and
    HBM traffic scale with T·w. No pallas: plain einsums the MXU tiles
    natively and GSPMD can shard the chunk axis (unlike a pallas custom
    call).

    Key validity is computed inline from positions (pad regions and
    suffix padding masked). Fully-padded query chunks see an all-masked
    row: softmax's internal max-subtraction keeps that finite (uniform
    probs over masked-input V values), and the caller's output mask
    zeroes it.
    """
    b, h, t, d = q.shape
    assert t % chunk == 0, (t, chunk)
    nc = t // chunk
    n_slabs = left + 1 + right
    w = n_slabs * chunk
    scale = 1.0 / math.sqrt(d)

    # slab-wise form: NEVER materialize the (B,H,nc,w,d) banded K/V copies
    # (an n_slabs-fold HBM write that measured 0.24-0.96x of full flash at
    # T=2048) — each window slab j of chunk c is just padded chunk c+j, a
    # shifted VIEW of K/V, so scores are n_slabs chunk-vs-chunk batched
    # matmuls concatenated on the window axis, and the prob@V contraction
    # accumulates per slab the same way. Only the (B,H,nc,chunk,w) score/
    # prob tensor (the linear-in-T one) is ever materialized.
    score_t = jnp.bfloat16 if compact_scores else jnp.float32
    mm_t = jnp.bfloat16 if compact_scores else k.dtype
    kp = jnp.pad(k, ((0, 0), (0, 0), (left * chunk, right * chunk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (left * chunk, right * chunk), (0, 0)))
    kp = kp.astype(mm_t)
    qc = q.reshape(b, h, nc, chunk, d).astype(mm_t)

    def slab(x, j):
        return jax.lax.slice_in_dim(x, j * chunk, j * chunk + t, axis=2).reshape(
            b, h, nc, chunk, x.shape[-1]
        )

    scores = jnp.concatenate(
        [
            jnp.einsum(
                "bhcqd,bhckd->bhcqk", qc, slab(kp, j),
                preferred_element_type=score_t,
            )
            for j in range(n_slabs)
        ],
        axis=-1,
    ) * jnp.asarray(scale, score_t)

    # absolute key position of window slot (c, wi) = c*chunk - left*chunk + wi
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (nc, w), 0)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (nc, w), 1)
    pos = c_idx * chunk - left * chunk + w_idx  # (nc, w)
    keep = (pos >= 0)[None] & (pos[None] < lengths[:, None, None])  # (B,nc,w)
    scores = jnp.where(
        keep[:, None, :, None, :], scores, jnp.asarray(-1e10, scores.dtype)
    )
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = probs.astype(jnp.bfloat16 if compact_scores else vp.dtype)
    vp = vp.astype(mm_t)
    out = sum(
        jnp.einsum(
            "bhcqk,bhckd->bhcqd",
            jax.lax.slice_in_dim(probs, j * chunk, (j + 1) * chunk, axis=-1),
            slab(vp, j),
            preferred_element_type=v.dtype,
        )
        for j in range(n_slabs)
    )
    return out.reshape(b, h, t, d)


def banded_mha(
    p,
    x: Array,
    lengths: Array,
    n_heads: int,
    *,
    chunk: int,
    left: int,
    right: int = 0,
    compact_scores: bool = False,
) -> Array:
    from jyutvoice_tpu.nn.quant import maybe_linear

    q = split_heads(maybe_linear(p["q"], x), n_heads)
    k = split_heads(maybe_linear(p["k"], x), n_heads)
    v = split_heads(maybe_linear(p["v"], x), n_heads)
    out = banded_sdpa(
        q, k, v, lengths, chunk=chunk, left=left, right=right,
        compact_scores=compact_scores,
    )
    return maybe_linear(p["o"], merge_heads(out))
