"""Causal CFM estimator U-Net (frozen CosyVoice2 decoder).

TPU-native re-design of the reference CausalConditionalDecoder
(jyutvoice/flow/decoder.py:798-1018). With the live config
(channels=[256], configs/base.yaml:88-99) the network never changes temporal
resolution — "down/up-sample" are causal convs — so here it is an explicitly
flat pipeline over (B, T, C):

  pack [x, mu, spks, cond] -> 320ch
  down:  resnet -> 4 attn blocks -> causal conv
  mid:   12 x (resnet -> 4 attn blocks)
  up:    skip-concat -> resnet -> 4 attn blocks -> causal conv
  final: causal block -> 1x1 proj -> 80ch

Each attn block: LN -> Attention(8 heads x 64, bias-free qkv) -> LN ->
GELU-FF(x4) (reference flow/transformer.py:148-443, diffusers semantics).
Timestep embedding: sinusoidal(320, scale 1000) -> silu MLP -> 1024
(reference decoder.py:15-30, 127-171, 821-827).
"""

from __future__ import annotations

import math


import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import EstimatorConfig
from jyutvoice_tpu.nn import attention, core

Array = jax.Array


# ---------------------------------------------------------------------------
# Timestep embedding
# ---------------------------------------------------------------------------


def sinusoidal_pos_emb(t: Array, dim: int, scale: float = 1000.0) -> Array:
    """(B,) -> (B, dim). reference decoder.py:15-30."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def init_time_mlp(key, in_dim: int, embed_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "linear1": core.linear_init(k1, in_dim, embed_dim),
        "linear2": core.linear_init(k2, embed_dim, embed_dim),
    }


def apply_time_mlp(p, t_emb: Array) -> Array:
    h = core.linear(p["linear1"], t_emb)
    h = core.silu(h)
    return core.linear(p["linear2"], h)


# ---------------------------------------------------------------------------
# Causal blocks
# ---------------------------------------------------------------------------


def init_causal_block(key, dim: int, dim_out: int):
    """CausalConv1d(k=3) -> LayerNorm -> Mish (reference decoder.py:773-788)."""
    return {
        "conv": core.conv1d_init(key, dim, dim_out, 3),
        "norm": core.layer_norm_init(dim_out),
    }


def apply_causal_block(p, x: Array, mask: Array, conv=core.conv1d) -> Array:
    h = conv(p["conv"], x * mask, padding="causal")
    h = core.layer_norm(p["norm"], h)
    h = core.mish(h)
    return h * mask


def init_causal_resnet(key, dim: int, dim_out: int, time_emb_dim: int):
    ks = jax.random.split(key, 4)
    return {
        "mlp": core.linear_init(ks[0], time_emb_dim, dim_out),
        "block1": init_causal_block(ks[1], dim, dim_out),
        "block2": init_causal_block(ks[2], dim_out, dim_out),
        "res_conv": core.conv1d_init(ks[3], dim, dim_out, 1),
    }


def apply_causal_resnet(
    p, x: Array, mask: Array, t: Array, conv=core.conv1d
) -> Array:
    """reference decoder.py:98-115 (causal variant 791-795).
    t: (B, time_embed_dim)."""
    h = apply_causal_block(p["block1"], x, mask, conv)
    h = h + core.linear(p["mlp"], core.mish(t))[:, None, :]
    h = apply_causal_block(p["block2"], h, mask, conv)
    # res_conv is k=1: conv1d_matmul short-circuits to a plain matmul
    return h + conv(p["res_conv"], x * mask, padding="valid")


# ---------------------------------------------------------------------------
# Transformer block (diffusers BasicTransformerBlock, layer_norm + gelu)
# ---------------------------------------------------------------------------


def init_transformer_block(key, dim: int, n_heads: int, head_dim: int, ff_mult: int = 4):
    ks = jax.random.split(key, 4)
    inner = dim * ff_mult
    return {
        "norm1": core.layer_norm_init(dim),
        "attn": attention.plain_mha_init(ks[0], dim, n_heads, head_dim),
        "norm3": core.layer_norm_init(dim),
        "ff_in": core.linear_init(ks[1], dim, inner),
        "ff_out": core.linear_init(ks[2], inner, dim),
    }


def apply_transformer_block(p, x: Array, attn_ctx: dict, n_heads: int) -> Array:
    from jyutvoice_tpu.nn.quant import maybe_linear

    h = core.layer_norm(p["norm1"], x)
    x = x + _attend(p["attn"], h, attn_ctx, n_heads)
    h = core.layer_norm(p["norm3"], x)
    h = core.gelu_torch(maybe_linear(p["ff_in"], h))
    return x + maybe_linear(p["ff_out"], h)


def use_compact_scores(batch2: int, t: int) -> bool:
    """bf16-score gate (backend check excluded; see _attend for rationale):
    total query rows >= 8192 (the batch-8 serving / batch-16 training
    regime) OR T >= 1536 (long-form decodes, where the quadratic
    (2B,H,T,T) score tensor dominates HBM traffic even at batch 1)."""
    return batch2 * t >= 8192 or t >= 1536


def use_banded(t: int, chunk: int, cfg: EstimatorConfig) -> bool:
    """Default long-form banded gate for the "xla" backend: at
    T >= banded_long_threshold the quadratic attention term dominates the
    solve and the (2,2) chunk-band (640-frame symmetric context) wins
    1.23x (T=2048) to 3.29x (T=12288) over stock flash at ~2% mel
    divergence (scripts/profile_dense_banded.py; docs/design.md round 4),
    with the VOCODED-domain cost bounded flat across the whole range
    (MCD 1.65-1.75 dB, spk-embed cosine at the noise floor, prompted
    included — scripts/eval_banded_vocoded.py, round 5; that evidence
    moved the default threshold 8192 -> 2048).
    Full attention only, 128-aligned T, TPU (CPU parity tests keep exact
    full attention). Set banded_long_threshold=0 to disable."""
    return (
        chunk == 0
        and cfg.banded_long_threshold > 0
        and t >= cfg.banded_long_threshold
        and t % cfg.banded_chunk == 0
    )


def use_stock_flash(t: int, chunk: int) -> bool:
    """Long-form flash gate: the stock jax TPU flash kernel (3-D grid,
    pipelined DMA — unlike nn/pallas/attention.py's full-K/V-in-VMEM form,
    which loses 2.5-4.5x here) beats the bf16-score XLA path once the
    quadratic score tensor dominates. Measured end-to-end on the full
    10-step solve (scripts/profile_stockflash_solve.py, v5e): 1.60x at
    T=2048, 1.65x at 3072-4096, 1.71-1.75x at 8192-12288 (mel MAE vs the
    bf16-score path ~1.5e-3, inside the 1e-2 parity budget); the scores
    path still wins below (0.72x at T=1024, 0.78x at 1536 — the sub-ms op
    is launch-overhead-bound there). Full attention only (the streaming
    chunk rule stays on the measured paths), T a multiple of the 512
    block — smaller blocks LOSE outright (blk128: 0.29-0.35x, blk256:
    0.92x, scripts/profile_stockflash_blocks.py), so non-512-aligned T
    stays on bf16 scores and the serving layer instead 512-aligns its
    totals (pipeline/buckets.py::pick_prompt_bucket, synthesize_long)."""
    return chunk == 0 and t >= 2048 and _flash_block(t) > 0


def _flash_block(t: int) -> int:
    """Stock-flash block size for sequence length t: 512 or 0 (ineligible).
    Measured (scripts/profile_stockflash_blocks.py, full 10-step solve):
    block 128 runs 0.29-0.35x of the bf16-score path and block 256 0.92x
    — the 3-D grid's per-block overhead swamps the win — while block 512
    gives the 1.60-1.75x speedups. So only 512-aligned sequences are
    flash-eligible; prompted serving totals are 512-aligned upstream by
    promoting the prompt bucket to 512 at t_mel >= 2048."""
    return 512 if t % 512 == 0 else 0


def _attend(p, x: Array, ctx: dict, n_heads: int) -> Array:
    """Dispatch attention backend: fused Pallas flash kernel (no (T,T) bias
    materialization) or the XLA SDPA path."""
    if ctx["backend"] == "ring":
        from jyutvoice_tpu.dist.ring import ring_attention
        from jyutvoice_tpu.nn.quant import maybe_linear

        q = attention.split_heads(maybe_linear(p["q"], x), n_heads)
        k = attention.split_heads(maybe_linear(p["k"], x), n_heads)
        v = attention.split_heads(maybe_linear(p["v"], x), n_heads)
        d = q.shape[-1]
        out = ring_attention(
            q, k, v, ctx["kv_valid"], ctx["mesh"], ctx["axis"],
            scale=1.0 / math.sqrt(d),
        )
        return maybe_linear(p["o"], attention.merge_heads(out))
    if ctx["backend"] == "banded":
        # linear-in-T chunk-local attention (nn/attention.py::banded_sdpa):
        # dense XLA einsums over the stacked-shift band — MXU-tiled,
        # GSPMD-shardable (no custom call), bf16 scores on TPU like the
        # compact-score path
        return attention.banded_mha(
            p, x, ctx["lengths"], n_heads,
            chunk=ctx["chunk"], left=ctx["left"], right=ctx["right"],
            compact_scores=jax.default_backend() == "tpu",
        )
    if ctx["backend"] == "flash_stock":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
        )
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as stock_flash,
        )

        from jyutvoice_tpu.nn.quant import maybe_linear

        b, t, _ = x.shape
        q = attention.split_heads(maybe_linear(p["q"], x), n_heads)
        k = attention.split_heads(maybe_linear(p["k"], x), n_heads)
        v = attention.split_heads(maybe_linear(p["v"], x), n_heads)
        d = q.shape[-1]
        # key-padding via segment ids: valid rows are segment 1, padding 0;
        # equality masking keeps valid queries off padded keys, and padded
        # queries attend among themselves (no empty-softmax NaN; their
        # outputs are mask-multiplied away downstream)
        seg = (
            jnp.arange(t, dtype=jnp.int32)[None, :] < ctx["lengths"][:, None]
        ).astype(jnp.int32)
        blk = _flash_block(t)
        bs = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_q_dkv=blk, block_k_dkv=blk,
            block_q_dq=blk, block_k_dq=blk, block_k_major_dq=blk,
        )
        out = stock_flash(
            q, k, v, segment_ids=SegmentIds(q=seg, kv=seg),
            causal=False, sm_scale=1.0 / math.sqrt(d), block_sizes=bs,
        )
        return maybe_linear(p["o"], attention.merge_heads(out))
    if ctx["backend"] == "pallas":
        from jyutvoice_tpu.nn.pallas.attention import flash_attention

        from jyutvoice_tpu.nn.quant import maybe_linear

        b, t, _ = x.shape
        q = attention.split_heads(maybe_linear(p["q"], x), n_heads)
        k = attention.split_heads(maybe_linear(p["k"], x), n_heads)
        v = attention.split_heads(maybe_linear(p["v"], x), n_heads)
        d = q.shape[-1]  # head dim of the PROJECTED q (inner != input dim)
        lens = jnp.repeat(ctx["lengths"], n_heads)
        out = flash_attention(
            q.reshape(b * n_heads, t, d),
            k.reshape(b * n_heads, t, d),
            v.reshape(b * n_heads, t, d),
            lens,
            scale=1.0 / math.sqrt(d),
            chunk_size=ctx["chunk_size"],
            num_left_chunks=ctx["num_left_chunks"],
        ).reshape(b, n_heads, t, d)
        return maybe_linear(p["o"], attention.merge_heads(out))
    # bf16 score/prob materialization halves attention HBM traffic at a
    # ~2e-4 abs rounding shift per op (see plain_mha docstring — NOT
    # bit-identical, but far inside the 1e-2 mel-parity budget). Only pays
    # once the (2B,H,T,T) scores dominate: measured 2.5x on the 10-step
    # solve at 2B=16/T=512 but a ~2-4% loss at 2B<=8, so gate on total
    # query rows — PLUS a sequence-length clause for long-form decodes,
    # where the quadratic score tensor dominates even at batch 1: solve
    # 392->111 ms at T=1536, 677->367 at T=2048, 1485->779 at T=3072
    # (round-3 gate sweep; envelope in scripts/profile_longform.py; f32
    # still wins at T<=1024: 55 vs 60 ms). CPU keeps true-f32 scores for
    # parity tests. Note the gate makes
    # large-batch/long-T output differ from small-batch output by the
    # rounding shift (a deliberate throughput/determinism trade).
    compact = jax.default_backend() == "tpu" and use_compact_scores(
        x.shape[0], x.shape[1]
    )
    return attention.plain_mha(
        p, x, ctx["bias"], n_heads, compact_scores=compact
    )


# ---------------------------------------------------------------------------
# Full estimator
# ---------------------------------------------------------------------------


def init_estimator(key, cfg: EstimatorConfig):
    assert len(cfg.channels) == 1, "flat U-Net (live config channels=[256])"
    ch = cfg.channels[0]
    ks = jax.random.split(key, 8 + cfg.num_mid_blocks)

    def stage(k, in_dim):
        k1, k2 = jax.random.split(k)
        return {
            "resnet": init_causal_resnet(k1, in_dim, ch, cfg.time_embed_dim),
            "blocks": [
                init_transformer_block(
                    jax.random.fold_in(k2, i), ch, cfg.num_heads, cfg.attention_head_dim
                )
                for i in range(cfg.n_blocks)
            ],
        }

    params = {
        "time_mlp": init_time_mlp(ks[0], cfg.in_channels, cfg.time_embed_dim),
        "down": stage(ks[1], cfg.in_channels),
        "down_conv": core.conv1d_init(ks[2], ch, ch, 3),
        "mid": [stage(ks[8 + i], ch) for i in range(cfg.num_mid_blocks)],
        "up": stage(ks[3], ch * 2),
        "up_conv": core.conv1d_init(ks[4], ch, ch, 3),
        "final_block": init_causal_block(ks[5], ch, ch),
        "final_proj": core.conv1d_init(ks[6], ch, cfg.out_channels, 1),
    }
    return params


def _stage(
    p, x: Array, mask: Array, t: Array, attn_ctx: dict, n_heads: int,
    conv=core.conv1d,
) -> Array:
    x = apply_causal_resnet(p["resnet"], x, mask, t, conv)
    for blk in p["blocks"]:
        x = apply_transformer_block(blk, x, attn_ctx, n_heads)
    return x


def apply_estimator(
    p,
    cfg: EstimatorConfig,
    x: Array,
    mask: Array,
    mu: Array,
    t: Array,
    spks: Array,
    cond: Array,
    streaming: bool = False,
) -> Array:
    """Velocity field estimate.

    x, mu, cond: (B, T, 80); mask: (B, T, 1); t: (B,); spks: (B, 80).
    Returns (B, T, 80). reference decoder.py:917-1018.
    """
    b, seq, _ = x.shape
    t_emb = sinusoidal_pos_emb(t, cfg.in_channels).astype(x.dtype)
    t_emb = apply_time_mlp(p["time_mlp"], t_emb)

    spks_t = jnp.broadcast_to(spks[:, None, :], (b, seq, spks.shape[-1])).astype(x.dtype)
    h = jnp.concatenate([x, mu, spks_t, cond], axis=-1)  # (B, T, 320)

    chunk = cfg.static_chunk_size if streaming else 0
    use_pallas = (
        cfg.attention_backend == "pallas"
        and seq % 128 == 0
        and jax.default_backend() == "tpu"
    )
    def banded_ctx():
        # linear long-form attention: chunk-band over MXU-aligned chunks.
        # Full-attention graphs only (the 50-frame streaming rule keeps
        # its own measured paths).
        assert chunk == 0, "banded backend is for full (non-streaming) graphs"
        assert seq % cfg.banded_chunk == 0, (seq, cfg.banded_chunk)
        return {
            "backend": "banded",
            "lengths": jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32),
            "chunk": cfg.banded_chunk,
            "left": cfg.banded_left,
            "right": cfg.banded_right,
        }

    if cfg.attention_backend == "banded":
        attn_ctx = banded_ctx()
    elif cfg.attention_backend == "ring":
        # sequence-parallel ring attention (dist/ring.py): K/V blocks
        # rotate over the mesh's seq axis, per-chip score tile is
        # (Tl, Tl). Full attention only (chunked streaming never runs
        # under the SP solver).
        from jyutvoice_tpu.dist.ring import get_ring_context

        assert chunk == 0, "ring attention supports full attention only"
        ring_mesh, ring_axis = get_ring_context()
        attn_ctx = {
            "backend": "ring",
            "kv_valid": mask[:, :, 0],
            "mesh": ring_mesh,
            "axis": ring_axis,
        }
    elif (
        cfg.attention_backend == "xla"
        and jax.default_backend() == "tpu"
        and use_banded(seq, chunk, cfg)
    ):
        # default long-form gate: linear chunk-band past the threshold
        # (wins 1.23-1.57x over flash at T=2048-4096, 2.46-3.29x at
        # 8192-12288; use_banded doc + vocoded bound in config.py)
        attn_ctx = banded_ctx()
    elif (
        cfg.attention_backend == "xla"
        and jax.default_backend() == "tpu"
        and use_stock_flash(seq, chunk)
    ):
        attn_ctx = {
            "backend": "flash_stock",
            "lengths": jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32),
        }
    elif use_pallas:
        lengths = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)
        attn_ctx = {
            "backend": "pallas",
            "lengths": lengths,
            "chunk_size": chunk,
            "num_left_chunks": cfg.num_decoding_left_chunks,
        }
    else:
        pad = mask[:, :, 0].astype(bool)
        attn_mask = core.chunk_attn_mask(pad, chunk, cfg.num_decoding_left_chunks)
        attn_ctx = {
            "backend": "xla",
            "bias": core.mask_to_bias(attn_mask)[:, None, :, :],
        }

    # "matmul" keeps the whole stage in MXU matmul land: avoids the XLA
    # conv<->matmul layout boundaries that break fusion at larger batches
    # (2.7x at 2B=12; scripts/profile_conv_as_matmul.py)
    conv = core.conv1d_matmul if cfg.conv_backend == "matmul" else core.conv1d

    h = _stage(p["down"], h, mask, t_emb, attn_ctx, cfg.num_heads, conv)
    skip = h
    h = conv(p["down_conv"], h * mask, padding="causal")
    for mid in p["mid"]:
        h = _stage(mid, h, mask, t_emb, attn_ctx, cfg.num_heads, conv)
    h = jnp.concatenate([h, skip], axis=-1)
    h = _stage(p["up"], h, mask, t_emb, attn_ctx, cfg.num_heads, conv)
    h = conv(p["up_conv"], h * mask, padding="causal")
    h = apply_causal_block(p["final_block"], h, mask, conv)
    out = conv(p["final_proj"], h * mask, padding="valid")
    return out * mask
