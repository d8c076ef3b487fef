"""Pallas TPU flash attention with inline pad/chunk masking.

The CFM estimator runs 56 attention blocks x ODE steps per synthesis
(SURVEY.md §3.1) — the hot loop. This kernel:

  * never materializes the (B, T, T) attention bias the XLA path builds
    (`chunk_attn_mask` + `mask_to_bias`): key-padding and the streaming
    chunk rule (reference utils/mask.py:91-207) are computed inline from a
    scalar length + chunk size,
  * streams K/V blocks through VMEM with an online-softmax accumulator
    (f32), one (BQ, D) output tile per grid step.

Layout: q, k, v are (BH, T, D) with head-folded batch; D in {64, 128};
T padded to a multiple of the block size by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    len_ref,  # prefetched (BH,) int32 valid key lengths
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, T, D)
    v_ref,  # (1, T, D)
    o_ref,  # (1, BQ, D)
    *,
    block_q: int,
    block_k: int,
    t_total: int,
    scale: float,
    chunk_size: int,
    num_left_chunks: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(1)
    q_start = qi * block_q
    q16 = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    valid_len = len_ref[b]

    d = q16.shape[-1]
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    if chunk_size > 0:
        chunk_idx = q_pos // chunk_size
        ending = (chunk_idx + 1) * chunk_size  # exclusive
        if num_left_chunks >= 0:
            start = jnp.maximum((chunk_idx - num_left_chunks) * chunk_size, 0)
        else:
            start = jnp.zeros_like(ending)
        # block-sparsity bounds: only key blocks this query block can see
        # (q_start is traced via program_id -> use jnp ops, fori_loop takes
        # traced bounds)
        blk_end = ((q_start + block_q - 1) // chunk_size + 1) * chunk_size
        if num_left_chunks >= 0:
            blk_start = jnp.maximum(
                (q_start // chunk_size - num_left_chunks) * chunk_size, 0
            )
        else:
            blk_start = 0
        kb_lo = blk_start // block_k
        kb_hi_chunk = pl.cdiv(jnp.minimum(blk_end, t_total), block_k)
    else:
        ending = jnp.full((block_q, 1), t_total, jnp.int32)
        start = jnp.zeros((block_q, 1), jnp.int32)
        kb_lo = 0
        kb_hi_chunk = t_total // block_k
    # never read key blocks entirely past the valid length
    kb_hi = jnp.minimum(kb_hi_chunk, pl.cdiv(valid_len, block_k))

    def body(kb, carry):
        m, l, acc = carry
        k_start = kb * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.bfloat16)
        v_blk = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.bfloat16)
        s = jnp.dot(q16, k_blk.T, preferred_element_type=jnp.float32)

        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        keep = (k_pos < valid_len) & (k_pos < ending) & (k_pos >= start)
        s = jnp.where(keep, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(jnp.bfloat16), v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(kb_lo, kb_hi, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "chunk_size", "num_left_chunks", "block_q", "block_k",
        "interpret",
    ),
)
def flash_attention(
    q: jax.Array,  # (BH, T, D)
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,  # (BH,) valid key lengths
    *,
    scale: float,
    chunk_size: int = 0,
    num_left_chunks: int = -1,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    bh, t, d = q.shape
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    assert t % block_q == 0 and t % block_k == 0, (t, block_q, block_k)

    kernel = functools.partial(
        _flash_kernel,
        block_q=block_q,
        block_k=block_k,
        t_total=t,
        scale=scale,
        chunk_size=chunk_size,
        num_left_chunks=num_left_chunks,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, t, d), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, t, d), lambda b, i, lens: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, lens: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, v)
