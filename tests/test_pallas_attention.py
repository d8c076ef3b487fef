"""Pallas flash attention correctness (interpret mode on CPU) vs the XLA
reference SDPA with the same pad/chunk masking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jyutvoice_tpu.nn import core
from jyutvoice_tpu.nn.attention import sdpa
from jyutvoice_tpu.nn.pallas.attention import flash_attention


def _reference(q, k, v, lengths, scale, chunk_size=0, num_left_chunks=-1):
    bh, t, d = q.shape
    pad = core.sequence_mask(lengths, t)  # (BH, T)
    attn_mask = core.chunk_attn_mask(pad, chunk_size, num_left_chunks)
    bias = core.mask_to_bias(attn_mask)[:, None, :, :]
    out = sdpa(q[:, None], k[:, None], v[:, None], bias, scale=scale)
    return out[:, 0]


@pytest.mark.parametrize(
    "t,lengths,chunk,left",
    [
        (256, [256, 200], 0, -1),
        (256, [130, 256], 0, -1),
        (256, [256, 256], 50, -1),
        (512, [400, 512], 100, 2),
    ],
)
def test_flash_attention_matches_sdpa(t, lengths, chunk, left):
    rng = np.random.default_rng(0)
    bh, d = 2, 64
    q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    scale = 1.0 / np.sqrt(d)

    ref = _reference(q, k, v, lens, scale, chunk, left)
    out = flash_attention(
        q, k, v, lens, scale=scale, chunk_size=chunk, num_left_chunks=left,
        interpret=True,
    )
    # only compare valid query rows (padded-query rows are masked downstream);
    # the kernel feeds the MXU bf16 inputs with f32 accumulation (the TPU
    # default matmul precision), so tolerance is bf16-level
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(out)[i, :L], np.asarray(ref)[i, :L], atol=5e-3, rtol=2e-2
        )
