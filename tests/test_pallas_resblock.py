"""Fused ResBlock-stage kernel vs the unfused XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jyutvoice_tpu.models.hift import apply_resblock, init_resblock
from jyutvoice_tpu.nn.pallas.resblock import (
    chain_halo,
    fused_resblock_stage,
    pack_stage_weights,
)

KS = (3, 7, 11)
DIL = (1, 3, 5)


def test_chain_halo():
    assert chain_halo(11, DIL) == (5 + 5) + (15 + 5) + (25 + 5)
    assert chain_halo(3, DIL) == (1 + 1) + (3 + 1) + (5 + 1)


@pytest.mark.parametrize("c,t", [(64, 700), (128, 512)])
def test_fused_stage_matches_unfused(c, t):
    key = jax.random.PRNGKey(0)
    branches = [
        init_resblock(jax.random.fold_in(key, i), c, KS[i], DIL)
        for i in range(3)
    ]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, t, c)) * 0.5, jnp.float32)

    ref = sum(
        apply_resblock(branches[i], x, KS[i], DIL) for i in range(3)
    ) / 3.0

    weights = pack_stage_weights(branches, DIL)
    out = fused_resblock_stage(
        x[0], weights, kernel_sizes=KS, dilations=DIL, block_t=256,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref)[0], atol=2e-5, rtol=1e-4
    )
