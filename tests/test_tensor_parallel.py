"""Tensor-parallel estimator over the 8-device CPU mesh: TP-sharded forward
must match the single-device result (GSPMD inserts the collectives)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_pipeline import TINY
from jyutvoice_tpu.dist.tp import make_tp_mesh, tp_cfm_cfg, tts_partition_tree
from jyutvoice_tpu.models.cfm import cfm_forward
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.weights.noise import rand_noise


def test_tp_estimator_matches_single_device():
    params = init_tts(jax.random.PRNGKey(0), TINY.tts)
    rng = np.random.default_rng(0)
    b, t = 1, 64
    mu = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    spks = jnp.asarray(rng.standard_normal((b, 80)), jnp.float32)
    cond = jnp.zeros((b, t, 80), jnp.float32)
    noise = jnp.asarray(rand_noise(t))

    def fn(dec_params, mu, mask, spks, cond):
        return cfm_forward(
            dec_params, TINY.tts.cfm, mu, mask, spks, cond,
            n_timesteps=2, rand_noise=noise,
        )

    ref = jax.jit(fn)(params["decoder"], mu, mask, spks, cond)

    mesh = make_tp_mesh(8)
    shardings = tts_partition_tree(params, mesh)
    with mesh:
        dec_sharded = jax.device_put(params["decoder"], shardings["decoder"])
        rep = NamedSharding(mesh, P())
        out = jax.jit(
            fn,
            in_shardings=(shardings["decoder"], rep, rep, rep, rep),
            out_shardings=rep,
        )(dec_sharded, mu, mask, spks, cond)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
    # the weights really are distributed
    leaf = dec_sharded["mid"][0]["blocks"][0]["attn"]["q"]["w"]
    assert len(leaf.sharding.device_set) == 8


def test_tp_cfm_cfg_forces_scores_backend():
    """TP graphs must not contain the stock-flash pallas call: tp_cfm_cfg
    rewrites 'xla' (gate-eligible) to 'xla_scores' and leaves explicit
    backend choices alone."""
    assert TINY.tts.cfm.estimator.attention_backend == "xla"
    forced = tp_cfm_cfg(TINY.tts.cfm)
    assert forced.estimator.attention_backend == "xla_scores"
    assert tp_cfm_cfg(forced) is forced
