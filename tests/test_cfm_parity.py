"""Parity: JAX CFM estimator + Euler/CFG solver vs reference torch modules."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

sys.path.insert(0, "tests")
import refshim

refshim.install()

import jax.numpy as jnp

from jyutvoice_tpu.config import CFMConfig, EstimatorConfig
from jyutvoice_tpu.models.cfm import cfm_forward, cosine_t_span
from jyutvoice_tpu.models.estimator import apply_estimator
from jyutvoice_tpu.weights.torch_convert import convert_estimator

EST_CFG = EstimatorConfig()
CFM_CFG = CFMConfig()


def _ref_estimator():
    from jyutvoice.flow.decoder import CausalConditionalDecoder

    torch.manual_seed(0)
    dec = CausalConditionalDecoder(
        in_channels=EST_CFG.in_channels,
        out_channels=EST_CFG.out_channels,
        channels=list(EST_CFG.channels),
        dropout=EST_CFG.dropout,
        attention_head_dim=EST_CFG.attention_head_dim,
        n_blocks=EST_CFG.n_blocks,
        num_mid_blocks=EST_CFG.num_mid_blocks,
        num_heads=EST_CFG.num_heads,
        act_fn=EST_CFG.act_fn,
        static_chunk_size=EST_CFG.static_chunk_size,
        num_decoding_left_chunks=EST_CFG.num_decoding_left_chunks,
    )
    dec.eval()
    return dec


@pytest.fixture(scope="module")
def ref_dec():
    return _ref_estimator()


@pytest.fixture(scope="module")
def params(ref_dec):
    sd = {k: v.detach().numpy() for k, v in ref_dec.state_dict().items()}
    return convert_estimator(sd, EST_CFG)


def _rand_inputs(b, t, full_len=None):
    torch.manual_seed(1)
    x = torch.randn(b, 80, t)
    mu = torch.randn(b, 80, t)
    spks = torch.randn(b, 80)
    cond = torch.randn(b, 80, t)
    lens = torch.tensor([t] * b) if full_len is None else torch.tensor(full_len)
    mask = (
        torch.arange(t)[None, :] < lens[:, None]
    ).float().unsqueeze(1)  # (B,1,T)
    tt = torch.tensor([0.35] * b)
    return x, mask, mu, tt, spks, cond


def _to_jax_inputs(x, mask, mu, tt, spks, cond):
    return (
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        jnp.asarray(mask.numpy().transpose(0, 2, 1)),
        jnp.asarray(mu.numpy().transpose(0, 2, 1)),
        jnp.asarray(tt.numpy()),
        jnp.asarray(spks.numpy()),
        jnp.asarray(cond.numpy().transpose(0, 2, 1)),
    )


@pytest.mark.parametrize("lens", [None, [29, 17]])
def test_estimator_parity(ref_dec, params, lens):
    b, t = 2, 29
    x, mask, mu, tt, spks, cond = _rand_inputs(b, t, lens)
    with torch.no_grad():
        ref = ref_dec(x, mask, mu, tt, spks, cond, streaming=False)
    jx, jmask, jmu, jt, jspks, jcond = _to_jax_inputs(x, mask, mu, tt, spks, cond)
    out = apply_estimator(params, EST_CFG, jx, jmask, jmu, jt, jspks, jcond)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref.numpy(), atol=5e-4, rtol=1e-3
    )


def test_estimator_streaming_chunk_mask_parity(ref_dec, params):
    b, t = 1, 120  # > static_chunk_size=50 so chunking matters
    x, mask, mu, tt, spks, cond = _rand_inputs(b, t)
    with torch.no_grad():
        ref = ref_dec(x, mask, mu, tt, spks, cond, streaming=True)
    jx, jmask, jmu, jt, jspks, jcond = _to_jax_inputs(x, mask, mu, tt, spks, cond)
    out = apply_estimator(
        params, EST_CFG, jx, jmask, jmu, jt, jspks, jcond, streaming=True
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref.numpy(), atol=5e-4, rtol=1e-3
    )


def test_cosine_t_span():
    n = 10
    ref = 1 - torch.cos(torch.linspace(0, 1, n + 1) * 0.5 * torch.pi)
    np.testing.assert_allclose(np.asarray(cosine_t_span(n)), ref.numpy(), atol=1e-7)


def test_cfm_forward_parity(ref_dec, params):
    """Full 10-step Euler + CFG solve vs reference CausalConditionalCFM."""
    from omegaconf import DictConfig
    from jyutvoice.flow.flow_matching import CausalConditionalCFM

    cfm = CausalConditionalCFM(
        in_channels=240,
        cfm_params=DictConfig(
            {
                "sigma_min": 1e-6,
                "solver": "euler",
                "t_scheduler": "cosine",
                "training_cfg_rate": 0.2,
                "inference_cfg_rate": 0.7,
                "reg_loss_type": "l1",
            }
        ),
        n_spks=1,
        spk_emb_dim=80,
        estimator=ref_dec,
    )

    b, t = 1, 36
    torch.manual_seed(3)
    mu = torch.randn(b, 80, t)
    spks = torch.randn(b, 80)
    cond = torch.randn(b, 80, t)
    mask = torch.ones(b, 1, t)

    with torch.no_grad():
        ref_out, _ = cfm(
            mu=mu, mask=mask, n_timesteps=4, spks=spks, cond=cond, streaming=False
        )

    noise = jnp.asarray(cfm.rand_noise.numpy().transpose(0, 2, 1))  # (1, 15000, 80)
    out = cfm_forward(
        params,
        CFM_CFG,
        jnp.asarray(mu.numpy().transpose(0, 2, 1)),
        jnp.asarray(mask.numpy().transpose(0, 2, 1)),
        jnp.asarray(spks.numpy()),
        jnp.asarray(cond.numpy().transpose(0, 2, 1)),
        n_timesteps=4,
        rand_noise=noise,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref_out.numpy(), atol=2e-3, rtol=1e-3
    )
