"""Weight provisioning integration: synthetic reference checkpoints -> split
by prefix -> convert -> .npz -> reload -> numerics preserved."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import refshim

refshim.install()

import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.weights import provision
from jyutvoice_tpu.weights.torch_convert import convert_flow_encoder

CFG = JyutVoiceConfig()


def _make_flow_pt(tmp_path):
    """Build a flow.pt-like state dict: FlowEncoder keys at top level
    (encoder./input_embedding./encoder_proj.) + decoder keys
    (decoder.estimator./spk_embed_affine_layer.), as produced by CosyVoice2
    and split by download_pretrain_weights.py:182-200."""
    from tests.test_flow_encoder_parity import _build_ref
    from tests.test_cfm_parity import _ref_estimator

    fe = _build_ref()
    sd = {k: v for k, v in fe.state_dict().items()}
    est = _ref_estimator()
    for k, v in est.state_dict().items():
        sd[f"decoder.estimator.{k}"] = v
    lin = torch.nn.Linear(192, 80)
    for k, v in lin.state_dict().items():
        sd[f"spk_embed_affine_layer.{k}"] = v
    path = str(tmp_path / "flow.pt")
    torch.save(sd, path)
    return path, fe


def test_provision_flow_roundtrip(tmp_path):
    flow_pt, ref_fe = _make_flow_pt(tmp_path)
    out = provision.provision(flow_pt=flow_pt, out_dir=str(tmp_path / "npz"))
    assert set(out) == {"flow_encoder", "flow_decoder"}

    fe_params = provision.load_pytree_npz(out["flow_encoder"])
    # reloaded params drive the model identically to a direct conversion
    direct = convert_flow_encoder(
        {k: v.numpy() for k, v in ref_fe.state_dict().items()}, CFG.flow_encoder
    )
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(fe_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    dec = provision.load_pytree_npz(out["flow_decoder"])
    assert "decoder" in dec and "spk_embed_affine_layer" in dec
    # the estimator applies without shape errors
    from jyutvoice_tpu.models.estimator import apply_estimator

    rng = np.random.default_rng(0)
    b, t = 1, 16
    out_arr = apply_estimator(
        dec["decoder"], CFG.tts.cfm.estimator,
        jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        jnp.ones((b, t, 1), jnp.float32),
        jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        jnp.asarray([0.5], jnp.float32),
        jnp.asarray(rng.standard_normal((b, 80)), jnp.float32),
        jnp.zeros((b, t, 80), jnp.float32),
    )
    assert out_arr.shape == (b, t, 80)
    assert np.isfinite(np.asarray(out_arr)).all()
