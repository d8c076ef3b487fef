"""Round-trip: torch state_dict -> pytree (torch_convert) -> state_dict
(torch_export) must reproduce every key bit-exactly — the interop guarantee
that models fine-tuned here load back into the reference torch code."""

import numpy as np
import pytest

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.weights.torch_convert import convert_tts
from jyutvoice_tpu.weights.torch_export import export_tts, save_torch_checkpoint


def _random_tts_sd():
    """Reference-shaped state_dict via the torch modules (tiny-but-real)."""
    import jax

    from jyutvoice_tpu.models.tts import init_tts

    # build from OUR init then export — gives us a full key set without
    # instantiating the reference model (shape source of truth is the
    # converter round-trip against real torch modules in the parity tests)
    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    return export_tts(params), params, cfg


def test_export_convert_roundtrip():
    sd, params, cfg = _random_tts_sd()
    back = convert_tts(sd, cfg.tts)

    import jax

    leaves_a, treedef_a = jax.tree.flatten(params)
    leaves_b, treedef_b = jax.tree.flatten(back)
    assert treedef_a == treedef_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_keys_match_reference_names():
    sd, _params, _cfg = _random_tts_sd()
    # spot-check the reference key grammar (models/jyutvoice_tts.py tree)
    for key in (
        "encoder.emb.weight",
        "encoder.prenet.conv_layers.0.weight",
        "encoder.encoder.attn_layers.0.conv_q.weight",
        "encoder.encoder.ffn_layers.5.conv_2.bias",
        "dp.conv_1.weight",
        "dp.norm_2.gamma",
        "decoder.estimator.time_mlp.linear_1.weight",
        "decoder.estimator.down_blocks.0.0.mlp.1.weight",
        "decoder.estimator.mid_blocks.11.1.3.attn1.to_q.weight",
        "decoder.estimator.up_blocks.0.2.weight",
        "decoder.estimator.final_proj.bias",
        "spk_embed_affine_layer.weight",
    ):
        assert key in sd, key
    # every 1x1 attention conv regained its kernel axis
    assert sd["encoder.encoder.attn_layers.0.conv_q.weight"].ndim == 3


@pytest.mark.slow
def test_save_torch_checkpoint_loads_in_reference_module(tmp_path):
    """The exported ckpt loads into the REAL reference JyutVoiceTTS module
    (imported via refshim) with no unexpected keys and no missing
    parameters — the actual interop contract."""
    import torch

    from tests.test_tts_parity import _build_ref_tts

    sd, params, cfg = _random_tts_sd()
    path = str(tmp_path / "export.ckpt")
    save_torch_checkpoint(path, params)
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    assert "state_dict" in loaded
    assert set(loaded["state_dict"].keys()) == set(sd.keys())

    ref_tts = _build_ref_tts()
    missing, unexpected = ref_tts.load_state_dict(
        loaded["state_dict"], strict=False
    )
    assert not unexpected, unexpected
    # anything "missing" must be a non-parameter buffer (CFM noise buffer)
    param_names = {k for k, _ in ref_tts.named_parameters()}
    param_missing = [k for k in missing if k in param_names]
    assert not param_missing, param_missing
