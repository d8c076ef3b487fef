"""Numerical parity: JAX TextEncoder / DurationPredictor vs reference torch
modules with randomly initialized weights (converted through the weights
layer). Tests both the math and the converter."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import refshim

refshim.install()

import jax.numpy as jnp

from jyutvoice_tpu.config import DurationPredictorConfig, TextEncoderConfig
from jyutvoice_tpu.models.duration import apply_duration_predictor
from jyutvoice_tpu.models.text_encoder import apply_text_encoder
from jyutvoice_tpu.weights.torch_convert import (
    convert_duration_predictor,
    convert_text_encoder,
)

CFG = TextEncoderConfig()
DP_CFG = DurationPredictorConfig()


@pytest.fixture(scope="module")
def ref_text_encoder():
    from omegaconf import DictConfig
    from jyutvoice.models.text_encoder import TextEncoder

    torch.manual_seed(0)
    te = TextEncoder(
        encoder_type="RoPE Encoder",
        encoder_params=DictConfig(
            {
                "n_feats": CFG.n_feats,
                "n_channels": CFG.n_channels,
                "filter_channels": CFG.filter_channels,
                "filter_channels_dp": 256,
                "n_heads": CFG.n_heads,
                "n_layers": CFG.n_layers,
                "kernel_size": CFG.kernel_size,
                "p_dropout": CFG.p_dropout,
                "prenet": True,
                "gin_channels": CFG.gin_channels,
            }
        ),
        n_vocab=CFG.n_vocab,
        n_lang=CFG.n_lang,
        n_tone=CFG.n_tone,
    )
    te.eval()
    return te


@pytest.fixture(scope="module")
def inputs():
    torch.manual_seed(1)
    b, t = 2, 13
    return {
        "x": torch.randint(0, CFG.n_vocab, (b, t)),
        "x_lengths": torch.tensor([13, 9]),
        "lang": torch.randint(0, CFG.n_lang, (b, t)),
        "tone": torch.randint(0, CFG.n_tone, (b, t)),
        "word_pos": torch.randint(0, 4, (b, t)),
        "syllable_pos": torch.randint(0, 4, (b, t)),
        "spk_embed": torch.randn(b, CFG.gin_channels),
    }


def test_text_encoder_parity(ref_text_encoder, inputs):
    with torch.no_grad():
        x_ref, mu_ref, mask_ref = ref_text_encoder(
            inputs["x"],
            inputs["x_lengths"],
            inputs["lang"],
            inputs["tone"],
            inputs["word_pos"],
            inputs["syllable_pos"],
            inputs["spk_embed"],
        )

    sd = {k: v.detach().numpy() for k, v in ref_text_encoder.state_dict().items()}
    params = convert_text_encoder(sd, CFG)

    out = apply_text_encoder(
        params,
        CFG,
        jnp.asarray(inputs["x"].numpy()),
        jnp.asarray(inputs["x_lengths"].numpy()),
        jnp.asarray(inputs["lang"].numpy()),
        jnp.asarray(inputs["tone"].numpy()),
        jnp.asarray(inputs["word_pos"].numpy()),
        jnp.asarray(inputs["syllable_pos"].numpy()),
        jnp.asarray(inputs["spk_embed"].numpy()),
    )
    # ours is channels-last; reference returns (B, C, T)
    np.testing.assert_allclose(
        np.asarray(out.x).transpose(0, 2, 1), x_ref.numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.mu).transpose(0, 2, 1), mu_ref.numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.x_mask)[:, :, 0], mask_ref.numpy()[:, 0, :], atol=0
    )


def test_duration_predictor_parity(ref_text_encoder, inputs):
    from jyutvoice.models.duration_predictor import DurationPredictor

    torch.manual_seed(2)
    dp = DurationPredictor(
        in_channels=DP_CFG.in_channels,
        filter_channels=DP_CFG.filter_channels,
        kernel_size=DP_CFG.kernel_size,
        p_dropout=DP_CFG.p_dropout,
        gin_channels=DP_CFG.gin_channels,
    )
    dp.eval()

    with torch.no_grad():
        x_ref, _, mask_ref = ref_text_encoder(
            inputs["x"],
            inputs["x_lengths"],
            inputs["lang"],
            inputs["tone"],
            inputs["word_pos"],
            inputs["syllable_pos"],
            inputs["spk_embed"],
        )
        logw_ref = dp(x_ref, mask_ref, inputs["spk_embed"])

    sd = {k: v.detach().numpy() for k, v in dp.state_dict().items()}
    params = convert_duration_predictor(sd, DP_CFG)

    logw = apply_duration_predictor(
        params,
        DP_CFG,
        jnp.asarray(x_ref.numpy().transpose(0, 2, 1)),
        jnp.asarray(mask_ref.numpy().transpose(0, 2, 1)),
        jnp.asarray(inputs["spk_embed"].numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(logw).transpose(0, 2, 1), logw_ref.numpy(), atol=2e-4, rtol=1e-4
    )
