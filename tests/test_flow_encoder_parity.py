"""Parity: JAX FlowEncoder (UpsampleConformerEncoder) vs reference torch."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

sys.path.insert(0, "tests")
import refshim

refshim.install()

import jax.numpy as jnp

from jyutvoice_tpu.config import FlowEncoderConfig
from jyutvoice_tpu.models.flow_encoder import apply_flow_encoder
from jyutvoice_tpu.weights.torch_convert import convert_flow_encoder

CFG = FlowEncoderConfig()


def _build_ref():
    from jyutvoice.transformer.upsample_encoder import UpsampleConformerEncoder
    from jyutvoice.utils.mask import make_pad_mask

    class FlowEncoder(torch.nn.Module):
        """reference infer.py:35-82 wrapper, re-stated for the test."""

        def __init__(self, vocab_size=6561, input_size=512, output_size=80):
            super().__init__()
            self.input_embedding = torch.nn.Embedding(vocab_size, input_size)
            self.encoder = UpsampleConformerEncoder(
                output_size=512,
                attention_heads=8,
                linear_units=2048,
                num_blocks=6,
                dropout_rate=0.1,
                positional_dropout_rate=0.1,
                attention_dropout_rate=0.1,
                normalize_before=True,
                input_layer="linear",
                pos_enc_layer_type="rel_pos_espnet",
                selfattention_layer_type="rel_selfattn",
                input_size=512,
                use_cnn_module=False,
                macaron_style=False,
                static_chunk_size=25,
            )
            self.encoder_proj = torch.nn.Linear(512, output_size)

        def forward(self, token, token_len, streaming=False):
            mask = (~make_pad_mask(token_len)).float().unsqueeze(-1)
            token = self.input_embedding(torch.clamp(token, min=0)) * mask
            h, h_lengths = self.encoder(token, token_len, streaming=streaming)
            h = self.encoder_proj(h)
            return h, h_lengths

    torch.manual_seed(0)
    fe = FlowEncoder()
    fe.eval()
    return fe


@pytest.fixture(scope="module")
def ref_fe():
    return _build_ref()


@pytest.fixture(scope="module")
def params(ref_fe):
    sd = {k: v.detach().numpy() for k, v in ref_fe.state_dict().items()}
    return convert_flow_encoder(sd, CFG)


@pytest.mark.parametrize("streaming", [False, True])
def test_flow_encoder_parity(ref_fe, params, streaming):
    torch.manual_seed(1)
    b, t = 2, 31 if not streaming else 60  # >25 tokens to exercise chunks
    tokens = torch.randint(0, CFG.vocab_size, (b, t))
    lens = torch.tensor([t, t - 7])
    with torch.no_grad():
        ref_h, _ = ref_fe(tokens, lens, streaming=streaming)

    out_h, out_lens = apply_flow_encoder(
        params, CFG, jnp.asarray(tokens.numpy()), jnp.asarray(lens.numpy()),
        streaming=streaming,
    )
    assert out_h.shape == tuple(ref_h.shape)
    np.testing.assert_array_equal(np.asarray(out_lens), (lens * 2).numpy())
    # compare only valid (unpadded) region per row
    for i, L in enumerate((lens * 2).tolist()):
        np.testing.assert_allclose(
            np.asarray(out_h)[i, :L], ref_h.numpy()[i, :L], atol=2e-3, rtol=1e-2
        )
