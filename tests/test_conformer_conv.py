"""Parity: full conformer layer (ConvolutionModule + macaron FF) vs the
reference (transformer/convolution.py:24-145, encoder_layer.py:241-319),
full forward and cached causal streaming — so CosyVoice2-style encoder
configs (use_cnn_module / macaron_style) are expressible."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

sys.path.insert(0, "tests")
import refshim

refshim.install()

import dataclasses

import jax
import jax.numpy as jnp

from jyutvoice_tpu.config import FlowEncoderConfig
from jyutvoice_tpu.models.flow_encoder import (
    apply_conformer_layer,
    apply_conv_module,
    apply_flow_encoder,
)
from jyutvoice_tpu.weights.torch_convert import (
    _conformer_layer,
    _conv_module,
    convert_flow_encoder,
)

SIZE = 64
HEADS = 4
KERNEL = 15


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _build_ref_conv(causal: bool, norm: str = "batch_norm"):
    from jyutvoice.transformer.activation import Swish
    from jyutvoice.transformer.convolution import ConvolutionModule

    torch.manual_seed(0)
    m = ConvolutionModule(SIZE, KERNEL, Swish(), norm, causal=causal)
    m.eval()
    return m


@pytest.mark.parametrize("norm", ["batch_norm", "layer_norm"])
def test_conv_module_parity_full(norm):
    ref = _build_ref_conv(causal=False, norm=norm)
    sd = {f"m.{k}": v for k, v in _sd(ref).items()}
    p = _conv_module(sd, "m")
    torch.manual_seed(1)
    x = torch.randn(2, 37, SIZE)
    lens = torch.tensor([37, 30])
    mask_pad = (torch.arange(37)[None, :] < lens[:, None]).unsqueeze(1)
    with torch.no_grad():
        want, _ = ref(x, mask_pad)
    got, _ = apply_conv_module(
        p, jnp.asarray(x.numpy()),
        jnp.asarray(mask_pad[:, 0].numpy()), KERNEL, norm, causal=False,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_conv_module_causal_cache_streaming():
    """Chunked causal conv with the left-context cache == one full pass
    (reference convolution.py:114-127 cache semantics)."""
    ref = _build_ref_conv(causal=True)
    sd = {f"m.{k}": v for k, v in _sd(ref).items()}
    p = _conv_module(sd, "m")
    torch.manual_seed(2)
    t = 40
    x = torch.randn(1, t, SIZE)
    ones = torch.ones(1, 1, t, dtype=torch.bool)
    with torch.no_grad():
        want, _ = ref(x, ones)
    xj = jnp.asarray(x.numpy())
    full, _ = apply_conv_module(
        p, xj, jnp.ones((1, t), bool), KERNEL, "batch_norm", causal=True
    )
    np.testing.assert_allclose(np.asarray(full), want.numpy(), atol=2e-5)

    # stream in 4 chunks of 10, carrying the (k-1)-frame cache
    cache = jnp.zeros((1, KERNEL - 1, SIZE))
    outs = []
    for i in range(0, t, 10):
        chunk = xj[:, i : i + 10]
        out, cache = apply_conv_module(
            p, chunk, jnp.ones((1, 10), bool), KERNEL, "batch_norm",
            causal=True, cache=cache,
        )
        outs.append(np.asarray(out))
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, want.numpy(), atol=2e-5)


def _build_ref_layer():
    from omegaconf import DictConfig  # noqa: F401 (refshim)
    from jyutvoice.transformer.activation import Swish
    from jyutvoice.transformer.attention import RelPositionMultiHeadedAttention
    from jyutvoice.transformer.convolution import ConvolutionModule
    from jyutvoice.transformer.encoder_layer import ConformerEncoderLayer
    from jyutvoice.transformer.positionwise_feed_forward import (
        PositionwiseFeedForward,
    )

    torch.manual_seed(0)
    layer = ConformerEncoderLayer(
        SIZE,
        RelPositionMultiHeadedAttention(HEADS, SIZE, 0.0),
        PositionwiseFeedForward(SIZE, 128, 0.0, Swish()),
        PositionwiseFeedForward(SIZE, 128, 0.0, Swish()),  # macaron
        ConvolutionModule(SIZE, KERNEL, Swish(), "batch_norm", causal=False),
        dropout_rate=0.0,
        normalize_before=True,
    )
    layer.eval()
    return layer


def test_full_conformer_layer_parity():
    """use_cnn_module=True + macaron=True layer vs the reference module."""
    from jyutvoice.transformer.embedding import EspnetRelPositionalEncoding

    ref = _build_ref_layer()
    sd = {f"l.{k}": v for k, v in _sd(ref).items()}
    p = _conformer_layer(sd, "l")
    assert "ff_macaron" in p and "conv" in p

    torch.manual_seed(3)
    t = 23
    x = torch.randn(1, t, SIZE)
    pos_enc = EspnetRelPositionalEncoding(SIZE, 0.0)
    pos_enc.eval()
    with torch.no_grad():
        _, pos_emb = pos_enc(x)
        mask = torch.ones(1, 1, t, dtype=torch.bool)
        want, *_ = ref(x, mask, pos_emb, mask)

    cfg = FlowEncoderConfig(
        macaron_style=True, use_cnn_module=True, cnn_module_kernel=KERNEL,
        cnn_module_norm="batch_norm", causal_cnn=False,
    )
    from jyutvoice_tpu.nn.attention import espnet_rel_pos_emb

    got = apply_conformer_layer(
        p, jnp.asarray(x.numpy()), espnet_rel_pos_emb(t, SIZE), None, HEADS,
        cfg, mask_pad=jnp.ones((1, t), bool),
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)


def test_full_encoder_with_conv_module_parity():
    """Whole UpsampleConformerEncoder with use_cnn_module + macaron enabled:
    converter auto-detects the extra weights; outputs match torch."""
    from jyutvoice.transformer.upsample_encoder import UpsampleConformerEncoder
    from jyutvoice.utils.mask import make_pad_mask

    # the reference UpsampleConformerEncoder hard-codes 4 up blocks
    cfg = FlowEncoderConfig(
        input_size=SIZE, output_size=SIZE, proj_size=SIZE,
        attention_heads=HEADS, linear_units=128, num_blocks=2,
        num_up_blocks=4, macaron_style=True, use_cnn_module=True,
        causal_cnn=False,
    )

    class FlowEncoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.input_embedding = torch.nn.Embedding(50, SIZE)
            self.encoder = UpsampleConformerEncoder(
                output_size=SIZE, attention_heads=HEADS, linear_units=128,
                num_blocks=2, dropout_rate=0.0,
                positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                normalize_before=True, input_layer="linear",
                pos_enc_layer_type="rel_pos_espnet",
                selfattention_layer_type="rel_selfattn", input_size=SIZE,
                use_cnn_module=True, macaron_style=True,
                static_chunk_size=25,
            )
            self.encoder_proj = torch.nn.Linear(SIZE, SIZE)

        def forward(self, token, token_len):
            mask = (~make_pad_mask(token_len)).float().unsqueeze(-1)
            token = self.input_embedding(torch.clamp(token, min=0)) * mask
            h, _ = self.encoder(token, token_len)
            return self.encoder_proj(h)

    torch.manual_seed(0)
    ref = FlowEncoder()
    # the reference hard-codes 512 channels in these two layers
    # (upsample_encoder.py:241,266); swap in SIZE-channel ones for the test
    from jyutvoice.transformer.upsample_encoder import (
        PreLookaheadLayer,
        Upsample1D,
    )

    ref.encoder.pre_lookahead_layer = PreLookaheadLayer(
        channels=SIZE, pre_lookahead_len=3
    )
    ref.encoder.up_layer = Upsample1D(
        channels=SIZE, out_channels=SIZE, stride=2
    )
    ref.eval()
    params = convert_flow_encoder(_sd(ref), cfg)

    torch.manual_seed(4)
    tokens = torch.randint(0, 50, (2, 19))
    lens = torch.tensor([19, 14])
    with torch.no_grad():
        want = ref(tokens, lens)
    got, _ = apply_flow_encoder(
        params, cfg, jnp.asarray(tokens.numpy()), jnp.asarray(lens.numpy())
    )
    want_np = want.numpy()
    got_np = np.asarray(got)
    # compare valid positions only (padding handling differs past lengths)
    for b, L in enumerate([19 * 2, 14 * 2]):
        np.testing.assert_allclose(got_np[b, :L], want_np[b, :L], atol=5e-5)
