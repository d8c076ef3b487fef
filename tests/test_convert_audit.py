"""Key-coverage audit of the checkpoint converters vs the REAL reference
key inventories.

refshim instantiates the actual reference classes, so their state_dict()
names are the true names of the 1039 pretrained tensors the reference loads
(reference README.md:231-234, scripts/download_pretrain_weights.py:168-215).
These tests prove the converters consume 100% of them — a renamed or extra
key in a real checkpoint fails loudly instead of converting to
silently-wrong weights.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, "tests")
import refshim

refshim.install()

from test_flow_encoder_parity import _build_ref as _build_ref_flow_encoder
from test_hift_parity import _build_ref_hift
from test_tts_parity import _build_ref_tts

from jyutvoice_tpu.config import FlowEncoderConfig, HiFTConfig, TTSConfig
from jyutvoice_tpu.weights import provision
from jyutvoice_tpu.weights.audit import (
    ConversionAuditError,
    audit_convert,
)
from jyutvoice_tpu.weights import torch_convert as tc


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def tts_sd():
    return _sd(_build_ref_tts())


@pytest.fixture(scope="module")
def flow_encoder_sd():
    return _sd(_build_ref_flow_encoder())


@pytest.fixture(scope="module")
def hift_sd():
    return _sd(_build_ref_hift())


def test_convert_key_coverage_tts(tts_sd):
    params, report = audit_convert(tc.convert_tts, tts_sd, TTSConfig())
    assert report.ok, report.ignored
    assert report.total == len(tts_sd)
    assert len(report.consumed) + len(report.allowed) == report.total
    assert params["encoder"] is not None


def test_convert_key_coverage_flow_encoder(flow_encoder_sd):
    _params, report = audit_convert(
        tc.convert_flow_encoder, flow_encoder_sd, FlowEncoderConfig()
    )
    assert report.ok, report.ignored
    # the true flow-encoder state_dict inventory is 209 tensors (the
    # reference README's "127 encoder" figure, README.md:231-234, does not
    # match any state_dict partition of the real module — the state_dict
    # names, not that count, are the ground truth this audit gates on)
    assert report.total == 209


def test_convert_key_coverage_hift(hift_sd):
    _params, report = audit_convert(tc.convert_hift, hift_sd, HiFTConfig())
    assert report.ok, report.ignored


def test_split_flow_checkpoint_full_coverage(tts_sd, flow_encoder_sd):
    """Reconstruct a full flow.pt inventory (encoder half + decoder half,
    download_pretrain_weights.py:168-215) and prove split->convert consumes
    every key of both halves."""
    flow_sd = dict(flow_encoder_sd)
    for k, v in tts_sd.items():
        if k.startswith(("decoder.", "spk_embed_affine_layer.")):
            flow_sd[k] = v
    enc_sd, dec_sd = provision.split_flow_state_dict(flow_sd)
    assert len(enc_sd) + len(dec_sd) == len(flow_sd)  # split loses nothing

    _enc, enc_report = audit_convert(
        tc.convert_flow_encoder, enc_sd, FlowEncoderConfig()
    )
    assert enc_report.ok, enc_report.ignored

    def convert_decoder_half(sd):
        return {
            "decoder": tc.convert_estimator(
                sd, TTSConfig().cfm.estimator, prefix="decoder.estimator."
            ),
            "spk_embed_affine_layer": tc._linear(sd, "spk_embed_affine_layer"),
        }

    _dec, dec_report = audit_convert(convert_decoder_half, dec_sd)
    assert dec_report.ok, dec_report.ignored
    # reference decoder inventory: 910 decoder + 2 spk-affine tensors
    # (README.md:231-234); encoder half is 209 tensors (127 non-bias)
    assert enc_report.total == 209
    assert dec_report.total == 910 + 2


def test_audit_rejects_extra_key(hift_sd):
    sd = dict(hift_sd)
    sd["conv_pre.parametrizations.weight.original2"] = np.zeros(3, np.float32)
    with pytest.raises(ConversionAuditError, match="original2"):
        audit_convert(tc.convert_hift, sd, HiFTConfig())


def test_audit_rejects_renamed_key(tts_sd):
    sd = dict(tts_sd)
    val = sd.pop("encoder.emb.weight")
    sd["encoder.embedding.weight"] = val  # renamed in a future revision
    # missing expected name -> loud KeyError from the converter itself
    with pytest.raises(KeyError, match="encoder.emb.weight"):
        audit_convert(tc.convert_tts, sd, TTSConfig())


def test_audit_allowlist(hift_sd):
    sd = dict(hift_sd)
    sd["f0_predictor.condnet.0.num_batches_tracked"] = np.zeros((), np.int64)
    _params, report = audit_convert(tc.convert_hift, sd, HiFTConfig())
    assert report.ok
    assert report.allowed == ["f0_predictor.condnet.0.num_batches_tracked"]
