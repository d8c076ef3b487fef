"""S3 speech tokenizer v2: JAX vs torch stand-in + weight conversion routes.

The reference consumes speech_tokenizer_v2.onnx via onnxruntime
(infer.py:98-145); here the whisper-encoder + FSQ architecture is native
(models/s3_tokenizer.py). A tiny config keeps the torch stand-in cheap —
the architecture is identical at every size.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from jyutvoice_tpu.models.s3_tokenizer import (
    S3TokenizerConfig,
    apply_s3_encoder,
    apply_s3_tokenizer,
    fsq_encode,
    init_s3_tokenizer,
)
from jyutvoice_tpu.weights.s3_convert import s3_from_flat

from tests import refshim_s3

TINY = S3TokenizerConfig(
    n_mels=16, n_audio_ctx=64, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2,
)


def _torch_model(seed: int = 0):
    torch.manual_seed(seed)
    cfg = refshim_s3.S3Config(
        n_mels=TINY.n_mels, n_audio_ctx=TINY.n_audio_ctx,
        n_audio_state=TINY.n_audio_state, n_audio_head=TINY.n_audio_head,
        n_audio_layer=TINY.n_audio_layer,
    )
    m = refshim_s3.S3TokenizerV2(cfg)
    # perturb every tensor so no two are identical — fresh LayerNorms are all
    # ones/zeros and torch's exporter dedupes identical tensors, which would
    # hide them from the initializer list (real checkpoints are distinct)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    m.eval()
    return m


def _mel(t: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, t, TINY.n_mels)).astype(np.float32)


def test_s3_shapes():
    params = init_s3_tokenizer(jax.random.PRNGKey(0), TINY)
    tokens = apply_s3_tokenizer(params, TINY, jnp.asarray(_mel(100)))
    assert tokens.shape == (1, 25)
    toks = np.asarray(tokens)
    assert (toks >= 0).all() and (toks < TINY.vocab_size).all()


def test_s3_parity_torch():
    model = _torch_model()
    flat = {k: v.numpy() for k, v in model.state_dict().items()}
    params = s3_from_flat(flat, TINY)

    mel = _mel(101, seed=1)  # odd length: exercises the stride-2 conv pads
    mel_t = torch.from_numpy(mel).permute(0, 2, 1)
    with torch.inference_mode():
        hidden_ref = model.encoder(mel_t).numpy()
        tokens_ref = model(mel_t).numpy()

    hidden = np.asarray(apply_s3_encoder(params, TINY, jnp.asarray(mel)))
    assert hidden.shape == hidden_ref.shape
    np.testing.assert_allclose(hidden, hidden_ref, rtol=1e-4, atol=1e-5)

    tokens = np.asarray(apply_s3_tokenizer(params, TINY, jnp.asarray(mel)))
    assert tokens.shape == tokens_ref.shape
    # integer codes: allow an (unobserved) rounding-boundary flip or two
    assert (tokens == tokens_ref).mean() >= 0.99


def test_s3_masked_bucket_equals_exact():
    """Zero-padded bucketed run with t_len == exact-length run on the valid
    token prefix (bucketed-jit prompt tokenization on TPU)."""
    from jyutvoice_tpu.models.s3_tokenizer import apply_s3_encoder, out_len

    params = init_s3_tokenizer(jax.random.PRNGKey(1), TINY)
    mel = _mel(101, seed=4)
    exact_h = np.asarray(apply_s3_encoder(params, TINY, jnp.asarray(mel)))
    exact_tok = np.asarray(apply_s3_tokenizer(params, TINY, jnp.asarray(mel)))

    padded = np.full((1, 128, TINY.n_mels), 55.0, np.float32)
    padded[:, :101] = mel
    t_len = jnp.asarray([101])
    h = np.asarray(apply_s3_encoder(params, TINY, jnp.asarray(padded), t_len))
    tok = np.asarray(apply_s3_tokenizer(params, TINY, jnp.asarray(padded), t_len))
    n_valid = int(out_len(np.asarray([101]))[0])
    assert n_valid == exact_h.shape[1]
    np.testing.assert_allclose(h[:, :n_valid], exact_h, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(tok[:, :n_valid], exact_tok)


def test_s3_fsq_codes_cover_vocab():
    """FSQ digits are base-3 in [0, 3); codes must hit both extremes."""
    params = {"w": jnp.eye(8, dtype=jnp.float32) * 100.0, "b": jnp.zeros(8)}
    h_hi = jnp.ones((1, 1, 8))
    h_lo = -jnp.ones((1, 1, 8))
    cfg = TINY
    assert int(fsq_encode(params, cfg, h_hi)[0, 0]) == cfg.vocab_size - 1
    assert int(fsq_encode(params, cfg, h_lo)[0, 0]) == 0
    assert int(fsq_encode(params, cfg, jnp.zeros((1, 1, 8)))[0, 0]) == (
        cfg.vocab_size - 1
    ) // 2


@pytest.mark.slow
def test_s3_onnx_roundtrip(tmp_path):
    """Export the stand-in to ONNX, read it back without onnx/onnxruntime."""
    from tests.test_campplus import _export_onnx  # reuses the exporter shim
    from jyutvoice_tpu.weights.onnx_reader import read_onnx

    model = _torch_model(seed=2)
    path = str(tmp_path / "s3.onnx")
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        torch.onnx.export(
            model.encoder,
            torch.from_numpy(_mel(100)).permute(0, 2, 1),
            path,
            do_constant_folding=False,
            dynamo=False,
        )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig

    graph = read_onnx(path)
    flat = dict(graph.initializers)
    # encoder-only export: names lack the "encoder." prefix; re-add it and
    # bring the FSQ head from the state_dict (the public onnx bundles both,
    # with names this same shape when unmangled)
    flat = {f"encoder.{k}": v for k, v in flat.items()}
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    for k in sd:
        if k.startswith("quantizer."):
            flat[k] = sd[k]
    params = s3_from_flat(flat, TINY)

    mel = _mel(100, seed=3)
    with torch.inference_mode():
        ref = model(torch.from_numpy(mel).permute(0, 2, 1)).numpy()
    tokens = np.asarray(apply_s3_tokenizer(params, TINY, jnp.asarray(mel)))
    assert (tokens == ref).mean() >= 0.99
