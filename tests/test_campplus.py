"""CAM++ speaker embedder: JAX vs torch stand-in, plus the ONNX weight path.

The reference consumes campplus.onnx via onnxruntime (infer.py:148-163);
here the architecture is native (models/campplus.py) and weights come from
either a torch state_dict or the ONNX initializers parsed by the
dependency-free reader. Both conversion routes are exercised end-to-end
against a real torch.onnx export of the stand-in network.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from jyutvoice_tpu.models.campplus import CampPlusConfig, apply_campplus, init_campplus
from jyutvoice_tpu.weights.campplus_convert import (
    campplus_from_flat,
    campplus_from_onnx,
)

from tests.refshim_campplus import CAMPPlus

CFG = CampPlusConfig()


def _torch_model(seed: int = 0) -> CAMPPlus:
    torch.manual_seed(seed)
    m = CAMPPlus(feat_dim=80, embedding_size=192)
    # randomize BN running stats so inference-mode normalization is non-trivial
    sd = m.state_dict()
    g = torch.Generator().manual_seed(seed + 1)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.2
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    m.load_state_dict(sd)
    m.eval()
    return m


def _feat(t: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    feat = rng.standard_normal((1, t, 80)).astype(np.float32)
    return feat - feat.mean(axis=1, keepdims=True)  # reference mean-norm


def _compare(model: CAMPPlus, params, t: int, seed: int = 1, atol: float = 2e-4):
    feat = _feat(t, seed)
    with torch.no_grad():
        ref = model(torch.from_numpy(feat)).numpy()
    out = np.asarray(apply_campplus(params, CFG, jnp.asarray(feat)))
    assert out.shape == (1, 192)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=atol)
    cos = float(
        (out * ref).sum()
        / (np.linalg.norm(out) * np.linalg.norm(ref) + 1e-12)
    )
    assert cos > 0.99999


def test_campplus_shapes():
    import jax

    params = init_campplus(jax.random.PRNGKey(0), CFG)
    out = apply_campplus(params, CFG, jnp.asarray(_feat(120)))
    assert out.shape == (1, 192)
    assert np.isfinite(np.asarray(out)).all()


def test_campplus_parity_state_dict():
    model = _torch_model()
    flat = {k: v.numpy() for k, v in model.state_dict().items()}
    params = campplus_from_flat(flat, CFG)
    # T=237: exercises the CAM segment pooling's partial final segment
    _compare(model, params, t=237)


def test_campplus_masked_bucket_equals_exact():
    """Zero-padded bucketed run with t_len == exact-length run (the property
    that lets prompt extraction jit one graph per bucket on TPU)."""
    import jax

    params = init_campplus(jax.random.PRNGKey(3), CFG)
    feat = _feat(237, seed=7)
    exact = np.asarray(apply_campplus(params, CFG, jnp.asarray(feat)))

    padded = np.zeros((1, 300, 80), np.float32)
    padded[:, :237] = feat
    # garbage in the pad region must not leak into the result
    padded[:, 237:] = 123.0
    out = np.asarray(
        apply_campplus(
            params, CFG, jnp.asarray(padded), t_len=jnp.asarray([237])
        )
    )
    np.testing.assert_allclose(out, exact, rtol=1e-4, atol=1e-5)


def _export_onnx(model: CAMPPlus, path: str, fold: bool):
    # torch.onnx's final onnxscript-function pass needs the `onnx` package
    # but is a no-op without custom ops; bypass it in this onnx-free env.
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        torch.onnx.export(
            model,
            torch.from_numpy(_feat(150)),
            path,
            do_constant_folding=fold,
            dynamo=False,
            input_names=["feat"],
            dynamic_axes={"feat": {1: "T"}},
        )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


@pytest.mark.slow
def test_campplus_onnx_name_based(tmp_path):
    """Unfolded export keeps module-path initializer names -> name map."""
    model = _torch_model(seed=2)
    path = str(tmp_path / "campplus.onnx")
    _export_onnx(model, path, fold=False)
    params = campplus_from_onnx(path, CFG)
    _compare(model, params, t=150, seed=3)


@pytest.mark.slow
def test_campplus_onnx_structural(tmp_path):
    """Folded export renames/folds initializers -> structural graph binding."""
    model = _torch_model(seed=4)
    path = str(tmp_path / "campplus_folded.onnx")
    _export_onnx(model, path, fold=True)

    from jyutvoice_tpu.weights.campplus_convert import campplus_from_onnx_graph
    from jyutvoice_tpu.weights.onnx_reader import read_onnx

    graph = read_onnx(path)
    params = campplus_from_onnx_graph(graph.nodes, graph.initializers, CFG)
    # constant folding bakes BN into conv weights in f32 inside the exporter
    # itself (measured ~2e-3 drift vs the unfolded module); the embedding
    # direction is what matters and _compare's cosine check covers it.
    _compare(model, params, t=150, seed=5, atol=5e-3)


@pytest.mark.slow
def test_provision_campplus_npz(tmp_path):
    """provision(campplus_onnx=...) -> campplus.npz -> load -> parity."""
    model = _torch_model(seed=8)
    onnx_path = str(tmp_path / "campplus.onnx")
    _export_onnx(model, onnx_path, fold=False)

    from jyutvoice_tpu.weights.provision import load_pytree_npz, provision

    written = provision(campplus_onnx=onnx_path, out_dir=str(tmp_path / "out"))
    assert "campplus" in written
    params = load_pytree_npz(written["campplus"])
    _compare(model, params, t=150, seed=9)


@pytest.mark.slow
def test_embedder_native_backend(tmp_path):
    """CampPlusEmbedder picks the native JAX backend straight from .onnx."""
    model = _torch_model(seed=6)
    path = str(tmp_path / "campplus.onnx")
    _export_onnx(model, path, fold=False)

    from jyutvoice_tpu.audio.fbank import kaldi_fbank
    from jyutvoice_tpu.pipeline.prompt import CampPlusEmbedder

    emb = CampPlusEmbedder(path)
    assert emb.params is not None and emb.session is None
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    e = emb(wav)
    assert e.shape == (192,) and np.isfinite(e).all()

    feat = kaldi_fbank(wav, num_mel_bins=80)
    feat = feat - feat.mean(axis=0, keepdims=True)
    with torch.no_grad():
        ref = model(torch.from_numpy(feat[None])).numpy()[0]
    np.testing.assert_allclose(e, ref, rtol=1e-3, atol=2e-4)
