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

def test_assemble_pretrain(tmp_path):
    """tts_init.npz = init_tts(seed) with decoder + spk affine injected
    (reference download_pretrain_weights.py:52-101): decoder leaves equal the
    converted ones, encoder/dp leaves equal the fresh random init."""
    from jyutvoice_tpu.models.tts import init_tts

    flow_pt, _ = _make_flow_pt(tmp_path)
    out = provision.provision(
        flow_pt=flow_pt, out_dir=str(tmp_path / "npz"),
        assemble_pretrain=True, seed=7,
    )
    assert "tts_init" in out
    tts = provision.load_pytree_npz(out["tts_init"])
    assert set(tts) == {"encoder", "dp", "decoder", "spk_embed_affine_layer"}

    dec = provision.load_pytree_npz(out["flow_decoder"])
    for a, b in zip(jax.tree.leaves(tts["decoder"]), jax.tree.leaves(dec["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(tts["spk_embed_affine_layer"]),
        jax.tree.leaves(dec["spk_embed_affine_layer"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fresh = init_tts(jax.random.PRNGKey(7), CFG.tts)
    for part in ("encoder", "dp"):
        for a, b in zip(jax.tree.leaves(tts[part]), jax.tree.leaves(fresh[part])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the injected decoder is NOT the random one
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(tts["decoder"]), jax.tree.leaves(fresh["decoder"])
        )
    ]
    assert max(diffs) > 0


def test_assemble_pretrain_requires_flow(tmp_path):
    with pytest.raises(ValueError, match="assemble_pretrain"):
        provision.provision(
            out_dir=str(tmp_path / "npz"), assemble_pretrain=True
        )


def test_download_artifacts_mocked(tmp_path):
    """download_artifacts fetches missing files, keeps existing ones, and
    skips gracefully (removing partial output) when a fetch fails."""
    calls = []

    def fake_fetch(url, dest):
        calls.append(url)
        if "hift" in url:
            with open(dest, "wb") as f:
                f.write(b"partial")
            raise OSError("network down")
        with open(dest, "wb") as f:
            f.write(b"data:" + url.encode())

    dest = tmp_path / "dl"
    dest.mkdir()
    (dest / "campplus.onnx").write_bytes(b"already-here")

    got = provision.download_artifacts(str(dest), fetch=fake_fetch)
    assert got["flow.pt"] and (dest / "flow.pt").read_bytes().startswith(b"data:")
    assert got["hift.pt"] is None
    assert not (dest / "hift.pt").exists()  # no truncated artifact left
    assert got["campplus.onnx"] == str(dest / "campplus.onnx")
    assert (dest / "campplus.onnx").read_bytes() == b"already-here"  # untouched
    assert all("campplus" not in u for u in calls)


def test_provision_cli_assemble(tmp_path):
    """End-to-end through the CLI surface: flow.pt -> tts_init.npz that
    cli/train.py --pretrain can load."""
    from jyutvoice_tpu.cli.provision import main as provision_main

    flow_pt, _ = _make_flow_pt(tmp_path)
    written = provision_main([
        "--flow-pt", flow_pt, "--out-dir", str(tmp_path / "npz"),
        "--assemble-pretrain", "--seed", "3",
    ])
    assert "tts_init" in written

    from jyutvoice_tpu.cli.infer import _load_params

    params = _load_params(written["tts_init"], "tts", CFG)
    assert set(params) == {"encoder", "dp", "decoder", "spk_embed_affine_layer"}


def test_verify_recipe_on_synthetic_standins(tmp_path):
    """provision.verify (cli --verify): strict audit -> convert ->
    synthesize -> metrics, end-to-end on synthetic checkpoints
    (the documented procedure for the first machine with real artifacts)."""
    from tests.test_hift_parity import _build_ref_hift

    flow_pt, _ = _make_flow_pt(tmp_path)
    hift_pt = str(tmp_path / "hift.pt")
    torch.save(_build_ref_hift().state_dict(), hift_pt)

    # stored "reference activation dump": any (T, 80) npy
    ref_mel = str(tmp_path / "ref_mel.npy")
    np.save(ref_mel, np.zeros((64, 80), np.float32))

    metrics = provision.verify(
        flow_pt=flow_pt,
        hift_pt=hift_pt,
        out_dir=str(tmp_path / "npz"),
        text="佢",
        lang="yue",
        phone="keoi5",
        n_timesteps=2,
        reference_mel=ref_mel,
    )
    assert metrics["xrt"] > 0
    assert "mel_mae" in metrics and np.isfinite(metrics["mel_mae"])
    assert metrics["audit"].startswith("pass")


def test_verify_with_download_assembles_pretrain(tmp_path):
    """`provision --verify --download` with no explicit checkpoint paths:
    flow.pt only becomes available inside provision(), so verify() must
    still assemble tts_init from it (regression: the assemble gate used to
    read the pre-download flow_pt=None and the documented one-command
    recipe failed AFTER a full download + conversion)."""
    from tests.test_hift_parity import _build_ref_hift

    dl = tmp_path / "dl"
    dl.mkdir()
    # "already downloaded" artifacts: download_artifacts never re-fetches
    flow_pt, _ = _make_flow_pt(dl)
    assert flow_pt == str(dl / "flow.pt")
    torch.save(_build_ref_hift().state_dict(), str(dl / "hift.pt"))

    def offline_fetch(url, dest):
        raise OSError("network down")  # campplus/speech_tokenizer skip

    metrics = provision.verify(
        out_dir=str(tmp_path / "npz"),
        text="佢",
        lang="yue",
        phone="keoi5",
        n_timesteps=2,
        download=True,
        download_dir=str(dl),
        fetch=offline_fetch,
    )
    assert metrics["xrt"] > 0
    assert metrics["audit"].startswith("pass")
