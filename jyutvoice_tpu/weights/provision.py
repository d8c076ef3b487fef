"""Pretrained-weight provisioning.

TPU-native analog of scripts/download_pretrain_weights.py in the reference:
given the CosyVoice2 artifacts (flow.pt, hift.pt) it splits the flow
checkpoint by key prefix into encoder/decoder halves
(download_pretrain_weights.py:168-215), converts everything straight to
jyutvoice_tpu pytrees saved as .npz, and can assemble the transfer-learning
starting point `tts_init.npz` — a fresh random TTS tree with the frozen
CosyVoice2 decoder + speaker affine injected (the reference's pretrain.pt,
download_pretrain_weights.py:52-101).

Artifacts can be fetched from the reference HuggingFace URLs with
download=True (download_pretrain_weights.py:219-236); fetch failures skip
gracefully so the tool stays usable offline with local paths.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.weights import torch_convert as tc
from jyutvoice_tpu.weights.audit import audit_convert

log = logging.getLogger(__name__)

# key prefixes from the reference splitter (download_pretrain_weights.py:182-200)
FLOW_ENCODER_PREFIXES = ("encoder.", "input_embedding.", "encoder_proj.")
FLOW_DECODER_PREFIXES = ("decoder.", "spk_embed_affine_layer.")

# the four reference artifacts (download_pretrain_weights.py:219-226)
ARTIFACT_URLS = {
    "flow.pt": "https://huggingface.co/lucyknada/CosyVoice2-0.5B/resolve/main/flow.pt",
    "hift.pt": "https://huggingface.co/lucyknada/CosyVoice2-0.5B/resolve/main/hift.pt",
    "campplus.onnx": (
        "https://huggingface.co/FunAudioLLM/CosyVoice2-0.5B/resolve/main/campplus.onnx"
    ),
    "speech_tokenizer_v2.onnx": (
        "https://huggingface.co/FunAudioLLM/CosyVoice2-0.5B/resolve/main/"
        "speech_tokenizer_v2.onnx"
    ),
}


def download_artifacts(
    dest_dir: str,
    urls: Optional[Dict[str, str]] = None,
    fetch=None,
) -> Dict[str, Optional[str]]:
    """Fetch the reference artifacts into dest_dir; skip gracefully offline.

    Returns {name: local_path_or_None}. Existing files are never re-fetched.
    `fetch(url, dest)` is injectable for tests; the default uses urllib.
    """
    if fetch is None:

        def fetch(url: str, dest: str) -> None:
            import urllib.request

            with urllib.request.urlopen(url, timeout=30) as r, open(
                dest, "wb"
            ) as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)

    os.makedirs(dest_dir, exist_ok=True)
    out: Dict[str, Optional[str]] = {}
    for name, url in (urls or ARTIFACT_URLS).items():
        dest = os.path.join(dest_dir, name)
        if os.path.exists(dest):
            log.info("artifact %s already present", dest)
            out[name] = dest
            continue
        # fetch to a temp name + atomic rename: a HARD kill (SIGKILL/power
        # loss) mid-download must not leave a truncated file at the final
        # path — later runs would see it as "already present" forever and
        # fail with a confusing deserialization error
        part = dest + ".part"
        try:
            fetch(url, part)
            os.replace(part, dest)
            out[name] = dest
            log.info("downloaded %s", name)
        except Exception as e:  # noqa: BLE001 — offline is a supported mode
            if os.path.exists(part):
                os.remove(part)  # no truncated artifacts
            out[name] = None
            log.warning("could not download %s (%s); skipping", name, e)
    return out


def assemble_pretrain_tree(decoder_tree: dict, cfg: JyutVoiceConfig, seed: int):
    """Fresh random TTS tree with the converted CosyVoice2 decoder injected.

    The reference builds pretrain.pt as a randomly initialised JyutVoiceTTS
    state_dict with load_state_dict(flow_decoder, strict=False)
    (download_pretrain_weights.py:52-101): encoder + duration predictor stay
    random, decoder + spk_embed_affine_layer take the pretrained values.
    """
    import jax

    from jyutvoice_tpu.models.tts import init_tts

    params = init_tts(jax.random.PRNGKey(seed), cfg.tts)
    params = dict(params)
    params["decoder"] = decoder_tree["decoder"]
    params["spk_embed_affine_layer"] = decoder_tree["spk_embed_affine_layer"]
    return params


def split_flow_state_dict(sd: Dict[str, np.ndarray]):
    """flow.pt -> (flow_encoder_sd, flow_decoder_sd) by key prefix."""
    enc = {k: v for k, v in sd.items() if k.startswith(FLOW_ENCODER_PREFIXES)}
    dec = {k: v for k, v in sd.items() if k.startswith(FLOW_DECODER_PREFIXES)}
    return enc, dec


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _listify(root)


def _listify(node):
    if isinstance(node, dict):
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [_listify(node[str(i)]) for i in range(len(keys))]
        return {k: _listify(v) for k, v in node.items()}
    return node


def save_pytree_npz(path: str, tree) -> None:
    np.savez(path, **_flatten(tree))


def load_pytree_npz(path: str):
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def provision(
    flow_pt: Optional[str] = None,
    hift_pt: Optional[str] = None,
    tts_ckpt: Optional[str] = None,
    campplus_onnx: Optional[str] = None,
    tokenizer_torch: Optional[str] = None,
    out_dir: str = "pretrained_models_tpu",
    cfg: Optional[JyutVoiceConfig] = None,
    assemble_pretrain: bool = False,
    seed: int = 42,
    download: bool = False,
    download_dir: str = "pretrained_models",
    fetch=None,
    strict_audit: bool = True,
) -> Dict[str, str]:
    """Convert reference torch checkpoints into native .npz pytrees.

    With download=True the reference HF artifacts are fetched first (skipping
    gracefully offline) and used for any path not given explicitly.  With
    assemble_pretrain=True also writes tts_init.npz — the transfer-learning
    start: random init + frozen CosyVoice2 decoder (reference pretrain.pt).
    campplus.onnx converts to a native CAM++ pytree (campplus.npz); the
    speech tokenizer converts from a torch checkpoint (s3_tokenizer.npz).

    Every torch conversion runs under the key-coverage audit
    (weights/audit.py): with strict_audit a single unconsumed source key —
    a renamed layer, an unexpected extra tensor — aborts provisioning with
    the full list instead of silently dropping weights.
    """
    cfg = cfg or JyutVoiceConfig()
    os.makedirs(out_dir, exist_ok=True)
    written = {}

    def _audited(convert_fn, sd, *args, **kwargs):
        params, report = audit_convert(
            convert_fn, sd, *args, strict=strict_audit, **kwargs
        )
        if report.ignored:
            log.warning(
                "%s: %d/%d source keys unconsumed (strict_audit=False): %s",
                convert_fn.__name__, len(report.ignored), report.total,
                report.ignored[:10],
            )
        else:
            log.info(
                "%s: consumed %d/%d source keys",
                convert_fn.__name__, len(report.consumed), report.total,
            )
        return params

    if download:
        got = download_artifacts(download_dir, fetch=fetch)
        flow_pt = flow_pt or got.get("flow.pt")
        hift_pt = hift_pt or got.get("hift.pt")
        campplus_onnx = campplus_onnx or got.get("campplus.onnx")
        for name in ("campplus.onnx", "speech_tokenizer_v2.onnx"):
            if got.get(name):
                written[name] = got[name]

    if flow_pt:
        sd = tc.load_torch_state_dict(flow_pt)
        enc_sd, dec_sd = split_flow_state_dict(sd)
        unsplit = set(sd) - set(enc_sd) - set(dec_sd)
        if unsplit:
            msg = (
                f"flow checkpoint has {len(unsplit)} keys outside the "
                f"reference's split prefixes "
                f"(download_pretrain_weights.py:182-200): {sorted(unsplit)[:10]}"
            )
            if strict_audit:
                raise ValueError(msg)
            log.warning("%s", msg)
        fe = _audited(tc.convert_flow_encoder, enc_sd, cfg.flow_encoder)
        path = os.path.join(out_dir, "flow_encoder.npz")
        save_pytree_npz(path, fe)
        written["flow_encoder"] = path

        def _convert_decoder_half(dsd):
            return {
                "decoder": tc.convert_estimator(
                    dsd, cfg.tts.cfm.estimator, prefix="decoder.estimator."
                ),
                "spk_embed_affine_layer": tc._linear(
                    dsd, "spk_embed_affine_layer"
                ),
            }

        decoder_tree = _audited(_convert_decoder_half, dec_sd)
        path = os.path.join(out_dir, "flow_decoder.npz")
        save_pytree_npz(path, decoder_tree)
        written["flow_decoder"] = path

        if assemble_pretrain:
            tts_init = assemble_pretrain_tree(decoder_tree, cfg, seed)
            path = os.path.join(out_dir, "tts_init.npz")
            save_pytree_npz(path, tts_init)
            written["tts_init"] = path

    if hift_pt:
        sd = tc.load_torch_state_dict(hift_pt)
        hp = _audited(tc.convert_hift, sd, cfg.hift)
        path = os.path.join(out_dir, "hift.npz")
        save_pytree_npz(path, hp)
        written["hift"] = path

    if tts_ckpt:
        sd = tc.load_torch_state_dict(tts_ckpt)
        tts = _audited(tc.convert_tts, sd, cfg.tts)
        path = os.path.join(out_dir, "tts.npz")
        save_pytree_npz(path, tts)
        written["tts"] = path

    if campplus_onnx:
        from jyutvoice_tpu.weights.campplus_convert import campplus_from_onnx

        try:
            cp = campplus_from_onnx(campplus_onnx)
            path = os.path.join(out_dir, "campplus.npz")
            save_pytree_npz(path, cp)
            written["campplus"] = path
        except Exception as e:  # noqa: BLE001 — keep provisioning usable
            log.warning("campplus conversion failed (%s); ORT fallback "
                        "remains available at inference time", e)

    if tokenizer_torch:
        from jyutvoice_tpu.weights.s3_convert import s3_from_flat

        # name-indexed conversion runs under the same strict audit as the
        # tts/hift/flow converters — a tokenizer checkpoint from a different
        # revision (renamed/extra tensors) aborts instead of converting
        # silently wrong. (campplus ONNX binds structurally, not by name —
        # it is validated by the parity tests against real torch.onnx
        # exports instead, tests/test_campplus.py.)
        sd = tc.load_torch_state_dict(tokenizer_torch)
        s3 = _audited(s3_from_flat, sd)
        path = os.path.join(out_dir, "s3_tokenizer.npz")
        save_pytree_npz(path, s3)
        written["s3_tokenizer"] = path

    if assemble_pretrain and "tts_init" not in written:
        raise ValueError(
            "assemble_pretrain requires flow_pt (or a successful download "
            "of flow.pt)"
        )
    return written


def verify(
    flow_pt: Optional[str] = None,
    hift_pt: Optional[str] = None,
    tts_ckpt: Optional[str] = None,
    out_dir: str = "pretrained_models_tpu",
    cfg: Optional[JyutVoiceConfig] = None,
    text: str = "The quick brown fox jumps over the lazy dog.",
    lang: str = "en",
    phone: Optional[str] = None,
    n_timesteps: int = 10,
    reference_mel: Optional[str] = None,
    download: bool = False,
    download_dir: str = "pretrained_models",
    fetch=None,
) -> Dict[str, object]:
    """One-command real-weight verification (reference infer.py:271-446):

    download (or take paths to) the real artifacts -> strict key-coverage
    audit -> convert -> synthesize the BASELINE config-1 sentence -> report
    xRT, and mel MAE when a stored reference activation dump
    (`reference_mel`: .npy of shape (T, 80)) is provided. Returns the
    metrics dict and prints it as one JSON line. Runs end-to-end on
    synthetic stand-in checkpoints in CI (tests/test_provision.py).
    """
    import json
    import time

    cfg = cfg or JyutVoiceConfig()
    written = provision(
        flow_pt=flow_pt,
        hift_pt=hift_pt,
        tts_ckpt=tts_ckpt,
        out_dir=out_dir,
        cfg=cfg,
        # flow_pt may only become available inside provision() via
        # --download, so gate on `download` too — otherwise the documented
        # `provision --verify --download` recipe converts everything and
        # then fails for want of a tts_init it never assembled.
        assemble_pretrain=tts_ckpt is None
        and (flow_pt is not None or download),
        download=download,
        download_dir=download_dir,
        fetch=fetch,
        strict_audit=True,
    )
    tts_path = written.get("tts") or written.get("tts_init")
    hift_path = written.get("hift")
    if not tts_path or not hift_path:
        raise ValueError(
            f"verification needs a TTS checkpoint ({'ok' if tts_path else 'missing'}) "
            f"and hift.pt ({'ok' if hift_path else 'missing'}); "
            f"provisioned: {sorted(written)}"
        )

    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    synth = Synthesizer(
        cfg, load_pytree_npz(tts_path), load_pytree_npz(hift_path)
    )
    # warm-up compiles, then a timed run
    synth.synthesize(text, lang=lang, phone=phone, n_timesteps=n_timesteps)
    t0 = time.perf_counter()
    res = synth.synthesize(
        text, lang=lang, phone=phone, n_timesteps=n_timesteps
    )
    elapsed = time.perf_counter() - t0
    audio_s = res.timings["audio_seconds"]
    metrics: Dict[str, object] = {
        "audit": "pass (strict, 100% key coverage)",
        "artifacts": {k: str(v) for k, v in written.items()},
        "mel_frames": res.mel_frames,
        "audio_seconds": round(audio_s, 3),
        "xrt": round(audio_s / max(elapsed, 1e-9), 2),
    }
    if reference_mel:
        want = np.load(reference_mel)
        t = min(len(want), len(res.mel))
        mae = float(np.mean(np.abs(res.mel[:t] - want[:t])))
        metrics["mel_mae"] = mae
        metrics["mel_mae_pass"] = bool(mae < 1e-2)
    print(json.dumps(metrics))
    return metrics
