"""Pretrained-weight provisioning.

TPU-native analog of scripts/download_pretrain_weights.py in the reference:
given the CosyVoice2 artifacts (flow.pt, hift.pt) it splits the flow
checkpoint by key prefix into encoder/decoder halves
(download_pretrain_weights.py:168-215) and converts everything straight to
jyutvoice_tpu pytrees saved as .npz. Downloads themselves are out of scope
in this offline environment — pass local paths.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.weights import torch_convert as tc

# key prefixes from the reference splitter (download_pretrain_weights.py:182-200)
FLOW_ENCODER_PREFIXES = ("encoder.", "input_embedding.", "encoder_proj.")
FLOW_DECODER_PREFIXES = ("decoder.", "spk_embed_affine_layer.")


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
    out_dir: str = "pretrained_models_tpu",
    cfg: Optional[JyutVoiceConfig] = None,
) -> Dict[str, str]:
    """Convert reference torch checkpoints into native .npz pytrees."""
    cfg = cfg or JyutVoiceConfig()
    os.makedirs(out_dir, exist_ok=True)
    written = {}

    if flow_pt:
        sd = tc.load_torch_state_dict(flow_pt)
        enc_sd, dec_sd = split_flow_state_dict(sd)
        fe = tc.convert_flow_encoder(enc_sd, cfg.flow_encoder)
        path = os.path.join(out_dir, "flow_encoder.npz")
        save_pytree_npz(path, fe)
        written["flow_encoder"] = path
        est = tc.convert_estimator(
            dec_sd, cfg.tts.cfm.estimator, prefix="decoder.estimator."
        )
        path = os.path.join(out_dir, "flow_decoder.npz")
        save_pytree_npz(
            path,
            {
                "decoder": est,
                "spk_embed_affine_layer": tc._linear(
                    dec_sd, "spk_embed_affine_layer"
                ),
            },
        )
        written["flow_decoder"] = path

    if hift_pt:
        sd = tc.load_torch_state_dict(hift_pt)
        hp = tc.convert_hift(sd, cfg.hift)
        path = os.path.join(out_dir, "hift.npz")
        save_pytree_npz(path, hp)
        written["hift"] = path

    if tts_ckpt:
        sd = tc.load_torch_state_dict(tts_ckpt)
        tts = tc.convert_tts(sd, cfg.tts)
        path = os.path.join(out_dir, "tts.npz")
        save_pytree_npz(path, tts)
        written["tts"] = path

    return written
