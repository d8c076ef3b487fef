"""Serving export: AOT-compiled / serialized synthesis graphs.

The TPU-native analog of the reference's ONNX/TensorRT export path
(scripts/export_onnx.py, infer_onnx.py): instead of exporting operators to a
foreign runtime, the bucketed synthesise graph is

  * AOT-compiled (`jax.jit(...).lower(...).compile()`) so a server pays no
    first-request trace/compile cost, and
  * serializable to portable StableHLO via `jax.export` for running under a
    different process/runtime version.

Weights are baked into the exported artifact as constants (like an ONNX
file); use one artifact per (text, mel, prompt, steps) bucket.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models import hift as hift_mod
from jyutvoice_tpu.models import tts as tts_mod
from jyutvoice_tpu.weights.noise import rand_noise


def _example_args(t_text: int, t_prompt: int):
    i32 = jnp.int32
    return (
        jax.ShapeDtypeStruct((1, t_text), i32),  # x
        jax.ShapeDtypeStruct((1,), i32),  # x_lengths
        jax.ShapeDtypeStruct((1, t_text), i32),  # lang
        jax.ShapeDtypeStruct((1, t_text), i32),  # tone
        jax.ShapeDtypeStruct((1, t_text), i32),  # word_pos
        jax.ShapeDtypeStruct((1, t_text), i32),  # syllable_pos
        jax.ShapeDtypeStruct((1, 192), jnp.float32),  # spk_embed
        jax.ShapeDtypeStruct((1, t_prompt, 80), jnp.float32),  # prompt_feat
        jax.ShapeDtypeStruct((1, t_prompt, 80), jnp.float32),  # prompt_h
        jax.ShapeDtypeStruct((1,), i32),  # prompt_lengths
    )


def build_serving_fn(
    cfg: JyutVoiceConfig,
    params_tts,
    params_hift,
    *,
    t_text: int,
    t_mel: int,
    t_prompt: int = 0,
    n_timesteps: int = 10,
    length_scale: float = 1.0,
):
    """Close over weights: (text features...) -> (wav, mel, mel_lengths)."""
    noise = jnp.asarray(rand_noise(t_prompt + t_mel))

    def fn(x, x_lengths, lang, tone, word_pos, syllable_pos, spk_embed,
           prompt_feat, prompt_h, prompt_lengths):
        out = tts_mod.synthesize_mel(
            params_tts, cfg.tts, x, x_lengths, lang, tone, word_pos,
            syllable_pos, spk_embed, prompt_feat, prompt_h, prompt_lengths,
            t_mel_max=t_mel, n_timesteps=n_timesteps, rand_noise=noise,
            length_scale=length_scale,
        )
        wav, _ = hift_mod.hift_vocode_auto(
            params_hift, cfg.hift, out.mel, deterministic=True
        )
        return wav, out.mel, out.mel_lengths

    return fn


def aot_compile(
    cfg: JyutVoiceConfig, params_tts, params_hift, *,
    t_text: int, t_mel: int, t_prompt: int = 0, n_timesteps: int = 10,
):
    """Ahead-of-time compiled callable for one bucket."""
    fn = build_serving_fn(
        cfg, params_tts, params_hift,
        t_text=t_text, t_mel=t_mel, t_prompt=t_prompt, n_timesteps=n_timesteps,
    )
    lowered = jax.jit(fn).lower(*_example_args(t_text, t_prompt))
    return lowered.compile()


def export_stablehlo(
    cfg: JyutVoiceConfig, params_tts, params_hift, path: str, *,
    t_text: int, t_mel: int, t_prompt: int = 0, n_timesteps: int = 10,
) -> None:
    """Serialize the bucket graph (weights baked in) to a StableHLO artifact.

    Forces the score-materializing attention path: the long-form
    stock-flash gate (models/estimator.py::use_stock_flash) would embed a
    TPU-only pallas custom call in the serialized module, which a foreign
    runtime (or another backend) cannot execute — exported artifacts must
    be pure StableHLO. aot_compile keeps the gate (same-device use).
    """
    import dataclasses

    from jax import export as jexport

    from jyutvoice_tpu.dist.gspmd import gspmd_safe_cfm_cfg

    # gspmd_safe_cfm_cfg rewrites BOTH pallas-capable backends ("xla"'s
    # stock-flash gate and the explicit "pallas" kernel) — an 'xla'-only
    # check here would still embed a TPU-only custom call for
    # attention_backend="pallas" configs
    safe_cfm = gspmd_safe_cfm_cfg(cfg.tts.cfm)
    if safe_cfm is not cfg.tts.cfm:
        tts = dataclasses.replace(cfg.tts, cfm=safe_cfm)
        cfg = dataclasses.replace(cfg, tts=tts)
    fn = build_serving_fn(
        cfg, params_tts, params_hift,
        t_text=t_text, t_mel=t_mel, t_prompt=t_prompt, n_timesteps=n_timesteps,
    )
    exported = jexport.export(jax.jit(fn))(*_example_args(t_text, t_prompt))
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_stablehlo(path: str):
    """Deserialize an exported graph; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
