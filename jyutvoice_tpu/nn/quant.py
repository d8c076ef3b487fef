"""Int8 quantization for frozen weights (optional serving mode).

The CFM estimator is frozen at inference (SURVEY §0) and dominates synthesis
cost; the v5e MXU runs int8 x int8 -> int32 at 2x its bf16 rate. This module
provides:

  * `quantize_linear` — per-output-channel symmetric int8 weights + f32
    scales for a (in, out) linear;
  * `linear_q` — dynamic per-row activation quantization, int8 matmul with
    int32 accumulation, dequantize, add bias.

Quality: weights of a trained model are near-Gaussian per channel; int8
per-channel keeps relative error ~1e-2. Whether that is audible must be
validated against real checkpoints — hence OFF by default
(EstimatorConfig.quantized).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_linear(p: Dict) -> Dict:
    """{'w': (in,out) f32, 'b'?} -> {'w_q': int8, 'scale': (out,) f32, 'b'?}."""
    w = p["w"]
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0  # (out,)
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def linear_q(p: Dict, x: Array) -> Array:
    """Quantized linear: dynamic per-row int8 activations, int8 MXU matmul.

    x: (..., in) f32/bf16 -> (..., out) f32.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # per row
    sx = jnp.maximum(sx, 1e-12)
    x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        p["w_q"],
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * p["scale"]
    if "b" in p:
        y = y + p["b"]
    return y


def maybe_linear(p: Dict, x: Array) -> Array:
    """Dispatch quantized vs f32 linear by param structure."""
    if "w_q" in p:
        return linear_q(p, x)
    from jyutvoice_tpu.nn import core

    return core.linear(p, x)


def quantize_estimator(params: Dict) -> Dict:
    """Quantize the big matmuls of every transformer block in an estimator
    param tree (attention q/k/v/o + ff_in/ff_out); everything else (convs,
    norms, time mlp) stays f32 — they are a small fraction of the FLOPs."""

    def q_block(blk):
        return {
            "norm1": blk["norm1"],
            "attn": {k: quantize_linear(v) for k, v in blk["attn"].items()},
            "norm3": blk["norm3"],
            "ff_in": quantize_linear(blk["ff_in"]),
            "ff_out": quantize_linear(blk["ff_out"]),
        }

    def q_stage(stage):
        return {
            "resnet": stage["resnet"],
            "blocks": [q_block(b) for b in stage["blocks"]],
        }

    return {
        "time_mlp": params["time_mlp"],
        "down": q_stage(params["down"]),
        "down_conv": params["down_conv"],
        "mid": [q_stage(s) for s in params["mid"]],
        "up": q_stage(params["up"]),
        "up_conv": params["up_conv"],
        "final_block": params["final_block"],
        "final_proj": params["final_proj"],
    }
