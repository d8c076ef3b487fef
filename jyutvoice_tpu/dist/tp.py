"""Tensor-parallel sharding for the CFM estimator (serving latency scaling).

NOTE: graphs jitted over these shardings must force
`attention_backend="xla_scores"` — use `tp_cfm_cfg(cfm_cfg)` below. The
long-form stock-flash gate (models/estimator.py::use_stock_flash) would
otherwise plant an unshardable pallas custom call inside the GSPMD
program at T >= 2048 (dist/sp.py enforces the same for the
sequence-parallel solver).

A head-sharded shard_map flash variant (each chip running the stock
kernel on its local heads) was considered and rejected: TP's niche is
SHORT-form latency scaling, where the flash gate never fires (scores win
below T=2048); for long form, per-chip TP score memory stays quadratic
in T ((2B, H/n, T, T)), so sequence sharding — dist/sp.py, and
dist/ring.py past its memory wall — dominates there anyway.


The reference has no TP (SURVEY.md §2.8) — single-GPU synthesis is its unit
of work. On TPU, multi-chip latency scaling is nearly free with GSPMD:
annotate the estimator's attention/FFN weights Megatron-style over a
`model` mesh axis and let XLA partition the per-step compute and insert the
all-reduces (over ICI) after the attention-out and FFN-out projections.

  * attn q/k/v: (C, H*D) sharded on the head-projection axis,
  * attn out:   (H*D, C) sharded on the input axis,
  * ff_in:      (C, 4C) sharded on the hidden axis,
  * ff_out:     (4C, C) sharded on the input axis,
  * conv/resnet/time/etc: replicated (tiny).

Usage:
    mesh = make_tp_mesh(n)
    shardings = tts_partition_tree(params, mesh)
    params = jax.device_put(params, shardings)
    out = jax.jit(fn, in_shardings=(shardings, ...))(params, ...)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(n_devices: int | None = None, axis_name: str = "model") -> Mesh:
    from jyutvoice_tpu.dist.mesh import make_mesh

    return make_mesh(n_devices, axis_name=axis_name)


def tp_cfm_cfg(cfm_cfg):
    """CFM config safe to jit over TP shardings: forces the
    score-materializing attention path so neither pallas-capable backend
    ("xla" via the stock-flash gate, or "pallas") can plant an
    unshardable custom call inside the GSPMD program — XLA would
    all-gather the full sequence onto every chip at each attention
    block. Thin alias of dist/gspmd.py::gspmd_safe_cfm_cfg."""
    from jyutvoice_tpu.dist.gspmd import gspmd_safe_cfm_cfg

    return gspmd_safe_cfm_cfg(cfm_cfg)


def _block_specs(axis: str) -> dict:
    return {
        "norm1": {"g": P(), "b": P()},
        "attn": {
            "q": {"w": P(None, axis)},
            "k": {"w": P(None, axis)},
            "v": {"w": P(None, axis)},
            "o": {"w": P(axis, None), "b": P()},
        },
        "norm3": {"g": P(), "b": P()},
        "ff_in": {"w": P(None, axis), "b": P(axis)},
        "ff_out": {"w": P(axis, None), "b": P()},
    }


def _stage_specs(stage_params: dict, axis: str) -> dict:
    return {
        "resnet": jax.tree.map(lambda _: P(), stage_params["resnet"]),
        "blocks": [_block_specs(axis) for _ in stage_params["blocks"]],
    }


def estimator_partition_specs(est_params: dict, axis: str = "model") -> dict:
    # the specs below describe the f32 param structure ({'w'}/{'w','b'});
    # int8-quantized estimators (nn/quant.quantize_estimator) carry
    # {'w_q','scale'} leaves instead — device_put against mismatched specs
    # fails with an inscrutable pytree-structure error, so say why up front
    leaves = jax.tree_util.tree_leaves_with_path(est_params)
    if any("w_q" in str(path) for path, _ in leaves[:4096]):
        raise ValueError(
            "int8-quantized estimator params cannot be tensor-parallel "
            "sharded (the TP partition specs cover the f32 layout only); "
            "quantize AFTER deciding the parallelism, or serve int8 "
            "single-chip / data-parallel"
        )
    return {
        "time_mlp": jax.tree.map(lambda _: P(), est_params["time_mlp"]),
        "down": _stage_specs(est_params["down"], axis),
        "down_conv": jax.tree.map(lambda _: P(), est_params["down_conv"]),
        "mid": [_stage_specs(s, axis) for s in est_params["mid"]],
        "up": _stage_specs(est_params["up"], axis),
        "up_conv": jax.tree.map(lambda _: P(), est_params["up_conv"]),
        "final_block": jax.tree.map(lambda _: P(), est_params["final_block"]),
        "final_proj": jax.tree.map(lambda _: P(), est_params["final_proj"]),
    }


def tts_partition_tree(params: dict, mesh: Mesh, axis: str = "model") -> Any:
    """NamedSharding tree for the full TTS param pytree: estimator weights
    TP-sharded, everything else replicated."""
    specs = {
        "encoder": jax.tree.map(lambda _: P(), params["encoder"]),
        "dp": jax.tree.map(lambda _: P(), params["dp"]),
        "decoder": estimator_partition_specs(params["decoder"], axis),
        "spk_embed_affine_layer": jax.tree.map(
            lambda _: P(), params["spk_embed_affine_layer"]
        ),
    }
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
