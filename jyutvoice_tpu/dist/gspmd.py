"""GSPMD-safety helper shared by every multi-device graph builder.

A pallas custom call cannot be partitioned by GSPMD: XLA all-gathers its
operands onto every chip, silently defeating whatever sharding the graph
was built for (batch for DP training, sequence for SP, weights for TP).
Two estimator attention backends lower to pallas kernels — "pallas"
(nn/pallas/attention.py) and "xla", whose long-form stock-flash gate
(models/estimator.py::use_stock_flash) plants the stock TPU kernel at
T >= 2048 — so any cfg traced into a sharded jit must be rewritten to the
score-materializing path first. Used by dist/sp.py, dist/tp.py::tp_cfm_cfg
and train/step.py::gspmd_safe_tts_cfg.
"""

from __future__ import annotations

import dataclasses

_PALLAS_CAPABLE = ("xla", "pallas")
# "ring" is equally unsafe OUTSIDE its own shard_map solver: traced into a
# DP/TP jit it either raises get_ring_context's (misleading) RuntimeError
# or shard_maps against whatever stale mesh the thread last bound. Only
# dist/sp.py builds ring graphs, and it sets the backend itself.
_UNSAFE = _PALLAS_CAPABLE + ("ring",)


def gspmd_safe_cfm_cfg(cfm_cfg):
    """Rewrite any pallas-capable (or foreign-meshed) attention backend to
    'xla_scores'."""
    if cfm_cfg.estimator.attention_backend not in _UNSAFE:
        return cfm_cfg
    return dataclasses.replace(
        cfm_cfg,
        estimator=dataclasses.replace(
            cfm_cfg.estimator, attention_backend="xla_scores"
        ),
    )
