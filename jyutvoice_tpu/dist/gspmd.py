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
# "banded" is safe for sharded INFERENCE (banded_sdpa is pure XLA einsums,
# GSPMD partitions it) but not for sharded TRAINING: cfm_loss rewrites
# "banded" to "xla" (the band must never be backpropped — models/cfm.py),
# and "xla"'s stock-flash gate would then plant the pallas kernel at
# T >= 2048 inside the batch-sharded grad jit. Training callers pass
# train=True so a reused long-form serving config lands on "xla_scores".
_UNSAFE_TRAIN = _UNSAFE + ("banded",)


def gspmd_safe_cfm_cfg(cfm_cfg, *, train: bool = False):
    """Rewrite any pallas-capable (or foreign-meshed) attention backend to
    'xla_scores'. train=True also rewrites 'banded' (see _UNSAFE_TRAIN)."""
    unsafe = _UNSAFE_TRAIN if train else _UNSAFE
    if cfm_cfg.estimator.attention_backend not in unsafe:
        return cfm_cfg
    return dataclasses.replace(
        cfm_cfg,
        estimator=dataclasses.replace(
            cfm_cfg.estimator, attention_backend="xla_scores"
        ),
    )
