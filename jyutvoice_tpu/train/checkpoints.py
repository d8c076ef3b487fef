"""Checkpoint save/restore via Orbax.

Replaces the reference's Lightning ModelCheckpoint + ckpt_path resume
(configs/base.yaml:146-159, train.py:54, baselightningmodule.py:113-116).
Stores {params, opt_state, step} as one pytree; `latest_step` supports
resume. Torch-format checkpoints are handled by the weights layer instead
(weights/torch_convert.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 10) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save(directory: str, step: int, state: Any, max_to_keep: int = 10) -> None:
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(directory: str, step: Optional[int] = None, template: Any = None):
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        mgr.close()
        return None
    if template is not None:
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        out = mgr.restore(step)
    mgr.close()
    return out
