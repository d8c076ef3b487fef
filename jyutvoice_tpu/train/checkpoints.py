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


def save_best(
    directory: str,
    step: int,
    state: Any,
    val_loss: float,
    max_to_keep: int = 10,
) -> None:
    """Keep the top-k checkpoints by validation loss in <dir>/best.

    The analog of the reference's ModelCheckpoint(monitor="val_loss",
    save_top_k=10) (configs/base.yaml:146-159); the step-based manager in
    the parent directory plays the save_last role.
    """
    mgr = ocp.CheckpointManager(
        os.path.join(os.path.abspath(directory), "best"),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m["val_loss"],
            best_mode="min",
        ),
    )
    mgr.save(
        step, args=ocp.args.StandardSave(state),
        metrics={"val_loss": float(val_loss)},
    )
    mgr.wait_until_finished()
    mgr.close()


def best_step(directory: str) -> Optional[int]:
    """Step of the lowest-val_loss checkpoint in <dir>/best, or None."""
    best_dir = os.path.join(os.path.abspath(directory), "best")
    if not os.path.isdir(best_dir):
        return None
    mgr = ocp.CheckpointManager(
        best_dir,
        options=ocp.CheckpointManagerOptions(
            best_fn=lambda m: m["val_loss"], best_mode="min"
        ),
    )
    step = mgr.best_step()
    mgr.close()
    return step


def restore_best(directory: str, template: Any = None):
    step = best_step(directory)
    if step is None:
        return None
    return restore(os.path.join(directory, "best"), step, template)


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
