"""TensorBoard + optional WandB metric/image logging (reference
baselightningmodule.py:118-300; the reference ships a commented-out WandB
logger in configs/base.yaml:164-172 — here it mirrors the TB surface when
the package and a project name are both present)."""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

_log = logging.getLogger(__name__)


class TrainLogger:
    """Thin wrapper: scalar dicts + mel/attn images; no-op without a dir."""

    def __init__(
        self,
        log_dir: Optional[str] = None,
        wandb_project: Optional[str] = None,
        wandb_run_name: Optional[str] = None,
    ):
        self.writer = None
        self.wandb = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except Exception as e:  # pragma: no cover
                _log.warning("tensorboard unavailable: %s", e)
        if wandb_project:
            try:
                import wandb  # type: ignore

                wandb.init(project=wandb_project, name=wandb_run_name)
                self.wandb = wandb
            except Exception as e:
                _log.warning(
                    "wandb requested but unavailable (%s); falling back to "
                    "TensorBoard only", e,
                )

    def scalars(self, tag_prefix: str, metrics: Dict[str, float], step: int):
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(f"{tag_prefix}/{k}", float(v), step)
        if self.wandb is not None:
            self.wandb.log(
                {f"{tag_prefix}/{k}": float(v) for k, v in metrics.items()},
                step=step,
            )

    def mel_image(self, tag: str, mel: np.ndarray, step: int):
        """mel (T, n_mels)."""
        from jyutvoice_tpu.utils.viz import colormap

        if self.writer is None and self.wandb is None:
            return
        img = colormap(np.asarray(mel).T[::-1])  # (n_mels, T, 3)
        if self.writer is not None:
            self.writer.add_image(tag, img, step, dataformats="HWC")
        if self.wandb is not None:
            self.wandb.log({tag: self.wandb.Image(img)}, step=step)

    def attn_image(self, tag: str, attn: np.ndarray, step: int):
        from jyutvoice_tpu.utils.viz import colormap

        if self.writer is None and self.wandb is None:
            return
        img = colormap(np.asarray(attn))
        if self.writer is not None:
            self.writer.add_image(tag, img, step, dataformats="HWC")
        if self.wandb is not None:
            self.wandb.log({tag: self.wandb.Image(img)}, step=step)

    def close(self):
        if self.writer is not None:
            self.writer.flush()
            self.writer.close()
        if self.wandb is not None:
            self.wandb.finish()
