"""TensorBoard metric/image logging (reference baselightningmodule.py:118-300
analog — WandB is optional there and absent here; TB via torch works)."""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

_log = logging.getLogger(__name__)


class TrainLogger:
    """Thin wrapper: scalar dicts + mel/attn images; no-op without a dir."""

    def __init__(self, log_dir: Optional[str] = None):
        self.writer = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except Exception as e:  # pragma: no cover
                _log.warning("tensorboard unavailable: %s", e)

    def scalars(self, tag_prefix: str, metrics: Dict[str, float], step: int):
        if self.writer is None:
            return
        for k, v in metrics.items():
            self.writer.add_scalar(f"{tag_prefix}/{k}", float(v), step)

    def mel_image(self, tag: str, mel: np.ndarray, step: int):
        """mel (T, n_mels)."""
        if self.writer is None:
            return
        from jyutvoice_tpu.utils.viz import colormap

        img = colormap(np.asarray(mel).T[::-1])  # (n_mels, T, 3)
        self.writer.add_image(tag, img, step, dataformats="HWC")

    def attn_image(self, tag: str, attn: np.ndarray, step: int):
        if self.writer is None:
            return
        from jyutvoice_tpu.utils.viz import colormap

        self.writer.add_image(
            tag, colormap(np.asarray(attn)), step, dataformats="HWC"
        )

    def close(self):
        if self.writer is not None:
            self.writer.flush()
            self.writer.close()
