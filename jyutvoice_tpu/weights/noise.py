"""The fixed CFM noise buffer.

The reference generates `rand_noise = torch.randn(1, 80, 15000)` under
`set_all_random_seed(0)` at decoder construction (flow_matching.py:353-354),
making synthesis deterministic. For bit-comparable mels we reproduce the
exact torch-RNG buffer (requires torch once, cached as .npy); without torch
a jax PRNG buffer is used (deterministic, but not reference-matching).
"""

from __future__ import annotations

import os

import numpy as np

_CACHE = os.path.join(os.path.dirname(__file__), "rand_noise_seed0.npy")
_FRAMES = 50 * 300


def rand_noise(frames: int = _FRAMES) -> np.ndarray:
    """(1, frames, 80) float32 noise, channels-last.

    Raises for frames beyond the reference's fixed 15000-frame buffer
    (flow_matching.py:354) instead of silently truncating — callers that
    support longer audio (pipeline/streaming.py) extend deterministically
    past the cap themselves.
    """
    if frames > _FRAMES:
        raise ValueError(
            f"{frames} frames exceed the {_FRAMES}-frame seed-0 noise "
            "buffer (reference 300 s cap)"
        )
    buf = None
    if os.path.exists(_CACHE):
        buf = np.load(_CACHE)
    else:
        try:
            import random

            import torch

            random.seed(0)
            np.random.seed(0)
            torch.manual_seed(0)
            buf = torch.randn(1, 80, _FRAMES).numpy().transpose(0, 2, 1)
            try:
                np.save(_CACHE, buf)
            except OSError:
                pass
        except ImportError:
            rng = np.random.default_rng(0)
            buf = rng.standard_normal((1, _FRAMES, 80), dtype=np.float32)
    return np.ascontiguousarray(buf[:, :frames, :], dtype=np.float32)


def rand_noise_extended(frames: int) -> np.ndarray:
    """(1, frames, 80) noise for beyond-reference lengths: the seed-0
    buffer for the first 15000 absolute positions, then a deterministic
    position-indexed PRNG stream (numpy Generator fills sequentially, so
    any two calls agree on every shared position). Streaming synthesis
    uses this to run past the reference's 300 s hard cap."""
    if frames <= _FRAMES:
        return rand_noise(frames)
    base = rand_noise(_FRAMES)
    extra = (
        np.random.default_rng(0xC0DEC)
        .standard_normal((frames - _FRAMES, 80))
        .astype(np.float32)[None]
    )
    return np.concatenate([base, extra], axis=1)
