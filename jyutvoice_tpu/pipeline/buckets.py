"""Length buckets: one XLA compile per bucket, masks carry semantics.

The reference runs fully dynamic shapes in eager torch; under XLA every
distinct shape is a compile, so sequence lengths are rounded up to a small
bucket table (SURVEY.md §7 hard-part #1).
"""

from __future__ import annotations

from typing import Sequence, Tuple

TEXT_BUCKETS: Tuple[int, ...] = (32, 64, 96, 128, 192, 256, 384, 512)
# mel frames: 50/s -> up to 300 s (the reference's fixed noise buffer cap)
MEL_BUCKETS: Tuple[int, ...] = (128, 256, 384, 512, 768, 1024, 1536, 2048,
                                3072, 4096, 6144, 8192, 12288, 15000)
PROMPT_BUCKETS: Tuple[int, ...] = (0, 64, 128, 256, 512)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds the largest bucket {buckets[-1]}")
