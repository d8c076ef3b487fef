"""Length buckets: one XLA compile per bucket, masks carry semantics.

The reference runs fully dynamic shapes in eager torch; under XLA every
distinct shape is a compile, so sequence lengths are rounded up to a small
bucket table (SURVEY.md §7 hard-part #1).
"""

from __future__ import annotations

from typing import Sequence, Tuple

# interactive sentences live in the first 8 buckets; the long tail exists
# so long-form one-pass decodes (synthesize_long, mel up to 15000+ frames
# = 300 s) can encode their whole text in one dispatch — the RoPE text
# encoder is length-agnostic and even 8192 tokens (~340 s of speech) is a
# ~0.5 GB score tensor, far from the chip's limit
TEXT_BUCKETS: Tuple[int, ...] = (32, 64, 96, 128, 192, 256, 384, 512,
                                 1024, 2048, 4096, 8192)
# text above this is "long-form": the serving engine routes such requests
# through synthesize_long instead of co-batching them (pipeline/server.py)
INTERACTIVE_TEXT_CAP = 512
# mel frames: 50/s -> up to 300 s (the reference's fixed noise buffer cap)
MEL_BUCKETS: Tuple[int, ...] = (128, 256, 384, 512, 768, 1024, 1536, 2048,
                                3072, 4096, 6144, 8192, 12288, 15000)
PROMPT_BUCKETS: Tuple[int, ...] = (0, 64, 128, 256, 512)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds the largest bucket {buckets[-1]}")


def pick_prompt_bucket(p_len: int, t_mel: int) -> int:
    """Prompt bucket, flash-aware: long-form decodes (t_mel >= 2048) hit
    the stock-flash attention gate only when the estimator total
    (t_prompt + t_mel) is 512-aligned (models/estimator.py::_flash_block —
    smaller flash blocks measured 0.29-0.92x, so only the 512 block is
    used). Every long mel bucket (2048..12288) is a 512-multiple, so
    promote the prompt bucket to 512 there: the <=448 extra rows cost
    ~(total'/total)^2 in attention but flash pays ~1.6x back — measured
    net 1.27x at mel2048+prompt256, 1.16x at +prompt128, ~1.4x at
    mel4096 (scripts/profile_stockflash_blocks.py)."""
    if p_len <= 0:
        # a zero-length prompt is the no-prompt graph — mapping it to the
        # 64 bucket would compile a distinct (t_text, t_mel, 64, steps)
        # graph (minutes cold on this platform) for nothing
        return 0
    t = pick_bucket(p_len, PROMPT_BUCKETS[1:])
    # promote only when the promoted total is actually flash-eligible —
    # at the non-512-aligned 15000 cap bucket the promotion would pay the
    # pad without ever firing the gate
    if t_mel >= 2048 and t_mel % 512 == 0 and (t_mel + t) % 512:
        t = PROMPT_BUCKETS[-1]
    return t
