"""Chinese word segmentation (word_pos feature support).

The reference segments zh/yue text with the pydips BERT CWS model before g2p
(infer.py:32,233-236; scripts/prepare_dataset.py:55) so multi-character words
get begin/middle/end word-position labels. pydips is an optional host
dependency here; the fallback treats every character as its own word (all
word_pos = 1), which keeps the pipeline functional with slightly weaker
prosody features.
"""

from __future__ import annotations

import functools
import logging

_log = logging.getLogger(__name__)


@functools.lru_cache(maxsize=1)
def _pydips_model():
    try:
        from pydips import BertModel  # type: ignore

        return BertModel()
    except Exception:
        return None


def word_seg(text: str) -> str:
    """Insert spaces between words. Uses pydips if present, else per-char."""
    if " " in text.strip():
        return text  # already segmented
    model = _pydips_model()
    if model is not None:
        return " ".join(model.cut(text, mode="coarse"))
    _log.debug("pydips unavailable: falling back to per-character segmentation")
    return " ".join(text)
