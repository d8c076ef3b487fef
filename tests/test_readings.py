"""Bundled hanzi-reading fallback: table validity + raw-text g2p goldens.

The reference needs ToJyutping/pypinyin for raw Chinese text (reference
text/cantonese/g2p.py:66-84, text/mandarin/g2p.py:13-19); neither is
installed here, so these tests exercise the bundled curated tables
(text/data_jyutping.py, text/data_pinyin.py) end to end.
"""

import ast

import pytest

from jyutvoice_tpu.text import text_to_sequence
from jyutvoice_tpu.text import data_jyutping, data_pinyin
from jyutvoice_tpu.text.cleaners import clean_text
from jyutvoice_tpu.text.jyutping import parse_jyutping
from jyutvoice_tpu.text.readings import (
    jyutping_readings,
    pinyin_readings,
    split_pinyin_loose,
)
from jyutvoice_tpu.text.symbols import symbol_to_id


# ---------------------------------------------------------------------------
# table integrity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "path",
    [
        "jyutvoice_tpu/text/data_jyutping.py",
        "jyutvoice_tpu/text/data_pinyin.py",
    ],
)
def test_no_conflicting_duplicate_keys(path):
    """Python dict literals silently keep the last duplicate key — catch
    conflicting duplicates at the source level."""
    tree = ast.parse(open(path).read())
    conflicts = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            seen = {}
            for k, v in zip(node.keys, node.values):
                if isinstance(k, ast.Constant):
                    val = ast.literal_eval(v)
                    if k.value in seen and val != seen[k.value]:
                        conflicts.append((k.value, seen[k.value], val))
                    seen[k.value] = val
    assert not conflicts, conflicts


def test_jyutping_table_valid():
    for table in (data_jyutping.WORDS, data_jyutping.CHARS):
        for key, reading in table.items():
            syls = reading.split()
            assert len(syls) == len(key), (key, reading)
            for s in syls:
                onset, nucleus, coda, tone = parse_jyutping(s)
                for part in (onset, nucleus, coda):
                    assert part == "" or part in symbol_to_id, (key, s, part)
                assert 1 <= int(tone) <= 6


def test_pinyin_table_valid():
    for table in (data_pinyin.WORDS, data_pinyin.CHARS):
        for key, reading in table.items():
            syls = reading.split()
            assert len(syls) == len(key), (key, reading)
            for s in syls:
                initial, final = split_pinyin_loose(s)
                tone = final[-1] if final and final[-1].isdigit() else ""
                base = final[:-1] if tone else final
                for part in (initial, base):
                    assert part == "" or part in symbol_to_id, (key, s, part)
                assert tone == "" or 1 <= int(tone) <= 4


# ---------------------------------------------------------------------------
# lookup behavior
# ---------------------------------------------------------------------------


def test_jyutping_readings_word_exception():
    # 銀行 must take the hong4 reading, standalone 行 the hang4 default
    assert jyutping_readings("銀行") == ["ngan4", "hong4"]
    assert jyutping_readings("行") == ["hang4"]


def test_pinyin_readings_word_exception():
    assert pinyin_readings("银行") == ["yin2", "hang2"]
    assert pinyin_readings("快乐") == ["kuai4", "le4"]
    assert pinyin_readings("音乐") == ["yin1", "yue4"]


def test_readings_unknown_char_raises():
    with pytest.raises(ValueError, match="not in the bundled"):
        jyutping_readings("龘")
    with pytest.raises(ValueError, match="not in the bundled"):
        pinyin_readings("龘")


def test_punctuation_passthrough():
    assert jyutping_readings("係!") == ["hai6", "!"]
    assert pinyin_readings("是!") == ["shi4", "!"]


def test_split_pinyin_loose():
    assert split_pinyin_loose("wo3") == ("w", "o3")
    assert split_pinyin_loose("you3") == ("y", "ou3")
    assert split_pinyin_loose("an1") == ("", "an1")
    assert split_pinyin_loose("zhong1") == ("zh", "ong1")
    assert split_pinyin_loose("de") == ("d", "e")
    assert split_pinyin_loose("!") == ("!", "!")


# ---------------------------------------------------------------------------
# raw-text g2p goldens (no ToJyutping/pypinyin installed in this env)
# ---------------------------------------------------------------------------


def test_yue_raw_text_golden():
    """BASELINE config-style raw Cantonese without --phone."""
    _norm, phones, tones, word_pos, syllable_pos, lang_ids = clean_text(
        "佢係邊個", lang="yue", padding=True
    )
    # keoi5 hai6 bin1 go3 -> onset/nucleus/coda decomposition per char
    assert phones == ["_", "k", "eo", "i", "h", "a", "i", "b", "i", "n",
                      "g", "o", "_"]
    assert tones == [0, 5, 5, 5, 6, 6, 6, 1, 1, 1, 3, 3, 0]
    assert lang_ids == [0] * len(phones)
    assert len(phones) == len(word_pos) == len(syllable_pos)


def test_zh_raw_text_golden():
    _norm, phones, tones, _wp, _sp, lang_ids = clean_text(
        "我们是朋友", lang="zh", padding=True
    )
    # wo3 men shi4 peng2 you3 (strict=False: y/w initials, neutral tone 0)
    assert phones == ["_", "w", "o", "m", "en", "sh", "i", "p", "eng",
                      "y", "ou", "_"]
    assert tones == [0, 3, 3, 0, 0, 4, 4, 2, 2, 3, 3, 0]
    assert lang_ids == [1] * len(phones)


def test_multilingual_raw_text():
    """Mixed CJK/English sentence runs end-to-end with zero optional deps."""
    ids, tones, word_pos, syllable_pos, lang_ids = text_to_sequence(
        "我今日去公園", lang="multilingual"
    )
    assert len(ids) == len(tones) == len(word_pos) == len(syllable_pos)
    assert all(i >= 0 for i in ids)


def test_yue_raw_text_to_sequence_ids():
    ids, tones, word_pos, syllable_pos, lang_ids = text_to_sequence(
        "佢係邊個", lang="yue"
    )
    assert ids == [symbol_to_id[s] for s in
                   ["_", "k", "eo", "i", "h", "a", "i", "b", "i", "n",
                    "g", "o", "_"]]


def test_lexicon_words_fully_covered():
    """Every word the bundled word-seg lexicon can emit must be readable in
    BOTH tables (the segmenter's own vocabulary is the minimum bar)."""
    from jyutvoice_tpu.text.lexicon import COMMON_WORDS

    for w in COMMON_WORDS:
        assert jyutping_readings(w), w
        assert pinyin_readings(w), w
