"""LIVE cross-parity: reference jyutvoice.text vs jyutvoice_tpu.text.

Runs the reference's OWN text frontend (cleaners -> per-language g2p ->
symbol ids; /root/reference/jyutvoice/text/) in-process via refshim_text
(reading dictionaries backed by our bundled tables on BOTH sides, so any
difference below is an assembly-logic divergence, not a data difference)
and asserts the full 5-tuple — ids, tones, word_pos, syllable_pos,
lang_ids — is identical to ours for every input mode:

  * Cantonese explicit-jyutping and raw hanzi,
  * Mandarin explicit-pinyin and raw hanzi,
  * English raw text (CMUdict words; OOV is a documented divergence),
  * multilingual mixed text (Chinese runs default to Cantonese).

This upgrades the frontend's parity evidence from frozen self-goldens
(test_text_golden.py) to a live comparison against reference code.
"""

import os

import pytest

import refshim_text

if not os.path.isdir(refshim_text.REF_PATH):  # pragma: no cover
    pytest.skip("reference checkout not present", allow_module_level=True)

refshim_text.install()

import jyutvoice.text as ref_text  # noqa: E402  (needs install() first)

from jyutvoice_tpu.text import text_to_sequence  # noqa: E402


def _both(text, lang, phone=None):
    ref = ref_text.text_to_sequence(text, lang=lang, phone=phone)
    ours = text_to_sequence(text, lang=lang, phone=phone)
    return ref, ours


def _assert_same(text, lang, phone=None):
    ref, ours = _both(text, lang, phone)
    names = ["ids", "tones", "word_pos", "syllable_pos", "lang_ids"]
    for name, r, o in zip(names, ref, ours):
        assert list(r) == list(o), f"{lang} {text!r}: {name} diverges"


YUE_TEXT = "佢 邊係 想 辭工 吖"
YUE_PHONE = "keoi5 bin1 hai6 soeng2 ci4 gung1 aa1"


def test_yue_explicit_jyutping():
    _assert_same(YUE_TEXT, "yue", YUE_PHONE)


def test_yue_explicit_jyutping_with_punctuation():
    _assert_same("你好 .", "yue", "nei5 hou2 .")


def test_yue_raw_hanzi():
    _assert_same(YUE_TEXT, "yue")


def test_zh_explicit_pinyin():
    _assert_same("你好 世界", "zh", "ni3 hao3 shi4 jie4")


def test_zh_raw_hanzi():
    _assert_same("你好 世界", "zh")


@pytest.mark.parametrize(
    "sentence",
    [
        "hello world",
        "I don't know.",
        "The quick brown fox jumps over the lazy dog!",
        "wait, what?",
    ],
)
def test_en_raw(sentence):
    _assert_same(sentence, "en")


def test_multilingual_mixed():
    _assert_same("Hello 世界", "multilingual")


def test_multilingual_starts_chinese():
    _assert_same("你好 world", "multilingual")


@pytest.mark.parametrize(
    "text,lang",
    [
        # CJK punctuation through rep_map (，。 -> , .)
        ("你好，世界。", "yue"),
        # bracket/tilde/ellipsis rewrites (「」-> ', ～ -> -, … kept)
        ("「你好」～世界…", "yue"),
        # digits are stripped by replace_punctuation for CJK langs
        ("你好2026世界", "yue"),
        # contractions join into one CMUdict lookup ("I'M", "IT'S")
        ("I'm fine, thanks!", "en"),
        ("it's a test... really?", "en"),
        # whitespace collapse in clean_text
        ("what's   up", "en"),
        # punctuation rides the non-Chinese segments in multilingual
        ("Hello, 世界! Good 你好?", "multilingual"),
    ],
)
def test_edge_cases(text, lang):
    _assert_same(text, lang)
