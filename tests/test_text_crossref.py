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


# ---------------------------------------------------------------------------
# Seeded property sweep: hundreds of RANDOM inputs per mode, built from the
# very tables both sides share, so any assembly divergence (tone parsing,
# word_pos grouping, padding, punctuation routing) surfaces on inputs no one
# hand-picked. Deterministic seed -> reproducible failures.
# ---------------------------------------------------------------------------

import random  # noqa: E402

from jyutvoice_tpu.text import data_jyutping, data_pinyin  # noqa: E402
from jyutvoice_tpu.text.english import get_dict  # noqa: E402

_PUNCT = [",", ".", "!", "?"]


def _random_cjk_words(rng, chars, n_words):
    """List of 1-3 char 'words' sampled from a bundled reading table."""
    return [
        "".join(rng.choices(chars, k=rng.randint(1, 3)))
        for _ in range(n_words)
    ]


def test_property_yue_raw_and_explicit():
    rng = random.Random(0xA11CE)
    # single-char entries only: the tables also carry multi-char words
    # whose constituent chars may have no standalone reading
    chars = sorted(k for k in data_jyutping.CHARS if len(k) == 1)
    for _ in range(40):
        words = _random_cjk_words(rng, chars, rng.randint(1, 5))
        if rng.random() < 0.4:
            words.append(rng.choice(_PUNCT))
        text = " ".join(words)
        _assert_same(text, "yue")  # raw-hanzi path
        # explicit path validates one syllable per char — punctuation
        # included (it rides the phone string as itself)
        phone = " ".join(
            data_jyutping.CHARS.get(c, c) for w in words for c in w
        )
        _assert_same(text, "yue", phone)  # explicit-jyutping path


def test_property_zh_raw_and_explicit():
    rng = random.Random(0xB0BA)
    chars = sorted(k for k in data_pinyin.CHARS if len(k) == 1)
    for _ in range(40):
        words = _random_cjk_words(rng, chars, rng.randint(1, 5))
        if rng.random() < 0.4:
            words.append(rng.choice(_PUNCT))
        text = " ".join(words)
        _assert_same(text, "zh")
        syls = [data_pinyin.CHARS.get(c, c) for w in words for c in w]
        # neutral-tone table readings are toneless ('me') — explicit input
        # requires a tone digit on BOTH sides (the reference's splitter
        # regex rejects toneless syllables into a crashing corner)
        if all(s[-1].isdigit() or s in _PUNCT for s in syls):
            _assert_same(text, "zh", " ".join(syls))


def test_property_en_raw():
    rng = random.Random(0xCAFE)
    words = sorted(
        w for w in get_dict() if w.isalpha() and w.isascii() and len(w) > 1
    )
    for _ in range(40):
        picks = [rng.choice(words).lower() for _ in range(rng.randint(2, 7))]
        if rng.random() < 0.5:
            picks.insert(rng.randrange(len(picks) + 1), rng.choice(_PUNCT))
        _assert_same(" ".join(picks), "en")


def test_property_multilingual_mixed():
    rng = random.Random(0xD1CE)
    yue_chars = sorted(data_jyutping.CHARS)
    en_words = sorted(
        w for w in get_dict() if w.isalpha() and w.isascii() and len(w) > 1
    )
    for _ in range(40):
        parts = []
        for _ in range(rng.randint(2, 5)):
            if rng.random() < 0.5:
                parts.append("".join(rng.choices(yue_chars, k=rng.randint(1, 3))))
            else:
                parts.append(rng.choice(en_words).lower())
            if rng.random() < 0.25:
                parts.append(rng.choice(_PUNCT))
        _assert_same(" ".join(parts), "multilingual")
