"""Text frontend tests: symbol-table parity with the reference data files,
jyutping/pinyin parsing, g2p feature tuples, number expansion."""

import importlib.util
import os

import pytest

from jyutvoice_tpu.text import (
    LANGUAGE_CODES,
    cleaned_text_to_sequence,
    intersperse,
    sequence_to_text,
    text_to_sequence,
)
from jyutvoice_tpu.text import cantonese, english, mandarin, multilingual
from jyutvoice_tpu.text.jyutping import JyutpingError, parse_jyutping
from jyutvoice_tpu.text.numbers import normalize_numbers
from jyutvoice_tpu.text.pinyin import split_pinyin_syllable
from jyutvoice_tpu.text.symbols import symbol_to_id, symbols

REF = "/root/reference/jyutvoice/text"


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_symbol_table_matches_reference_data():
    """Recompute the union symbol table from the reference's per-language
    symbol data files and check ids are interchangeable."""
    yue = _load_module(f"{REF}/cantonese/symbols.py", "ref_yue_sym")
    en = _load_module(f"{REF}/english/symbols.py", "ref_en_sym")
    zh = _load_module(f"{REF}/mandarin/symbols.py", "ref_zh_sym")
    all_sym = sorted(set(list(yue.symbols) + list(en.symbols) + list(zh.symbols)))
    ref_symbols = ["_", "SP", "UNK", "!", "?", "…", ",", ".", "'", "-"] + all_sym
    assert symbols == ref_symbols
    assert len(symbols) == 97  # configs/base.yaml:65 n_vocab


@pytest.mark.parametrize(
    "syl,expect",
    [
        ("keoi5", ("k", "eo", "i", "5")),
        ("bin1", ("b", "i", "n", "1")),
        ("soeng2", ("s", "oe", "ng", "2")),
        ("gwong2", ("gw", "o", "ng", "2")),
        ("ng5", ("", "ng", "", "5")),
        ("m4", ("", "m", "", "4")),
        ("aa3", ("", "aa", "", "3")),
        ("ngo5", ("ng", "o", "", "5")),
        ("jyut6", ("j", "yu", "t", "6")),
        ("kwaang1", ("kw", "aa", "ng", "1")),
    ],
)
def test_parse_jyutping(syl, expect):
    assert parse_jyutping(syl) == expect


def test_parse_jyutping_rejects_garbage():
    for bad in ["xyz1", "keoi", "keoi7", "q3"]:
        with pytest.raises(JyutpingError):
            parse_jyutping(bad)


def test_cantonese_g2p_with_jyutping():
    phones, tones, word2ph, word_pos, syllable_pos, lang_ids = cantonese.g2p(
        "佢 係邊 個", jyutping="keoi5 hai6 bin1 go3"
    )
    assert phones == ["_", "k", "eo", "i", "h", "a", "i", "b", "i", "n", "g", "o", "_"]
    assert tones == [0, 5, 5, 5, 6, 6, 6, 1, 1, 1, 3, 3, 0]
    assert syllable_pos == [0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 1, 2, 0]
    # 佢=single word (1), 係邊=two chars (1,3), 個=single (1)
    assert word_pos == [0, 1, 1, 1, 1, 1, 1, 3, 3, 3, 1, 1, 0]
    assert lang_ids == [0] * len(phones)
    assert len(phones) == len(tones) == len(word_pos) == len(syllable_pos)


def test_cantonese_g2p_punctuation():
    phones, tones, word2ph, word_pos, syllable_pos, lang_ids = cantonese.g2p(
        "好 ,", jyutping="hou2 ,"
    )
    assert phones == ["_", "h", "o", "u", ",", "_"]
    assert tones == [0, 2, 2, 2, 0, 0]
    assert syllable_pos == [0, 1, 2, 3, 0, 0]


@pytest.mark.parametrize(
    "syl,expect",
    [
        ("hao3", ("h", "ao3")),
        ("ni3", ("n", "i3")),
        ("zhong1", ("zh", "ong1")),
        ("jiu4", ("j", "iou4")),
        ("hui2", ("h", "uei2")),
        ("lun2", ("l", "uen2")),
        ("ju2", ("j", "v2")),
        ("jun1", ("j", "vn1")),
        ("xue2", ("x", "ve2")),
        ("quan2", ("q", "van2")),
        ("yi1", ("", "i1")),
        ("you3", ("", "iou3")),
        ("wo3", ("", "uo3")),
        ("wen4", ("", "uen4")),
        ("yuan2", ("", "van2")),
        ("er2", ("", "er2")),
        ("zhi4", ("zh", "i4")),
        # non-pinyin comes back with an EMPTY initial (reference
        # mandarin/g2p.py:22-28); the explicit path then gives punctuation
        # syllable_pos=1 — a reference quirk the raw path (pypinyin emits
        # the char for both styles -> initial == final -> 0) does not share
        ("!", ("", "!")),
        (".", ("", ".")),
    ],
)
def test_split_pinyin_syllable(syl, expect):
    assert split_pinyin_syllable(syl) == expect


def test_mandarin_g2p_with_pinyin():
    phones, tones, word2ph, word_pos, syllable_pos, lang_ids = mandarin.g2p(
        "你好 世界 !", pinyin="ni3 hao3 shi4 jie4 !"
    )
    assert phones == ["_", "n", "i", "h", "ao", "sh", "i", "j", "ie", "!", "_"]
    assert tones == [0, 3, 3, 3, 3, 4, 4, 4, 4, 0, 0]
    assert lang_ids == [1] * len(phones)
    # reference quirk (replicated): explicit-pinyin punctuation takes the
    # syllable branch — ('', '!') fails the initial==final punctuation
    # check — so it gets position 1, unlike the raw-text path's 0
    assert syllable_pos[-2] == 1
    # all phones exist in the symbol table
    assert all(p in symbol_to_id for p in phones)


@pytest.mark.skipif(
    english.find_cmudict() is None, reason="no cmudict data file available"
)
def test_english_g2p_basic():
    phones, tones, word2ph, word_pos, syllable_pos, lang_ids = english.g2p(
        "hello world"
    )
    assert phones[0] == "_" and phones[-1] == "_"
    inner = phones[1:-1]
    # HELLO -> HH AH0 L OW1 ; WORLD -> W ER1 L D
    assert inner[:4] == ["hh", "ah", "l", "ow"]
    assert inner[4:] == ["w", "er", "l", "d"]
    assert tones[1:5] == [1, 1, 1, 2] or tones[1:5] == [3, 1, 3, 2]
    assert lang_ids == [2] * len(phones)
    assert all(p in symbol_to_id for p in phones)
    # stress digit + 1 tones: ow from OW1 -> 2
    assert tones[4] == 2


@pytest.mark.skipif(
    english.find_cmudict() is None, reason="no cmudict data file available"
)
def test_multilingual_g2p():
    phones, tones, word2ph, word_pos, syllable_pos, lang_ids = multilingual.g2p(
        "hello", lang="zh"
    )
    assert phones[0] == "-" and phones[-1] == "_"
    assert lang_ids[1] == 2  # inner chunk english


def test_text_to_sequence_cantonese():
    ids, tones, word_pos, syllable_pos, lang_ids = text_to_sequence(
        "佢", lang="yue", phone="keoi5"
    )
    assert ids == [symbol_to_id[s] for s in ["_", "k", "eo", "i", "_"]]
    assert LANGUAGE_CODES["yue"] == 0
    assert sequence_to_text(ids) == "_keoi_"


def test_intersperse():
    assert intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]
    assert intersperse([], 0) == [0]


@pytest.mark.parametrize(
    "inp,expect",
    [
        # in (1000, 3000) the reference reads numbers year-style (group=2)
        ("1,234", "twelve thirty-four"),
        # inflect keeps ', ' between 3-digit scale groups and hyphenates
        # tens-units compounds (andword='' in the cardinal pass)
        ("3,456", "three thousand, four hundred fifty-six"),
        ("4,000", "four thousand"),
        ("1001", "ten oh one"),  # the (1000, 3000) year branch catches it
        ("5001", "five thousand one"),
        ("3101", "three thousand, one hundred one"),
        ("1234567", "one million, two hundred thirty-four thousand, "
                    "five hundred sixty-seven"),
        # decimals: fraction rendered as a CARDINAL by the final number
        # pass (reference flow), not digit-by-digit; '0.05' loses its
        # leading zero exactly like the reference does
        ("3.14", "three point fourteen"),
        ("0.5", "zero point five"),
        ("0.05", "zero point five"),
        ("$5", "five dollars"),
        ("$1.01", "one dollar, one cent"),
        ("$0.50", "fifty cents"),
        # money amounts in (1000, 3000) read year-style: the reference
        # emits digits and its final pass applies the year rule
        ("$1,234", "twelve thirty-four dollars"),
        ("£20", "twenty pounds"),
        ("£1984", "nineteen eighty-four pounds"),
        # ordinals go through inflect's DEFAULT andword ('and')
        ("1st", "first"),
        ("3rd", "third"),
        ("22nd", "twenty-second"),
        ("60th", "sixtieth"),
        ("101st", "one hundred and first"),
        ("1001st", "one thousand and first"),
        ("2000", "two thousand"),
        ("2003", "two thousand three"),
        ("1900", "nineteen hundred"),
        ("1984", "nineteen eighty-four"),
        ("17", "seventeen"),
    ],
)
def test_normalize_numbers(inp, expect):
    assert normalize_numbers(inp) == expect


def test_normalize_numbers_mixed():
    out = normalize_numbers("I paid $3.50 for 1,000 apples on 1st Jan 2000.")
    assert "three dollars, fifty cents" in out
    assert "one thousand" in out
    assert "first" in out
    assert "two thousand" in out


def test_malformed_decimal_passthrough():
    assert "1.2.3" not in normalize_numbers("$1.2.3")


def test_replace_punctuation_languages():
    from jyutvoice_tpu.text.cleaners import replace_punctuation, text_normalize

    # full-width -> ascii mapping, CJK-only filter for yue/zh
    assert replace_punctuation("你好，世界！", lang="yue") == "你好,世界!"
    # latin letters dropped for yue/zh
    assert replace_punctuation("你好abc，", lang="zh") == "你好,"
    # en keeps isalpha() + punct, drops spaces — NB: CJK chars are isalpha()
    # in Python, so they survive (reference cleaners.py:59-66 behavior)
    assert replace_punctuation("Hello， 你好 world.", lang="en") == "Hello,你好world."
    # multilingual keeps both
    assert replace_punctuation("Hi 你好！", lang="multilingual") == "Hi你好!"
    # brackets/quotes collapse to apostrophe; tilde to dash
    assert replace_punctuation("《書》~", lang="yue") == "'書'-"
    assert text_normalize("  你好。 ", lang="yue") == "你好."
    with pytest.raises(ValueError):
        replace_punctuation("x", lang="fr")


def test_clean_text_rejects_unknown_lang():
    from jyutvoice_tpu.text.cleaners import clean_text

    with pytest.raises(ValueError):
        clean_text("hi", lang="de")


def test_word_seg_fallback():
    from jyutvoice_tpu.text.word_seg import word_seg

    # already segmented -> unchanged
    assert word_seg("你好 世界") == "你好 世界"
    # unsegmented without pydips -> lexicon or per-char, never unsegmented
    out = word_seg("你好世界")
    assert " " in out


def test_word_seg_dict_fallback_recovers_words(caplog):
    """Without pydips the bundled-lexicon greedy matcher keeps common
    multi-char words intact (B/E word_pos structure), and the degradation
    warns loudly exactly once."""
    import logging

    import jyutvoice_tpu.text.word_seg as ws
    from jyutvoice_tpu.text import cantonese

    if ws._pydips_model() is not None:
        pytest.skip("pydips installed: fallback path not active")

    ws._warned = False
    with caplog.at_level(logging.WARNING, logger="jyutvoice_tpu.text.word_seg"):
        seg = ws.word_seg("我哋而家食飯")
    assert seg == "我哋 而家 食飯"
    assert any("pydips" in r.message for r in caplog.records)

    # warning is one-time
    with caplog.at_level(logging.WARNING, logger="jyutvoice_tpu.text.word_seg"):
        n_before = len(caplog.records)
        ws.word_seg("我哋而家食飯")
    assert len(caplog.records) == n_before

    # word_pos labels show B/E structure, unlike the per-char collapse
    _, _, _, word_pos, _, _ = cantonese.g2p(
        seg, jyutping="ngo5 dei6 ji4 gaa1 sik6 faan6"
    )
    assert 2 in word_pos or 3 in word_pos  # non-single-char word labels


def test_dict_seg_unmatched_chars_single():
    from jyutvoice_tpu.text.word_seg import dict_seg

    # chars absent from the lexicon become single-char words
    out = dict_seg("鑫淼")
    assert out == "鑫 淼"
    # mixed: lexicon word + OOV char
    assert dict_seg("香港鑫") == "香港 鑫"


def test_jyutping_roundtrip_exhaustive():
    """Every valid onset+nucleus+coda+tone combination parses back to its
    construction. Excluded: syllabic-nasal nuclei (m/n/ng) with a coda and
    no onset — not valid jyutping; the parser correctly reads those strings
    as onset + vowel-less forms instead."""
    onsets = [""] + "b d g gw z p t k kw c m n ng f h s l w j".split()
    nucleuses = "aa a i yu u oe e eo o m n ng".split()
    codas = [""] + "p t k m n ng i u".split()
    checked = 0
    for o in onsets:
        for nu in nucleuses:
            for c in codas:
                if o == "" and nu in ("m", "n", "ng") and c != "":
                    continue  # invalid jyutping (ambiguous surface string)
                syl = f"{o}{nu}{c}3"
                assert parse_jyutping(syl) == (o, nu, c, "3"), syl
                checked += 1
    assert checked > 2000


def test_pinyin_roundtrip_initial_finals():
    """initial+final surface forms split back to (initial, final)."""
    from jyutvoice_tpu.text.symbols import MANDARIN_FINALS, MANDARIN_INITIALS

    # surface abbreviations expand to the strict final after an initial
    expands = {"iu": "iou", "ui": "uei", "un": "uen"}
    # strict-only spellings never appear in full after an initial
    skipped = {"iou", "uei", "uen"}
    checked = 0
    for ini in MANDARIN_INITIALS:
        for fin in MANDARIN_FINALS:
            if fin in skipped or fin.startswith("v") or fin == "er":
                continue
            if ini in ("j", "q", "x") and fin.startswith("u"):
                # written u after j/q/x is phonemic v; no iu/ui/un expansion
                expect = "v" + fin[1:]
            else:
                expect = expands.get(fin, fin)
            got = split_pinyin_syllable(f"{ini}{fin}2")
            assert got == (ini, expect + "2"), (ini, fin, got)
            checked += 1
    assert checked > 500
