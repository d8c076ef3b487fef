"""Stubs so the PUBLIC reference's TEXT frontend imports and runs here.

The reference text stack (jyutvoice/text/*) needs pypinyin, pycantonese,
ToJyutping, g2p_en and a sentencepiece DebertaV2 tokenizer — none installed
in this environment. For LIVE cross-parity tests we import the reference's
own text modules with those seams substituted:

  * pypinyin / pycantonese / ToJyutping are backed by jyutvoice_tpu's own
    bundled reading tables and parsers, so both sides consume IDENTICAL
    dictionary data and the cross-tests exercise the reference's assembly
    code (tones, word_pos, syllable_pos, padding, cleaners, id mapping) —
    which is exactly the part our rebuild re-implements,
  * g2p_en.G2p raises loudly (cross-tests must use CMUdict words only —
    the OOV fallback is a documented deliberate divergence),
  * DebertaV2Tokenizer becomes a regex word/punct splitter emitting
    sentencepiece-style pieces, mirroring jyutvoice_tpu.text.english's own
    no-deberta fallback (whole words prefixed with "▁", bare punctuation).

The reference writes a cmudict cache pickle next to its (read-only) dict
file at import time; install() redirects that one write to os.devnull.

Import `install()` BEFORE any `jyutvoice.text` import. Test infra only.
"""

from __future__ import annotations

import builtins
import importlib.machinery
import os
import sys
import types

REF_PATH = "/root/reference"

_installed = False


def _module(name):
    """types.ModuleType with a real __spec__ — transformers probes stub
    packages via importlib.util.find_spec, which raises on spec-less
    modules already present in sys.modules."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_pypinyin():
    from jyutvoice_tpu.text.pinyin import split_pinyin_syllable
    from jyutvoice_tpu.text.readings import pinyin_readings, split_pinyin_loose

    pypinyin = _module("pypinyin")

    class Style:
        INITIALS = "INITIALS"
        FINALS_TONE3 = "FINALS_TONE3"

    def _pinyin(word, style=None, strict=True, **kw):
        # raw-text path (reference mandarin/g2p.py::text_to_pinyin) uses
        # strict=False per-word calls; back it with the bundled table
        readings = pinyin_readings(word)
        if style == Style.INITIALS:
            return [[split_pinyin_loose(r)[0]] for r in readings]
        if style == Style.FINALS_TONE3:
            return [[split_pinyin_loose(r)[1]] for r in readings]
        raise NotImplementedError(f"pypinyin stub: style {style!r}")

    pypinyin.Style = Style
    pypinyin.pinyin = _pinyin

    style_pkg = _module("pypinyin.style")
    finals_mod = _module("pypinyin.style.finals")

    class FinalsConverter:
        # explicit-pinyin path (strict=True): 'hao3' -> 'ao3'
        def to_finals_tone3(self, syllable, strict=True):
            return split_pinyin_syllable(syllable)[1]

    finals_mod.FinalsConverter = FinalsConverter
    initials_mod = _module("pypinyin.style.initials")
    initials_mod.convert = (
        lambda syllable, strict=True: split_pinyin_syllable(syllable)[0]
    )
    style_pkg.finals = finals_mod
    style_pkg.initials = initials_mod
    pypinyin.style = style_pkg
    sys.modules["pypinyin"] = pypinyin
    sys.modules["pypinyin.style"] = style_pkg
    sys.modules["pypinyin.style.finals"] = finals_mod
    sys.modules["pypinyin.style.initials"] = initials_mod


def _install_pycantonese():
    from jyutvoice_tpu.text import jyutping as jp
    from jyutvoice_tpu.text.readings import jyutping_readings

    pc = _module("pycantonese")

    class _Parsed:
        def __init__(self, onset, nucleus, coda, tone):
            self.onset = onset
            self.nucleus = nucleus
            self.coda = coda
            self.tone = tone

    def parse_jyutping(syllable):
        return [_Parsed(*jp.parse_jyutping(syllable))]

    def characters_to_jyutping(text):
        # reference word2jyutping() calls this per single character
        return [(text, jyutping_readings(text)[0])]

    pc.parse_jyutping = parse_jyutping
    pc.characters_to_jyutping = characters_to_jyutping
    sys.modules["pycantonese"] = pc


def _install_tojyutping():
    from jyutvoice_tpu.text.readings import jyutping_readings

    tj = _module("ToJyutping")

    def get_jyutping_list(text):
        # one (char, reading) pair per character; punctuation maps to
        # itself (the reference's caller keys punctuation on the WORD)
        return list(zip(text, jyutping_readings(text)))

    tj.get_jyutping_list = get_jyutping_list
    sys.modules["ToJyutping"] = tj


def _install_g2p_en():
    mod = _module("g2p_en")

    class G2p:
        def __init__(self, *a, **kw):
            pass

        def __call__(self, word):
            raise NotImplementedError(
                f"g2p_en stub invoked for OOV word {word!r}: cross-parity "
                "tests must use CMUdict words only (the OOV fallback is a "
                "documented divergence)"
            )

    mod.G2p = G2p
    sys.modules["g2p_en"] = mod


class _StubDebertaTokenizer:
    """Sentencepiece-shaped regex tokenizer: '▁' + word, bare punctuation.

    Emits whole words as single pieces, so the reference's subword
    grouping (english/g2p.py::text_to_words) reduces to one-token words —
    exactly what jyutvoice_tpu.text.english's regex fallback produces
    (same punctuation set and token regex, imported — not copied — so the
    shim cannot drift from the fallback it mirrors).
    """

    _real_cls = None  # original transformers.DebertaV2Tokenizer

    @classmethod
    def from_pretrained(cls, path, *a, **kw):
        # Prefer a REAL tokenizer when this environment can actually load
        # one (sentencepiece + model files present) so both the reference
        # and jyutvoice_tpu.text.english — whose lazy
        # `from transformers import DebertaV2Tokenizer` also resolves to
        # this patched attribute — keep using the genuine article; fall
        # back to the regex stub otherwise.
        if cls._real_cls is not None:
            try:
                return cls._real_cls.from_pretrained(path, *a, **kw)
            except Exception:
                pass
        return cls()

    def tokenize(self, text):
        from jyutvoice_tpu.text.english import _FALLBACK_TOKEN_RE
        from jyutvoice_tpu.text.symbols import punctuations

        return [
            t if t in punctuations else "▁" + t
            for t in _FALLBACK_TOKEN_RE.findall(text)
        ]


def _patch_deberta():
    import transformers

    try:
        # transformers resolves this attr lazily; a missing-backend
        # placeholder is fine (its from_pretrained raises -> stub)
        _StubDebertaTokenizer._real_cls = getattr(
            transformers, "DebertaV2Tokenizer", None
        )
    except Exception:
        _StubDebertaTokenizer._real_cls = None
    transformers.DebertaV2Tokenizer = _StubDebertaTokenizer


def _import_reference_text():
    """Import jyutvoice.text with the reference's read-only cache write
    redirected to os.devnull (english/g2p.py pickles its cmudict next to
    the dict file, which lives on a read-only mount here)."""
    real_open = builtins.open

    def guarded_open(file, mode="r", *a, **kw):
        if (
            isinstance(file, str)
            and file.startswith(REF_PATH)
            and ("w" in mode or "a" in mode or "+" in mode)
        ):
            return real_open(os.devnull, mode, *a, **kw)
        return real_open(file, mode, *a, **kw)

    builtins.open = guarded_open
    try:
        import jyutvoice.text  # noqa: F401
    finally:
        builtins.open = real_open


def install():
    global _installed
    if _installed:
        return
    _install_pypinyin()
    _install_pycantonese()
    _install_tojyutping()
    _install_g2p_en()
    _patch_deberta()
    if REF_PATH not in sys.path:
        sys.path.append(REF_PATH)
    _import_reference_text()
    _installed = True


# ---------------------------------------------------------------------------
# Extra stubs for the reference DATA pipeline (jyutvoice/data/
# text_mel_datamodule.py): torchaudio (kaldi fbank — only the spk-emb
# extraction path uses it) and librosa (filters.mel backed by our own
# slaney filterbank so BOTH mel paths consume identical weights;
# resample/load raise — cross-tests feed sr-matched arrays).
# ---------------------------------------------------------------------------

_data_installed = False


def _install_torchaudio():
    ta = _module("torchaudio")
    compliance = _module("torchaudio.compliance")
    kaldi = _module("torchaudio.compliance.kaldi")

    def _fbank(*a, **kw):
        raise NotImplementedError(
            "torchaudio stub: kaldi fbank unavailable (spk-emb extraction "
            "path is out of scope for datamodule cross-tests)"
        )

    kaldi.fbank = _fbank
    compliance.kaldi = kaldi
    ta.compliance = compliance
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.compliance"] = compliance
    sys.modules["torchaudio.compliance.kaldi"] = kaldi


def _install_librosa():
    from jyutvoice_tpu.audio.mel import mel_filterbank

    lb = _module("librosa")
    filters = _module("librosa.filters")

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    filters.mel = mel

    def _unavailable(*a, **kw):
        raise NotImplementedError(
            "librosa stub: resample/load unavailable — feed sr-matched "
            "float arrays"
        )

    lb.filters = filters
    lb.resample = _unavailable
    lb.load = _unavailable
    sys.modules["librosa"] = lb
    sys.modules["librosa.filters"] = filters


def install_data():
    """Stubs for importing jyutvoice.data.text_mel_datamodule. Call AFTER
    refshim.install() (lightning/whisper/onnxruntime permissive shims) and
    refshim_text.install() (the text frontend the dataset tokenizes with)."""
    global _data_installed
    if _data_installed:
        return
    _install_torchaudio()
    _install_librosa()
    _data_installed = True
