"""LIVE cross-parity: reference TextMelDataset/Collate vs train.datamodule.

Runs the reference's OWN data pipeline (jyutvoice/data/
text_mel_datamodule.py) in-process — text frontend via refshim_text
(identical reading data both sides), librosa.filters.mel backed by our own
slaney filterbank (identical mel weights both sides, so the mel comparison
checks the torch.stft-vs-matmul-DFT math live inside the dataset context)
— and asserts our row_to_example + collate produce the same batches:

  * string rows (text/lang/phone) through g2p + intersperse,
  * on-the-fly mel from raw audio (reference computes mel in get_datapoint),
  * the token_mel_ratio trim incl. the reference's unit-mixing quirk
    (min(mel_frames/ratio, decoder_h FRAMES) shortens mel when decoder_h
    is short),
  * zero-pad collate with fix_len_compatibility'd mel length.

Known deliberate divergences (documented in PARITY.md):
  * f_max: the reference's live yaml has f_max=null (-> sr/2 = 12 kHz) for
    TRAINING mels while its own inference prompt features use fmax=8000
    (infer.py:177) — an upstream inconsistency. We use 8000 everywhere
    (consistent with the frozen CosyVoice2 vocoder); the cross-test
    constructs the reference dataset with f_max=8000 to compare the rest.
  * precomputed-int rows: the reference expects post-intersperse ids; our
    prepare_dataset stores raw text_to_sequence ids and intersperses at
    load (self-consistent either way) — not cross-comparable, not tested.
"""

import os

import numpy as np
import pytest
import refshim
import refshim_text

if not os.path.isdir(refshim_text.REF_PATH):  # pragma: no cover
    pytest.skip("reference checkout not present", allow_module_level=True)

refshim.install()
refshim_text.install()
refshim_text.install_data()

from jyutvoice.data.text_mel_datamodule import (  # noqa: E402
    TextMelBatchCollate,
    TextMelDataset,
)

from jyutvoice_tpu.audio.mel import MelSpec  # noqa: E402
from jyutvoice_tpu.train.datamodule import (  # noqa: E402
    DataConfig,
    collate,
    row_to_example,
)

SR = 24000
MEL_KW = dict(
    n_fft=1920, n_mels=80, sample_rate=SR, hop_length=480, win_length=1920,
    f_min=0.0, f_max=8000,
)


def _audio(n, seed):
    rng = np.random.default_rng(seed)
    return np.clip(rng.standard_normal(n) * 0.1, -1, 1).astype(np.float32)


def _case_rows():
    """(ref_row, our_row) pairs covering the cross-testable branches."""
    rng = np.random.default_rng(7)
    cases = []

    def add(text, lang, phone, n_samples, seed, spk=None, dh_frames=None):
        wav = _audio(n_samples, seed)
        ref = {
            "text": text,
            "lang": lang,
            "phone": phone,
            "audio": {"array": wav, "path": None, "sampling_rate": SR},
        }
        ours = {"text": text, "lang": lang, "phone": phone, "audio": wav}
        if spk is not None:
            ref["spk_emb"] = spk
            ours["spk_emb"] = spk
        if dh_frames is not None:
            dh = rng.standard_normal((dh_frames, 80)).astype(np.float32)
            ref["decoder_h"] = dh
            ours["decoder_h"] = dh
        cases.append((ref, ours))

    add("佢 邊係", "yue", "keoi5 bin1 hai6", 24000, 0)
    add("hello world", "en", None, 36001, 1,
        spk=rng.standard_normal(192).astype(np.float32))
    # frame-rate decoder_h matching the mel length (75 frames for 36000)
    add("你好", "zh", "ni3 hao3", 36000, 2, dh_frames=75)
    # SHORT decoder_h triggers the reference's unit-mixing trim quirk:
    # token_len = min(75 // 2, 10) = 10 -> mel trimmed to 20 frames
    add("世界", "yue", "sai3 gaai3", 36000, 3, dh_frames=10)
    return cases


@pytest.fixture(scope="module")
def pipelines(tmp_path_factory):
    ref_ds = TextMelDataset(
        dataset=[],
        add_blank=True,
        token_mel_ratio=2,
        tmp_dir=str(tmp_path_factory.mktemp("ref_tmp")),
        **MEL_KW,
    )
    ref_collate = TextMelBatchCollate(n_mels=80)
    cfg = DataConfig(add_blank=True, token_mel_ratio=2, bucket_text=False)
    mel = MelSpec(sr=SR, n_fft=1920, hop=480, win_length=1920, n_mels=80,
                  fmin=0.0, fmax=8000.0)
    return ref_ds, ref_collate, cfg, mel


def test_datapoints_match(pipelines):
    ref_ds, _, cfg, mel = pipelines
    for ref_row, our_row in _case_rows():
        dp = ref_ds.get_datapoint(ref_row)
        ex = row_to_example(our_row, cfg, mel_fn=mel)
        assert dp is not None and ex is not None
        label = ref_row["text"]
        assert list(np.asarray(dp["x"])) == list(ex["x"]), label
        assert list(np.asarray(dp["tone"])) == list(ex["tone"]), label
        assert list(np.asarray(dp["word_pos"])) == list(ex["word_pos"]), label
        assert (
            list(np.asarray(dp["syllable_pos"])) == list(ex["syllable_pos"])
        ), label
        assert list(np.asarray(dp["lang"])) == list(ex["lang"]), label
        ref_mel = np.asarray(dp["y"]).T  # (n_mels, T) -> (T, n_mels)
        assert ref_mel.shape == ex["mel"].shape, label
        np.testing.assert_allclose(ref_mel, ex["mel"], atol=5e-4, rtol=0)
        np.testing.assert_allclose(
            np.asarray(dp["spk_emb"]), ex["spk_emb"], atol=0
        )


def test_collated_batch_matches(pipelines):
    ref_ds, ref_collate, cfg, mel = pipelines
    rows = _case_rows()
    ref_batch = ref_collate([ref_ds.get_datapoint(r) for r, _ in rows])
    our_batch = collate(
        [row_to_example(r, cfg, mel_fn=mel) for _, r in rows], cfg
    )

    assert list(np.asarray(ref_batch["x_lengths"])) == list(
        our_batch["x_lengths"]
    )
    assert list(np.asarray(ref_batch["y_lengths"])) == list(
        our_batch["y_lengths"]
    )
    for key in ("x", "lang", "tone", "word_pos", "syllable_pos"):
        np.testing.assert_array_equal(
            np.asarray(ref_batch[key]), our_batch[key], err_msg=key
        )
    # reference y is (B, n_mels, T); ours channels-last (B, T, n_mels)
    np.testing.assert_allclose(
        np.asarray(ref_batch["y"]).transpose(0, 2, 1),
        our_batch["y"],
        atol=5e-4,
        rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(ref_batch["decoder_h"]), our_batch["decoder_h"], atol=0
    )
    np.testing.assert_allclose(
        np.asarray(ref_batch["spk_embed"]), our_batch["spk_embed"], atol=0
    )
    assert ref_batch["durations"] is None


def test_short_decoder_h_trim_quirk(pipelines):
    """The reference trims mel to ratio * decoder_h_frames when decoder_h
    is shorter than mel_frames/ratio (unit-mixing quirk, replicated)."""
    _, _, cfg, mel = pipelines
    wav = _audio(36000, 3)  # 75 mel frames
    dh = np.zeros((10, 80), np.float32)
    ex = row_to_example(
        {"text": "世界", "lang": "yue", "phone": "sai3 gaai3",
         "audio": wav, "decoder_h": dh},
        cfg,
        mel_fn=mel,
    )
    assert ex["mel"].shape[0] == 20  # 2 * min(75 // 2, 10)
    assert ex["decoder_h"].shape[0] == 20  # zero-padded past frame 10
    assert np.all(ex["decoder_h"][10:] == 0)


def test_property_random_rows(pipelines):
    """Seeded sweep of random rows across the branch space: audio lengths
    off the hop grid, decoder_h around the trim-quirk boundary (shorter /
    equal / longer than mel_frames//ratio), spk_emb present/absent, raw
    vs explicit-phone text — datapoints must match the reference's."""
    import random

    ref_ds, ref_collate, cfg, mel = pipelines
    rng = random.Random(0xDA7A)
    nrng = np.random.default_rng(0xDA7A)
    texts = [
        ("佢", "yue", "keoi5"),
        ("你好", "zh", "ni3 hao3"),
        ("hello", "en", None),
        ("世界 好", "yue", "sai3 gaai3 hou2"),
    ]
    pairs = []
    for i in range(14):
        text, lang, phone = rng.choice(texts)
        n_samples = rng.randrange(24000, 90000)
        wav = _audio(n_samples, 100 + i)
        ref_row = {
            "text": text, "lang": lang, "phone": phone,
            "audio": {"array": wav, "path": None, "sampling_rate": SR},
        }
        our_row = {"text": text, "lang": lang, "phone": phone, "audio": wav}
        if rng.random() < 0.5:
            spk = nrng.standard_normal(192).astype(np.float32)
            ref_row["spk_emb"] = spk
            our_row["spk_emb"] = spk
        if rng.random() < 0.7:
            mel_frames = n_samples // 480
            # below / at / above the mel_frames//ratio boundary
            dh_frames = max(1, mel_frames // 2 + rng.randrange(-12, 13))
            dh = nrng.standard_normal((dh_frames, 80)).astype(np.float32)
            ref_row["decoder_h"] = dh
            our_row["decoder_h"] = dh
        pairs.append((ref_row, our_row))

    for ref_row, our_row in pairs:
        dp = ref_ds.get_datapoint(ref_row)
        ex = row_to_example(our_row, cfg, mel_fn=mel)
        label = f"{ref_row['text']} n={len(our_row['audio'])}"
        assert (dp is None) == (ex is None), label
        if dp is None:
            continue
        assert list(np.asarray(dp["x"])) == list(ex["x"]), label
        ref_mel = np.asarray(dp["y"]).T
        assert ref_mel.shape == ex["mel"].shape, label
        np.testing.assert_allclose(ref_mel, ex["mel"], atol=5e-4, rtol=0)
        # the reference datapoint leaves a short decoder_h UNPADDED
        # (collate zero-pads later); we pad at load — same post-collate
        ref_dh = np.asarray(dp["decoder_h"])
        L = ref_dh.shape[0]
        assert ex["decoder_h"].shape[0] == ex["mel"].shape[0], label
        np.testing.assert_allclose(
            ref_dh, ex["decoder_h"][:L], atol=0, err_msg=label
        )
        assert np.all(ex["decoder_h"][L:] == 0), label
        np.testing.assert_allclose(
            np.asarray(dp["spk_emb"]), ex["spk_emb"], atol=0, err_msg=label
        )
