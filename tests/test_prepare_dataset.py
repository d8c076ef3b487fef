"""Dataset preparation CLI on a synthetic HF dataset (no ONNX models:
spk_emb falls back to zeros, decoder_h absent — the reference's smoke path)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

datasets = pytest.importorskip("datasets")


def _synth_dataset(tmp_path, n=4):
    rng = np.random.default_rng(0)
    rows = {
        "text": ["佢 好"] * n,
        "phone": ["keoi5 hou2"] * n,
        "lang": ["yue"] * n,
        "audio": [
            {
                "array": rng.uniform(-0.3, 0.3, 24000).astype(np.float32),
                "sampling_rate": 24000,
            }
            for _ in range(n)
        ],
    }
    ds = datasets.Dataset.from_dict(rows)
    path = str(tmp_path / "raw")
    ds.save_to_disk(path)
    return path


def test_prepare_dataset_cli(tmp_path):
    from jyutvoice_tpu.cli.prepare_dataset import main

    raw = _synth_dataset(tmp_path)
    out = str(tmp_path / "prepared")
    main(["--input", raw, "--output", out, "--lang", "yue"])

    ds = datasets.load_from_disk(out)
    assert len(ds) == 4
    row = ds[0]
    assert row["audio_processed"] is True
    assert len(row["phone_ids"]) == len(row["tones"]) == len(row["word_pos"])
    assert len(row["mel"]) == 50  # 1 s -> 50 frames
    assert len(row["mel"][0]) == 80
    assert len(row["spk_emb"]) == 192  # zeros fallback without campplus

    # prepared rows feed the datamodule directly
    from jyutvoice_tpu.train.datamodule import DataConfig, TextMelDataModule

    dm = TextMelDataModule(out, DataConfig(batch_size=2, valid_ratio=0.25))
    batch = next(iter(dm.train_batches()))
    assert batch["y"].shape[-1] == 80
    assert batch["x"].shape[0] == 2


def test_prepare_dataset_device_batch_matches_per_row(tmp_path):
    """--device-batch output == per-row output (zeros-spk smoke path), and a
    bad row is isolated instead of poisoning its batch."""
    from jyutvoice_tpu.cli.prepare_dataset import main

    rng = np.random.default_rng(0)
    rows = {
        "text": ["佢 好"] * 4,
        "phone": ["keoi5 hou2"] * 4,
        "lang": ["yue"] * 4,
        "audio": [
            {
                "array": rng.uniform(-0.3, 0.3, n).astype(np.float32),
                "sampling_rate": 24000,
            }
            # row 2 is too short for the mel frontend -> must fail alone
            for n in (24000, 36000, 100, 24000)
        ],
    }
    raw = str(tmp_path / "raw")
    datasets.Dataset.from_dict(rows).save_to_disk(raw)

    per_row = str(tmp_path / "per_row")
    batched = str(tmp_path / "batched")
    main(["--input", raw, "--output", per_row, "--lang", "yue"])
    main(["--input", raw, "--output", batched, "--lang", "yue",
          "--device-batch", "3"])

    a = datasets.load_from_disk(per_row)
    b = datasets.load_from_disk(batched)
    assert len(a) == len(b) == 3  # the short row was dropped in both
    for ra, rb in zip(a, b):
        assert ra["phone_ids"] == rb["phone_ids"]
        assert ra["spk_emb"] == rb["spk_emb"]
        np.testing.assert_allclose(
            np.asarray(ra["mel"]), np.asarray(rb["mel"]), atol=1e-4, rtol=1e-4
        )


def test_prepare_dataset_shard_and_merge(tmp_path):
    from jyutvoice_tpu.cli.prepare_dataset import main

    raw = _synth_dataset(tmp_path, n=4)
    shards = []
    for rank in range(2):
        out = str(tmp_path / f"shard{rank}")
        main(["--input", raw, "--output", out, "--lang", "yue",
              "--rank", str(rank), "--worlds", "2"])
        shards.append(out)
    merged = str(tmp_path / "merged")
    main(["--output", merged, "--merge", *shards])
    ds = datasets.load_from_disk(merged)
    assert len(ds) == 4


def test_prepare_dataset_missing_input_is_usage_error(tmp_path):
    """No --input and no --merge must be an argparse usage error (SystemExit),
    not a TypeError from os.path.isdir(None) after the heavy imports."""
    from jyutvoice_tpu.cli.prepare_dataset import main

    with pytest.raises(SystemExit):
        main(["--output", str(tmp_path / "out")])
    with pytest.raises(SystemExit):
        main(["--output", str(tmp_path / "out"), "--merge"])
