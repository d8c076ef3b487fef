"""Dataset preparation — the analog of the reference's
scripts/prepare_dataset{,2}.py + merge_dataset_shards.py.

Per row: validates the charset, runs g2p to precomputed id lists, extracts
the 24 kHz mel, the campplus speaker embedding and the flow-encoder hidden
states (`decoder_h`, the prior-loss target) from speech tokens. Rank/world
sharding mirrors prepare_dataset2.py:429-458; `--merge` concatenates shard
outputs (merge_dataset_shards.py:14-65).

Failed rows are marked `audio_processed=False` instead of crashing
(reference prepare_dataset.py:305-371).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger("jyutvoice_tpu.prepare")


def _capability_columns(extractor):
    """Optional output columns, decided by extractor CAPABILITY (not by what
    an individual row produced) so every row — including failures — has the
    same arrow schema."""
    cap_tok = (
        getattr(extractor.tokenizer, "params", None) is not None
        or getattr(extractor.tokenizer, "session", None) is not None
    )
    cap_h = cap_tok and extractor.flow_encoder_params is not None
    cols = ["phone_ids", "tones", "word_pos", "syllable_pos", "lang_ids",
            "mel", "spk_emb"]
    if cap_h:
        cols.append("decoder_h")
    if cap_tok:
        cols.append("speech_tokens")
    return cols, cap_tok, cap_h


def process_row(row, extractor, lang_default="yue"):
    from jyutvoice_tpu.text import text_to_sequence

    out = dict(row)
    cols, cap_tok, cap_h = _capability_columns(extractor)
    # failure defaults FIRST: a failed row must carry the same columns as a
    # successful one or the arrow writer rejects the mixed batch
    for c in cols:
        out[c] = []
    out["audio_processed"] = False
    try:
        ids, tones, word_pos, syllable_pos, lang_ids = text_to_sequence(
            row["text"], lang=row.get("lang", lang_default), phone=row.get("phone")
        )
        out.update(
            phone_ids=ids, tones=tones, word_pos=word_pos,
            syllable_pos=syllable_pos, lang_ids=lang_ids,
        )
        audio = np.asarray(row["audio"]["array"], np.float32)
        sr = int(row["audio"]["sampling_rate"])
        feats = extractor(audio, sr)
        out["mel"] = feats.prompt_feat.tolist()
        out["spk_emb"] = feats.spk_embed.tolist()
        if cap_h and feats.prompt_h is not None:
            out["decoder_h"] = feats.prompt_h.tolist()
        if cap_tok and feats.speech_tokens is not None:
            out["speech_tokens"] = feats.speech_tokens.tolist()
        out["audio_processed"] = True
    except Exception as e:  # noqa: BLE001 — mirror reference row tolerance
        log.warning("row failed: %s", e)
    return out


def process_batch(rows, extractor, lang_default="yue"):
    """Batched map body: per-row text processing + ONE fused device dispatch
    per length-bucket group (PromptExtractor.extract_batch) instead of 3-4
    dispatch/readback round trips per row. Failed rows are marked
    `audio_processed=False` (columns filled with empty lists to keep the
    arrow schema consistent)."""
    from jyutvoice_tpu.text import text_to_sequence

    n = len(rows["text"])
    langs = rows.get("lang") or [lang_default] * n
    phones = rows.get("phone") or [None] * n
    out = {k: list(v) for k, v in rows.items()}
    ok = [True] * n
    text_feats = [None] * n
    audios, srs, audio_rows = [], [], []
    for i in range(n):
        try:
            text_feats[i] = text_to_sequence(
                rows["text"][i], lang=langs[i] or lang_default, phone=phones[i]
            )
            audios.append(np.asarray(rows["audio"][i]["array"], np.float32))
            srs.append(int(rows["audio"][i]["sampling_rate"]))
            audio_rows.append(i)
        except Exception as e:  # noqa: BLE001 — reference row tolerance
            log.warning("row failed: %s", e)
            ok[i] = False

    feats = dict(
        zip(audio_rows, extractor.extract_batch(audios, srs))
    ) if audio_rows else {}

    cols, cap_tok, cap_h = _capability_columns(extractor)
    for c in cols:
        out[c] = [[] for _ in range(n)]
    out["audio_processed"] = [False] * n

    for i in range(n):
        f = feats.get(i)
        if not ok[i] or f is None or isinstance(f, Exception):
            if isinstance(f, Exception):
                log.warning("row failed: %s", f)
            continue
        ids, tones, word_pos, syllable_pos, lang_ids = text_feats[i]
        out["phone_ids"][i] = ids
        out["tones"][i] = tones
        out["word_pos"][i] = word_pos
        out["syllable_pos"][i] = syllable_pos
        out["lang_ids"][i] = lang_ids
        out["mel"][i] = f.prompt_feat.tolist()
        out["spk_emb"][i] = f.spk_embed.tolist()
        if cap_h and f.prompt_h is not None:
            out["decoder_h"][i] = f.prompt_h.tolist()
        if cap_tok and f.speech_tokens is not None:
            out["speech_tokens"][i] = f.speech_tokens.tolist()
        out["audio_processed"][i] = True
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="prepare a JyutVoice dataset")
    parser.add_argument("--input", help="HF dataset dir / hub id")
    parser.add_argument("--output", required=True)
    parser.add_argument("--lang", default="yue")
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--worlds", type=int, default=1)
    parser.add_argument("--flow-encoder", default=None)
    parser.add_argument("--campplus-onnx", default=None)
    parser.add_argument("--tokenizer-onnx", default=None)
    parser.add_argument("--tokenizer-torch", default=None,
                        help="speech_tokenizer_v2 torch ckpt (native JAX backend)")
    parser.add_argument("--merge", nargs="*", default=None,
                        help="shard dirs to concatenate instead of preparing")
    parser.add_argument("--device-dsp", action="store_true",
                        help="with --device-batch: compute kaldi-fbank + "
                        "whisper-mel inside the fused graph (matmul-DFT) — "
                        "keeps prep device-bound on few-core hosts")
    parser.add_argument("--device-batch", type=int, default=0,
                        help="rows per fused device dispatch (0 = row-at-a-"
                        "time). Groups rows by length bucket and runs one "
                        "dispatch + one readback per group — order-of-"
                        "magnitude prep throughput on remote-attached TPUs")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.merge is not None and not args.merge:
        parser.error("--merge requires at least one shard directory")
    if args.merge is None and args.input is None:
        parser.error("--input is required (or use --merge SHARD...)")

    import datasets

    if args.merge:
        shards = [datasets.load_from_disk(p) for p in args.merge]
        merged = datasets.concatenate_datasets(shards)
        merged.save_to_disk(args.output)
        log.info("merged %d shards -> %s (%d rows)", len(shards), args.output,
                 len(merged))
        return

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.pipeline.prompt import PromptExtractor

    cfg = JyutVoiceConfig()
    fe_params = None
    if args.flow_encoder:
        from jyutvoice_tpu.cli.infer import _load_params

        fe_params = _load_params(args.flow_encoder, "flow_encoder", cfg)
    extractor = PromptExtractor(
        flow_encoder_params=fe_params,
        flow_encoder_cfg=cfg.flow_encoder,
        campplus_onnx=args.campplus_onnx,
        tokenizer_onnx=args.tokenizer_onnx,
        tokenizer_torch=args.tokenizer_torch,
        device_dsp=args.device_dsp,
    )

    ds = (
        datasets.load_from_disk(args.input)
        if os.path.isdir(args.input)
        else datasets.load_dataset(args.input, split="train")
    )
    if args.worlds > 1:
        ds = ds.shard(num_shards=args.worlds, index=args.rank)
        log.info("shard %d/%d: %d rows", args.rank, args.worlds, len(ds))

    if args.device_batch > 1:
        ds = ds.map(
            lambda rows: process_batch(rows, extractor, args.lang),
            batched=True, batch_size=args.device_batch,
        )
    else:
        ds = ds.map(lambda row: process_row(row, extractor, args.lang))
    ds = ds.filter(lambda row: row["audio_processed"])
    ds.save_to_disk(args.output)
    log.info("wrote %s (%d rows)", args.output, len(ds))


if __name__ == "__main__":
    main()
