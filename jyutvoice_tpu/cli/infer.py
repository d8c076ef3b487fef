"""Inference CLI — the analog of the reference's infer.py (infer.py:271-446).

Example:
  python -m jyutvoice_tpu.cli.infer \
      --text "佢 係 邊 個" --lang yue --phone "keoi5 hai6 bin1 go3" \
      --ckpt pretrained_models_tpu/tts.npz --hift pretrained_models_tpu/hift.npz \
      --output out.wav

Checkpoints may be native .npz pytrees (weights/provision.py) or reference
torch files (.ckpt/.pt, converted on the fly when torch is available).
Voice cloning needs --ref-audio plus the campplus/speech-tokenizer ONNX and
flow-encoder weights, exactly like the reference.
"""

from __future__ import annotations

import argparse
import logging
import wave

import numpy as np

log = logging.getLogger("jyutvoice_tpu.infer")


def save_wav(path: str, audio: np.ndarray, sr: int = 24000) -> None:
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def load_wav(path: str):
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        data = np.frombuffer(f.readframes(n), dtype=np.int16)
        if f.getnchannels() > 1:
            data = data.reshape(-1, f.getnchannels()).mean(axis=1)
    return data.astype(np.float32) / 32768.0, sr


def _load_params(path: str, kind: str, cfg):
    from jyutvoice_tpu.weights import provision, torch_convert as tc

    if path.endswith(".npz"):
        return provision.load_pytree_npz(path)
    sd = tc.load_torch_state_dict(path)
    if kind == "tts":
        return tc.convert_tts(sd, cfg.tts)
    if kind == "hift":
        return tc.convert_hift(sd, cfg.hift)
    if kind == "flow_encoder":
        return tc.convert_flow_encoder(sd, cfg.flow_encoder)
    raise ValueError(kind)


def main(argv=None, cfg=None):
    parser = argparse.ArgumentParser(description="JyutVoice-TPU inference")
    parser.add_argument("--text", default=None)
    parser.add_argument("--text-file", default=None,
                        help="batch mode: one utterance per line, synthesized "
                             "in batched groups; outputs <output-stem>_NNNN.wav")
    parser.add_argument("--batch-size", type=int, default=8,
                        help="batch-mode group size")
    parser.add_argument("--lang", default="yue",
                        choices=["yue", "zh", "en", "multilingual"])
    parser.add_argument("--phone", default=None,
                        help="explicit jyutping/pinyin (space separated)")
    parser.add_argument("--ckpt", "--tts_checkpoint", default=None,
                        help="tts checkpoint (.npz/.ckpt/.pt)")
    parser.add_argument("--hift", default=None, help="hift checkpoint")
    parser.add_argument("--flow-encoder", "--flow_encoder", default=None)
    parser.add_argument("--campplus-onnx", default=None)
    parser.add_argument("--tokenizer-onnx", default=None)
    parser.add_argument("--tokenizer-torch", default=None,
                        help="speech_tokenizer_v2 torch ckpt (native JAX backend)")
    parser.add_argument("--ref-audio", "--ref_audio", default=None,
                        help="voice cloning prompt wav")
    parser.add_argument("--output", default="output.wav")
    parser.add_argument("--n-timesteps", "--n_timesteps", type=int, default=10)
    parser.add_argument("--length-scale", "--length_scale", type=float, default=0.9)
    parser.add_argument("--stream", action="store_true",
                        help="chunked streaming synthesis (overlap-cached "
                             "decoder + vocoder; logs first-chunk latency)")
    parser.add_argument("--chunk-frames", type=int, default=100,
                        help="mel frames per streaming chunk (2s audio = 100)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.pipeline.prompt import PromptExtractor
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    cfg = cfg or JyutVoiceConfig()
    key = jax.random.PRNGKey(args.seed)
    if args.ckpt:
        params_tts = _load_params(args.ckpt, "tts", cfg)
    else:
        log.warning("no --ckpt given: using RANDOM tts weights (smoke mode)")
        params_tts = init_tts(key, cfg.tts)
    if args.hift:
        params_hift = _load_params(args.hift, "hift", cfg)
    else:
        log.warning("no --hift given: using RANDOM vocoder weights (smoke mode)")
        params_hift = init_hift(jax.random.fold_in(key, 1), cfg.hift)

    spk_embed = None
    prompt_feat = prompt_h = None
    if args.ref_audio:
        fe_params = (
            _load_params(args.flow_encoder, "flow_encoder", cfg)
            if args.flow_encoder
            else None
        )
        extractor = PromptExtractor(
            flow_encoder_params=fe_params,
            flow_encoder_cfg=cfg.flow_encoder,
            campplus_onnx=args.campplus_onnx,
            tokenizer_onnx=args.tokenizer_onnx,
            tokenizer_torch=args.tokenizer_torch,
        )
        audio, sr = load_wav(args.ref_audio)
        feats = extractor(audio, sr)
        spk_embed = feats.spk_embed
        prompt_feat = feats.prompt_feat
        prompt_h = feats.prompt_h
        if prompt_h is None:
            log.warning(
                "no speech tokenizer / flow encoder: cloning uses mel prompt only"
            )
            prompt_feat = None

    if (args.text is None) == (args.text_file is None):
        parser.error("exactly one of --text / --text-file is required")

    def _seg(t: str) -> str:
        if args.lang in ("yue", "zh") and args.phone is None:
            from jyutvoice_tpu.text.word_seg import word_seg

            return word_seg(t)
        return t

    synth = Synthesizer(cfg, params_tts, params_hift)

    if args.text_file:
        import os

        with open(args.text_file, encoding="utf-8") as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        stem, ext = os.path.splitext(args.output)
        ext = ext or ".wav"
        n_done = 0
        for lo in range(0, len(lines), args.batch_size):
            group = lines[lo : lo + args.batch_size]
            items = []
            for ln in group:
                # optional per-line explicit phonetics: "text|jyutping"
                text, _, phone = (s.strip() for s in ln.partition("|"))
                items.append(
                    {"text": text if phone else _seg(text),
                     "lang": args.lang, "phone": phone or None,
                     "spk_embed": spk_embed,
                     "prompt_feat": prompt_feat, "prompt_h": prompt_h}
                )
            results = synth.synthesize_batch(
                items, n_timesteps=args.n_timesteps,
                length_scale=args.length_scale, return_mel=False,
            )
            for res in results:
                path = f"{stem}_{n_done:04d}{ext}"
                save_wav(path, res.wav)
                n_done += 1
        log.info("wrote %d wavs to %s_*%s", n_done, stem, ext)
        return

    text = _seg(args.text)
    if args.stream:
        import time

        import numpy as np

        t0 = time.perf_counter()
        chunks = []
        for i, chunk in enumerate(
            synth.synthesize_streaming(
                text,
                lang=args.lang,
                phone=args.phone,
                spk_embed=spk_embed,
                prompt_feat=prompt_feat,
                prompt_h=prompt_h,
                chunk_frames=args.chunk_frames,
                length_scale=args.length_scale,
                n_timesteps=args.n_timesteps,
            )
        ):
            if i == 0:
                log.info(
                    "first chunk (%.2fs audio) after %.0f ms",
                    len(chunk) / 24000, (time.perf_counter() - t0) * 1e3,
                )
            chunks.append(np.asarray(chunk))
        wav = np.concatenate(chunks)
        elapsed = time.perf_counter() - t0
        save_wav(args.output, wav)
        log.info(
            "wrote %s (streamed, %d chunks): %.2fs audio, rtf=%.3f",
            args.output, len(chunks), len(wav) / 24000,
            elapsed / max(len(wav) / 24000, 1e-9),
        )
        return

    result = synth.synthesize(
        text,
        lang=args.lang,
        phone=args.phone,
        spk_embed=spk_embed,
        prompt_feat=prompt_feat,
        prompt_h=prompt_h,
        n_timesteps=args.n_timesteps,
        length_scale=args.length_scale,
    )
    save_wav(args.output, result.wav)
    log.info(
        "wrote %s: %.2fs audio, rtf=%.3f, timings=%s",
        args.output,
        len(result.wav) / 24000,
        result.rtf,
        {k: round(v, 4) for k, v in result.timings.items()},
    )


if __name__ == "__main__":
    main()
