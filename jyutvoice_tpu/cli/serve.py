"""HTTP serving CLI — deploy the synthesizer as a service.

The reference ships no server (its surface is the one-shot infer.py CLI,
reference infer.py:271-446); this is the TPU framework's production serving
entry around pipeline/http_server.py (dynamic batching + multi-stream
streaming lane).

Example:
  python -m jyutvoice_tpu.cli.serve \
      --ckpt pretrained_models_tpu/tts.npz --hift pretrained_models_tpu/hift.npz \
      --port 8080 --streaming

  curl -s localhost:8080/tts -d '{"text":"佢係邊個","lang":"yue"}' > out.wav
  curl -sN localhost:8080/tts/stream -d '{"text":"佢係邊個"}' > stream.wav
"""

from __future__ import annotations

import argparse
import logging

log = logging.getLogger("jyutvoice_tpu.serve")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", help="tts weights (.npz pytree or torch .ckpt/.pt)")
    ap.add_argument("--hift", help="hift weights (.npz pytree or torch .pt)")
    ap.add_argument(
        "--random-init",
        action="store_true",
        help="serve random-init weights (smoke testing / load testing)",
    )
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--n-timesteps", type=int, default=10)
    ap.add_argument("--length-scale", type=float, default=1.0)
    ap.add_argument(
        "--streaming", action="store_true", help="enable POST /tts/stream"
    )
    ap.add_argument(
        "--campplus", help="campplus.onnx for ref_audio_b64 speaker embedding"
    )
    ap.add_argument(
        "--s3-tokenizer",
        help="speech tokenizer weights (onnx or torch) for ref_audio_b64",
    )
    ap.add_argument(
        "--flow-encoder",
        help="flow-encoder weights (.npz/.pt) for ref_audio_b64 prompt states",
    )
    ap.add_argument("--max-streams", type=int, default=4)
    ap.add_argument("--chunk-frames", type=int, default=100)
    ap.add_argument(
        "--stream-prompt-frames", type=int, default=0,
        help="prompt capacity of the streaming lane (a PROMPT_BUCKETS "
        "value, e.g. 64/128): lets /tts/stream graft ref_audio_b64 cloning "
        "prompts. 0 (default) = speaker-embedding-only voice matching on "
        "streams; every tick pays the prompt-extended segment when set",
    )
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="pre-compile the serving graphs before traffic: the common "
        "interactive envelope (text <=128 tokens, mel <=1024 frames) at "
        "every power-of-two batch size up to --max-batch, plus the "
        "streaming chunk graph when --streaming. A cold process pays "
        "minutes per graph on its first unlucky request otherwise; with "
        "the persistent compilation cache, later restarts warm in seconds",
    )
    ap.add_argument(
        "--warmup-text",
        help="comma-separated text buckets to warm (default: 32,64,96,128)",
    )
    ap.add_argument(
        "--warmup-mel",
        help="comma-separated mel buckets to warm (default: 128..1024)",
    )
    ap.add_argument(
        "--warmup-long",
        action="store_true",
        help="also pre-compile the long-form family (synthesize_long: "
        "text buckets 1024-8192, every 512-aligned mel bucket 2048-12288 "
        "+ windowed vocoder; Synthesizer.warmup_long defaults) — a cold "
        "first multi-minute request pays ~90 s of compiles otherwise",
    )
    ap.add_argument(
        "--long-attention", choices=("auto", "banded", "exact"),
        default="auto",
        help="single-device long-form attention: 'auto' = banded past "
        "the config threshold (T>=2048, the measured default), 'banded' "
        "= force the linear chunk-band at any length, 'exact' = full "
        "attention always (~3x slower past 164 s). Ignored with "
        "--sp-devices (sharded decodes pick --sp-attention)",
    )
    ap.add_argument(
        "--warmup-long-prompts", action="store_true",
        help="with --warmup-long: also pre-compile the prompt-headed "
        "cloning shapes (512-frame head solve + strip per mel size) — "
        "needed only if over-long CLONING requests are expected; roughly "
        "doubles the long-form warmup compile time",
    )
    ap.add_argument(
        "--sp-devices", type=int, default=0,
        help="shard long-form solves (text past the interactive buckets) "
        "over a sequence-parallel mesh of this many local devices "
        "(dist/sp.py): per-chip attention memory/FLOPs drop N-fold, "
        "shrinking a long request's latency and its head-of-line window. "
        "0 (default) = single-chip long solves",
    )
    ap.add_argument(
        "--sp-attention", choices=("scores", "ring", "banded"),
        default="scores",
        help="sequence-parallel attention backend: 'scores' = GSPMD dense "
        "(per-chip (2B,H,T/N,T) score slab), 'ring' = ring attention "
        "(per-chip (T/N,T/N) tile; for decodes past the dense memory "
        "wall), 'banded' = linear chunk-band (per-chip (2B,H,T/N,w), "
        "~2% mel divergence — docs/design.md round 4)",
    )
    ap.add_argument("--verbose", action="store_true")
    return ap


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    if not args.random_init and not (args.ckpt and args.hift):
        raise SystemExit("--ckpt and --hift are required (or pass --random-init)")

    import jax

    from jyutvoice_tpu.cli.infer import _load_params
    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.pipeline.http_server import TTSServer
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    cfg = JyutVoiceConfig()
    if args.random_init:
        from jyutvoice_tpu.models.hift import init_hift
        from jyutvoice_tpu.models.tts import init_tts

        log.warning("serving RANDOM-INIT weights (smoke/load testing only)")
        params = init_tts(jax.random.PRNGKey(0), cfg.tts)
        params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
    else:
        params = _load_params(args.ckpt, "tts", cfg)
        params_hift = _load_params(args.hift, "hift", cfg)

    extractor = None
    if args.campplus or args.s3_tokenizer or args.flow_encoder:
        from jyutvoice_tpu.pipeline.prompt import PromptExtractor

        fe_params = (
            _load_params(args.flow_encoder, "flow_encoder", cfg)
            if args.flow_encoder
            else None
        )
        s3 = args.s3_tokenizer or ""
        extractor = PromptExtractor(
            flow_encoder_params=fe_params,
            flow_encoder_cfg=cfg.flow_encoder,
            campplus_onnx=args.campplus,
            tokenizer_onnx=s3 if s3.endswith(".onnx") else None,
            tokenizer_torch=s3 if s3 and not s3.endswith(".onnx") else None,
        )

    synth = Synthesizer(cfg, params, params_hift)
    sp_mesh = None
    if args.sp_devices:
        from jyutvoice_tpu.dist.sp import make_sp_mesh

        if args.sp_devices < 2:
            # a 1-device "mesh" would silently route long solves through
            # the GSPMD score path, losing the single-chip stock-flash
            # gate (1.6-1.75x); single-chip long solves are the default
            raise SystemExit(
                f"--sp-devices must be >= 2 (got {args.sp_devices}); "
                f"omit it for single-chip long solves"
            )
        n_dev = len(jax.devices())
        if args.sp_devices > n_dev:
            raise SystemExit(
                f"--sp-devices {args.sp_devices} but only {n_dev} device(s) "
                f"visible"
            )
        sp_mesh = make_sp_mesh(args.sp_devices)
        log.info(
            "long-form solves sequence-parallel over %d devices (%s)",
            args.sp_devices, args.sp_attention,
        )
    if args.warmup:
        import time

        cap = max(1, min(args.max_batch, 8))  # engine splits past 8
        sizes = [1]
        while sizes[-1] < cap:
            sizes.append(sizes[-1] * 2)
        t0 = time.perf_counter()

        def _buckets(spec):
            return tuple(int(v) for v in spec.split(",")) if spec else None

        n = synth.warmup(
            text_buckets=_buckets(args.warmup_text),
            mel_buckets=_buckets(args.warmup_mel),
            n_timesteps=(args.n_timesteps,),
            batch_sizes=sizes,
            pcm16=True,  # the engine serves PCM16 (http_server.py)
            log_fn=lambda m: log.info("%s", m),
        )
        log.info(
            "warmup: %d batch graphs in %.1f s", n, time.perf_counter() - t0
        )
    if args.warmup_long:
        import time

        t0 = time.perf_counter()
        n = synth.warmup_long(
            n_timesteps=(args.n_timesteps,),
            pcm16=True,
            log_fn=lambda m: log.info("%s", m),
            # warm the SAME solve graphs the engine will pick; cloning
            # shapes (prompt-headed solves, needed only when over-long
            # CLONING requests occur) are opt-in — they roughly double
            # the long-form compile bill
            mesh=sp_mesh,
            sp_attention=args.sp_attention,
            with_prompt=args.warmup_long_prompts,
            # the engine dispatches single-device long solves with
            # long_attention (server.py) — warm the SAME keys, or
            # --long-attention exact|banded leaves the served graphs cold
            attention=(args.long_attention if sp_mesh is None else "auto"),
        )
        log.info(
            "warmup-long: %d graphs in %.1f s", n, time.perf_counter() - t0
        )
    server = TTSServer(
        synth,
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        n_timesteps=args.n_timesteps,
        length_scale=args.length_scale,
        streaming=args.streaming,
        max_streams=args.max_streams,
        chunk_frames=args.chunk_frames,
        stream_prompt_frames=args.stream_prompt_frames,
        verbose=args.verbose,
        prompt_extractor=extractor,
        sp_mesh=sp_mesh,
        sp_attention=args.sp_attention,
        long_attention=args.long_attention,
    )
    log.info(
        "serving on http://%s:%d (device: %s, streaming: %s)",
        server.host, server.port, jax.devices()[0], args.streaming,
    )
    if args.warmup and args.streaming:
        # drain one dummy utterance through the lane to compile the fused
        # chunk-step graph (the public surface exercises the whole path:
        # prepare_stream + vmapped multi-stream tick)
        import time

        t0 = time.perf_counter()
        for _ in server.lane.submit("佢", lang="yue", phone="keoi5"):
            pass
        log.info(
            "warmup: streaming chunk graph in %.1f s",
            time.perf_counter() - t0,
        )
    # block until SIGTERM/SIGINT, then drain cleanly (in-flight requests
    # finish; new submits are rejected) — the serving twin of the training
    # CLI's preemption handling
    import signal
    import threading

    stop = threading.Event()

    def _on_signal(signum, frame):  # noqa: ARG001
        stop.set()

    try:
        signal.signal(signal.SIGTERM, _on_signal)
        signal.signal(signal.SIGINT, _on_signal)
    except ValueError:
        pass  # not the main thread (tests)
    try:
        stop.wait()
        log.info("shutdown signal received: draining")
    except KeyboardInterrupt:
        log.info("shutting down")
    finally:
        server.close()


if __name__ == "__main__":
    main()
