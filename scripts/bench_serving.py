"""TPU benchmark: dynamic-batching ServingEngine under concurrent load.

Submits N_REQ concurrent requests (same text bucket; random weights) and
reports realized batch sizes, per-request latency, and aggregate xRT —
the serving-shape complement to bench.py's single-stream headline.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.pipeline.server import ServingEngine
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    cfg = JyutVoiceConfig()
    synth = Synthesizer(
        cfg,
        init_tts(jax.random.PRNGKey(0), cfg.tts),
        init_hift(jax.random.PRNGKey(1), cfg.hift),
    )

    # ~6 s utterance (philosophical-length phone string) per request
    phone = " ".join(["keoi5 hai6 bin1 go3 aa3"] * 6)
    text = "佢 係邊 個 呀 " * 6
    import sys
    n_req = 32
    max_batch = int(sys.argv[sys.argv.index("--max-batch") + 1]) \
        if "--max-batch" in sys.argv else 16

    with ServingEngine(
        synth, max_batch=max_batch, max_wait_ms=30.0, n_timesteps=10,
        pcm16=True,
    ) as engine:
        # warmup: compile the max-batch bucket graph (batch dim is padded to
        # powers of two inside synthesize_batch, so this covers the run)
        ws = [engine.submit(text, lang="yue", phone=phone)
              for _ in range(max_batch)]
        for w in ws:
            w.result()
        engine.submit(text, lang="yue", phone=phone).result()  # batch-1 graph
        engine.stats.__init__()  # drop warmup/compile from the stats
        t0 = time.perf_counter()
        futs = [
            engine.submit(text, lang="yue", phone=phone) for _ in range(n_req)
        ]
        results = [f.result() for f in futs]
        wall = time.perf_counter() - t0
        stats = engine.stats

    audio_s = sum(r.mel_frames for r in results) * cfg.audio.hop_length
    audio_s /= cfg.audio.sample_rate
    print(
        json.dumps(
            {
                "n_requests": n_req,
                "max_batch": max_batch,
                "aggregate_xrt": round(audio_s / wall, 1),
                "audio_seconds": round(audio_s, 1),
                "wall_seconds": round(wall, 2),
                "mean_batch": round(stats.mean_batch, 2),
                "mean_latency_ms": round(stats.mean_latency_ms, 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
