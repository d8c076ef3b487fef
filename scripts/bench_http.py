"""End-to-end HTTP serving benchmark: concurrent clients against TTSServer.

Measures aggregate xRT and request latency through the FULL production
stack — HTTP parse -> dynamic batching engine -> bucketed TPU dispatch ->
PCM16 WAV response — i.e. scripts/bench_serving.py plus the HTTP layer.

Usage: python scripts/bench_http.py [--requests 32] [--concurrency 16]
"""

import argparse
import json
import os
import threading
import time
import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--n-timesteps", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.pipeline.http_server import TTSServer
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
    synth = Synthesizer(cfg, params, params_hift)

    # ~6 s utterance (same workload as scripts/bench_serving.py)
    phone = " ".join(["keoi5 hai6 bin1 go3 aa3"] * 6)
    body = json.dumps(
        {"text": "佢 係邊 個 呀 " * 6, "lang": "yue", "phone": phone}
    ).encode()

    with TTSServer(
        synth, port=0, max_batch=args.max_batch, max_wait_ms=20.0,
        n_timesteps=args.n_timesteps, request_timeout=3600.0,
    ) as srv:
        url = f"http://127.0.0.1:{srv.port}/tts"

        def post():
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"}
            )
            try:
                with urllib.request.urlopen(req, timeout=1200) as r:
                    return len(r.read())
            except urllib.error.HTTPError as e:
                raise RuntimeError(
                    f"HTTP {e.code}: {e.read().decode()[:500]}"
                ) from None

        print("warmup (compiles)...", flush=True)
        # realized group sizes pad to powers of two — warm each batch graph
        # (1, 2, 4, ..., max_batch) or the measurement times compiles
        sizes = [1]
        while sizes[-1] < args.max_batch:
            sizes.append(sizes[-1] * 2)
        for s in sizes:
            ws = [threading.Thread(target=post) for _ in range(s)]
            for w in ws:
                w.start()
            for w in ws:
                w.join()
            print(f"  batch-{s} graph warm", flush=True)

        latencies = []
        bytes_total = [0]
        lock = threading.Lock()
        sem = threading.Semaphore(args.concurrency)

        def worker():
            with sem:
                t0 = time.perf_counter()
                n = post()
                dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)
                bytes_total[0] += n

        t0 = time.perf_counter()
        threads = [
            threading.Thread(target=worker) for _ in range(args.requests)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        audio_s = (bytes_total[0] - 44 * args.requests) / 2 / cfg.audio.sample_rate
        lat = sorted(latencies)
        print(
            json.dumps(
                {
                    "requests": args.requests,
                    "concurrency": args.concurrency,
                    "wall_s": round(wall, 2),
                    "audio_seconds": round(audio_s, 1),
                    "aggregate_xrt": round(audio_s / wall, 1),
                    "latency_p50_s": round(lat[len(lat) // 2], 3),
                    "latency_p95_s": round(lat[int(len(lat) * 0.95)], 3),
                    "mean_batch": round(srv.engine.stats.mean_batch, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
