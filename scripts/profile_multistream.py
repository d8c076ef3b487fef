"""Measure multi-stream streaming: N concurrent sessions in ONE dispatch per
tick (MultiStreamSynthesizer) vs N sequential single-stream runs.

Run on the real TPU:  python scripts/profile_multistream.py [--streams 4]

Target (VERDICT round 2 item 5): >=3x aggregate streaming xRT at 4
concurrent streams vs sequential, >=80x aggregate.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_xla"),
)

import numpy as np

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.pipeline.streaming import (
    MultiStreamSynthesizer,
    StreamingSynthesizer,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--frames", type=int, default=500, help="mel frames per stream")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--pcm16", action="store_true",
                    help="on-device int16 wav (halves readback bytes)")
    ap.add_argument("--prompt-frames", type=int, default=0,
                    help="compile the multi-stream lane with cloning-prompt "
                    "capacity (a PROMPT_BUCKETS value); half the sessions "
                    "then carry a real prompt, half stream prompt-free — "
                    "measures the per-tick cost of a prompt-capable graph")
    args = ap.parse_args()

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
    rng = np.random.default_rng(0)
    n = args.streams
    mus = [rng.standard_normal((args.frames, 80)).astype(np.float32) for _ in range(n)]
    spks = [rng.standard_normal(80).astype(np.float32) for _ in range(n)]
    audio_s_each = args.frames * 480 / 24000.0

    # -- sequential single-stream ------------------------------------------
    ss = StreamingSynthesizer(
        cfg, params, params_hift, chunk_frames=args.chunk,
        n_timesteps=args.steps,
    )
    _ = [np.concatenate(list(ss.stream(mus[0], spks[0])))]  # warm compile
    t0 = time.perf_counter()
    for i in range(n):
        list(ss.stream(mus[i], spks[i]))
    seq_s = time.perf_counter() - t0
    seq_xrt = n * audio_s_each / seq_s

    # -- multi-stream lock-step --------------------------------------------
    p = args.prompt_frames
    ms = MultiStreamSynthesizer(
        cfg, params, params_hift, max_sessions=n, chunk_frames=args.chunk,
        n_timesteps=args.steps, pcm16=args.pcm16, prompt_frames=p,
    )
    if p:
        # half cloning / half prompt-free: both ride the one compiled graph
        pf = rng.standard_normal((p, 80)).astype(np.float32)
        ph = rng.standard_normal((p, 80)).astype(np.float32)
        reqs = [
            (m, s, pf, ph) if i % 2 == 0 else (m, s)
            for i, (m, s) in enumerate(zip(mus, spks))
        ]
    else:
        reqs = [(m, s) for m, s in zip(mus, spks)]
    # warm compile (a prompt-free session compiles the same graph)
    _ = ms.run_all([(mus[0][: args.chunk * 2], spks[0])])
    t0 = time.perf_counter()
    out = ms.run_all(reqs)
    multi_s = time.perf_counter() - t0
    assert len(out) == n
    multi_xrt = n * audio_s_each / multi_s

    print(json.dumps({
        "pcm16": args.pcm16,
        "prompt_frames": p,
        "streams": n,
        "chunk_frames": args.chunk,
        "frames_per_stream": args.frames,
        "n_timesteps": args.steps,
        "sequential_s": round(seq_s, 3),
        "sequential_aggregate_xrt": round(seq_xrt, 1),
        "multistream_s": round(multi_s, 3),
        "multistream_aggregate_xrt": round(multi_xrt, 1),
        "speedup": round(multi_xrt / seq_xrt, 2),
    }))


if __name__ == "__main__":
    main()
