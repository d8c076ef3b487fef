"""TPU streaming benchmark: first-chunk latency + steady-state xRT.

Measures synthesize_streaming-equivalent decode+vocode chunks (chunk=100
mel frames = 2 s audio) with the overlap caches, on random weights
(identical FLOPs to converted ones). Reports:
  - first_chunk_ms: time from request to the first audible samples
  - steady_xrt: audio seconds per wall second once compiled + warmed
"""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.pipeline.streaming import StreamingSynthesizer

cfg = JyutVoiceConfig()
params = init_tts(jax.random.PRNGKey(0), cfg.tts)
params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
rng = np.random.default_rng(0)

CHUNK = 100          # mel frames per streaming chunk (2 s of audio)
T_TOTAL = 1000       # 20 s utterance
mu_y = rng.standard_normal((T_TOTAL, 80)).astype(np.float32)
spk = rng.standard_normal(80).astype(np.float32)

ss = StreamingSynthesizer(cfg, params, params_hift, chunk_frames=CHUNK)

# cold run: compile
t0 = time.perf_counter()
g = ss.stream(mu_y, spk)
first = next(g)
first = np.asarray(first)
cold_first = time.perf_counter() - t0
for w in g:
    pass

# warm run: measure
t0 = time.perf_counter()
g = ss.stream(mu_y, spk)
first = np.asarray(next(g))
first_chunk_s = time.perf_counter() - t0
total_samples = len(first)
for w in g:
    total_samples += len(np.asarray(w))
total_s = time.perf_counter() - t0
audio_s = total_samples / cfg.audio.sample_rate
print(json.dumps({
    "first_chunk_ms": round(first_chunk_s * 1000, 1),
    "cold_first_chunk_s": round(cold_first, 1),
    "steady_xrt": round(audio_s / total_s, 1),
    "audio_seconds": round(audio_s, 2),
    "wall_seconds": round(total_s, 3),
    "chunk_frames": CHUNK,
    "device": str(jax.devices()[0]),
}))
