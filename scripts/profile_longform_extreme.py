"""Single-chip long-form envelope PAST the bucket table (round 5).

Solves T=24576 mel frames (8.2 min of audio — 1.6x the reference's
300 s hard cap, 2x our own 12288 official bucket) in ONE pass with the
banded default + windowed vocoder, and records the analytic per-graph
peak HBM. Measured (v5e, warm cache):

  solve 4.65 s + vocode 0.72 s = 91.6x RT; solve peak 1.60 GB (banded
  is linear in T), vocoder graph peak 8.58 GB.

The NEXT single-chip wall is therefore the windowed VOCODER's batch-of-
windows buffer (~2x more T crosses v5e's 16 GB near T~45k ≈ 15 min);
the lever, if ever needed, is lax.scan over window groups instead of
one batched dispatch — not built, documented here with the number.
Run alone (one TPU job at a time).
"""
import os, sys, time, json
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models.cfm import cfm_forward
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.models import hift as hift_mod
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.weights.noise import rand_noise_extended

cfg = JyutVoiceConfig()
params = init_tts(jax.random.PRNGKey(0), cfg.tts)
hp = init_hift(jax.random.PRNGKey(1), cfg.hift)
dec = params["decoder"]
rng = np.random.default_rng(0)
for T in (24576,):
    mu = jnp.asarray(rng.standard_normal((1, T, 80)), jnp.float32)
    mask = jnp.ones((1, T, 1), jnp.float32)
    spks = jnp.asarray(rng.standard_normal((1, 80)), jnp.float32)
    cond = jnp.zeros((1, T, 80), jnp.float32)
    noise = jnp.asarray(rand_noise_extended(T))
    @jax.jit
    def solve(dec, mu, mask, spks, cond, noise):
        return cfm_forward(dec, cfg.tts.cfm, mu, mask, spks, cond, n_timesteps=10, rand_noise=noise)
    @jax.jit
    def voc(p, mel):
        wav, _ = hift_mod.hift_vocode_auto(p, cfg.hift, mel, deterministic=True)
        return wav
    c_solve = solve.lower(dec, mu, mask, spks, cond, noise).compile()
    ma = c_solve.memory_analysis()
    peak_solve = getattr(ma, 'peak_memory_in_bytes', 0)
    mel = solve(dec, mu, mask, spks, cond, noise)
    float(jnp.sum(mel))  # warm
    t0 = time.perf_counter(); mel = solve(dec, mu, mask, spks, cond, noise); s_solve_tmp = float(jnp.sum(mel)); t1 = time.perf_counter()
    wav = voc(hp, mel); float(jnp.sum(wav))
    ma2 = voc.lower(hp, mel).compile().memory_analysis()
    peak_voc = getattr(ma2, 'peak_memory_in_bytes', 0)
    t2 = time.perf_counter(); wav = voc(hp, mel); _ = float(jnp.sum(wav)); t3 = time.perf_counter()
    audio_s = T * cfg.audio.hop_length / cfg.audio.sample_rate
    print(json.dumps({
        "T": T, "audio_s": round(audio_s,1),
        "solve_s": round(t1-t0,2), "voc_s": round(t3-t2,2),
        "xrt_solve_plus_voc": round(audio_s/((t1-t0)+(t3-t2)),1),
        "peak_hbm_solve_mb": round(peak_solve/1e6,1),
        "peak_hbm_voc_mb": round(peak_voc/1e6,1),
        "finite": bool(np.isfinite(s_solve_tmp)),
    }), flush=True)
