"""Bisect the b=8 solve cliff: single estimator call + attention-only +
conv-only at 2B = 2..16, plus batch 5-7 solve times."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.models.estimator import apply_estimator
from jyutvoice_tpu.nn import attention, core

cfg = JyutVoiceConfig()
params = init_tts(jax.random.PRNGKey(0), cfg.tts)
dec = params["decoder"]
T = 512
rng = np.random.default_rng(0)

def timed(fn, args, iters=10, reps=3):
    _ = float(jnp.sum(fn(*args)))
    def t(n):
        t0 = time.perf_counter(); o=None
        for _ in range(n): o = fn(*args)
        _ = float(jnp.sum(o)); return time.perf_counter()-t0
    base = min(t(1) for _ in range(reps)); tn = min(t(iters+1) for _ in range(reps))
    return (tn-base)/iters

est_cfg = cfg.tts.cfm.estimator
blk = dec["down"]["blocks"][0]  # one transformer block's params

for bb in (2, 4, 8, 10, 12, 16):
    x = jnp.asarray(rng.standard_normal((bb, T, 80)), jnp.float32)
    mask = jnp.ones((bb, T, 1), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((bb, T, 80)), jnp.float32)
    tt = jnp.full((bb,), 0.5, jnp.float32)
    spks = jnp.asarray(rng.standard_normal((bb, 80)), jnp.float32)
    cond = jnp.zeros((bb, T, 80), jnp.float32)
    h256 = jnp.asarray(rng.standard_normal((bb, T, 256)), jnp.float32)

    @jax.jit
    def est(dec, x, mask, mu, tt, spks, cond):
        return apply_estimator(dec, est_cfg, x, mask, mu, tt, spks, cond)

    @jax.jit
    def attn_only(blk, h):
        bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
        return attention.plain_mha(blk["attn"], h, bias, est_cfg.num_heads)

    te = timed(est, (dec, x, mask, mu, tt, spks, cond))
    ta = timed(attn_only, (blk, h256))
    print(f"2B={bb}: estimator={te*1000:7.2f} ms  single_attn={ta*1000:6.3f} ms "
          f"(x14attn={14*ta*1000:6.1f})", flush=True)
