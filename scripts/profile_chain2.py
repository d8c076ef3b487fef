"""Which part of the real estimator graph is slow at 2B=12?"""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.models import estimator as E
from jyutvoice_tpu.nn import core

cfg = JyutVoiceConfig()
params = init_tts(jax.random.PRNGKey(0), cfg.tts)
dec = params["decoder"]
est_cfg = cfg.tts.cfm.estimator
T = 512
rng = np.random.default_rng(0)

def timed(fn, args, iters=10, reps=3):
    _ = float(jnp.sum(fn(*args)))
    def t(n):
        t0 = time.perf_counter(); o=None
        for _ in range(n): o = fn(*args)
        _ = float(jnp.sum(o)); return time.perf_counter()-t0
    base = min(t(1) for _ in range(reps)); tn = min(t(iters+1) for _ in range(reps))
    return (tn-base)/iters*1000

bb = 12
x256 = jnp.asarray(rng.standard_normal((bb, T, 256)), jnp.float32)
x320 = jnp.asarray(rng.standard_normal((bb, T, 320)), jnp.float32)
x512 = jnp.asarray(rng.standard_normal((bb, T, 512)), jnp.float32)
mask = jnp.ones((bb, T, 1), jnp.float32)
temb = jnp.asarray(rng.standard_normal((bb, 1024)), jnp.float32)
ctx = {"backend": "xla", "bias": None}

@jax.jit
def mid_stages(dec, x, mask, temb):
    for st in dec["mid"]:
        x = E._stage(st, x, mask, temb, ctx, est_cfg.num_heads)
    return x

@jax.jit
def down_stage(dec, x, mask, temb):
    return E._stage(dec["down"], x, mask, temb, ctx, est_cfg.num_heads)

@jax.jit
def up_stage(dec, x, mask, temb):
    h = E._stage(dec["up"], x, mask, temb, ctx, est_cfg.num_heads)
    h = core.conv1d(dec["up_conv"], h * mask, padding="causal")
    h = E.apply_causal_block(dec["final_block"], h, mask)
    return core.conv1d(dec["final_proj"], h * mask, padding="valid") * mask

print(f"2B=12 mid(12 stages) = {timed(mid_stages,(dec,x256,mask,temb)):7.2f} ms", flush=True)
print(f"2B=12 down stage(320c) = {timed(down_stage,(dec,x320,mask,temb)):7.2f} ms", flush=True)
print(f"2B=12 up stage(512c)+tail = {timed(up_stage,(dec,x512,mask,temb)):7.2f} ms", flush=True)
