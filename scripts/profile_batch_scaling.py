"""Where does multi-stream serving time go? Component times at b=1,2,4,8."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models import hift as H
from jyutvoice_tpu.models import cfm as C
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.weights.noise import rand_noise

cfg = JyutVoiceConfig()
params = init_tts(jax.random.PRNGKey(0), cfg.tts)
params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
t_mel = 512
rng = np.random.default_rng(0)

def timed(fn, args, iters=10, reps=3):
    _ = float(jnp.sum(fn(*args)))
    def t(n):
        t0 = time.perf_counter(); o=None
        for _ in range(n): o = fn(*args)
        _ = float(jnp.sum(o)); return time.perf_counter()-t0
    base = min(t(1) for _ in range(reps)); tn = min(t(iters+1) for _ in range(reps))
    return (tn-base)/iters

for b in (1, 2, 4, 8):
    noise = jnp.asarray(np.tile(rand_noise(t_mel), (b,1,1)))
    mu = jnp.asarray(rng.standard_normal((b,t_mel,80)), jnp.float32)
    mask = jnp.ones((b,t_mel,1), jnp.float32)
    spks = jnp.asarray(rng.standard_normal((b,80)), jnp.float32)
    cond = jnp.zeros((b,t_mel,80), jnp.float32)
    mel = jnp.asarray(rng.standard_normal((b,t_mel,80)), jnp.float32)

    @jax.jit
    def solve(dec, mu, mask, spks, cond):
        t_span = C.cosine_t_span(10)
        return C.solve_euler_cfg(dec, cfg.tts.cfm, noise*mask, t_span, mu, mask, spks, cond)
    @jax.jit
    def voc(ph, mel):
        wav, _ = H.hift_inference(ph, cfg.hift, mel, deterministic=True)
        return wav
    ts = timed(solve, (params["decoder"], mu, mask, spks, cond))
    tv = timed(voc, (params_hift, mel))
    audio = b*t_mel*480/24000
    print(f"b={b}: solve={ts*1000:7.1f} ms  voc={tv*1000:6.1f} ms  "
          f"sum_xRT={audio/(ts+tv):5.0f}  solve_xRT={audio/ts:5.0f}", flush=True)
