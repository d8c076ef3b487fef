"""Vocoder batch scaling: grouped-fused vs separate resblocks at b=1..8."""
import os, time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig, HiFTConfig
from jyutvoice_tpu.models import hift as H
from jyutvoice_tpu.models.hift import init_hift

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

for fuse in (True, False):
    cfg = dataclasses.replace(HiFTConfig(), fuse_resblock_branches=fuse)
    params = init_hift(jax.random.PRNGKey(1), cfg)
    @jax.jit
    def voc(ph, mel):
        wav, _ = H.hift_inference(ph, cfg, mel, deterministic=True)
        return wav
    for b in (2, 4, 8):
        mel = jnp.asarray(rng.standard_normal((b, T, 80)), jnp.float32)
        tv = timed(voc, (params, mel))
        print(f"fuse={fuse} b={b}: {tv:7.1f} ms", flush=True)
