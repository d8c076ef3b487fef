"""Micro-bench estimator sub-ops at 2B in {8,12,16} to find the cliff."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.models.estimator import (
    apply_causal_resnet, apply_causal_block, apply_transformer_block)
from jyutvoice_tpu.nn import core

cfg = JyutVoiceConfig()
params = init_tts(jax.random.PRNGKey(0), cfg.tts)
dec = params["decoder"]
T = 512
rng = np.random.default_rng(0)

def timed(fn, args, iters=20, reps=3):
    _ = float(jnp.sum(fn(*args)))
    def t(n):
        t0 = time.perf_counter(); o=None
        for _ in range(n): o = fn(*args)
        _ = float(jnp.sum(o)); return time.perf_counter()-t0
    base = min(t(1) for _ in range(reps)); tn = min(t(iters+1) for _ in range(reps))
    return (tn-base)/iters*1000

est_cfg = cfg.tts.cfm.estimator
stage = dec["mid"][0]
blk = stage["blocks"][0]

for bb in (8, 12, 16):
    x = jnp.asarray(rng.standard_normal((bb, T, 256)), jnp.float32)
    mask = jnp.ones((bb, T, 1), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((bb, 1024)), jnp.float32)

    resnet = jax.jit(lambda p, x, m, t: apply_causal_resnet(p, x, m, t))
    cblock = jax.jit(lambda p, x, m: apply_causal_block(p, x, m))
    conv_only = jax.jit(lambda p, x: core.conv1d(p, x, padding="causal"))
    ln = jax.jit(lambda p, x: core.layer_norm(p, x))
    ff = jax.jit(lambda p, x: core.linear(p, x))
    tblock = jax.jit(lambda p, x: apply_transformer_block(
        p, x, {"backend": "xla", "bias": None}, est_cfg.num_heads))

    tr = timed(resnet, (stage["resnet"], x, mask, temb))
    tc = timed(cblock, (stage["resnet"]["block1"], x, mask))
    tco = timed(conv_only, (stage["resnet"]["block1"]["conv"], x))
    tl = timed(ln, (blk["norm1"], x))
    tf = timed(ff, (blk["ff_in"], x))
    tb = timed(tblock, (blk, x))
    print(f"2B={bb}: resnet={tr:6.2f}  cblock={tc:6.2f}  conv_k3={tco:6.2f}  "
          f"ln={tl:5.3f}  ff256x1024={tf:5.3f}  tblock={tb:6.2f}", flush=True)
