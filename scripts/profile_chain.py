"""Chain-composition scaling: N tblocks / N resnets chained in one jit."""
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

mids = dec["mid"]
print("blocks per mid stage:", len(mids[0]["blocks"]), flush=True)

def chain_tblocks(n_stages):
    def f(dec, x, bias):
        ctx = {"backend": "xla", "bias": bias}
        for st in dec["mid"][:n_stages]:
            for blk in st["blocks"]:
                x = E.apply_transformer_block(blk, x, ctx, est_cfg.num_heads)
        return x
    return jax.jit(f, static_argnums=())

def chain_resnets(n_stages):
    def f(dec, x, mask, temb):
        for st in dec["mid"][:n_stages]:
            x = E.apply_causal_resnet(st["resnet"], x, mask, temb)
        return x
    return jax.jit(f)

for bb in (8, 12):
    x = jnp.asarray(rng.standard_normal((bb, T, 256)), jnp.float32)
    mask = jnp.ones((bb, T, 1), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((bb, 1024)), jnp.float32)
    bias = core.mask_to_bias(core.chunk_attn_mask(mask[:, :, 0].astype(bool), 0))[:, None]
    for n in (3, 12):
        tt = timed(chain_tblocks(n), (dec, x, bias))
        tr = timed(chain_resnets(n), (dec, x, mask, temb))
        nb = n * len(mids[0]["blocks"])
        print(f"2B={bb} stages={n}: {nb} tblocks={tt:7.2f} ms ({tt/nb:5.3f}/blk)  "
              f"{n} resnets={tr:6.2f} ms", flush=True)
