"""Stock pallas flash attention vs XLA SDPA inside the interleaved mid
stages at 2B=12/16 (the attention-HBM-bound serving regime)."""
import os, time, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental.pallas.ops.tpu.flash_attention import (
    flash_attention, BlockSizes)
from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.models import estimator as E
from jyutvoice_tpu.nn import attention, core
from jyutvoice_tpu.nn.quant import maybe_linear

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

def tblock_flash(p, x, n_heads):
    h = core.layer_norm(p["norm1"], x)
    q = attention.split_heads(maybe_linear(p["attn"]["q"], h), n_heads)
    k = attention.split_heads(maybe_linear(p["attn"]["k"], h), n_heads)
    v = attention.split_heads(maybe_linear(p["attn"]["v"], h), n_heads)
    d = q.shape[-1]
    o = flash_attention(q, k, v, causal=False, sm_scale=1.0/np.sqrt(d))
    x = x + maybe_linear(p["attn"]["o"], attention.merge_heads(o))
    h = core.layer_norm(p["norm3"], x)
    h = core.gelu_torch(maybe_linear(p["ff_in"], h))
    return x + maybe_linear(p["ff_out"], h)

ctx = {"backend": "xla", "bias": None}

def mid(kind):
    def f(dec, x, mask, temb):
        for st in dec["mid"]:
            x = E.apply_causal_resnet(st["resnet"], x, mask, temb, core.conv1d_matmul)
            for blk in st["blocks"]:
                if kind == "flash":
                    x = tblock_flash(blk, x, est_cfg.num_heads)
                else:
                    x = E.apply_transformer_block(blk, x, ctx, est_cfg.num_heads)
        return x
    return jax.jit(f)

for bb in (12, 16):
    x = jnp.asarray(rng.standard_normal((bb, T, 256)), jnp.float32)
    mask = jnp.ones((bb, T, 1), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((bb, 1024)), jnp.float32)
    if bb == 12:
        a = mid("xla")(dec, x, mask, temb); b = mid("flash")(dec, x, mask, temb)
        print("max diff xla vs flash:", float(jnp.max(jnp.abs(a - b))), flush=True)
    tx = timed(mid("xla"), (dec, x, mask, temb))
    tf = timed(mid("flash"), (dec, x, mask, temb))
    print(f"2B={bb}: mid xla={tx:7.2f} ms   mid flash={tf:7.2f} ms", flush=True)
