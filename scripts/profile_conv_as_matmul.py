"""Replace k=3 causal convs with shifted matmuls inside the interleaved
mid stages: does it recover the fusion?"""
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

def conv1d_mm(p, x, padding):
    """k-tap conv as k shifted matmuls (causal or valid k=1)."""
    w = p["w"]  # (K, Cin, Cout)
    k = w.shape[0]
    if k == 1:
        y = x @ w[0]
    else:
        assert padding == "causal"
        y = x @ w[k - 1]
        for i in range(k - 1):
            shift = k - 1 - i
            xs = jnp.pad(x, ((0, 0), (shift, 0), (0, 0)))[:, : x.shape[1]]
            y = y + xs @ w[i]
    if "b" in p:
        y = y + p["b"]
    return y

def causal_block_mm(p, x, mask):
    h = conv1d_mm(p["conv"], x * mask, "causal")
    h = core.layer_norm(p["norm"], h)
    h = core.mish(h)
    return h * mask

def resnet_mm(p, x, mask, t):
    h = causal_block_mm(p["block1"], x, mask)
    h = h + core.linear(p["mlp"], core.mish(t))[:, None, :]
    h = causal_block_mm(p["block2"], h, mask)
    return h + conv1d_mm(p["res_conv"], x * mask, "valid")

ctx = {"backend": "xla", "bias": None}

@jax.jit
def mid_conv(dec, x, mask, temb):
    for st in dec["mid"]:
        x = E._stage(st, x, mask, temb, ctx, est_cfg.num_heads)
    return x

@jax.jit
def mid_mm(dec, x, mask, temb):
    for st in dec["mid"]:
        x = resnet_mm(st["resnet"], x, mask, temb)
        for blk in st["blocks"]:
            x = E.apply_transformer_block(blk, x, ctx, est_cfg.num_heads)
    return x

for bb in (2, 8, 12, 16):
    x = jnp.asarray(rng.standard_normal((bb, T, 256)), jnp.float32)
    mask = jnp.ones((bb, T, 1), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((bb, 1024)), jnp.float32)
    # numerics check once
    if bb == 2:
        a = mid_conv(dec, x, mask, temb); b = mid_mm(dec, x, mask, temb)
        print("max diff conv vs mm:", float(jnp.max(jnp.abs(a - b))), flush=True)
    tc = timed(mid_conv, (dec, x, mask, temb))
    tm = timed(mid_mm, (dec, x, mask, temb))
    print(f"2B={bb}: mid conv={tc:7.2f} ms   mid matmul={tm:7.2f} ms", flush=True)
