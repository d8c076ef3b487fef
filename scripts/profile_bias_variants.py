"""Composed estimator at 2B=12/16 with different attention-bias shapes."""
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

def est_with_bias(bias_kind):
    def f(dec, x, mask, mu, tt, spks, cond):
        b, seq, _ = x.shape
        t_emb = E.sinusoidal_pos_emb(tt, est_cfg.in_channels).astype(x.dtype)
        t_emb = E.apply_time_mlp(dec["time_mlp"], t_emb)
        spks_t = jnp.broadcast_to(spks[:, None, :], (b, seq, spks.shape[-1])).astype(x.dtype)
        h = jnp.concatenate([x, mu, spks_t, cond], axis=-1)
        pad = mask[:, :, 0].astype(bool)
        if bias_kind == "btt":
            attn_mask = core.chunk_attn_mask(pad, 0)
            bias = core.mask_to_bias(attn_mask)[:, None, :, :]
        elif bias_kind == "keys":
            bias = core.mask_to_bias(pad)[:, None, None, :]  # (B,1,1,T)
        else:
            bias = None
        ctx = {"backend": "xla", "bias": bias}
        h = E._stage(dec["down"], h, mask, t_emb, ctx, est_cfg.num_heads)
        skip = h
        h = core.conv1d(dec["down_conv"], h * mask, padding="causal")
        for mid in dec["mid"]:
            h = E._stage(mid, h, mask, t_emb, ctx, est_cfg.num_heads)
        h = jnp.concatenate([h, skip], axis=-1)
        h = E._stage(dec["up"], h, mask, t_emb, ctx, est_cfg.num_heads)
        h = core.conv1d(dec["up_conv"], h * mask, padding="causal")
        h = E.apply_causal_block(dec["final_block"], h, mask)
        out = core.conv1d(dec["final_proj"], h * mask, padding="valid")
        return out * mask
    return jax.jit(f)

for bb in (8, 12, 16):
    x = jnp.asarray(rng.standard_normal((bb, T, 80)), jnp.float32)
    mask = jnp.ones((bb, T, 1), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((bb, T, 80)), jnp.float32)
    tt = jnp.full((bb,), 0.5, jnp.float32)
    spks = jnp.asarray(rng.standard_normal((bb, 80)), jnp.float32)
    cond = jnp.zeros((bb, T, 80), jnp.float32)
    row = []
    for kind in ("btt", "keys", "none"):
        f = est_with_bias(kind)
        row.append(f"{kind}={timed(f, (dec, x, mask, mu, tt, spks, cond)):7.2f}")
    print(f"2B={bb}: " + "  ".join(row), flush=True)
