"""Round-2 perf experiments: bf16 attention scores at large batch,
bf16 activations with matmul convs, vocoder matmul convs."""
import os, time, dataclasses, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig, HiFTConfig
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models import estimator as E
from jyutvoice_tpu.models import hift as H
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

# ---- experiment 1: bf16 attention scores at 2B=16 ----
def tblock_bf16scores(p, x, n_heads):
    h = core.layer_norm(p["norm1"], x)
    q = attention.split_heads(maybe_linear(p["attn"]["q"], h), n_heads)
    k = attention.split_heads(maybe_linear(p["attn"]["k"], h), n_heads)
    v = attention.split_heads(maybe_linear(p["attn"]["v"], h), n_heads)
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.bfloat16) * (1.0/np.sqrt(d))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
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
                if kind == "bf16s":
                    x = tblock_bf16scores(blk, x, est_cfg.num_heads)
                else:
                    x = E.apply_transformer_block(blk, x, ctx, est_cfg.num_heads)
        return x
    return jax.jit(f)

for bb in (4, 16):
    x = jnp.asarray(rng.standard_normal((bb, T, 256)), jnp.float32)
    mask = jnp.ones((bb, T, 1), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((bb, 1024)), jnp.float32)
    if bb == 4:
        a = mid("xla")(dec, x, mask, temb); b = mid("bf16s")(dec, x, mask, temb)
        rel = float(jnp.max(jnp.abs(a-b)) / (jnp.std(a)+1e-9))
        print(f"bf16-scores rel maxdiff: {rel:.4f}", flush=True)
    tx = timed(mid("xla"), (dec, x, mask, temb))
    tb = timed(mid("bf16s"), (dec, x, mask, temb))
    print(f"exp1 2B={bb}: mid f32-scores={tx:7.2f}  bf16-scores={tb:7.2f}", flush=True)

# ---- experiment 2: vocoder with matmul convs for the k<=3 convs ----
orig_conv = core.conv1d
def conv_auto(p, x, **kw):
    k = p["w"].shape[0]
    pad = kw.get("padding", "same_torch")
    if k <= 3 and kw.get("stride", 1) == 1 and kw.get("groups", 1) == 1 \
       and isinstance(pad, str) and (k == 1 or pad in ("causal", "same_torch")):
        return core.conv1d_matmul(p, x, padding=pad, dilation=kw.get("dilation", 1))
    return orig_conv(p, x, **kw)

hcfg = HiFTConfig()
ph = init_hift(jax.random.PRNGKey(1), hcfg)
@jax.jit
def voc(ph, mel):
    wav, _ = H.hift_inference(ph, hcfg, mel, deterministic=True)
    return wav
for b in (1, 4):
    mel = jnp.asarray(rng.standard_normal((b, T, 80)), jnp.float32)
    t0 = timed(voc, (ph, mel))
    core.conv1d = conv_auto
    H.core.conv1d = conv_auto
    @jax.jit
    def voc_mm(ph, mel):
        wav, _ = H.hift_inference(ph, hcfg, mel, deterministic=True)
        return wav
    t1 = timed(voc_mm, (ph, mel))
    core.conv1d = orig_conv
    H.core.conv1d = orig_conv
    print(f"exp2 voc b={b}: conv={t0:6.1f} ms  k<=3-as-matmul={t1:6.1f} ms", flush=True)
