"""Banded-attention negative results — the measurement recipes.

Reproduces the round-4 design.md claims that were measured and REJECTED,
so future rounds do not re-explore them blind:

  --batch      batching long banded solves scales worse than linear
               (b=1/2/4 at T=4096: ~820/864/953 ms per request — the
               post-band solve is bandwidth-bound linear-stage work)
  --online     two-pass online-softmax banded op (no (chunk,w) prob
               materialization): ~2x SLOWER than the slab form (score
               recomputation in small tiles dominates)
  --chunks     chunk-size sweep at fixed-ish window (c256(1,1) vs
               c128(2,2) within noise; larger windows scale with w)
  --mat16      bf16-materialized band (one big einsum, N=w tiles):
               loses to the slab form (band HBM write outweighs tiling)

Isolated-op timings under the tunnel RTT are noisy (+-70% run-to-run at
<5 ms) — compare variants WITHIN one run only, and never run two TPU
processes concurrently (CLAUDE.md: the N-iter-minus-base method silently
underestimates when another job stalls the base measurement).
"""
import argparse
import dataclasses
import functools
import math
import os
import time

import numpy as np


def _setup():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _timed(f, *args, iters=10, repeats=3):
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        w = None
        for _ in range(n):
            w = f(*args)
        float(jnp.sum(w))
        return time.perf_counter() - t0

    base = min(run(1) for _ in range(repeats))
    tn = min(run(iters + 1) for _ in range(repeats))
    return max((tn - base) / iters, 1e-9)


def _qkv(t, b=2, h=8, d=64, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    lengths = jnp.asarray([t] * (b - 1) + [t - 37], jnp.int32)
    return q, k, v, lengths


def bench_batch():
    import jax
    import jax.numpy as jnp

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.cfm import cfm_forward
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.weights.noise import rand_noise_extended

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    dec = params["decoder"]
    rng = np.random.default_rng(0)
    for t_mel in (4096, 12288):
        noise = jnp.asarray(rand_noise_extended(t_mel))
        audio_s = t_mel * cfg.audio.hop_length / cfg.audio.sample_rate
        for b in (1, 2, 4):
            mu = jnp.asarray(rng.standard_normal((b, t_mel, 80)), jnp.float32)
            mask = jnp.ones((b, t_mel, 1), jnp.float32)
            spks = jnp.asarray(rng.standard_normal((b, 80)), jnp.float32)
            cond = jnp.zeros((b, t_mel, 80), jnp.float32)

            @jax.jit
            def solve(dec, mu, mask, spks, cond, noise):
                return cfm_forward(dec, cfg.tts.cfm, mu, mask, spks, cond,
                                   n_timesteps=10, rand_noise=noise)

            try:
                solve(dec, mu, mask, spks, cond, noise)
                p = _timed(solve, dec, mu, mask, spks, cond, noise,
                           iters=2, repeats=2)
                print(f"T={t_mel} b={b}: {p*1000:8.1f} ms  per-req "
                      f"{p/b*1000:7.1f} ms  agg {audio_s*b/p:7.1f}x RT",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"T={t_mel} b={b}: FAILED {type(e).__name__}", flush=True)


def _banded_online(q, k, v, lengths, *, chunk, left, right):
    import jax
    import jax.numpy as jnp

    b, h, t, d = q.shape
    nc = t // chunk
    n_slabs = left + 1 + right
    scale = 1.0 / math.sqrt(d)
    kp = jnp.pad(k, ((0, 0), (0, 0), (left * chunk, right * chunk), (0, 0))).astype(jnp.bfloat16)
    vp = jnp.pad(v, ((0, 0), (0, 0), (left * chunk, right * chunk), (0, 0))).astype(jnp.bfloat16)
    qc = q.reshape(b, h, nc, chunk, d).astype(jnp.bfloat16)

    def slab(x, j):
        return jax.lax.slice_in_dim(x, j * chunk, j * chunk + t, axis=2).reshape(
            b, h, nc, chunk, x.shape[-1]
        )

    c_idx = jax.lax.broadcasted_iota(jnp.int32, (nc, chunk), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (nc, chunk), 1)

    def scores_j(j):
        s = jnp.einsum("bhcqd,bhckd->bhcqk", qc, slab(kp, j),
                       preferred_element_type=jnp.float32) * scale
        pos = c_idx * chunk - left * chunk + j * chunk + k_idx
        keep = (pos >= 0)[None] & (pos[None] < lengths[:, None, None])
        return jnp.where(keep[:, None, :, None, :], s, -1e10)

    m = jnp.full((b, h, nc, chunk, 1), -1e30, jnp.float32)
    for j in range(n_slabs):
        m = jnp.maximum(m, jnp.max(scores_j(j), axis=-1, keepdims=True))
    l = jnp.zeros((b, h, nc, chunk, 1), jnp.float32)
    for j in range(n_slabs):
        l = l + jnp.sum(jnp.exp(scores_j(j) - m), axis=-1, keepdims=True)
    out = jnp.zeros((b, h, nc, chunk, d), jnp.float32)
    for j in range(n_slabs):
        p = (jnp.exp(scores_j(j) - m) / jnp.maximum(l, 1e-30)).astype(jnp.bfloat16)
        out = out + jnp.einsum("bhcqk,bhckd->bhcqd", p, slab(vp, j),
                               preferred_element_type=jnp.float32)
    return out.reshape(b, h, t, d).astype(v.dtype)


def _banded_mat16(q, k, v, lengths, *, chunk, left, right):
    import jax
    import jax.numpy as jnp

    b, h, t, d = q.shape
    nc = t // chunk
    n_slabs = left + 1 + right
    w = n_slabs * chunk
    scale = 1.0 / math.sqrt(d)
    kp = jnp.pad(k, ((0, 0), (0, 0), (left * chunk, right * chunk), (0, 0))).astype(jnp.bfloat16)
    vp = jnp.pad(v, ((0, 0), (0, 0), (left * chunk, right * chunk), (0, 0))).astype(jnp.bfloat16)
    qc = q.reshape(b, h, nc, chunk, d).astype(jnp.bfloat16)

    def band(x):
        return jnp.stack([
            jax.lax.slice_in_dim(x, j * chunk, j * chunk + t, axis=2)
            .reshape(b, h, nc, chunk, d)
            for j in range(n_slabs)
        ], axis=3).reshape(b, h, nc, w, d)

    kb, vb = band(kp), band(vp)
    s = jnp.einsum("bhcqd,bhcwd->bhcqw", qc, kb,
                   preferred_element_type=jnp.bfloat16) * jnp.bfloat16(scale)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (nc, w), 0)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (nc, w), 1)
    pos = c_idx * chunk - left * chunk + w_idx
    keep = (pos >= 0)[None] & (pos[None] < lengths[:, None, None])
    s = jnp.where(keep[:, None, :, None, :], s, jnp.bfloat16(-1e10))
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum("bhcqw,bhcwd->bhcqd", p, vb,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, t, d).astype(v.dtype)


def bench_ops(which):
    import jax

    from jyutvoice_tpu.nn import attention as A

    q, k, v, lengths = _qkv(12288)
    kw = dict(chunk=128, left=2, right=2)
    variants = [("slab(cur)", jax.jit(functools.partial(
        A.banded_sdpa, compact_scores=True, **kw)))]
    if which == "online":
        variants.append(("online", jax.jit(functools.partial(_banded_online, **kw))))
    elif which == "mat16":
        variants.append(("mat_bf16", jax.jit(functools.partial(_banded_mat16, **kw))))
    outs = {}
    for name, f in variants:
        outs[name] = np.asarray(f(q, k, v, lengths))
        p = _timed(f, q, k, v, lengths, iters=20)
        print(f"{name:10s}: {p*1000:7.2f} ms/op", flush=True)
    names = list(outs)
    if len(names) == 2:
        print(f"MAE {np.abs(outs[names[0]] - outs[names[1]]).mean():.2e}")


def bench_chunks():
    import jax

    from jyutvoice_tpu.nn import attention as A

    q, k, v, lengths = _qkv(12288)
    for name, ch, l, r in [("c128_2_2", 128, 2, 2), ("c256_1_1", 256, 1, 1),
                           ("c256_2_2", 256, 2, 2), ("c384_1_1", 384, 1, 1),
                           ("c512_1_1", 512, 1, 1)]:
        if q.shape[2] % ch:
            continue
        f = jax.jit(functools.partial(
            A.banded_sdpa, chunk=ch, left=l, right=r, compact_scores=True))
        f(q, k, v, lengths)
        p = _timed(f, q, k, v, lengths, iters=10)
        print(f"{name:10s} (w={(l+1+r)*ch:4d}): {p*1000:7.2f} ms/op", flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", action="store_true")
    ap.add_argument("--online", action="store_true")
    ap.add_argument("--chunks", action="store_true")
    ap.add_argument("--mat16", action="store_true")
    args = ap.parse_args()
    _setup()
    if args.batch or not any((args.batch, args.online, args.chunks, args.mat16)):
        bench_batch()
    if args.online:
        bench_ops("online")
    if args.chunks:
        bench_chunks()
    if args.mat16:
        bench_ops("mat16")


if __name__ == "__main__":
    main()
