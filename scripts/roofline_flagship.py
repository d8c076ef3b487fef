"""Roofline decomposition of the flagship bucket (VERDICT r4 #5).

bench.py's headline (T_mel=512 + 128-frame prompt, 10 Euler steps + HiFT)
claims "near the ceiling" — this pins it per stage. For each component
the script measures p50 device time (N-iter minus readback-base, the
platform-correct method) and computes its ROOFLINE BOUND from XLA's
compiled cost model:

    bound_s = max(flops / 80e12, bytes / 800e9)

(80 TFLOPS = this chip's MEASURED effective f32-via-bf16 matmul ceiling,
CLAUDE.md; 800 GB/s HBM) — so `achieved = bound / measured` is the
fraction of the attainable (not theoretical-peak) rate.

CAVEAT (measured round 5): XLA's "bytes accessed" counts LOGICAL operand
reads/writes — fusion-internal traffic served from VMEM included — so it
overcounts true HBM bytes severalfold and rows can show attained > 1.
Read the HBM side as a slack upper bound; the FLOPs bound is the honest
one (and bf16 MXU passes can beat the 80 TFLOPS f32-effective
denominator, e.g. the attention stack at ~96 TFLOPS-equivalent).

Components:
  pipeline     full bench graph (synthesize_mel + vocoder)  [= bench p50]
  mel          synthesize_mel only (encoder+dur+expand+10-step solve)
  solve10      10x estimator (derived: mel(10 steps) - mel(0 steps))
  estimator1   one estimator call at the solve shape (2B=2, T=640)
  conv_stack   estimator with the 56 attention blocks REMOVED (params
               pruned) — the resnet/causal-conv/proj share
  attn56       56 sequential transformer blocks on (2,640,256) — the
               attention+FF share
  vocoder      hift at T=512
  dispatch     empty jitted graph (pure launch+readback overhead)

Run on TPU, alone (one TPU job at a time). Prints a JSON line per
component + a share table; recorded in docs/design.md round 5.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models import hift as hift_mod
    from jyutvoice_tpu.models.estimator import apply_estimator
    from jyutvoice_tpu.models.tts import init_tts, synthesize_mel
    from jyutvoice_tpu.weights.noise import rand_noise

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    params_hift = __import__(
        "jyutvoice_tpu.models.hift", fromlist=["init_hift"]
    ).init_hift(jax.random.PRNGKey(1), cfg.hift)
    dec = params["decoder"]
    est_cfg = cfg.tts.cfm.estimator
    rng = np.random.default_rng(0)

    T_MEL, T_PROMPT, T_TEXT, STEPS = 512, 128, 128, 10
    T_SOLVE = T_MEL + T_PROMPT  # 640: the estimator shape inside the solve
    B2 = 2  # CFG batch doubling at request batch 1

    def timed(fn, args, iters=20, reps=3):
        _ = float(jnp.sum(fn(*args)))  # compile
        def t(n):
            o = None
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(*args)
            float(jnp.sum(o))
            return time.perf_counter() - t0
        base = min(t(1) for _ in range(reps))
        tn = min(t(iters + 1) for _ in range(reps))
        return max((tn - base) / iters, 1e-9)

    def cost(fn, *args):
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0)), float(
                ca.get("bytes accessed", 0.0)
            )
        except Exception:
            return 0.0, 0.0

    # ---- bench-identical pipeline inputs --------------------------------
    base_args = (
        jnp.asarray(rng.integers(1, 97, (1, T_TEXT)), jnp.int32),
        jnp.asarray([T_TEXT], jnp.int32),
        jnp.asarray(rng.integers(0, 4, (1, T_TEXT)), jnp.int32),
        jnp.asarray(rng.integers(0, 7, (1, T_TEXT)), jnp.int32),
        jnp.asarray(rng.integers(0, 4, (1, T_TEXT)), jnp.int32),
        jnp.asarray(rng.integers(0, 4, (1, T_TEXT)), jnp.int32),
        jnp.asarray(rng.standard_normal((1, 192)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, T_PROMPT, 80)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, T_PROMPT, 80)), jnp.float32),
        jnp.asarray([T_PROMPT], jnp.int32),
    )
    noise = jnp.asarray(rand_noise(T_SOLVE))

    def mel_graph(n_steps):
        @jax.jit
        def mel_fn(params, *a):
            return synthesize_mel(
                params, cfg.tts, *a, t_mel_max=T_MEL, n_timesteps=n_steps,
                rand_noise=noise,
            ).mel
        return mel_fn

    @jax.jit
    def voc_fn(p, mel):
        wav, _ = hift_mod.hift_vocode_auto(p, cfg.hift, mel, deterministic=True)
        return wav

    mel_fn10 = mel_graph(STEPS)
    mel_fn1 = mel_graph(1)

    # ---- estimator-shape inputs ----------------------------------------
    x = jnp.asarray(rng.standard_normal((B2, T_SOLVE, 80)), jnp.float32)
    mask = jnp.ones((B2, T_SOLVE, 1), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B2, T_SOLVE, 80)), jnp.float32)
    tt = jnp.full((B2,), 0.5, jnp.float32)
    spks = jnp.asarray(rng.standard_normal((B2, 80)), jnp.float32)
    cond = jnp.zeros((B2, T_SOLVE, 80), jnp.float32)
    h256 = jnp.asarray(
        rng.standard_normal((B2, T_SOLVE, est_cfg.channels[0])), jnp.float32
    )

    @jax.jit
    def est_fn(dec, x, mask, mu, tt, spks, cond):
        return apply_estimator(dec, est_cfg, x, mask, mu, tt, spks, cond)

    # conv-only estimator: prune every stage's transformer blocks
    def prune_blocks(tree):
        import copy
        t = copy.copy(tree)
        out = {}
        for k, v in t.items():
            if k == "blocks":
                out[k] = []
            elif isinstance(v, dict):
                out[k] = prune_blocks(v)
            elif isinstance(v, list):
                out[k] = [
                    prune_blocks(e) if isinstance(e, dict) else e for e in v
                ]
            else:
                out[k] = v
        return out

    dec_noattn = prune_blocks(dec)

    @jax.jit
    def conv_fn(dec, x, mask, mu, tt, spks, cond):
        return apply_estimator(dec, est_cfg, x, mask, mu, tt, spks, cond)

    # 56 sequential transformer blocks (down 4 + mid 12*4 + up 4 = 56 in
    # the live config), reusing one block's weights — timing-equivalent
    from jyutvoice_tpu.models.estimator import apply_transformer_block
    from jyutvoice_tpu.nn import core

    blk = dec["down"]["blocks"][0]
    n_blocks_total = est_cfg.n_blocks * (2 + est_cfg.num_mid_blocks)
    pad = mask[:, :, 0].astype(bool)
    bias = core.mask_to_bias(
        core.chunk_attn_mask(pad, 0, est_cfg.num_decoding_left_chunks)
    )[:, None, :, :]

    @jax.jit
    def attn56_fn(blk, h):
        ctx = {"backend": "xla", "bias": bias}
        for _ in range(n_blocks_total):
            h = apply_transformer_block(blk, h, ctx, est_cfg.num_heads)
        return h

    mel_abs = jax.ShapeDtypeStruct((1, T_MEL, 80), jnp.float32)
    mel_in = jnp.asarray(rng.standard_normal((1, T_MEL, 80)), jnp.float32)

    @jax.jit
    def empty_fn(v):
        return v + 1.0

    one = jnp.ones((8,), jnp.float32)

    comps = {}
    comps["pipeline"] = (
        timed(lambda *a: voc_fn(params_hift, mel_fn10(params, *a)), base_args),
        *(lambda fm, fv: (fm[0] + fv[0], fm[1] + fv[1]))(
            cost(mel_fn10, params, *base_args), cost(voc_fn, params_hift, mel_abs)
        ),
    )
    comps["mel10"] = (timed(mel_fn10, (params,) + base_args),
                      *cost(mel_fn10, params, *base_args))
    comps["mel1"] = (timed(mel_fn1, (params,) + base_args),
                     *cost(mel_fn1, params, *base_args))
    comps["estimator1"] = (timed(est_fn, (dec, x, mask, mu, tt, spks, cond)),
                           *cost(est_fn, dec, x, mask, mu, tt, spks, cond))
    comps["conv_stack1"] = (
        timed(conv_fn, (dec_noattn, x, mask, mu, tt, spks, cond)),
        *cost(conv_fn, dec_noattn, x, mask, mu, tt, spks, cond),
    )
    comps["attn56_1"] = (timed(attn56_fn, (blk, h256)),
                         *cost(attn56_fn, blk, h256))
    comps["vocoder"] = (timed(voc_fn, (params_hift, mel_in)),
                        *cost(voc_fn, params_hift, mel_in))
    comps["dispatch"] = (timed(empty_fn, (one,), iters=50), 0.0, 0.0)

    MATMUL_TFLOPS, HBM_GBS = 80e12, 800e9
    out = {}
    for name, (sec, flops, byts) in comps.items():
        bound = max(flops / MATMUL_TFLOPS, byts / HBM_GBS)
        out[name] = {
            "ms": round(sec * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "mb": round(byts / 1e6, 1),
            "bound_ms": round(bound * 1e3, 3),
            "attained": round(bound / sec, 3) if bound else None,
            "limit": (
                None if not bound
                else ("mxu" if flops / MATMUL_TFLOPS >= byts / HBM_GBS
                      else "hbm")
            ),
        }
        print(json.dumps({"component": name, **out[name]}), flush=True)

    # derived shares of the pipeline
    pipe = comps["pipeline"][0]
    solve10 = comps["mel10"][0] - comps["mel1"][0]  # 9 extra steps
    per_step = solve10 / (STEPS - 1)
    encoder_rest = comps["mel10"][0] - per_step * STEPS
    print(json.dumps({
        "summary": {
            "pipeline_ms": round(pipe * 1e3, 2),
            "solve_per_step_ms": round(per_step * 1e3, 3),
            "solve10_ms": round(per_step * STEPS * 1e3, 2),
            "encoder_dur_expand_ms": round(encoder_rest * 1e3, 2),
            "vocoder_ms": round(comps["vocoder"][0] * 1e3, 2),
            "dispatch_ms": round(comps["dispatch"][0] * 1e3, 3),
            "share_solve": round(per_step * STEPS / pipe, 3),
            "share_vocoder": round(comps["vocoder"][0] / pipe, 3),
            "share_encoder": round(encoder_rest / pipe, 3),
            "est1_attn_ms": round(comps["attn56_1"][0] * 1e3, 3),
            "est1_conv_ms": round(comps["conv_stack1"][0] * 1e3, 3),
            "est1_total_ms": round(comps["estimator1"][0] * 1e3, 3),
        }
    }))


if __name__ == "__main__":
    main()
