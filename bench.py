"""Benchmark: synthesis real-time factor (xRT) at 24 kHz on one chip.

Measures the steady-state compiled throughput of the flagship path — full
synthesise graph (text encoder -> durations -> expand -> 10-step CFM Euler
with CFG) + HiFT vocoder — at the 512-frame mel bucket (10.24 s of audio),
plus a p50 latency curve over the 128/256/512/1024 buckets.

Prints ONE JSON line:
  {"metric": "synthesis_xrt_24khz", "value": N, "unit": "x_realtime",
   "vs_baseline": N}   — vs_baseline = xRT / 20 (BASELINE.md target:
   >= 20x real-time per TPU v5e core).

Weights: converted checkpoints from pretrained_models_tpu/ when present
(identical FLOPs either way), otherwise random init — stated in the JSON
detail for transparency.
"""

import json
import os
import time

import numpy as np

HEADLINE_BUCKET = 512
# 2048 = 41 s one-pass decode (stock-flash gate + 512-promoted prompt);
# 12288 = 246 s decode (flash + windowed vocoder) — the long-form story
# in the official curve. The 12288 point runs few iterations (one solve
# is ~5 s of device time); it is a detail metric, not the headline.
CURVE_BUCKETS = (128, 256, 512, 1024, 2048, 12288)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the tunneled TPU platform autotunes
    convolutions for minutes on first compile; cache survives processes."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _load_weights(cfg):
    """(params_tts, params_hift, source_label): converted checkpoints when
    pretrained_models_tpu/ has them, random init otherwise."""
    import jax

    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts

    tts_npz = os.path.join("pretrained_models_tpu", "tts.npz")
    hift_npz = os.path.join("pretrained_models_tpu", "hift.npz")
    if os.path.exists(tts_npz) and os.path.exists(hift_npz):
        from jyutvoice_tpu.weights.provision import load_pytree_npz

        return load_pytree_npz(tts_npz), load_pytree_npz(hift_npz), "converted"

    key = jax.random.PRNGKey(0)
    return (
        init_tts(key, cfg.tts),
        init_hift(jax.random.fold_in(key, 1), cfg.hift),
        "random-init",
    )


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models import hift as hift_mod
    from jyutvoice_tpu.models.tts import synthesize_mel
    from jyutvoice_tpu.weights.noise import rand_noise

    cfg = JyutVoiceConfig()
    params, params_hift, weights_src = _load_weights(cfg)

    t_text, t_prompt = 128, 128
    n_steps = 10
    b = 1
    rng = np.random.default_rng(0)
    hift_cfg = cfg.hift
    tts_cfg = cfg.tts

    base_args = (
        jnp.asarray(rng.integers(1, 97, (b, t_text)), jnp.int32),
        jnp.asarray([t_text], jnp.int32),
        jnp.asarray(rng.integers(0, 4, (b, t_text)), jnp.int32),
        jnp.asarray(rng.integers(0, 7, (b, t_text)), jnp.int32),
        jnp.asarray(rng.integers(0, 4, (b, t_text)), jnp.int32),
        jnp.asarray(rng.integers(0, 4, (b, t_text)), jnp.int32),
        jnp.asarray(rng.standard_normal((b, 192)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, t_prompt, 80)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, t_prompt, 80)), jnp.float32),
        jnp.asarray([t_prompt], jnp.int32),
    )

    def _graph_flops(jitted, *args) -> float:
        """Analytic per-dispatch FLOPs from XLA's compiled cost model; 0.0
        when the platform/runtime does not expose cost_analysis."""
        try:
            ca = jitted.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:  # noqa: BLE001 — cost model is best-effort
            return 0.0

    def bucket_runner(t_mel: int):
        # mirror the production pipeline's prompt padding: long-form
        # buckets promote the prompt pad to 512 so prompt+mel totals are
        # 512-aligned and the stock-flash attention gate fires
        # (pipeline/buckets.py::pick_prompt_bucket, net 1.24-1.42x)
        from jyutvoice_tpu.pipeline.buckets import pick_prompt_bucket

        t_prompt_pad = pick_prompt_bucket(t_prompt, t_mel)
        args = list(base_args)
        if t_prompt_pad != t_prompt:
            pad = ((0, 0), (0, t_prompt_pad - t_prompt), (0, 0))
            args[7] = jnp.asarray(np.pad(np.asarray(args[7]), pad))
            args[8] = jnp.asarray(np.pad(np.asarray(args[8]), pad))
        args = tuple(args)
        noise = jnp.asarray(rand_noise(t_prompt_pad + t_mel))

        @jax.jit
        def mel_fn(params, x, x_lengths, lang, tone, word_pos, syllable_pos,
                   spk, prompt_feat, prompt_h, prompt_lengths):
            out = synthesize_mel(
                params, tts_cfg, x, x_lengths, lang, tone, word_pos,
                syllable_pos, spk, prompt_feat, prompt_h, prompt_lengths,
                t_mel_max=t_mel, n_timesteps=n_steps, rand_noise=noise,
            )
            return out.mel

        @jax.jit
        def voc_fn(params, mel):
            # auto-windows batch-1 long-form mels, as production does
            wav, _ = hift_mod.hift_vocode_auto(
                params, hift_cfg, mel, deterministic=True
            )
            return wav

        def run_once():
            return voc_fn(params_hift, mel_fn(params, *args))

        def flops():
            # abstract mel operand: lowering needs only shape/dtype —
            # never dispatch an extra multi-second solve for a FLOP count
            mel_abs = jax.ShapeDtypeStruct((1, t_mel, 80), jnp.float32)
            return (
                _graph_flops(mel_fn, params, *args)
                + _graph_flops(voc_fn, params_hift, mel_abs)
            )

        return run_once, flops

    def measure(run_once, iters: int, repeats: int) -> float:
        """p50 per-iteration seconds. The scalar readback forces real device
        completion (block_until_ready is unreliable over the tunneled TPU
        runtime); the 1-iteration baseline subtracts the fixed readback RTT.
        """

        def timed(n: int) -> float:
            t0 = time.perf_counter()
            wav = None
            for _ in range(n):
                wav = run_once()
            float(jnp.sum(wav))  # single readback barrier
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(repeats))
        tn = min(timed(iters + 1) for _ in range(repeats))
        return max((tn - t1) / iters, 1e-6)

    hop, sr = cfg.audio.hop_length, cfg.audio.sample_rate
    curve, bucket_flops = {}, {}
    for t_mel in CURVE_BUCKETS:
        run_once, flops = bucket_runner(t_mel)
        float(jnp.sum(run_once()))  # warmup / compile
        is_headline = t_mel == HEADLINE_BUCKET
        p50 = measure(
            run_once,
            iters=20 if is_headline else (2 if t_mel >= 8192 else 8),
            repeats=3 if is_headline else 2,
        )
        curve[t_mel] = p50
        bucket_flops[t_mel] = flops()

    # achieved TFLOPS / MFU per bucket (XLA cost-model FLOPs / measured p50;
    # denominator = v5e bf16 MXU peak — the estimator's f32 matmuls run as
    # bf16 MXU passes, CLAUDE.md measured envelope)
    PEAK_TFLOPS = 197.0
    tflops = {
        t: (bucket_flops[t] / curve[t]) / 1e12
        for t in CURVE_BUCKETS
        if bucket_flops[t] > 0
    }
    mfu = {t: v / PEAK_TFLOPS for t, v in tflops.items()}

    # regression guard: compare against the last committed round's curve;
    # a bucket >10% slower gets flagged in the JSON (VERDICT r3 weak #6)
    regressions = []
    prev_curve, prev_round = {}, None
    try:
        import glob

        cands = sorted(glob.glob("BENCH_r*.json"))
        if cands:
            prev_round = cands[-1]
            with open(prev_round) as f:
                prev = json.load(f)
            prev_curve = (
                prev.get("parsed", {}).get("detail", {}).get("bucket_p50_s", {})
            )
        for t_str, prev_p50 in prev_curve.items():
            t = int(t_str)
            if t in curve and prev_p50 > 0 and curve[t] > 1.10 * prev_p50:
                regressions.append(
                    {
                        "bucket": t,
                        "prev_p50_s": prev_p50,
                        "p50_s": round(curve[t], 4),
                        "slowdown": round(curve[t] / prev_p50, 3),
                    }
                )
    except Exception:  # noqa: BLE001 — the guard must never fail the bench
        pass

    p50 = curve[HEADLINE_BUCKET]
    audio_seconds = HEADLINE_BUCKET * hop / sr
    xrt = audio_seconds / p50
    print(
        json.dumps(
            {
                "metric": "synthesis_xrt_24khz",
                "value": round(xrt, 3),
                "unit": "x_realtime",
                "vs_baseline": round(xrt / 20.0, 3),
                "detail": {
                    "p50_latency_s": round(p50, 4),
                    "audio_seconds": audio_seconds,
                    "mel_bucket": HEADLINE_BUCKET,
                    "n_timesteps": n_steps,
                    "weights": weights_src,
                    "bucket_p50_s": {
                        str(t): round(v, 4) for t, v in curve.items()
                    },
                    "bucket_xrt": {
                        str(t): round(t * hop / sr / v, 1)
                        for t, v in curve.items()
                    },
                    "bucket_tflops": {
                        str(t): round(v, 1) for t, v in tflops.items()
                    },
                    "bucket_mfu": {
                        str(t): round(v, 4) for t, v in mfu.items()
                    },
                    "peak_tflops_denominator": PEAK_TFLOPS,
                    # buckets whose estimator total (prompt 512 + mel)
                    # crosses banded_long_threshold decode with the
                    # (2,2) chunk-band default — ~2% mel divergence vs
                    # full attention, docs/design.md round 4
                    "long_attention": (
                        f"banded@T>="
                        f"{cfg.tts.cfm.estimator.banded_long_threshold}"
                        if cfg.tts.cfm.estimator.banded_long_threshold
                        else "flash"
                    ),
                    "regressions_vs_prev": regressions,
                    "prev_curve_from": prev_round,
                    "platform": jax.devices()[0].platform,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
