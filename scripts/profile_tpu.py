"""Ad-hoc TPU profiling: mel vs vocoder split, f32 vs bf16 estimator."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models import hift as H
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts, synthesize_mel
    from jyutvoice_tpu.weights.noise import rand_noise

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
    t_text, t_mel, t_prompt, b = 128, 512, 128, 1
    noise = jnp.asarray(rand_noise(t_prompt + t_mel))
    rng = np.random.default_rng(0)

    @jax.jit
    def mel_fn(params, x, xl, lang, tone, wp, sp, spk, pf, ph, pl):
        return synthesize_mel(
            params, cfg.tts, x, xl, lang, tone, wp, sp, spk, pf, ph, pl,
            t_mel_max=t_mel, n_timesteps=10, rand_noise=noise,
        ).mel

    @jax.jit
    def voc_fn(params, mel):
        wav, _ = H.hift_inference(params, cfg.hift, mel, deterministic=True)
        return wav

    def cast(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree
        )

    params_bf16 = cast(params, jnp.bfloat16)
    noise_bf16 = noise.astype(jnp.bfloat16)

    @jax.jit
    def mel_fn_bf16(params, x, xl, lang, tone, wp, sp, spk, pf, ph, pl):
        return synthesize_mel(
            params, cfg.tts, x, xl, lang, tone, wp, sp,
            spk.astype(jnp.bfloat16), pf.astype(jnp.bfloat16),
            ph.astype(jnp.bfloat16), pl,
            t_mel_max=t_mel, n_timesteps=10, rand_noise=noise_bf16,
        ).mel

    args = (
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

    t0 = time.time()
    mel = mel_fn(params, *args)
    _ = float(jnp.sum(mel))
    print("mel_fn compile:", round(time.time() - t0, 1), "s", flush=True)
    t0 = time.time()
    _ = float(jnp.sum(voc_fn(params_hift, mel)))
    print("voc_fn compile:", round(time.time() - t0, 1), "s", flush=True)
    t0 = time.time()
    mel_b = mel_fn_bf16(params_bf16, *args)
    _ = float(jnp.sum(mel_b.astype(jnp.float32)))
    print("mel_fn bf16 compile:", round(time.time() - t0, 1), "s", flush=True)

    def timed(fn, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        _ = float(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0

    def amortized(fn, n=21):
        base = min(timed(fn, 1) for _ in range(3))
        tn = min(timed(fn, n) for _ in range(3))
        return (tn - base) / (n - 1)

    m = amortized(lambda: mel_fn(params, *args))
    print("mel f32 per iter:", round(m * 1000, 2), "ms", flush=True)
    v = amortized(lambda: voc_fn(params_hift, mel))
    print("voc per iter:", round(v * 1000, 2), "ms", flush=True)
    mb = amortized(lambda: mel_fn_bf16(params_bf16, *args))
    print("mel bf16 per iter:", round(mb * 1000, 2), "ms", flush=True)

    mae = float(jnp.mean(jnp.abs(mel - mel_b.astype(jnp.float32))))
    print("bf16 vs f32 mel MAE:", mae, flush=True)
    audio_s = t_mel * 480 / 24000
    print("xRT f32:", round(audio_s / (m + v), 1),
          " xRT bf16:", round(audio_s / (mb + v), 1), flush=True)


if __name__ == "__main__":
    main()
