"""Single-chip long-form decode envelope: solve+vocode time / memory vs T.

Motivates dist/sp.py: the (2B, H, T, T) attention working set grows
quadratically; this script measures where one chip's HBM runs out and what
xRT long one-pass decodes achieve below that wall.
"""
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
    from jyutvoice_tpu.models import hift as hift_mod
    from jyutvoice_tpu.models.cfm import cfm_forward
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.weights.noise import rand_noise_extended

    cfg = JyutVoiceConfig()
    key = jax.random.PRNGKey(0)
    params = init_tts(key, cfg.tts)
    params_hift = init_hift(jax.random.fold_in(key, 1), cfg.hift)
    rng = np.random.default_rng(0)
    hop, sr = cfg.audio.hop_length, cfg.audio.sample_rate

    for t_mel in (2048, 4096, 8192, 12288):
        try:
            mu = jnp.asarray(rng.standard_normal((1, t_mel, 80)), jnp.float32)
            mask = jnp.ones((1, t_mel, 1), jnp.float32)
            spks = jnp.asarray(rng.standard_normal((1, 80)), jnp.float32)
            cond = jnp.zeros((1, t_mel, 80), jnp.float32)
            noise = jnp.asarray(rand_noise_extended(t_mel))
            cfm_cfg = cfg.tts.cfm

            @jax.jit
            def solve(dec, mu, mask, spks, cond, noise):
                return cfm_forward(
                    dec, cfm_cfg, mu, mask, spks, cond,
                    n_timesteps=10, rand_noise=noise,
                )

            @jax.jit
            def voc(ph, mel):
                return hift_mod.hift_inference(
                    ph, cfg.hift, mel, deterministic=True
                )[0]

            def run():
                return voc(params_hift, solve(
                    params["decoder"], mu, mask, spks, cond, noise))

            float(jnp.sum(run()))  # compile + any OOM surfaces here

            def timed(n):
                t0 = time.perf_counter()
                w = None
                for _ in range(n):
                    w = run()
                float(jnp.sum(w))
                return time.perf_counter() - t0

            base = min(timed(1) for _ in range(2))
            tn = min(timed(4) for _ in range(2))
            p = max((tn - base) / 3, 1e-9)
            audio_s = t_mel * hop / sr
            print(
                f"T={t_mel:6d} ({audio_s:6.1f} s audio): {p*1000:8.1f} ms "
                f"-> {audio_s/p:6.1f}x RT",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — expected: OOM at the wall
            print(f"T={t_mel:6d}: FAILED ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)
            break


if __name__ == "__main__":
    main()
