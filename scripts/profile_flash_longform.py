"""Long-form estimator attention: pallas flash vs XLA bf16-score path.

Round 2 measured the pallas flash kernel losing to plain XLA SDPA at the
512-frame serving bucket (docs/design.md optimization matrix). This script
re-asks the question where it should flip: one-pass long-form decodes
(T >= 2048), where the XLA path materializes the quadratic (2B, H, T, T)
score tensor (bf16-gated since round 3) while the flash kernel streams K/V
blocks through VMEM in O(T) memory.

Measures the full 10-step CFM solve (batch 1, CFG -> 2B=2) per backend and
the mel MAE between them (the f32-score XLA path at the same T is the
quality anchor). Timing per CLAUDE.md: chained iterations with one host
readback fence, min over repeats.
"""
import dataclasses
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.cfm import cfm_forward
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.weights.noise import rand_noise_extended

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    dec = params["decoder"]
    rng = np.random.default_rng(0)
    hop, sr = cfg.audio.hop_length, cfg.audio.sample_rate

    def cfm_cfg_with(backend: str):
        est = dataclasses.replace(
            cfg.tts.cfm.estimator, attention_backend=backend
        )
        return dataclasses.replace(cfg.tts.cfm, estimator=est)

    for t_mel in (1024, 2048, 4096, 8192, 12288):
        mu = jnp.asarray(rng.standard_normal((1, t_mel, 80)), jnp.float32)
        mask = jnp.ones((1, t_mel, 1), jnp.float32)
        spks = jnp.asarray(rng.standard_normal((1, 80)), jnp.float32)
        cond = jnp.zeros((1, t_mel, 80), jnp.float32)
        noise = jnp.asarray(rand_noise_extended(t_mel))
        audio_s = t_mel * hop / sr

        outs, times = {}, {}
        for backend in ("xla", "pallas"):
            cc = cfm_cfg_with(backend)

            @jax.jit
            def solve(dec, mu, mask, spks, cond, noise, cc=cc):
                return cfm_forward(
                    dec, cc, mu, mask, spks, cond,
                    n_timesteps=10, rand_noise=noise,
                )

            try:
                out = solve(dec, mu, mask, spks, cond, noise)
                outs[backend] = np.asarray(out)

                def timed(n):
                    t0 = time.perf_counter()
                    w = None
                    for _ in range(n):
                        w = solve(dec, mu, mask, spks, cond, noise)
                    float(jnp.sum(w))
                    return time.perf_counter() - t0

                base = min(timed(1) for _ in range(2))
                tn = min(timed(4) for _ in range(2))
                times[backend] = max((tn - base) / 3, 1e-9)
            except Exception as e:  # noqa: BLE001 — OOM at the wall
                print(f"T={t_mel} {backend}: FAILED "
                      f"({type(e).__name__}: {str(e)[:160]})", flush=True)

        if "xla" in times and "pallas" in times:
            mae = float(np.abs(outs["xla"] - outs["pallas"]).mean())
            px, pp = times["xla"], times["pallas"]
            print(
                f"T={t_mel:6d} ({audio_s:6.1f} s): xla {px*1000:8.1f} ms "
                f"({audio_s/px:6.1f}x) | pallas {pp*1000:8.1f} ms "
                f"({audio_s/pp:6.1f}x) | speedup {px/pp:5.2f}x | "
                f"mel MAE {mae:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
