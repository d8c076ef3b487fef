"""Full 10-step long-form solve: stock-flash attention gate on vs off.

Companion to profile_flash_stock_longform.py (isolated op): measures the
production gate (models/estimator.py::use_stock_flash) end-to-end and the
mel MAE it introduces vs the bf16-score path. The gate override below
pins the measured envelope (full attention, 512-aligned, T >= 2048)
independent of the shipped threshold, so re-runs after gate tweaks keep
measuring the same sweep — results recorded in docs/design.md set the
shipped T >= 2048 threshold (scores wins 0.72-0.78x at T=1024/1536).
"""
import dataclasses
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

    import jyutvoice_tpu.models.estimator as E
    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.cfm import cfm_forward
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.weights.noise import rand_noise_extended

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    dec = params["decoder"]
    rng = np.random.default_rng(0)
    hop, sr = cfg.audio.hop_length, cfg.audio.sample_rate
    orig_gate = E.use_stock_flash

    def cfm_cfg_with(backend: str):
        est = dataclasses.replace(
            cfg.tts.cfm.estimator, attention_backend=backend
        )
        return dataclasses.replace(cfg.tts.cfm, estimator=est)

    for t_mel in (2048, 3072, 4096, 8192, 12288):
        mu = jnp.asarray(rng.standard_normal((1, t_mel, 80)), jnp.float32)
        mask = (np.arange(t_mel) < t_mel - 37).astype(np.float32)
        mask = jnp.asarray(mask[None, :, None])  # realistic padding tail
        spks = jnp.asarray(rng.standard_normal((1, 80)), jnp.float32)
        cond = jnp.zeros((1, t_mel, 80), jnp.float32)
        noise = jnp.asarray(rand_noise_extended(t_mel))
        audio_s = t_mel * hop / sr

        # probe below the shipped threshold by widening the gate
        E.use_stock_flash = (
            lambda t, c: c == 0 and t % 512 == 0 and t >= 2048
        )
        outs, times = {}, {}
        try:
            for backend in ("xla_scores", "xla"):
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
                except Exception as e:  # noqa: BLE001
                    print(f"T={t_mel} {backend}: FAILED "
                          f"({type(e).__name__}: {str(e)[:160]})", flush=True)
        finally:
            E.use_stock_flash = orig_gate

        if len(times) == 2:
            mae = float(np.abs(outs["xla"] - outs["xla_scores"]).mean())
            ps, pf = times["xla_scores"], times["xla"]
            print(
                f"T={t_mel:6d} ({audio_s:6.1f} s): scores {ps*1000:8.1f} ms "
                f"({audio_s/ps:6.1f}x) | flash {pf*1000:8.1f} ms "
                f"({audio_s/pf:6.1f}x) | speedup {ps/pf:5.2f}x | "
                f"mel MAE {mae:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
