"""Stock-flash block-size sensitivity at real serving totals.

The production long-form estimator sequence is t_prompt_pad + t_mel
(models/tts.py::synthesize_mel), so prompted decodes land on totals like
2176/2304/3200 that are 128- or 256- but not 512-aligned.

Round-3 findings (v5e, full 10-step solve, batch 1):
  T=2176 blk128: flash 1184.5 ms vs scores 413.7 -> 0.35x
  T=4224 blk128: flash 4911.0 ms vs scores 1434.0 -> 0.29x
  T=2304 blk256: flash  493.8 ms vs scores 452.9 -> 0.92x
Smaller blocks LOSE outright — the 3-D grid's per-block overhead swamps
the flash win — so use_stock_flash stays 512-only and the serving layer
512-aligns totals instead (pick_prompt_bucket promotes the prompt bucket
to 512 at t_mel >= 2048). The cases below measure the promoted totals
(2560 = mel2048+prompt512, 4608 = mel4096+prompt512) against the scores
path at the UNpromoted total, i.e. the actual production trade.
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

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

    # (scores_T, flash_T, description): production trade — scores at the
    # unpromoted total vs flash at the 512-promoted total
    cases = [
        (2176, 2560, "mel2048: prompt128-scores vs prompt512-flash"),
        (4224, 4608, "mel4096: prompt128-scores vs prompt512-flash"),
    ]
    for t_scores, t_flash, desc in cases:
        valid = t_scores - 37  # same audio content in both shapes
        audio_s = valid * hop / sr
        times = {}
        for backend, t_mel in (("xla_scores", t_scores), ("xla", t_flash)):
            mu_np = rng.standard_normal((1, t_scores, 80))
            mu = jnp.asarray(
                np.pad(mu_np, ((0, 0), (0, t_mel - t_scores), (0, 0))),
                jnp.float32,
            )
            mask = (np.arange(t_mel) < valid).astype(np.float32)
            mask = jnp.asarray(mask[None, :, None])
            spks = jnp.asarray(rng.standard_normal((1, 80)), jnp.float32)
            cond = jnp.zeros((1, t_mel, 80), jnp.float32)
            noise = jnp.asarray(rand_noise_extended(t_mel))
            cc = cfm_cfg_with(backend)

            @jax.jit
            def solve(dec, mu, mask, spks, cond, noise, cc=cc):
                return cfm_forward(
                    dec, cc, mu, mask, spks, cond,
                    n_timesteps=10, rand_noise=noise,
                )

            try:
                out = solve(dec, mu, mask, spks, cond, noise)
                float(jnp.sum(out))  # warmup fence (no full readback)

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
                      f"({type(e).__name__}: {str(e)[:200]})", flush=True)

        if len(times) == 2:
            ps, pf = times["xla_scores"], times["xla"]
            print(
                f"{desc:44s} ({audio_s:6.1f} s): "
                f"scores@{t_scores} {ps*1000:8.1f} ms ({audio_s/ps:6.1f}x) | "
                f"flash@{t_flash} {pf*1000:8.1f} ms ({audio_s/pf:6.1f}x) | "
                f"net {ps/pf:5.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
