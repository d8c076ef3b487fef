"""Dense banded estimator attention (nn/attention.py::banded_sdpa) on the
full long-form solve, vs the shipped full-attention stock-flash gate.

Round-4 follow-up to profile_banded_longform.py: the pallas-kernel banded
variants fail to compile at T >= 8192 on this platform and the chunked-
causal mask always loses; this measures the pure-XLA chunk-band (linear
in T, MXU-aligned 128 chunks, symmetric lookahead) that replaced them.

Reports solve ms / xRT / speedup vs full flash and mel MAE vs full
attention (semantic divergence of the band, not a numerical error).
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

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.cfm import cfm_forward
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.weights.noise import rand_noise_extended

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    dec = params["decoder"]
    rng = np.random.default_rng(0)
    hop, sr = cfg.audio.hop_length, cfg.audio.sample_rate

    def cfm_cfg_with(backend, chunk=128, left=4, right=4):
        est = dataclasses.replace(
            cfg.tts.cfm.estimator, attention_backend=backend,
            banded_chunk=chunk, banded_left=left, banded_right=right,
        )
        return dataclasses.replace(cfg.tts.cfm, estimator=est)

    variants = [
        ("full_flash", cfm_cfg_with("xla")),
        ("band_c128_2_2", cfm_cfg_with("banded", 128, 2, 2)),
        ("band_c128_4_4", cfm_cfg_with("banded", 128, 4, 4)),
        ("band_c128_8_8", cfm_cfg_with("banded", 128, 8, 8)),
        ("band_c256_4_4", cfm_cfg_with("banded", 256, 4, 4)),
        ("band_c128_8_0", cfm_cfg_with("banded", 128, 8, 0)),
    ]

    for t_mel in (2048, 4096, 8192, 12288):
        mu = jnp.asarray(rng.standard_normal((1, t_mel, 80)), jnp.float32)
        mask = (np.arange(t_mel) < t_mel - 37).astype(np.float32)
        mask = jnp.asarray(mask[None, :, None])
        spks = jnp.asarray(rng.standard_normal((1, 80)), jnp.float32)
        cond = jnp.zeros((1, t_mel, 80), jnp.float32)
        noise = jnp.asarray(rand_noise_extended(t_mel))
        audio_s = t_mel * hop / sr

        outs, times = {}, {}
        for name, cc in variants:

            @jax.jit
            def solve(dec, mu, mask, spks, cond, noise, cc=cc):
                return cfm_forward(
                    dec, cc, mu, mask, spks, cond,
                    n_timesteps=10, rand_noise=noise,
                )

            try:
                out = solve(dec, mu, mask, spks, cond, noise)
                outs[name] = np.asarray(out)

                def timed(n):
                    t0 = time.perf_counter()
                    w = None
                    for _ in range(n):
                        w = solve(dec, mu, mask, spks, cond, noise)
                    float(jnp.sum(w))
                    return time.perf_counter() - t0

                base = min(timed(1) for _ in range(2))
                tn = min(timed(4) for _ in range(2))
                times[name] = max((tn - base) / 3, 1e-9)
            except Exception as e:  # noqa: BLE001
                print(f"T={t_mel} {name}: FAILED "
                      f"({type(e).__name__}: {str(e)[:160]})", flush=True)

        if "full_flash" not in times:
            continue
        ref_out = outs["full_flash"]
        pf = times["full_flash"]
        print(f"-- T={t_mel} ({audio_s:.1f} s)  |out| mean "
              f"{float(np.abs(ref_out).mean()):.3f}", flush=True)
        for name, _ in variants:
            if name not in times:
                continue
            p = times[name]
            mae = float(np.abs(outs[name] - ref_out).mean())
            print(
                f"   {name:15s} {p*1000:8.1f} ms ({audio_s/p:6.1f}x RT) "
                f"speedup {pf/p:5.2f}x  mel MAE vs full {mae:.3e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
