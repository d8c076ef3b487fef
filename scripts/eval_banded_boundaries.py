"""Chunk-boundary artifact check for the banded long-form default.

The (2,2) chunk-band gives every query a >= 2-chunk (256-frame) context
on each side, so adjacent frames straddling a 128-frame chunk boundary
see windows differing by one chunk — if that mattered, the banded mel
would show elevated frame-to-frame deltas exactly at boundary indices.
This measures |mel[t+1] - mel[t]| at chunk boundaries vs everywhere
else, for the banded and full-flash solves, plus the banded-vs-full
divergence profile across the utterance (uniform vs edge-concentrated).

Random-init weights; the structural question (does the band introduce
boundary seams?) is weight-independent to first order.
"""
import dataclasses
import os

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
    t_mel = 8192
    mu = jnp.asarray(rng.standard_normal((1, t_mel, 80)), jnp.float32)
    mask = jnp.ones((1, t_mel, 1), jnp.float32)
    spks = jnp.asarray(rng.standard_normal((1, 80)), jnp.float32)
    cond = jnp.zeros((1, t_mel, 80), jnp.float32)
    noise = jnp.asarray(rand_noise_extended(t_mel))

    outs = {}
    for name, thr in (("banded", 8192), ("full", 0)):
        est = dataclasses.replace(
            cfg.tts.cfm.estimator, banded_long_threshold=thr
        )
        cc = dataclasses.replace(cfg.tts.cfm, estimator=est)

        @jax.jit
        def solve(dec, mu, mask, spks, cond, noise, cc=cc):
            return cfm_forward(dec, cc, mu, mask, spks, cond,
                               n_timesteps=10, rand_noise=noise)

        outs[name] = np.asarray(solve(dec, mu, mask, spks, cond, noise))[0]

    chunk = cfg.tts.cfm.estimator.banded_chunk
    bidx = np.arange(chunk - 1, t_mel - 1, chunk)  # t -> t+1 crosses a boundary
    other = np.setdiff1d(np.arange(t_mel - 1), bidx)
    for name, mel in outs.items():
        flux = np.abs(np.diff(mel, axis=0)).mean(axis=1)  # (T-1,)
        print(f"{name:6s}: frame flux at chunk boundaries "
              f"{flux[bidx].mean():.4f} vs elsewhere {flux[other].mean():.4f} "
              f"(ratio {flux[bidx].mean()/flux[other].mean():.3f})")

    d = np.abs(outs["banded"] - outs["full"]).mean(axis=1)  # (T,)
    qs = np.percentile(d, [50, 90, 99])
    thirds = [d[: t_mel // 3].mean(), d[t_mel // 3 : 2 * t_mel // 3].mean(),
              d[2 * t_mel // 3 :].mean()]
    print(f"banded-vs-full per-frame MAE: p50 {qs[0]:.4f} p90 {qs[1]:.4f} "
          f"p99 {qs[2]:.4f}; by utterance third "
          f"{thirds[0]:.4f}/{thirds[1]:.4f}/{thirds[2]:.4f}")
    # divergence at boundary frames vs elsewhere
    bframes = np.zeros(t_mel, bool)
    for b in range(chunk, t_mel, chunk):
        bframes[b - 1 : b + 1] = True
    print(f"divergence at boundary frames {d[bframes].mean():.4f} vs "
          f"elsewhere {d[~bframes].mean():.4f}")


if __name__ == "__main__":
    main()
