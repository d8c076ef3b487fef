"""Per-stage HiFT timing on TPU (amortized, readback-corrected)."""

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

    cfg = JyutVoiceConfig().hift
    params = H.init_hift(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    t_mel = 512
    L = t_mel * 480
    mel = jnp.asarray(rng.standard_normal((1, t_mel, 80)), jnp.float32)
    f0up = jnp.abs(jnp.asarray(rng.standard_normal((1, L)), jnp.float32)) * 100
    src = jnp.asarray(rng.standard_normal((1, L, 1)), jnp.float32)
    re = jnp.asarray(rng.standard_normal((1, L // 4 + 1, 9)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((1, L // 4 + 1, 9)), jnp.float32)

    def amortized(fn, *args, n=21):
        jfn = jax.jit(fn)
        _ = float(jnp.sum(jax.tree.leaves(jfn(*args))[0]))

        def timed(k):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = jfn(*args)
            _ = float(jnp.sum(jax.tree.leaves(out)[0]))
            return time.perf_counter() - t0

        base = min(timed(1) for _ in range(3))
        tn = min(timed(n) for _ in range(3))
        return (tn - base) / (n - 1)

    t = amortized(lambda m: H.apply_f0_predictor(params["f0_predictor"], m), mel)
    print("f0_pred:", round(t * 1000, 2), "ms", flush=True)
    t = amortized(
        lambda f: H.sine_source(params["m_source"], f, cfg, None, True), f0up
    )
    print("sine_source:", round(t * 1000, 2), "ms", flush=True)
    t = amortized(lambda s: H.small_stft(s[:, :, 0], 16, 4), src)
    print("small_stft:", round(t * 1000, 2), "ms", flush=True)
    t = amortized(lambda a, b: H.small_istft(a, b, 16, 4), re, im)
    print("small_istft:", round(t * 1000, 2), "ms", flush=True)
    t = amortized(lambda m, s: H.hift_decode(params, cfg, m, s), mel, src)
    print("decode(all):", round(t * 1000, 2), "ms", flush=True)


if __name__ == "__main__":
    main()
