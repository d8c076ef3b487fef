"""Measure the int8-quantized estimator: speed + mel deviation vs f32."""
import os, time
import numpy as np
import jax, jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.cfm import cfm_forward
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.nn.quant import quantize_estimator
    from jyutvoice_tpu.weights.noise import rand_noise

    cfg = JyutVoiceConfig()
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)["decoder"]
    qparams = quantize_estimator(params)
    b, t_mel = 1, 640
    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.standard_normal((b, t_mel, 80)), jnp.float32)
    mask = jnp.ones((b, t_mel, 1), jnp.float32)
    c = jnp.asarray(rng.standard_normal((b, 80)), jnp.float32)
    cond = jnp.zeros((b, t_mel, 80), jnp.float32)
    noise = jnp.asarray(rand_noise(t_mel))

    @jax.jit
    def solve(p, mu, mask, c, cond):
        return cfm_forward(p, cfg.tts.cfm, mu, mask, c, cond,
                           n_timesteps=10, rand_noise=noise)

    outs = {}
    for name, p in (("f32", params), ("int8", qparams)):
        out = solve(p, mu, mask, c, cond)
        _ = float(jnp.sum(out))
        outs[name] = np.asarray(out)

        def timed(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = solve(p, mu, mask, c, cond)
            _ = float(jnp.sum(o))
            return time.perf_counter() - t0

        base = min(timed(1) for _ in range(3))
        tn = min(timed(11) for _ in range(3))
        print(f"{name}: {(tn-base)/10*1000:.2f} ms / 10-step solve", flush=True)

    mae = np.abs(outs["f32"] - outs["int8"]).mean()
    print(f"int8 vs f32 mel MAE: {mae:.4f} (scale {np.abs(outs['f32']).mean():.3f})")


if __name__ == "__main__":
    main()
