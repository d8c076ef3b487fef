"""Compare Pallas flash attention vs XLA SDPA at estimator shapes on TPU."""

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

    from jyutvoice_tpu.nn import core
    from jyutvoice_tpu.nn.attention import sdpa
    from jyutvoice_tpu.nn.pallas.attention import flash_attention

    rng = np.random.default_rng(0)

    def bench(t, bh=16, d=64, chunk=0):
        q = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((bh, t, d)), jnp.float32)
        lens = jnp.full((bh,), t, jnp.int32)
        scale = 1.0 / np.sqrt(d)

        @jax.jit
        def xla_fn(q, k, v, lens):
            pad = core.sequence_mask(lens, t)
            bias = core.mask_to_bias(core.chunk_attn_mask(pad, chunk))[:, None]
            return sdpa(q[:, None], k[:, None], v[:, None], bias, scale=scale)[:, 0]

        def pallas_fn(q, k, v, lens):
            return flash_attention(
                q, k, v, lens, scale=scale, chunk_size=chunk
            )

        def timed(fn, n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(q, k, v, lens)
            _ = float(jnp.sum(out))
            return time.perf_counter() - t0

        for name, fn in (("xla", xla_fn), ("pallas", pallas_fn)):
            _ = float(jnp.sum(fn(q, k, v, lens)))  # compile
            base = min(timed(fn, 1) for _ in range(3))
            tn = min(timed(fn, 51) for _ in range(3))
            per = (tn - base) / 50
            print(
                f"T={t} chunk={chunk} {name}: {per*1e6:.0f} us/call",
                flush=True,
            )

    for t in (512, 2048):
        for chunk in (0, 100):
            bench(t, chunk=chunk)


if __name__ == "__main__":
    main()
