"""Isolated attention op at long-form shapes: stock pallas flash vs XLA.

The custom kernel (nn/pallas/attention.py) loses 2.5-4.5x inside the
long-form solve (profile_flash_longform.py) — it holds full K/V in VMEM
and serially fori_loops key blocks (no DMA pipelining). This asks whether
the STOCK jax flash kernel (3-D grid, pipelined) wins the isolated op at
the estimator's long-form shapes (B=2, H=8, D=64, T >= 2048) before any
wiring work. XLA side uses the same bf16-score trick as the production
path (nn/attention.py::sdpa with compact_scores=True).
"""
import functools
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
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, H, D = 2, 8, 64
    scale = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)

    def timed(fn, args, iters=8, reps=3):
        out = fn(*args)
        float(jnp.sum(out))

        def t(n):
            o = None
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(*args)
            float(jnp.sum(o))
            return time.perf_counter() - t0

        base = min(t(1) for _ in range(reps))
        tn = min(t(iters + 1) for _ in range(reps))
        return (tn - base) / iters * 1000, np.asarray(out)

    @jax.jit
    def xla_sdpa(q, k, v):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.bfloat16,
        ) * scale
        p = jax.nn.softmax(s.astype(jnp.bfloat16), axis=-1)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32
        )

    for t_len in (2048, 4096, 8192):
        q = jnp.asarray(rng.standard_normal((B, H, t_len, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, t_len, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, t_len, D)), jnp.float32)

        tx, ox = timed(xla_sdpa, (q, k, v))
        line = f"T={t_len:5d}: xla bf16-scores {tx:8.2f} ms"
        for bq, bk in ((512, 512), (1024, 1024), (512, 2048)):
            if bq > t_len or bk > t_len:
                continue
            bs = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_q_dkv=bq, block_k_dkv=bk,
                block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
            )
            fl = jax.jit(functools.partial(
                flash_attention, causal=False, sm_scale=scale,
                block_sizes=bs,
            ))
            try:
                tf, of = timed(fl, (q, k, v))
                mae = float(np.abs(ox - of).mean())
                line += (f" | flash[{bq}/{bk}] {tf:8.2f} ms "
                         f"({tx/tf:4.2f}x, mae {mae:.1e})")
            except Exception as e:  # noqa: BLE001
                line += f" | flash[{bq}/{bk}] FAILED {type(e).__name__}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
