"""Batch-16 scaling-cliff probe: one batch-16 solve vs two OVERLAPPED
batch-8 dispatches (both enqueued before the fence, so device-side they
pipeline back-to-back without a host round-trip between them).

Round-2 measurement: batch 16 solves in ~497 ms where linear scaling from
batch 8 predicts ~318 ms (docs/design.md serving table) — capping serving
at 337x aggregate. If 2x overlapped batch-8 lands near 2x the batch-8 time,
the server can serve 16-request groups as two dispatches and skip the cliff.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models import cfm as C
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.weights.noise import rand_noise

cfg = JyutVoiceConfig()
params = init_tts(jax.random.PRNGKey(0), cfg.tts)
t_mel = 512
rng = np.random.default_rng(0)


def inputs(b):
    return (
        jnp.asarray(np.tile(rand_noise(t_mel), (b, 1, 1))),
        jnp.asarray(rng.standard_normal((b, t_mel, 80)), jnp.float32),
        jnp.ones((b, t_mel, 1), jnp.float32),
        jnp.asarray(rng.standard_normal((b, 80)), jnp.float32),
        jnp.zeros((b, t_mel, 80), jnp.float32),
    )


@jax.jit
def solve(dec, noise, mu, mask, spks, cond):
    t_span = C.cosine_t_span(10)
    return C.solve_euler_cfg(
        dec, cfg.tts.cfm, noise * mask, t_span, mu, mask, spks, cond
    )


def fence(*outs):
    return sum(float(jnp.sum(o)) for o in outs)


def timed(run, iters=8, reps=3):
    run()  # warm
    def t(n):
        t0 = time.perf_counter()
        for _ in range(n):
            run()
        return time.perf_counter() - t0
    base = min(t(1) for _ in range(reps))
    tn = min(t(iters + 1) for _ in range(reps))
    return (tn - base) / iters


in16 = inputs(16)
in8a = inputs(8)
in8b = inputs(8)

t16 = timed(lambda: fence(solve(params["decoder"], *in16)))
t8 = timed(lambda: fence(solve(params["decoder"], *in8a)))
# two dispatches enqueued back-to-back, ONE fence at the end
t8x2 = timed(
    lambda: fence(
        solve(params["decoder"], *in8a), solve(params["decoder"], *in8b)
    )
)

audio16 = 16 * t_mel * 480 / 24000
print(f"batch16 single dispatch : {t16*1000:7.1f} ms  xRT={audio16/t16:6.0f}")
print(f"batch8  single dispatch : {t8*1000:7.1f} ms")
print(f"2x batch8 overlapped    : {t8x2*1000:7.1f} ms  xRT={audio16/t8x2:6.0f}")
print(f"split-dispatch speedup vs batch16: {t16/t8x2:0.2f}x")
