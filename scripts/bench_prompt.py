"""TPU benchmark: native voice-cloning prompt extraction path.

Measures the three device models of the prompt pipeline (random weights —
identical FLOPs to converted artifacts) for a 10 s reference clip:

  * CAM++ speaker embedding  (models/campplus.py, ~1000 fbank frames)
  * S3 speech tokenizer v2   (models/s3_tokenizer.py, ~1000 whisper-mel
    frames -> 250 tokens; this is the big one: 1280-d 6-layer encoder)
  * FlowEncoder prompt encoding (models/flow_encoder.py, 250 tokens -> 500
    hidden frames)

All three run masked at a geometric length bucket (one compiled graph per
bucket). Timing uses the chained-iterations + scalar-readback recipe from
bench.py (block_until_ready is unreliable over the tunneled runtime).
"""

import json
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
    from jyutvoice_tpu.models.campplus import (
        CampPlusConfig,
        apply_campplus,
        init_campplus,
    )
    from jyutvoice_tpu.models.flow_encoder import (
        apply_flow_encoder,
        init_flow_encoder,
    )
    from jyutvoice_tpu.models.s3_tokenizer import (
        S3TokenizerConfig,
        apply_s3_tokenizer,
        init_s3_tokenizer,
    )

    rng = np.random.default_rng(0)
    seconds = 10.0
    t_fbank = int(seconds * 100) - 2  # kaldi fbank ~100 fps
    t_wmel = int(seconds * 100)  # whisper mel 100 fps
    n_tokens = t_wmel // 4  # 25 Hz

    cp_cfg = CampPlusConfig()
    s3_cfg = S3TokenizerConfig()
    jv_cfg = JyutVoiceConfig()

    cp = init_campplus(jax.random.PRNGKey(0), cp_cfg)
    s3 = init_s3_tokenizer(jax.random.PRNGKey(1), s3_cfg)
    fe = init_flow_encoder(jax.random.PRNGKey(2), jv_cfg.flow_encoder)

    bucket = 1152  # covers 10 s at both frame rates
    fbank = jnp.asarray(
        rng.standard_normal((1, bucket, 80)).astype(np.float32)
    )
    wmel = jnp.asarray(
        rng.standard_normal((1, bucket, 128)).astype(np.float32)
    )
    tokens = jnp.asarray(
        rng.integers(0, 6561, (1, 256)).astype(np.int32)
    )

    cp_fn = jax.jit(lambda p, f, n: apply_campplus(p, cp_cfg, f, t_len=n))
    s3_fn = jax.jit(lambda p, m, n: apply_s3_tokenizer(p, s3_cfg, m, t_len=n))
    fe_fn = jax.jit(
        lambda p, t, n: apply_flow_encoder(p, jv_cfg.flow_encoder, t, n)[0]
    )

    runs = {
        "campplus_ms": lambda: cp_fn(
            cp, fbank, jnp.asarray([t_fbank], jnp.int32)
        ),
        "s3_tokenizer_ms": lambda: s3_fn(
            s3, wmel, jnp.asarray([t_wmel], jnp.int32)
        ),
        "flow_encoder_ms": lambda: fe_fn(
            fe, tokens, jnp.asarray([n_tokens], jnp.int32)
        ),
    }

    def measure(fn, iters=10, repeats=3):
        def timed(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            float(jnp.sum(out))
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(repeats))
        tn = min(timed(iters + 1) for _ in range(repeats))
        return max((tn - t1) / iters, 1e-6)

    results = {"prompt_seconds": seconds, "device": str(jax.devices()[0])}
    for name, fn in runs.items():
        float(jnp.sum(fn()))  # compile
        results[name] = round(measure(fn) * 1000, 2)
    results["total_ms"] = round(
        results["campplus_ms"]
        + results["s3_tokenizer_ms"]
        + results["flow_encoder_ms"],
        2,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
