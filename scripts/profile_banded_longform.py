"""Banded / chunked estimator attention for one-pass long-form decode.

VERDICT r3 #1: full attention is the quadratic term behind 32.9x @T=12288.
The reference's own CausalConditionalCFM streaming semantics
(/root/reference/jyutvoice/flow/decoder.py:951-959, configs/base.yaml:98)
are 50-frame chunk masks with num_decoding_left_chunks=-1 (chunked-causal,
~T^2/2 score FLOPs); a finite left-chunk count (reference-supported config,
base.yaml:10) makes attention linear in T.

Variants per T in {2048, 4096, 8192, 12288}, full 10-step solve, batch 1
(CFG doubles to 2B=2 inside):

  full_flash     shipped gate (stock TPU flash, full attention)  [baseline]
  chunk_scores   streaming=True, XLA bf16-score path w/ chunk_attn_mask bias
  chunk_pallas   streaming=True, our pallas kernel (block-sparse k-loop,
                 chunk=50, left=-1): chunked-causal
  band_pallas_L  streaming=True, left=L in {2, 10}: true banded, linear

Reports solve ms / xRT / speedup vs full_flash, and mel MAE vs full_flash
(NOTE: chunk masks are a *different function*, not an approximation — MAE
indicates semantic divergence magnitude under random weights, judged against
the scale of the full-attention output itself).
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

    def cfm_cfg_with(backend: str, left: int):
        est = dataclasses.replace(
            cfg.tts.cfm.estimator,
            attention_backend=backend,
            num_decoding_left_chunks=left,
        )
        return dataclasses.replace(cfg.tts.cfm, estimator=est)

    variants = [
        ("full_flash", "xla", False, -1),
        ("chunk_scores", "xla", True, -1),
        ("chunk_pallas", "xla_pallas", True, -1),
        ("band_pallas_2", "xla_pallas", True, 2),
        ("band_pallas_10", "xla_pallas", True, 10),
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
        for name, backend, streaming, left in variants:
            # "xla_pallas" = force the pallas kernel for the chunked run
            be = "pallas" if backend == "xla_pallas" else backend
            cc = cfm_cfg_with(be, left)

            @jax.jit
            def solve(dec, mu, mask, spks, cond, noise, cc=cc, st=streaming):
                return cfm_forward(
                    dec, cc, mu, mask, spks, cond,
                    n_timesteps=10, rand_noise=noise, streaming=st,
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
                      f"({type(e).__name__}: {str(e)[:200]})", flush=True)

        if "full_flash" not in times:
            continue
        ref_out = outs["full_flash"]
        ref_scale = float(np.abs(ref_out).mean())
        pf = times["full_flash"]
        print(f"-- T={t_mel} ({audio_s:.1f} s)  |out| mean {ref_scale:.3f}",
              flush=True)
        for name, _, _, _ in variants:
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
