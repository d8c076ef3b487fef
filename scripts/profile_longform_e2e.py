"""End-to-end long-form production surface with the banded default.

Measures `synthesize_long` (text -> wav, pcm16, return_mel=False) at the
~237 s decode, A/B full-flash (banded_long_threshold=0 via attention
override impossible — gate is config-level, so A/B = attention='auto'
(banded at T=12288) vs a threshold-0 config) on real TPU. Updates the
design.md round-3 "30.0x" figure for round 4.
"""
import dataclasses
import os
import time


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jyutvoice_tpu.config import JyutVoiceConfig
    from jyutvoice_tpu.models.hift import init_hift
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.pipeline.synthesize import Synthesizer

    n_syll = 1360  # ~8161 interspersed tokens -> ~12k mel frames
    text = "佢係" * (n_syll // 2)
    phone = " ".join(["keoi5", "hai6"] * (n_syll // 2))

    for thr in (8192, 0):
        cfg = JyutVoiceConfig()
        est = dataclasses.replace(
            cfg.tts.cfm.estimator, banded_long_threshold=thr
        )
        cfm = dataclasses.replace(cfg.tts.cfm, estimator=est)
        cfg = dataclasses.replace(
            cfg, tts=dataclasses.replace(cfg.tts, cfm=cfm)
        )
        params = init_tts(jax.random.PRNGKey(0), cfg.tts)
        params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
        synth = Synthesizer(cfg, params, params_hift)

        res = synth.synthesize_long(
            text, lang="yue", phone=phone, pcm16=True, return_mel=False
        )  # warm (compiles)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = synth.synthesize_long(
                text, lang="yue", phone=phone, pcm16=True, return_mel=False
            )
            times.append(time.perf_counter() - t0)
        audio_s = res.timings["audio_seconds"]
        best = min(times)
        label = f"banded@{thr}" if thr else "flash (thr=0)"
        print(
            f"{label:16s}: {audio_s:.1f} s audio in {best:.2f} s = "
            f"{audio_s/best:.1f}x RT (mel {res.timings['mel']:.2f} voc "
            f"{res.timings['vocoder']:.2f} front "
            f"{res.timings['frontend_and_duration']:.2f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
