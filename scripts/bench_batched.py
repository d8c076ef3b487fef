import os, time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig, TTSConfig, CFMConfig, EstimatorConfig
from jyutvoice_tpu.models import hift as H
from jyutvoice_tpu.models.hift import init_hift
from jyutvoice_tpu.models.tts import init_tts, synthesize_mel
from jyutvoice_tpu.weights.noise import rand_noise

t_text, t_mel = 128, 512
rng = np.random.default_rng(0)

for backend in ("pallas",):
    est = dataclasses.replace(EstimatorConfig(), attention_backend=backend)
    cfg = dataclasses.replace(
        JyutVoiceConfig(),
        tts=dataclasses.replace(TTSConfig(), cfm=dataclasses.replace(CFMConfig(), estimator=est)),
    )
    params = init_tts(jax.random.PRNGKey(0), cfg.tts)
    params_hift = init_hift(jax.random.PRNGKey(1), cfg.hift)
    noise = jnp.asarray(rand_noise(t_mel))
    for b in (1, 8):
        @jax.jit
        def full(params, params_hift, x, xl, lang, tone, wp, sp, spk, pf, ph, pl):
            out = synthesize_mel(params, cfg.tts, x, xl, lang, tone, wp, sp, spk,
                pf, ph, pl, t_mel_max=t_mel, n_timesteps=10, rand_noise=noise)
            wav, _ = H.hift_inference(params_hift, cfg.hift, out.mel, deterministic=True)
            return wav
        args = (params, params_hift,
            jnp.asarray(rng.integers(1,97,(b,t_text)),jnp.int32), jnp.full((b,),t_text,jnp.int32),
            jnp.asarray(rng.integers(0,4,(b,t_text)),jnp.int32), jnp.asarray(rng.integers(0,7,(b,t_text)),jnp.int32),
            jnp.asarray(rng.integers(0,4,(b,t_text)),jnp.int32), jnp.asarray(rng.integers(0,4,(b,t_text)),jnp.int32),
            jnp.asarray(rng.standard_normal((b,192)),jnp.float32),
            jnp.zeros((b,0,80),jnp.float32), jnp.zeros((b,0,80),jnp.float32),
            jnp.zeros((b,),jnp.int32))
        _ = float(jnp.sum(full(*args)))
        def timed(n):
            t0=time.perf_counter()
            o=None
            for _ in range(n): o=full(*args)
            _=float(jnp.sum(o)); return time.perf_counter()-t0
        base=min(timed(1) for _ in range(3)); tn=min(timed(11) for _ in range(3))
        per=(tn-base)/10
        audio = b * t_mel * 480 / 24000
        print(f"{backend} batch={b}: {per*1000:.1f} ms/iter, aggregate xRT={audio/per:.0f}", flush=True)
