"""TPU training benchmark: train steps/s + mel-frames/s at a realistic batch.

Runs the full frozen-decoder fine-tune step (forward + backward + AdamW)
on one chip at batch 16, text 128 / mel 512 buckets.
"""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jyutvoice_tpu.config import JyutVoiceConfig
from jyutvoice_tpu.models.tts import init_tts
from jyutvoice_tpu.train.step import init_train_state, make_train_step

cfg = JyutVoiceConfig()
params = init_tts(jax.random.PRNGKey(0), cfg.tts)
state, tx = init_train_state(params, cfg.tts, cfg.train)
step = jax.jit(make_train_step(cfg.tts, cfg.train, tx), donate_argnums=(0,))

B, T_TXT, T_MEL = 16, 128, 512
rng = np.random.default_rng(0)
batch = {
    "x": jnp.asarray(rng.integers(1, 97, (B, T_TXT)), jnp.int32),
    "x_lengths": jnp.full((B,), T_TXT, jnp.int32),
    "y": jnp.asarray(rng.standard_normal((B, T_MEL, 80)), jnp.float32),
    "y_lengths": jnp.full((B,), T_MEL, jnp.int32),
    "lang": jnp.asarray(rng.integers(0, 4, (B, T_TXT)), jnp.int32),
    "tone": jnp.asarray(rng.integers(0, 7, (B, T_TXT)), jnp.int32),
    "word_pos": jnp.asarray(rng.integers(0, 4, (B, T_TXT)), jnp.int32),
    "syllable_pos": jnp.asarray(rng.integers(0, 4, (B, T_TXT)), jnp.int32),
    "spk_embed": jnp.asarray(rng.standard_normal((B, 192)), jnp.float32),
    "decoder_h": jnp.asarray(rng.standard_normal((B, T_MEL, 80)), jnp.float32),
}
key = jax.random.PRNGKey(0)

state, m = step(state, key, batch)       # compile
_ = float(m["loss"])

N = 20
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, jax.random.fold_in(key, i), batch)
_ = float(m["loss"])                      # readback fence
dt = time.perf_counter() - t0
print(json.dumps({
    "steps_per_s": round(N / dt, 2),
    "mel_frames_per_s": round(N * B * T_MEL / dt, 0),
    "examples_per_s": round(N * B / dt, 1),
    "batch": B, "t_text": T_TXT, "t_mel": T_MEL,
    "step_ms": round(dt / N * 1000, 1),
    "device": str(jax.devices()[0]),
}))
