"""jyutvoice_tpu — TPU-native Cantonese/Mandarin/English zero-shot TTS framework.

A from-scratch JAX/XLA/Pallas rebuild of the JyutVoice system
(reference: indiejoseph/JyutVoice): a Matcha-style trainable text front half
grafted onto a frozen CosyVoice2 conditional-flow-matching mel decoder and a
HiFT (NSF + iSTFT HiFi-GAN) vocoder.

Design principles (TPU-first, not a port):
  * channels-last (B, T, C) activations everywhere,
  * static shapes with length-bucketed padding and mask-correct ops,
  * `lax.scan` for the Euler ODE loop, CFG as a leading batch-2 axis,
  * pure-functional modules: params are pytrees, apply fns are pure,
  * data-parallel scaling via `jax.sharding.Mesh` + XLA collectives.
"""

__version__ = "0.1.0"
