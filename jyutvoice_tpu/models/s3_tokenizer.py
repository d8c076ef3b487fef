"""S3 speech tokenizer v2 (CosyVoice2 speech_tokenizer_v2), TPU-native JAX.

The reference consumes this model only as an opaque speech_tokenizer_v2.onnx
run through onnxruntime (reference infer.py:98-145): whisper 128-bin
log-mel @100 fps -> speech tokens @25 Hz, vocab 6561 = 3^8. The blob is the
FunAudioLLM supervised "S3" tokenizer v2: a whisper-style audio encoder
(two stride-2 convs, sinusoidal positions, 6 pre-LN attention blocks) and a
finite-scalar-quantization head (linear 1280->8, tanh, round to {-1,0,1},
code = sum digit_i * 3^i). This module implements the same network natively
so prompt tokenization is jittable and onnxruntime-free; weights load from
a torch state_dict (e.g. the public s3tokenizer checkpoints) via
weights/s3_convert.py.

Everything is channels-last (B, T, C); attention reuses the repo's matmul
conventions. The FSQ rounding happens in f32 exactly like the export.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jyutvoice_tpu.nn import core

Array = jax.Array

_FSQ_TANH_SCALE = 0.9990000128746033  # keeps round(tanh(x)*s) in {-1,0,1}


@dataclasses.dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    n_audio_ctx: int = 1500
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 6
    n_fsq_dims: int = 8
    fsq_level: int = 3

    @property
    def vocab_size(self) -> int:
        return self.fsq_level**self.n_fsq_dims  # 6561


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """whisper's sinusoidal position table: [sin | cos] halves."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _mha_init(key, d: int) -> dict:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": core.linear_init(kq, d, d),
        "k": core.linear_init(kk, d, d, bias=False),
        "v": core.linear_init(kv, d, d),
        "out": core.linear_init(ko, d, d),
    }


def _whisper_mha(p: dict, x: Array, n_head: int, bias=None) -> Array:
    b, t, d = x.shape
    scale = (d // n_head) ** -0.25
    q = core.linear(p["q"], x).reshape(b, t, n_head, -1).transpose(0, 2, 1, 3) * scale
    k = core.linear(p["k"], x).reshape(b, t, n_head, -1).transpose(0, 2, 3, 1) * scale
    v = core.linear(p["v"], x).reshape(b, t, n_head, -1).transpose(0, 2, 1, 3)
    scores = (q @ k).astype(jnp.float32)
    if bias is not None:  # (B, 1, 1, T) key mask: -inf on padded frames
        scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = (w @ v).transpose(0, 2, 1, 3).reshape(b, t, d)
    return core.linear(p["out"], out)


def _block_init(key, d: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn": _mha_init(k1, d),
        "attn_ln": core.layer_norm_init(d),
        "mlp1": core.linear_init(k2, d, d * 4),
        "mlp2": core.linear_init(k3, d * 4, d),
        "mlp_ln": core.layer_norm_init(d),
    }


def _block(p: dict, x: Array, n_head: int, bias=None) -> Array:
    x = x + _whisper_mha(p["attn"], core.layer_norm(p["attn_ln"], x), n_head, bias)
    h = core.linear(p["mlp1"], core.layer_norm(p["mlp_ln"], x))
    h = core.linear(p["mlp2"], jax.nn.gelu(h, approximate=False))
    return x + h


def init_s3_tokenizer(key, cfg: S3TokenizerConfig = S3TokenizerConfig()) -> dict:
    keys = jax.random.split(key, cfg.n_audio_layer + 3)
    d = cfg.n_audio_state
    return {
        "conv1": core.conv1d_init(keys[0], cfg.n_mels, d, 3),
        "conv2": core.conv1d_init(keys[1], d, d, 3),
        "pos": jnp.asarray(sinusoids(cfg.n_audio_ctx, d)),
        "blocks": [_block_init(keys[2 + i], d) for i in range(cfg.n_audio_layer)],
        "fsq": core.linear_init(keys[-1], d, cfg.n_fsq_dims),
    }


def out_len(t_len: Array) -> Array:
    """Valid token count after the two stride-2 k=3 p=1 convs."""
    t1 = (t_len - 1) // 2 + 1
    return (t1 - 1) // 2 + 1


def apply_s3_encoder(
    p: dict, cfg: S3TokenizerConfig, mel: Array, t_len: Optional[Array] = None
) -> Array:
    """whisper log-mel (B, T, n_mels) -> hidden states (B, T//4, d).

    With t_len ((B,) valid mel-frame counts) the input may be zero-padded
    to a bucketed T: the convs are local (zero pad == exact-run pad) and
    attention masks padded keys, so valid positions match the exact-length
    run — enabling one compiled graph per bucket on TPU.
    """
    if t_len is not None:
        t_len = t_len.astype(jnp.int32)
        m = (jnp.arange(mel.shape[1])[None, :] < t_len[:, None])[..., None]
        mel = jnp.where(m, mel, 0.0)
    x = jax.nn.gelu(core.conv1d(p["conv1"], mel, stride=2), approximate=False)
    if t_len is not None:
        # re-zero past the stride-2 boundary: conv1's bias+gelu ring there
        # must read as the exact-length run's zero padding for conv2
        t1 = (t_len - 1) // 2 + 1
        m1 = (jnp.arange(x.shape[1])[None, :] < t1[:, None])[..., None]
        x = jnp.where(m1, x, 0.0)
    x = jax.nn.gelu(core.conv1d(p["conv2"], x, stride=2), approximate=False)
    x = x + p["pos"][: x.shape[1]].astype(x.dtype)
    bias = None
    if t_len is not None:
        valid = out_len(t_len.astype(jnp.int32))
        key_ok = jnp.arange(x.shape[1])[None, :] < valid[:, None]
        bias = jnp.where(key_ok, 0.0, -jnp.inf)[:, None, None, :]
    for blk in p["blocks"]:
        x = _block(blk, x, cfg.n_audio_head, bias)
    return x


def fsq_encode(p: dict, cfg: S3TokenizerConfig, h: Array) -> Array:
    """FSQ: hidden (B, T, d) -> codes (B, T) in [0, 3^8)."""
    z = jnp.tanh(core.linear(p, h).astype(jnp.float32)) * _FSQ_TANH_SCALE
    digits = jnp.round(z) + cfg.fsq_level // 2
    powers = jnp.power(
        float(cfg.fsq_level), jnp.arange(cfg.n_fsq_dims, dtype=jnp.float32)
    )
    return jnp.sum(digits * powers, axis=-1).astype(jnp.int32)


def apply_s3_tokenizer(
    p: dict, cfg: S3TokenizerConfig, mel: Array, t_len: Optional[Array] = None
) -> Array:
    """whisper log-mel (B, T, n_mels) -> speech tokens (B, T//4) @25 Hz.

    With t_len, tokens past out_len(t_len) are padding garbage — slice
    them off host-side (the jitted shape stays static).
    """
    return fsq_encode(p["fsq"], cfg, apply_s3_encoder(p, cfg, mel, t_len))
