"""CAM++ speaker-embedding network, TPU-native JAX.

The reference consumes this model only as an opaque `campplus.onnx` blob run
through onnxruntime (reference infer.py:148-163, 355-362): 80-bin kaldi
fbank @16 kHz, mean-normalized over time, -> 192-d speaker embedding. That
blob is the 3D-Speaker CAM++ architecture (FCM 2-D residual front-end +
CAM-attentive dense-TDNN backbone + stats pooling); this module implements
the same network natively so the voice-cloning prompt path is jittable and
onnxruntime-free. Weights load either from the ONNX initializers
(weights/onnx_reader.py + weights/campplus_convert.py) or a torch
state_dict.

Everything is channels-last (B, T, C); the FCM front-end runs NHWC with
H=frequency, W=time. BatchNorms are inference-mode (running stats) — the
model is frozen, prep-time only.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from jyutvoice_tpu.nn import core

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CampPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4  # bottleneck = bn_size * growth_rate = 128
    init_channels: int = 128
    m_channels: int = 32  # FCM width
    num_layers: Tuple[int, ...] = (12, 24, 16)
    kernel_sizes: Tuple[int, ...] = (3, 3, 3)
    dilations: Tuple[int, ...] = (1, 2, 2)
    seg_len: int = 100  # CAM segment pooling window

    @property
    def fcm_out_channels(self) -> int:
        return self.m_channels * (self.feat_dim // 8)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _bn_init(ch: int, affine: bool = True) -> dict:
    p = {"mean": jnp.zeros(ch), "var": jnp.ones(ch)}
    if affine:
        p["gamma"] = jnp.ones(ch)
        p["beta"] = jnp.zeros(ch)
    return p


def batch_norm(p: dict, x: Array, eps: float = 1e-5) -> Array:
    """Inference-mode batch norm over the trailing channel axis."""
    y = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    if "gamma" in p:
        y = y * p["gamma"]
    if "beta" in p:
        y = y + p["beta"]
    return y


def _conv2d_init(key, in_ch: int, out_ch: int, k: int, bias: bool = False) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * k * k
    p = {"w": core.kaiming_uniform_torch(kw, (k, k, in_ch, out_ch), fan_in=fan_in)}
    if bias:
        p["b"] = core.uniform_bias_torch(kb, (out_ch,), fan_in)
    return p


def conv2d(p: dict, x: Array, stride=(1, 1), padding=(1, 1)) -> Array:
    """2-D conv over (B, H, W, C); weight (KH, KW, Cin, Cout)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _relu(x: Array) -> Array:
    return jnp.maximum(x, 0.0)


# ---------------------------------------------------------------------------
# FCM front-end: 2-D residual CNN over (freq, time), stride on freq only
# ---------------------------------------------------------------------------


def _res_block_init(key, in_ch: int, out_ch: int, stride: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": _conv2d_init(k1, in_ch, out_ch, 3),
        "bn1": _bn_init(out_ch),
        "conv2": _conv2d_init(k2, out_ch, out_ch, 3),
        "bn2": _bn_init(out_ch),
    }
    if stride != 1 or in_ch != out_ch:
        p["sc_conv"] = {
            "w": core.kaiming_uniform_torch(
                k3, (1, 1, in_ch, out_ch), fan_in=in_ch
            )
        }
        p["sc_bn"] = _bn_init(out_ch)
    return p


def _res_block(p: dict, x: Array, stride: int) -> Array:
    out = _relu(batch_norm(p["bn1"], conv2d(p["conv1"], x, stride=(stride, 1))))
    out = batch_norm(p["bn2"], conv2d(p["conv2"], out))
    if "sc_conv" in p:
        sc = conv2d(p["sc_conv"], x, stride=(stride, 1), padding=(0, 0))
        sc = batch_norm(p["sc_bn"], sc)
    else:
        sc = x
    return _relu(out + sc)


def _fcm_init(key, cfg: CampPlusConfig) -> dict:
    keys = jax.random.split(key, 7)
    m = cfg.m_channels
    return {
        "conv1": _conv2d_init(keys[0], 1, m, 3),
        "bn1": _bn_init(m),
        "layer1": [
            _res_block_init(keys[1], m, m, 2),
            _res_block_init(keys[2], m, m, 1),
        ],
        "layer2": [
            _res_block_init(keys[3], m, m, 2),
            _res_block_init(keys[4], m, m, 1),
        ],
        "conv2": _conv2d_init(keys[5], m, m, 3),
        "bn2": _bn_init(m),
    }


def _fcm(p: dict, x: Array) -> Array:
    """(B, T, F) fbank -> (B, T', C*F/8) with T'=T (time stride 1)."""
    b, t, f = x.shape
    h = jnp.transpose(x, (0, 2, 1))[..., None]  # (B, F, T, 1)
    h = _relu(batch_norm(p["bn1"], conv2d(p["conv1"], h)))
    for i, blk in enumerate(p["layer1"]):
        h = _res_block(blk, h, 2 if i == 0 else 1)
    for i, blk in enumerate(p["layer2"]):
        h = _res_block(blk, h, 2 if i == 0 else 1)
    h = _relu(batch_norm(p["bn2"], conv2d(p["conv2"], h, stride=(2, 1))))
    # torch reshape(B, C*F', T) flattens channel-major: flat[c*F'+f]
    h = jnp.transpose(h, (0, 2, 3, 1))  # (B, T, C, F')
    return h.reshape(b, t, -1)


# ---------------------------------------------------------------------------
# CAM dense-TDNN backbone
# ---------------------------------------------------------------------------


def _seg_pool_mean(x: Array, seg_len: int) -> Array:
    """Per-segment time mean, repeated back over each segment (the CAM
    "local context"). Matches F.avg_pool1d(..., ceil_mode=True): the final
    partial segment averages over its actual frames."""
    b, t, c = x.shape
    n_seg = -(-t // seg_len)
    pad = n_seg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(b, n_seg, seg_len, c).sum(axis=2)
    counts = jnp.full((n_seg,), float(seg_len)).at[-1].set(float(seg_len - pad))
    means = sums / counts[None, :, None]
    return jnp.repeat(means, seg_len, axis=1)[:, :t]


def _cam_layer_init(key, bn_ch: int, out_ch: int, k: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "local": core.conv1d_init(k1, bn_ch, out_ch, k, bias=False),
        "lin1": core.linear_init(k2, bn_ch, bn_ch // 2),
        "lin2": core.linear_init(k3, bn_ch // 2, out_ch),
    }


def _cam_layer(p: dict, x: Array, dilation: int, seg_len: int) -> Array:
    y = core.conv1d_auto(p["local"], x, padding="same_torch", dilation=dilation)
    context = x.mean(axis=1, keepdims=True) + _seg_pool_mean(x, seg_len)
    m = jax.nn.sigmoid(core.linear(p["lin2"], _relu(core.linear(p["lin1"], context))))
    return y * m


def _dense_layer_init(key, in_ch: int, out_ch: int, bn_ch: int, k: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "bn1": _bn_init(in_ch),
        "linear1": {"w": core.kaiming_uniform_torch(k1, (in_ch, bn_ch), fan_in=in_ch)},
        "bn2": _bn_init(bn_ch),
        "cam": _cam_layer_init(k2, bn_ch, out_ch, k),
    }


def _dense_layer(p: dict, x: Array, dilation: int, seg_len: int) -> Array:
    h = core.linear(p["linear1"], _relu(batch_norm(p["bn1"], x)))
    h = _relu(batch_norm(p["bn2"], h))
    return _cam_layer(p["cam"], h, dilation, seg_len)


def init_campplus(key, cfg: CampPlusConfig = CampPlusConfig()) -> dict:
    keys = jax.random.split(key, 8)
    channels = cfg.fcm_out_channels
    p = {
        "head": _fcm_init(keys[0], cfg),
        "tdnn": {
            "conv": core.conv1d_init(keys[1], channels, cfg.init_channels, 5, bias=False),
            "bn": _bn_init(cfg.init_channels),
        },
        "blocks": [],
    }
    channels = cfg.init_channels
    bn_ch = cfg.bn_size * cfg.growth_rate
    for i, (n_layers, k, d) in enumerate(
        zip(cfg.num_layers, cfg.kernel_sizes, cfg.dilations)
    ):
        bkeys = jax.random.split(keys[2 + i], n_layers + 1)
        layers = []
        ch = channels
        for j in range(n_layers):
            layers.append(_dense_layer_init(bkeys[j], ch, cfg.growth_rate, bn_ch, k))
            ch += cfg.growth_rate
        block = {
            "layers": layers,
            "transit": {
                "bn": _bn_init(ch),
                "linear": {
                    "w": core.kaiming_uniform_torch(
                        bkeys[-1], (ch, ch // 2), fan_in=ch
                    )
                },
            },
        }
        p["blocks"].append(block)
        channels = ch // 2
    p["out_bn"] = _bn_init(channels)
    p["dense"] = {
        "linear": {
            "w": core.kaiming_uniform_torch(
                keys[6], (channels * 2, cfg.embedding_size), fan_in=channels * 2
            )
        },
        "bn": _bn_init(cfg.embedding_size, affine=False),
    }
    return p


def apply_campplus(p: dict, cfg: CampPlusConfig, feat: Array) -> Array:
    """Mean-normalized kaldi fbank (B, T, 80) -> speaker embedding (B, 192)."""
    x = _fcm(p["head"], feat)
    x = core.conv1d(p["tdnn"]["conv"], x, stride=2, padding=(2, 2))
    x = _relu(batch_norm(p["tdnn"]["bn"], x))
    for block, k, d in zip(p["blocks"], cfg.kernel_sizes, cfg.dilations):
        for layer in block["layers"]:
            x = jnp.concatenate([x, _dense_layer(layer, x, d, cfg.seg_len)], axis=-1)
        x = core.linear(
            block["transit"]["linear"], _relu(batch_norm(block["transit"]["bn"], x))
        )
    x = _relu(batch_norm(p["out_bn"], x))
    # stats pooling: mean + unbiased std over time
    mean = x.mean(axis=1)
    std = jnp.sqrt(jnp.maximum(x.var(axis=1, ddof=1), 0.0))  # torch .std(unbiased)
    stats = jnp.concatenate([mean, std], axis=-1)
    emb = core.linear(p["dense"]["linear"], stats)
    return batch_norm(p["dense"]["bn"], emb)
