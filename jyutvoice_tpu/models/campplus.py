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
from typing import Optional, Tuple

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


def _res_block(p: dict, x: Array, stride: int, mz) -> Array:
    out = mz(_relu(batch_norm(p["bn1"], conv2d(p["conv1"], x, stride=(stride, 1)))))
    out = mz(batch_norm(p["bn2"], conv2d(p["conv2"], out)))
    if "sc_conv" in p:
        sc = conv2d(p["sc_conv"], x, stride=(stride, 1), padding=(0, 0))
        sc = mz(batch_norm(p["sc_bn"], sc))
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


def _fcm(p: dict, x: Array, mz) -> Array:
    """(B, T, F) fbank -> (B, T', C*F/8) with T'=T (time stride 1)."""
    b, t, f = x.shape
    h = jnp.transpose(x, (0, 2, 1))[..., None]  # (B, F, T, 1)
    h = mz(_relu(batch_norm(p["bn1"], conv2d(p["conv1"], h))))
    for i, blk in enumerate(p["layer1"]):
        h = _res_block(blk, h, 2 if i == 0 else 1, mz)
    for i, blk in enumerate(p["layer2"]):
        h = _res_block(blk, h, 2 if i == 0 else 1, mz)
    h = mz(_relu(batch_norm(p["bn2"], conv2d(p["conv2"], h, stride=(2, 1)))))
    # torch reshape(B, C*F', T) flattens channel-major: flat[c*F'+f]
    h = jnp.transpose(h, (0, 2, 3, 1))  # (B, T, C, F')
    return h.reshape(b, t, -1)


# ---------------------------------------------------------------------------
# CAM dense-TDNN backbone
# ---------------------------------------------------------------------------


def _seg_pool_mean(x: Array, seg_len: int, t_valid=None) -> Array:
    """Per-segment time mean, repeated back over each segment (the CAM
    "local context"). Matches F.avg_pool1d(..., ceil_mode=True): the final
    partial segment averages over its actual frames. With t_valid (traced
    scalar), frames past t_valid are treated as absent, so a zero-padded
    bucketed run reproduces the exact-length result."""
    b, t, c = x.shape
    n_seg = -(-t // seg_len)
    pad = n_seg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(b, n_seg, seg_len, c).sum(axis=2)
    if t_valid is None:
        counts = jnp.full((1, n_seg), float(seg_len)).at[0, -1].set(
            float(seg_len - pad)
        )
    else:  # t_valid: (B,) — per-row true frame counts per segment
        starts = jnp.arange(n_seg, dtype=jnp.float32) * seg_len
        counts = jnp.clip(
            t_valid.astype(jnp.float32)[:, None] - starts[None, :],
            1e-6,
            seg_len,
        )
    means = sums / counts[:, :, None]
    return jnp.repeat(means, seg_len, axis=1)[:, :t]


def _cam_layer_init(key, bn_ch: int, out_ch: int, k: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "local": core.conv1d_init(k1, bn_ch, out_ch, k, bias=False),
        "lin1": core.linear_init(k2, bn_ch, bn_ch // 2),
        "lin2": core.linear_init(k3, bn_ch // 2, out_ch),
    }


def _cam_layer(p: dict, x: Array, dilation: int, seg_len: int, mz, t_valid) -> Array:
    y = core.conv1d_auto(p["local"], x, padding="same_torch", dilation=dilation)
    if t_valid is None:
        mean = x.mean(axis=1, keepdims=True)
    else:  # x is zero past t_valid; divide by the true count
        mean = x.sum(axis=1, keepdims=True) / t_valid[:, None, None].astype(x.dtype)
    context = mean + _seg_pool_mean(x, seg_len, t_valid)
    m = jax.nn.sigmoid(core.linear(p["lin2"], _relu(core.linear(p["lin1"], context))))
    return mz(y * m)


def _dense_layer_init(key, in_ch: int, out_ch: int, bn_ch: int, k: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "bn1": _bn_init(in_ch),
        "linear1": {"w": core.kaiming_uniform_torch(k1, (in_ch, bn_ch), fan_in=in_ch)},
        "bn2": _bn_init(bn_ch),
        "cam": _cam_layer_init(k2, bn_ch, out_ch, k),
    }


def _dense_layer(p: dict, x: Array, dilation: int, seg_len: int, mz, t_valid) -> Array:
    h = core.linear(p["linear1"], mz(_relu(batch_norm(p["bn1"], x))))
    h = mz(_relu(batch_norm(p["bn2"], h)))
    return _cam_layer(p["cam"], h, dilation, seg_len, mz, t_valid)


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


def apply_campplus(
    p: dict, cfg: CampPlusConfig, feat: Array, t_len: Optional[Array] = None
) -> Array:
    """Mean-normalized kaldi fbank (B, T, 80) -> speaker embedding (B, 192).

    With t_len (per-row valid frame counts, (B,) int) the input may be
    zero-padded to any bucketed T and the result equals the exact-length
    run bit-for-bit in structure: every layer output is re-zeroed past the
    valid boundary (so convs see exactly the zero padding the exact-length
    run would), and the global reductions (CAM context means, segment
    pooling, stats pooling) divide by true counts. This is what makes
    bucketed-jit prompt extraction possible on TPU (one compiled graph per
    bucket instead of one per utterance length).
    """
    b, t, _f = feat.shape
    if t_len is None:
        mz1 = mz2d = lambda x: x  # noqa: E731
        t1 = None
    else:
        tl = t_len.astype(jnp.int32)
        m1 = (jnp.arange(t)[None, :] < tl[:, None])[..., None]  # (B, T, 1)
        mz1 = lambda x: jnp.where(m1, x, 0.0)  # noqa: E731
        m2d = m1[:, None, :, :]  # NHWC (B, F, T, C): time on axis 2
        mz2d = lambda x: jnp.where(m2d, x, 0.0)  # noqa: E731
        feat = mz1(feat)

    x = _fcm(p["head"], feat, mz2d)
    x = core.conv1d(p["tdnn"]["conv"], x, stride=2, padding=(2, 2))
    # after the stride-2 TDNN (k=5, pad=2): valid out = floor((t-1)/2)+1
    if t_len is None:
        mzt = lambda x: x  # noqa: E731
        t1 = None
    else:
        t1 = (tl - 1) // 2 + 1
        mt = (jnp.arange(x.shape[1])[None, :] < t1[:, None])[..., None]
        mzt = lambda y: jnp.where(mt, y, 0.0)  # noqa: E731
    x = mzt(_relu(batch_norm(p["tdnn"]["bn"], x)))
    for block, k, d in zip(p["blocks"], cfg.kernel_sizes, cfg.dilations):
        for layer in block["layers"]:
            x = jnp.concatenate(
                [x, _dense_layer(layer, x, d, cfg.seg_len, mzt, t1)], axis=-1
            )
        x = core.linear(
            block["transit"]["linear"],
            mzt(_relu(batch_norm(block["transit"]["bn"], x))),
        )
    x = mzt(_relu(batch_norm(p["out_bn"], x)))
    # stats pooling: mean + unbiased std over (valid) time
    if t1 is None:
        mean = x.mean(axis=1)
        var = x.var(axis=1, ddof=1)
    else:
        n = t1.astype(x.dtype)[:, None]
        mean = x.sum(axis=1) / n
        dev = mzt(x - mean[:, None, :])
        var = jnp.square(dev).sum(axis=1) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(jnp.maximum(var, 0.0))  # torch .std(unbiased)
    stats = jnp.concatenate([mean, std], axis=-1)
    emb = core.linear(p["dense"]["linear"], stats)
    return batch_norm(p["dense"]["bn"], emb)
