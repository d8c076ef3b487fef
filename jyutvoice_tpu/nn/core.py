"""Functional NN primitives: pytree params + pure apply fns.

All activations are channels-last (B, T, C). Convolution weights are stored
as (K, C_in, C_out) so the hot path is a single `lax.conv_general_dilated`
with dimension_numbers ('NWC','WIO','NWC') — the layout XLA tiles best onto
the TPU MXU. The torch-weight converter (jyutvoice_tpu/weights) transposes
from torch's (C_out, C_in, K) at load time.

Numerical semantics intentionally match the reference modules they replace
(cited per-function) so converted weights give bit-comparable outputs in f32.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
PyTree = dict


# ---------------------------------------------------------------------------
# Initializers (torch-compatible distributions for from-scratch training)
# ---------------------------------------------------------------------------


def _fan_in_out_linear(shape: Tuple[int, int]) -> Tuple[int, int]:
    return shape[0], shape[1]


def xavier_uniform(key, shape, dtype=jnp.float32, fan_in=None, fan_out=None):
    if fan_in is None or fan_out is None:
        fan_in, fan_out = shape[-2], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def kaiming_uniform_torch(key, shape, dtype=jnp.float32, fan_in=None):
    """torch's default Linear/Conv weight init: kaiming_uniform(a=sqrt(5))."""
    if fan_in is None:
        fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    # gain for a=sqrt(5): sqrt(2/(1+5)) = sqrt(1/3); bound = gain*sqrt(3/fan_in)
    bound = math.sqrt(1.0 / (3.0 * fan_in)) * math.sqrt(3.0) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_bias_torch(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal_init(key, shape, std, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> PyTree:
    kw, kb = jax.random.split(key)
    p = {"w": kaiming_uniform_torch(kw, (in_dim, out_dim), fan_in=in_dim)}
    if bias:
        p["b"] = uniform_bias_torch(kb, (out_dim,), in_dim)
    return p


def linear(p: PyTree, x: Array) -> Array:
    y = jnp.dot(x, p["w"], preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def embedding_init(key, n_vocab: int, dim: int, std: Optional[float] = None) -> PyTree:
    std = dim**-0.5 if std is None else std
    return {"w": normal_init(key, (n_vocab, dim), std)}


def embedding(p: PyTree, ids: Array) -> Array:
    return jnp.take(p["w"], ids, axis=0)


# ---------------------------------------------------------------------------
# Conv1d  (channels-last; weight (K, C_in, C_out))
# ---------------------------------------------------------------------------


def conv1d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel_size: int,
    bias: bool = True,
    groups: int = 1,
) -> PyTree:
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel_size
    p = {
        "w": kaiming_uniform_torch(
            kw, (kernel_size, in_ch // groups, out_ch), fan_in=fan_in
        )
    }
    if bias:
        p["b"] = uniform_bias_torch(kb, (out_ch,), fan_in)
    return p


def conv1d(
    p: PyTree,
    x: Array,
    *,
    stride: int = 1,
    padding="same_torch",
    dilation: int = 1,
    groups: int = 1,
) -> Array:
    """1-D convolution over (B, T, C).

    padding: "same_torch" = torch's padding=K//2 (symmetric, matches the
    reference's non-causal convs), "causal" = left-pad K-1 (reference
    CausalConv1d, decoder.py:737-770), "valid", or explicit (left, right).
    """
    w = p["w"]
    k = w.shape[0]
    eff_k = (k - 1) * dilation + 1
    if padding == "same_torch":
        pad = ((k // 2) * dilation, (k // 2) * dilation)
    elif padding == "causal":
        pad = (eff_k - 1, 0)
    elif padding == "valid":
        pad = (0, 0)
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[pad],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv1d_auto(
    p: PyTree,
    x: Array,
    *,
    stride: int = 1,
    padding="same_torch",
    dilation: int = 1,
    groups: int = 1,
) -> Array:
    """conv1d that lowers small kernels (k <= 3, stride 1, ungrouped) to
    shifted matmuls (see conv1d_matmul) and falls back to conv1d otherwise.
    Input traffic scales with k in the matmul form, so big kernels stay as
    convs; measured net win on the HiFT vocoder (56.0 -> 52.5 ms at b=4,
    scripts/profile_round2_experiments.py)."""
    k = p["w"].shape[0]
    pad_ok = (
        k == 1
        or padding == "causal"  # left pad (k-1)*d: exact for any k
        # even k with same_torch pads (k//2, k//2) = k*d total -> output
        # t+d, which the (k-1)*d-total-pad matmul form cannot express
        or (padding == "same_torch" and k % 2 == 1)
        or (
            isinstance(padding, tuple)
            and padding[0] + padding[1] == (k - 1) * dilation
        )
    )
    if k <= 3 and stride == 1 and groups == 1 and pad_ok:
        return conv1d_matmul(p, x, padding=padding, dilation=dilation)
    return conv1d(
        p, x, stride=stride, padding=padding, dilation=dilation, groups=groups
    )


def conv1d_matmul(
    p: PyTree,
    x: Array,
    *,
    padding="same_torch",
    dilation: int = 1,
) -> Array:
    """conv1d as K shifted matmuls — mathematically identical, MXU-native.

    Measured motivation (scripts/profile_conv_as_matmul.py, v5e): when small
    convs interleave with attention/FFN matmuls, XLA's conv lowering forces
    layout boundaries that break fusion at batch >= 12(×T=512) — the same
    graph runs 2.7x faster with convs expressed as matmuls (28.3 -> 10.3 ms
    for the estimator's 12 mid stages), and never slower at small batch.
    Stride/groups unsupported (nothing on the compute path needs them).
    """
    w = p["w"]  # (K, Cin, Cout)
    k = w.shape[0]
    t = x.shape[1]
    if k == 1:
        y = x @ w[0]
    else:
        if padding == "same_torch":
            left = (k // 2) * dilation
        elif padding == "causal":
            left = (k - 1) * dilation
        elif padding == "valid":
            raise ValueError("valid padding: pre-pad explicitly or use conv1d")
        else:
            left = padding[0]
        # tap i reads x[t + i*dilation - left]: one pad + K static slices
        right = (k - 1) * dilation - left
        xp = jnp.pad(x, ((0, 0), (left, max(right, 0)), (0, 0)))
        y = None
        for i in range(k):
            xi = jax.lax.dynamic_slice_in_dim(xp, i * dilation, t, axis=1)
            y = xi @ w[i] if y is None else y + xi @ w[i]
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def depthwise_conv1d_init(key, channels: int, kernel_size: int) -> PyTree:
    """torch depthwise Conv1d (groups == channels): weight (C, 1, K) ->
    ours (K, C); torch fan_in = (in_ch/groups)*K = K."""
    kw, kb = jax.random.split(key)
    return {
        "w": kaiming_uniform_torch(kw, (kernel_size, channels), fan_in=kernel_size),
        "b": uniform_bias_torch(kb, (channels,), kernel_size),
    }


def depthwise_conv1d(p: PyTree, x: Array, *, padding="valid") -> Array:
    """Depthwise conv over (B, T, C) as K shifted elementwise multiply-adds.

    XLA's grouped-conv lowering (feature_group_count=C) is the measured ~4x
    slow path on this TPU (CLAUDE.md); K tap-shifts are pure VPU work and
    fuse. padding follows conv1d's conventions.
    """
    w = p["w"]
    k = w.shape[0]
    if padding == "same_torch":
        pad = (k // 2, k // 2)
    elif padding == "causal":
        pad = (k - 1, 0)
    elif padding == "valid":
        pad = (0, 0)
    else:
        pad = padding
    xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
    t_out = xp.shape[1] - k + 1
    y = None
    for tap in range(k):
        term = jax.lax.slice_in_dim(xp, tap, tap + t_out, axis=1) * w[tap]
        y = term if y is None else y + term
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def batch_norm_init(channels: int) -> PyTree:
    return {
        "gamma": jnp.ones((channels,)),
        "beta": jnp.zeros((channels,)),
        "mean": jnp.zeros((channels,)),
        "var": jnp.ones((channels,)),
    }


def batch_norm(p: PyTree, x: Array, eps: float = 1e-5) -> Array:
    """Inference-mode BatchNorm over the channel (last) axis of (B, T, C),
    using running statistics (torch BatchNorm1d.eval semantics)."""
    inv = jax.lax.rsqrt(p["var"].astype(x.dtype) + eps)
    return (x - p["mean"].astype(x.dtype)) * inv * p["gamma"].astype(
        x.dtype
    ) + p["beta"].astype(x.dtype)


def conv_transpose1d_init(
    key, in_ch: int, out_ch: int, kernel_size: int, bias: bool = True
) -> PyTree:
    kw, kb = jax.random.split(key)
    fan_in = out_ch * kernel_size  # torch ConvTranspose fan_in uses weight[1]*k
    p = {"w": kaiming_uniform_torch(kw, (kernel_size, in_ch, out_ch), fan_in=fan_in)}
    if bias:
        p["b"] = uniform_bias_torch(kb, (out_ch,), fan_in)
    return p


def conv_transpose1d(
    p: PyTree, x: Array, *, stride: int, padding: int = 0
) -> Array:
    """torch-semantics ConvTranspose1d over (B, T, C).

    Output length = (T-1)*stride - 2*padding + K.  Implemented as an
    lhs-dilated convolution with a spatially flipped kernel — one fused XLA
    conv, no gather/scatter (reference: torch ConvTranspose1d in
    hifigan/generator.py:295 and flow Upsample1D decoder.py:205).
    """
    w = p["w"]  # (K, C_in, C_out)
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=0)
    y = jax.lax.conv_general_dilated(
        x,
        w_flip.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv_transpose1d_matmul(
    p: PyTree, x: Array, *, stride: int, padding: int = 0
) -> Array:
    """ConvTranspose1d as ceil(K/S) batched matmuls + reshape.

    y[s*q + r] = sum_m x[q-m] @ W[r + s*m] — each output phase r is a
    matmul over taps m, so the whole op is n_taps (B,T,Cin)@(Cin,S*Cout)
    products and one reshape. Mathematically identical to conv_transpose1d
    (max err ~2e-7). Measured v5e: when S does NOT divide K, XLA's
    lhs-dilated conv lowering is catastrophic and this wins big
    (k11/s5 @T=4096: 835 -> 123 us; k7/s3 @T=20480: 310 -> 24 us); when
    S | K the fused conv wins (k16/s8: 61 vs 177 us) — see
    conv_transpose1d_auto.
    """
    w = p["w"]  # (K, Cin, Cout)
    k, cin, cout = w.shape
    s = stride
    n_taps = -(-k // s)
    wpad = jnp.pad(w, ((0, n_taps * s - k), (0, 0), (0, 0)))
    b, t, _ = x.shape
    y = None
    for m in range(n_taps):
        wm = wpad[m * s : (m + 1) * s]  # (s, cin, cout)
        xm = jnp.pad(x, ((0, 0), (m, n_taps - 1 - m), (0, 0)))
        ym = jnp.einsum(
            "btc,scd->btsd", xm, wm, preferred_element_type=x.dtype
        )
        y = ym if y is None else y + ym
    y = y.reshape(b, (t + n_taps - 1) * s, cout)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    lo = padding
    hi = (t - 1) * s + k - padding
    return y[:, lo:hi]


def conv_transpose1d_auto(
    p: PyTree, x: Array, *, stride: int, padding: int = 0
) -> Array:
    """Measured dispatch: matmul form when stride does not divide K
    (XLA's lhs-dilated lowering is ~7-13x slower there), fused conv
    otherwise."""
    if p["w"].shape[0] % stride != 0:
        return conv_transpose1d_matmul(p, x, stride=stride, padding=padding)
    return conv_transpose1d(p, x, stride=stride, padding=padding)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int) -> PyTree:
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def layer_norm(p: PyTree, x: Array, eps: float = 1e-5) -> Array:
    """LayerNorm over the last dim (torch nn.LayerNorm semantics)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["g"] + p["b"]
    return y.astype(x.dtype)


def channel_layer_norm(p: PyTree, x: Array, eps: float = 1e-4) -> Array:
    """The glow-TTS channel LayerNorm (reference models/text_encoder.py:11-29).

    In the reference it normalizes dim 1 of (B, C, T); with our channels-last
    layout that is identical math to last-dim LayerNorm, but with eps=1e-4.
    """
    return layer_norm(p, x, eps=eps)


def group_norm_init(num_channels: int) -> PyTree:
    return {"g": jnp.ones((num_channels,)), "b": jnp.zeros((num_channels,))}


def group_norm(
    p: PyTree, x: Array, num_groups: int, eps: float = 1e-5
) -> Array:
    """torch nn.GroupNorm over (B, T, C): stats over (T, C/G) per group.

    NOTE: like the reference's Block1D (flow/decoder.py:82-95) this
    normalizes over padded frames too — masking happens outside. Replicated,
    not "fixed", for weight parity.
    """
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, t, c) * p["g"] + p["b"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def mish(x: Array) -> Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def snake(x: Array, alpha: Array, alpha_logscale: bool = False) -> Array:
    """Snake activation x + sin^2(a*x)/a (reference transformer/activation.py:34-84).

    `alpha` has shape (C,) and broadcasts over (B, T, C).
    """
    if alpha_logscale:
        alpha = jnp.exp(alpha)
    return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(x * alpha))


def gelu_torch(x: Array) -> Array:
    """torch F.gelu default = exact erf form (diffusers GELU default)."""
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))).astype(x.dtype)


def silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def elu(x: Array) -> Array:
    return jax.nn.elu(x)


def leaky_relu(x: Array, slope: float) -> Array:
    return jnp.where(x >= 0, x, x * slope)


# ---------------------------------------------------------------------------
# Masks (jittable analogs of reference jyutvoice/utils/{model,mask}.py)
# ---------------------------------------------------------------------------


def sequence_mask(lengths: Array, max_length: int) -> Array:
    """(B,) lengths -> (B, T) bool mask. reference utils/model.py:7-12."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def subsequent_chunk_mask(size: int, chunk_size: int, num_left_chunks: int = -1):
    """(T, T) bool chunk-causal mask (reference utils/mask.py:91-131),
    built vectorized instead of a Python loop."""
    row = jnp.arange(size)
    chunk_idx = row // chunk_size
    ending = jnp.minimum((chunk_idx + 1) * chunk_size, size)
    if num_left_chunks < 0:
        start = jnp.zeros_like(row)
    else:
        start = jnp.maximum((chunk_idx - num_left_chunks) * chunk_size, 0)
    col = jnp.arange(size)
    return (col[None, :] >= start[:, None]) & (col[None, :] < ending[:, None])


def chunk_attn_mask(
    pad_mask: Array, static_chunk_size: int, num_left_chunks: int = -1
) -> Array:
    """(B, T) pad mask -> (B, T, T) bool attention mask.

    static_chunk_size <= 0 gives the full (non-streaming) mask: key-padding
    only, broadcast over queries — matching add_optional_chunk_mask
    (reference utils/mask.py:137-207) for the decoding configurations used.
    """
    b, t = pad_mask.shape
    keys = pad_mask[:, None, :]
    if static_chunk_size and static_chunk_size > 0:
        cm = subsequent_chunk_mask(t, static_chunk_size, num_left_chunks)
        return keys & cm[None, :, :]
    return jnp.broadcast_to(keys, (b, t, t))


def mask_to_bias(mask: Array, dtype=jnp.float32) -> Array:
    """bool mask -> additive bias, 0 kept / -1e10 masked
    (reference utils/common.py:201-209)."""
    return (1.0 - mask.astype(dtype)) * -1.0e10


def generate_path(duration: Array, attn_mask: Array) -> Array:
    """Duration -> monotonic alignment path (reference utils/model.py:29-46).

    duration: (B, T_text) float durations.
    attn_mask: (B, T_text, T_mel) bool/float.
    Returns (B, T_text, T_mel): row i covers mel frames
    [cumsum[:i], cumsum[:i+1]).  Pure cumsum + compare: fully vectorized.
    """
    b, t_x, t_y = attn_mask.shape
    cum = jnp.cumsum(duration, axis=1)  # (B, T_text)
    pos = jnp.arange(t_y, dtype=cum.dtype)
    path = (pos[None, None, :] < cum[:, :, None]).astype(attn_mask.dtype)
    prev = jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return (path - prev) * attn_mask


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------


def dropout(x: Array, rate: float, key: Optional[Array], deterministic: bool) -> Array:
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
