"""Unit tests for nn.core primitives vs torch reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from jyutvoice_tpu.nn import attention, core


def t2j(x):
    return jnp.asarray(x.detach().cpu().numpy())


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_conv1d_matches_torch(rng):
    b, t, cin, cout, k = 2, 17, 6, 10, 5
    x = rng.standard_normal((b, t, cin), dtype=np.float32)
    conv = torch.nn.Conv1d(cin, cout, k, padding=k // 2)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    p = {
        "w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0)),
        "b": jnp.asarray(conv.bias.detach().numpy()),
    }
    out = core.conv1d(p, jnp.asarray(x), padding="same_torch")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_conv1d_causal_matches_torch(rng):
    b, t, c, k = 2, 23, 8, 3
    x = rng.standard_normal((b, t, c), dtype=np.float32)
    conv = torch.nn.Conv1d(c, c, k, padding=0)
    xt = torch.nn.functional.pad(torch.from_numpy(x).transpose(1, 2), (k - 1, 0))
    with torch.no_grad():
        ref = conv(xt).transpose(1, 2).numpy()
    p = {
        "w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0)),
        "b": jnp.asarray(conv.bias.detach().numpy()),
    }
    out = core.conv1d(p, jnp.asarray(x), padding="causal")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_conv1d_dilated_matches_torch(rng):
    b, t, c, k, d = 1, 40, 4, 3, 5
    x = rng.standard_normal((b, t, c), dtype=np.float32)
    conv = torch.nn.Conv1d(c, c, k, dilation=d, padding=(k * d - d) // 2)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    p = {
        "w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0)),
        "b": jnp.asarray(conv.bias.detach().numpy()),
    }
    pad = (k * d - d) // 2
    out = core.conv1d(p, jnp.asarray(x), padding=(pad, pad), dilation=d)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,s,pad", [(16, 8, 4), (11, 5, 3), (7, 3, 2), (4, 2, 1)])
def test_conv_transpose1d_matches_torch(rng, k, s, pad):
    b, t, cin, cout = 2, 13, 6, 4
    x = rng.standard_normal((b, t, cin), dtype=np.float32)
    conv = torch.nn.ConvTranspose1d(cin, cout, k, s, padding=pad)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    p = {
        # torch ConvTranspose1d weight (C_in, C_out, K) -> (K, C_in, C_out)
        "w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 0, 1)),
        "b": jnp.asarray(conv.bias.detach().numpy()),
    }
    out = core.conv_transpose1d(p, jnp.asarray(x), stride=s, padding=pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 9, 32), dtype=np.float32)
    ln = torch.nn.LayerNorm(32)
    with torch.no_grad():
        ln.weight.copy_(torch.rand(32))
        ln.bias.copy_(torch.rand(32) - 0.5)
        ref = ln(torch.from_numpy(x)).numpy()
    p = {"g": t2j(ln.weight), "b": t2j(ln.bias)}
    out = core.layer_norm(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 11, 16), dtype=np.float32)
    gn = torch.nn.GroupNorm(8, 16)
    with torch.no_grad():
        gn.weight.copy_(torch.rand(16))
        gn.bias.copy_(torch.rand(16) - 0.5)
        ref = gn(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    p = {"g": t2j(gn.weight), "b": t2j(gn.bias)}
    out = core.group_norm(p, jnp.asarray(x), num_groups=8)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_activations_match_torch(rng):
    x = rng.standard_normal((64,), dtype=np.float32) * 3
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(
        np.asarray(core.mish(jnp.asarray(x))),
        torch.nn.functional.mish(xt).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(core.gelu_torch(jnp.asarray(x))),
        torch.nn.functional.gelu(xt).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(core.silu(jnp.asarray(x))),
        torch.nn.functional.silu(xt).numpy(),
        atol=1e-6,
    )
    alpha = np.abs(rng.standard_normal(8).astype(np.float32)) + 0.5
    x2 = rng.standard_normal((2, 5, 8), dtype=np.float32)
    # reference Snake: x + sin^2(x*alpha)/alpha
    ref = x2 + (1.0 / (alpha + 1e-9)) * np.sin(x2 * alpha) ** 2
    np.testing.assert_allclose(
        np.asarray(core.snake(jnp.asarray(x2), jnp.asarray(alpha))), ref, atol=1e-6
    )


def test_generate_path_matches_torch_semantics():
    # reference utils/model.py:29-46
    dur = jnp.asarray([[2.0, 3.0, 1.0], [1.0, 1.0, 0.0]])
    x_mask = core.sequence_mask(jnp.asarray([3, 2]), 3).astype(jnp.float32)
    y_mask = core.sequence_mask(jnp.asarray([6, 2]), 7).astype(jnp.float32)
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
    path = core.generate_path(dur, attn_mask)
    expect0 = np.array(
        [
            [1, 1, 0, 0, 0, 0, 0],
            [0, 0, 1, 1, 1, 0, 0],
            [0, 0, 0, 0, 0, 1, 0],
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(np.asarray(path[0]), expect0)
    expect1 = np.array(
        [
            [1, 0, 0, 0, 0, 0, 0],
            [0, 1, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0],
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(np.asarray(path[1]), expect1)


def test_subsequent_chunk_mask_matches_reference():
    # reference utils/mask.py example: subsequent_chunk_mask(4, 2)
    m = np.asarray(core.subsequent_chunk_mask(4, 2))
    expect = np.array(
        [
            [1, 1, 0, 0],
            [1, 1, 0, 0],
            [1, 1, 1, 1],
            [1, 1, 1, 1],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(m, expect)


def test_rel_shift_gather_matches_espnet():
    # reference transformer/attention.py:227-247 rel_shift
    b, h, t = 2, 3, 5
    x = torch.randn(b, h, t, 2 * t - 1)
    zero_pad = torch.zeros((b, h, t, 1))
    x_padded = torch.cat([zero_pad, x], dim=-1)
    x_padded = x_padded.view(b, h, 2 * t, t)
    ref = x_padded[:, :, 1:].view(b, h, t, 2 * t - 1)[:, :, :, : t]
    out = attention.rel_shift_gather(t2j(x), t, t)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_rel_shift_gather_degenerate_tq1():
    # out[i, j] = in[i, tq-1-i+j]; with t_q == 1 that is the identity.
    # t_q=1, w=1 (rel_mha at T=1): the flat path's band is zero-width, so
    # the gather fallback must be taken (regression: round-3 guard change)
    x = jnp.arange(6.0).reshape(2, 3, 1, 1)
    out = attention.rel_shift_gather(x, 1, 1)
    assert out.shape == (2, 3, 1, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    # t_q=1 with a wider band and t_k == w (chunked caller with c_len=1)
    w = 5
    x2 = jnp.arange(2.0 * 3 * w).reshape(2, 3, 1, w)
    out2 = attention.rel_shift_gather(x2, 1, w)
    assert out2.shape == (2, 3, 1, w)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x2))


def test_espnet_rel_pos_emb_matches_torch():
    import math as m

    t, d = 7, 16
    # torch reference re-implementation (transformer/embedding.py:222-253)
    pe_positive = torch.zeros(t, d)
    pe_negative = torch.zeros(t, d)
    position = torch.arange(0, t, dtype=torch.float32).unsqueeze(1)
    div_term = torch.exp(
        torch.arange(0, d, 2, dtype=torch.float32) * -(m.log(10000.0) / d)
    )
    pe_positive[:, 0::2] = torch.sin(position * div_term)
    pe_positive[:, 1::2] = torch.cos(position * div_term)
    pe_negative[:, 0::2] = torch.sin(-1 * position * div_term)
    pe_negative[:, 1::2] = torch.cos(-1 * position * div_term)
    pe_positive = torch.flip(pe_positive, [0])
    ref = torch.cat([pe_positive, pe_negative[1:]], dim=0)
    out = attention.espnet_rel_pos_emb(t, d)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_mesh_available():
    assert len(jax.devices()) == 8


def test_conv1d_matmul_equivalence():
    """conv1d_matmul == conv1d for every (k, dilation, padding) the
    estimator/vocoder use; k=1 short-circuits to a plain matmul."""
    import jax
    import jax.numpy as jnp

    from jyutvoice_tpu.nn import core

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 37, 16)), jnp.float32)
    for k, d, padding in [
        (1, 1, "valid"),
        (3, 1, "causal"),
        (3, 1, "same_torch"),
        (5, 2, "causal"),
        (7, 3, "same_torch"),
        (11, 5, "same_torch"),
        (3, 2, (2, 2)),
        (3, 1, (1, 1)),
    ]:
        p = core.conv1d_init(jax.random.PRNGKey(k * 10 + d), 16, 24, k)
        ref = core.conv1d(x=x, p=p, padding=padding, dilation=d)
        mm = core.conv1d_matmul(p, x, padding=padding, dilation=d)
        np.testing.assert_allclose(
            np.asarray(mm), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"k={k} d={d} pad={padding}",
        )
        auto = core.conv1d_auto(p, x, padding=padding, dilation=d)
        np.testing.assert_allclose(
            np.asarray(auto), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"auto k={k} d={d} pad={padding}",
        )


def test_conv_transpose_matmul_matches_conv():
    """conv_transpose1d_matmul == conv_transpose1d for the HiFT shapes
    (k16/s8, k11/s5, k7/s3) and the auto dispatch picks a correct branch."""
    import jax

    from jyutvoice_tpu.nn import core

    rng = np.random.default_rng(0)
    for k, s, t in [(16, 8, 12), (11, 5, 20), (7, 3, 33), (4, 2, 9)]:
        p = core.conv_transpose1d_init(jax.random.PRNGKey(k), 6, 10, k)
        x = jnp.asarray(rng.standard_normal((2, t, 6)), jnp.float32)
        pad = (k - s) // 2
        ref = core.conv_transpose1d(p, x, stride=s, padding=pad)
        mm = core.conv_transpose1d_matmul(p, x, stride=s, padding=pad)
        np.testing.assert_allclose(
            np.asarray(mm), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"k={k} s={s}",
        )
        auto = core.conv_transpose1d_auto(p, x, stride=s, padding=pad)
        np.testing.assert_allclose(
            np.asarray(auto), np.asarray(ref), rtol=1e-5, atol=1e-5,
        )


def test_conv1d_auto_even_kernel_same_torch_keeps_conv_semantics():
    """k=2 with same_torch pads (1,1) -> output t+1; the matmul lowering
    cannot express that, so conv1d_auto must fall back to conv1d."""
    import jax

    from jyutvoice_tpu.nn import core

    p = core.conv1d_init(jax.random.PRNGKey(0), 4, 4, 2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 9, 4)),
                    jnp.float32)
    ref = core.conv1d(p, x, padding="same_torch")
    auto = core.conv1d_auto(p, x, padding="same_torch")
    assert auto.shape == ref.shape  # (1, 10, 4)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref), rtol=1e-6)


def test_rand_noise_cap_and_extension():
    from jyutvoice_tpu.weights.noise import (
        _FRAMES,
        rand_noise,
        rand_noise_extended,
    )

    with pytest.raises(ValueError):
        rand_noise(_FRAMES + 1)
    a = rand_noise_extended(_FRAMES + 7)
    b = rand_noise_extended(_FRAMES + 30)
    # seed-0 prefix preserved; extension is position-indexed (prefix-stable)
    np.testing.assert_array_equal(a[0, :_FRAMES], rand_noise(_FRAMES)[0])
    np.testing.assert_array_equal(a[0, _FRAMES:], b[0, _FRAMES:_FRAMES + 7])


def test_compact_scores_gate_and_tolerance(rng):
    """The bf16-score fast path (estimator._attend gate) must stay inside
    the mel-parity budget and the gate must cover both regimes."""
    from jyutvoice_tpu.models.estimator import use_compact_scores

    # batch regime: 2B*T rows; long-form regime: T alone.
    assert use_compact_scores(16, 512)        # 8192 rows (batch-8 serving)
    assert not use_compact_scores(8, 512)     # 4096 rows: f32 wins
    assert use_compact_scores(2, 1536)        # long-form clause
    assert not use_compact_scores(2, 1024)    # f32 still wins at T<=1024
    assert use_compact_scores(1, 2048)

    b, h, t, d = 2, 8, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    bias = jnp.where(
        jnp.arange(t)[None, None, None, :] < t - 17, 0.0, -1e10
    ).astype(jnp.float32)
    ref = attention.sdpa(q, k, v, bias)
    fast = attention.sdpa(q, k, v, bias, compact_scores=True)
    diff = float(jnp.max(jnp.abs(fast - ref)))
    # measured ~2e-4 abs/op on TPU; allow headroom, but far under the
    # 1e-2 end-to-end mel budget
    assert diff < 5e-2, diff
    corr = float(jnp.corrcoef(fast.ravel(), ref.ravel())[0, 1])
    assert corr > 0.9999, corr
