"""MAS tests: C++ kernel vs numpy fallback vs JAX wavefront vs the
independent reference-recurrence implementation in refshim, plus the
monotonic-path invariants."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
import refshim

import jax.numpy as jnp

from jyutvoice_tpu import align


def _make_case(rng, b, t_x, t_y):
    value = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
    t_xs = rng.integers(2, t_x + 1, b).astype(np.int32)
    t_ys = np.array(
        [rng.integers(tx, t_y + 1) for tx in t_xs], dtype=np.int32
    )  # t_y >= t_x required by MAS
    mask = np.zeros((b, t_x, t_y), np.float32)
    for i in range(b):
        mask[i, : t_xs[i], : t_ys[i]] = 1
    return value, mask, t_xs, t_ys


def _ref_path(value, mask, t_xs, t_ys):
    v = (value * mask).copy()
    paths = np.zeros_like(v, dtype=np.int32)
    refshim._numpy_maximum_path_c(paths, v, t_xs, t_ys)
    return paths.astype(np.float32) * mask


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    return _make_case(rng, 5, 11, 23)


def _check_valid_path(path, t_xs, t_ys):
    for i in range(path.shape[0]):
        p = path[i, : t_xs[i], : t_ys[i]]
        # each mel frame assigned exactly one text token
        np.testing.assert_array_equal(p.sum(axis=0), np.ones(t_ys[i]))
        # monotonic, contiguous coverage: each row covers >= 1 frame
        assert (p.sum(axis=1) >= 1).all()
        # non-decreasing argmax
        am = p.argmax(axis=0)
        assert (np.diff(am) >= 0).all()


def test_cpp_matches_reference_recurrence(case):
    value, mask, t_xs, t_ys = case
    expect = _ref_path(value, mask, t_xs, t_ys)
    got = align.maximum_path(value, mask)
    np.testing.assert_array_equal(got, expect)
    _check_valid_path(got, t_xs, t_ys)


def test_cpp_library_built():
    assert align._get_lib() is not None, "C++ MAS kernel should build with g++"


def test_numpy_fallback_matches(case):
    value, mask, t_xs, t_ys = case
    expect = _ref_path(value, mask, t_xs, t_ys)
    got = align._maximum_path_numpy(
        (value * mask).copy(), t_xs, t_ys
    ).astype(np.float32) * mask
    np.testing.assert_array_equal(got, expect)


def test_jax_wavefront_matches(case):
    value, mask, t_xs, t_ys = case
    expect = _ref_path(value, mask, t_xs, t_ys)
    got = np.asarray(align.maximum_path_jax(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, expect)


def test_jax_wavefront_jits(case):
    import jax

    value, mask, *_ = case
    f = jax.jit(align.maximum_path_jax)
    out1 = np.asarray(f(jnp.asarray(value), jnp.asarray(mask)))
    out2 = align.maximum_path(value, mask)
    np.testing.assert_array_equal(out1, out2)
