"""Monotonic Alignment Search.

Three implementations of the same Viterbi max-path DP (reference
jyutvoice/utils/monotonic_align/core.pyx + __init__.py):

  * `maximum_path` — host-side: C++/OpenMP shared library (built on demand
    with g++, cached next to the source) with a pure-numpy fallback;
  * `maximum_path_jax` — on-device: `lax.scan` over mel frames with a
    vectorized carry over text positions (anti-diagonal wavefront), fully
    jittable so training never leaves the TPU.

All take value (B, t_x, t_y) log-priors + mask and return a 0/1 path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

_log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "mas.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmas.so")
_lib = None
_lib_tried = False


def _build_lib() -> Optional[str]:
    cmds = [
        ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
        ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],  # no OpenMP
    ]
    for cmd in cmds:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return _LIB_PATH
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            continue
    return None


def _get_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build_lib()
    if path is None:
        _log.warning("MAS C++ extension unavailable; using numpy fallback")
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.maximum_path_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except OSError as e:  # pragma: no cover
        _log.warning("failed to load MAS library: %s", e)
    return _lib


def _maximum_path_numpy(value: np.ndarray, t_xs: np.ndarray, t_ys: np.ndarray):
    """Vectorized-over-x numpy DP (fallback)."""
    b, t_x, t_y = value.shape
    path = np.zeros((b, t_x, t_y), dtype=np.int32)
    max_neg = -1e9
    for i in range(b):
        v = value[i]
        tx, ty = int(t_xs[i]), int(t_ys[i])
        for y in range(ty):
            x_lo, x_hi = max(0, tx + y - ty), min(tx, y + 1)
            if x_hi <= x_lo:
                continue
            xs = np.arange(x_lo, x_hi)
            v_cur = np.where(xs == y, max_neg, v[xs, y - 1] if y > 0 else max_neg)
            if y == 0:
                v_cur = np.full(xs.shape, max_neg)
            v_prev = np.where(
                xs == 0,
                0.0 if y == 0 else max_neg,
                v[np.maximum(xs - 1, 0), y - 1] if y > 0 else max_neg,
            )
            if y == 0:
                v_prev = np.where(xs == 0, 0.0, max_neg)
            v[xs, y] += np.maximum(v_cur, v_prev)
        index = tx - 1
        for y in range(ty - 1, -1, -1):
            path[i, index, y] = 1
            if index != 0 and (
                index == y or v[index, y - 1] < v[index - 1, y - 1]
            ):
                index -= 1
    return path


def maximum_path(value, mask):
    """Host MAS. value/mask: (B, t_x, t_y) arrays (any array-like).

    Returns np.ndarray float32 path. Matches reference
    monotonic_align/__init__.py:7-22 semantics (value is pre-masked).
    """
    value = np.ascontiguousarray(np.asarray(value, dtype=np.float32))
    mask_np = np.asarray(mask)
    value = value * mask_np
    b, t_x, t_y = value.shape
    t_xs = np.ascontiguousarray(mask_np.sum(axis=1)[:, 0].astype(np.int32))
    t_ys = np.ascontiguousarray(mask_np.sum(axis=2)[:, 0].astype(np.int32))

    lib = _get_lib()
    if lib is not None:
        path = np.zeros((b, t_x, t_y), dtype=np.int32)
        lib.maximum_path_batch(
            path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b,
            t_x,
            t_y,
        )
    else:
        path = _maximum_path_numpy(value, t_xs, t_ys)
    return path.astype(np.float32) * mask_np


# ---------------------------------------------------------------------------
# On-device JAX wavefront MAS
# ---------------------------------------------------------------------------


def maximum_path_jax(value, mask):
    """Jittable MAS: scan over t_y with an (x,)-vector carry.

    value, mask: (B, t_x, t_y). The forward DP recurrence
        V[x, y] = max(V[x, y-1] if x<y else -inf,
                      V[x-1, y-1] if x>0 else (0 at y==0)) + value[x, y]
    vectorizes over x at each y (VPU-friendly); backtrack is a reverse scan
    carrying the current text index.
    """
    import jax
    import jax.numpy as jnp

    value = jnp.asarray(value) * mask
    b, t_x, t_y = value.shape
    t_xs = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)
    t_ys = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)
    neg = jnp.float32(-1e9)
    xs = jnp.arange(t_x)

    def fwd_step(carry, y):
        v_prev_row = carry  # (B, t_x) = V[:, y-1]
        stay = jnp.where(xs[None, :] == y, neg, v_prev_row)
        stay = jnp.where(y == 0, neg, stay)
        advance = jnp.concatenate(
            [jnp.full((b, 1), neg), v_prev_row[:, :-1]], axis=1
        )
        base = jnp.where((xs[None, :] == 0) & (y == 0), 0.0, neg)
        best = jnp.maximum(jnp.maximum(stay, advance), base)
        # outside the valid band the reference never writes; keep neg there
        lo = jnp.maximum(0, t_xs[:, None] + y - t_ys[:, None])
        hi = jnp.minimum(t_xs[:, None], y + 1)
        in_band = (xs[None, :] >= lo) & (xs[None, :] < hi)
        row = jnp.where(in_band, best + value[:, :, y], neg)
        return row, row

    init = jnp.full((b, t_x), neg)
    _, v_rows = jax.lax.scan(fwd_step, init, jnp.arange(t_y))
    v = jnp.transpose(v_rows, (1, 2, 0))  # (B, t_x, t_y)

    def bwd_step(index, y):
        # path bit for (index, y); move when index==y or V[idx,y-1] < V[idx-1,y-1]
        active = y < t_ys  # rows shorter than t_y: only set inside valid range
        onehot = (xs[None, :] == index[:, None]) & active[:, None]
        vy = jnp.where(y - 1 >= 0, v[:, :, jnp.maximum(y - 1, 0)], neg)
        v_idx = jnp.take_along_axis(vy, index[:, None], axis=1)[:, 0]
        v_idx1 = jnp.take_along_axis(
            vy, jnp.maximum(index - 1, 0)[:, None], axis=1
        )[:, 0]
        move = (index != 0) & ((index == y) | (v_idx < v_idx1)) & active
        return index - move.astype(index.dtype), onehot

    init_idx = t_xs - 1
    _, bits = jax.lax.scan(
        bwd_step, init_idx, jnp.arange(t_y - 1, -1, -1)
    )
    path = jnp.flip(jnp.transpose(bits, (1, 2, 0)), axis=2)  # (B, t_x, t_y)
    return path.astype(jnp.float32) * mask
