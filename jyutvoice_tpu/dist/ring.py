"""Ring attention for sequence-parallel long-form decoding.

The GSPMD annotation path (dist/sp.py) keeps attention scores sharded on
the QUERY axis only: per-chip memory is (2B, H, T/n, T) because every chip
all-gathers the full K/V. That caps one-pass decodes at roughly
T ~ 60k frames on a 16 GB chip even at n=8. Ring attention shards BOTH
axes: each chip holds a (T/n, D) K/V block, computes a local
(T/n, T/n) score tile with an online-softmax accumulator (the
flash-attention recurrence), and rotates the K/V block to its ring
neighbour with `ppermute` — n-1 rotations visit every block, per-chip
score memory drops to (2B, H, T/n, T/n), and each rotation is issued
BEFORE the tile compute that reads the current block, so it rides ICI
while the MXU works (no data dependency). Reference has no analog (single-GPU decoding only);
this is the "How to Scale Your Model" collective-matmul pattern applied
to the CFM estimator.

Mask semantics: key validity travels WITH the rotating block (a (B, T/n)
mask shard rides the ring), so arbitrary padding works; queries in padded
rows produce unnormalized garbage that the caller's output mask removes —
same contract as the estimator's other attention backends.

Used inside `shard_map` (dist/sp.py::sp_cfm_solve(attention="ring")); pure
jnp + lax so it runs identically on the CPU test mesh and TPU pods.
"""

from __future__ import annotations

import math
import threading

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_NEG = -1e30  # not -inf: an all-masked tile must not NaN the running max

# Mesh/axis the estimator's "ring" attention backend should shard over.
# Config dataclasses hold only primitives, so sp_cfm_solve registers the
# live mesh here. jax.jit traces lazily on the FIRST CALL, so the solver
# re-binds its own mesh before every call (dist/sp.py::run) — building
# several ring solvers before calling them cannot cross-wire meshes. The
# jitted graph bakes the mesh in at trace time. The registry is
# THREAD-LOCAL: run() re-binds in the calling thread immediately before
# the jitted call, so two threads first-calling different ring solvers
# concurrently each trace against their own mesh instead of racing on a
# shared global.
_ACTIVE = threading.local()


def set_ring_context(mesh, axis_name: str) -> None:
    _ACTIVE.mesh = mesh
    _ACTIVE.axis = axis_name


def get_ring_context():
    if getattr(_ACTIVE, "mesh", None) is None:
        raise RuntimeError(
            "attention_backend='ring' requires dist.ring.set_ring_context"
            "(mesh, axis) first (dist/sp.py::sp_cfm_solve does this) — "
            "note the registry is thread-local: bind it in the thread "
            "that makes the first (tracing) call"
        )
    return _ACTIVE.mesh, _ACTIVE.axis


def ring_attention_local(
    q: Array,
    k: Array,
    v: Array,
    kv_valid: Array,
    axis_name: str,
    scale: float | None = None,
) -> Array:
    """Per-shard body: full attention over the ring of K/V blocks.

    q, k, v: (B, H, Tl, D) local shards of the sequence axis;
    kv_valid: (B, Tl) bool/0-1 validity of the LOCAL key block.
    Returns (B, H, Tl, D) = softmax(q K^T / sqrt(d)) V over the GLOBAL
    sequence, computed without ever materializing a (Tl, T) tile.
    """
    n = lax.psum(1, axis_name)
    d = q.shape[-1]
    s = (1.0 / math.sqrt(d)) if scale is None else scale
    b, h, tl, _ = q.shape

    perm = [(i, (i + 1) % n) for i in range(n)]  # rotate blocks rightwards

    def absorb(o, m, l, k_blk, v_blk, m_blk):
        """Fold one (B, H, Tl, Tl) score tile into the online-softmax
        accumulator. Tile in f32 (softmax numerics); the bf16
        compact-score trade is not worth re-deriving here — the tile is
        already n^2-fold smaller than the dense path's working set."""
        t = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * s
        t = jnp.where(m_blk[:, None, None, :].astype(bool), t, _NEG)
        m_new = jnp.maximum(m, jnp.max(t, axis=-1, keepdims=True))
        # rescale the running accumulator, fold in this tile
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(t - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return o, m_new, l

    def step(i, state):
        o, m, l, k_blk, v_blk, mask_blk = state
        # PREFETCH the neighbour's block first: the three ppermutes have
        # no data dependency on this step's tile compute (which reads the
        # CURRENT block), so the rotation rides ICI while the MXU works.
        # The loop runs n-1 times, so no final wasted restore-rotation
        # (the old rotate-after-compute form spent 1/n of the ring's ICI
        # traffic restoring the original block after the last tile AND
        # serialized every rotation behind the einsum that read it).
        nk = lax.ppermute(k_blk, axis_name, perm)
        nv = lax.ppermute(v_blk, axis_name, perm)
        nm = lax.ppermute(mask_blk, axis_name, perm)
        o, m, l = absorb(o, m, l, k_blk, v_blk, mask_blk)
        return o, m, l, nk, nv, nm

    # fresh constants are device-invariant under shard_map's varying-axes
    # typing; mark them varying over the ring axis so the fori_loop carry
    # types match (jax >= 0.7 vma rules)
    def _vary(x):
        return lax.pcast(x, (axis_name,), to="varying")

    o0 = _vary(jnp.zeros((b, h, tl, d), jnp.float32))
    m0 = _vary(jnp.full((b, h, tl, 1), _NEG, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, tl, 1), jnp.float32))
    mask0 = kv_valid.astype(jnp.float32)
    o, m, l, k_last, v_last, m_last = lax.fori_loop(
        0, n - 1, step, (o0, m0, l0, k, v, mask0)
    )
    # last block: absorb only (n=1 collapses to a single local tile)
    o, m, l = absorb(o, m, l, k_last, v_last, m_last)
    return (o / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    kv_valid: Array,
    mesh,
    axis_name: str,
    scale: float | None = None,
) -> Array:
    """shard_map wrapper: q/k/v (B, H, T, D) sharded on T over `axis_name`,
    kv_valid (B, T) likewise; output (B, H, T, D) sharded the same way."""
    from jax.sharding import PartitionSpec as P

    try:  # jax >= 0.6 public name
        from jax import shard_map as smap
    except ImportError:  # older experimental location
        from jax.experimental.shard_map import shard_map as smap

    seq4 = P(None, None, axis_name, None)
    seq2 = P(None, axis_name)

    def body(q, k, v, kv_valid):
        return ring_attention_local(q, k, v, kv_valid, axis_name, scale)

    return smap(
        body,
        mesh=mesh,
        in_specs=(seq4, seq4, seq4, seq2),
        out_specs=seq4,
    )(q, k, v, kv_valid)
