"""Sequence-parallel (context-parallel) CFM decoding for long-form synthesis.

The reference bounds one decode at 15000 mel frames = 300 s
(flow_matching.py:353-354) and scales past memory only by chunked streaming.
On TPU the real long-form wall is the estimator's quadratic attention
working set — (2B, H, T, T) scores across 56 transformer blocks — and that
shards cleanly over the *sequence* axis of a device mesh:

  * activations (B, T, C) are annotated P(None, "seq", None): GSPMD
    partitions every matmul/causal-conv along T (halo exchanges for the
    k<=3 convs ride ICI) and all-gathers only the small (T, H*D) K/V
    blocks for attention;
  * scores stay sharded on the query axis — per-chip attention memory and
    FLOPs drop n_seq-fold, so utterances whose score tensors cannot fit on
    one chip decode in a single pass on a pod slice;
  * the Euler scan, CFG batch doubling, and mask arithmetic are untouched:
    this is a sharding annotation, not a new code path.

Composes with tensor parallel on a ("model", "seq") 2-D mesh: estimator
weights shard Megatron-style over "model" (dist/tp.py) while activations
shard over "seq" — XLA emits the attention/FFN all-reduces per sequence
shard. The reference has no analog (SURVEY.md §2.8: no SP/CP anywhere);
this is the TPU-native sequence-scaling story next to the faithful
chunked-streaming port (pipeline/streaming.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_sp_mesh(
    n_seq: Optional[int] = None, n_model: int = 1
) -> Mesh:
    """1-D ("seq",) mesh, or ("model", "seq") when n_model > 1."""
    devices = np.asarray(jax.devices())
    if n_seq is None:
        n_seq = devices.size // n_model
    if n_seq < 1 or n_model < 1:
        raise ValueError(
            f"mesh sizes must be >= 1, got n_seq={n_seq} n_model={n_model}"
        )
    if n_model * n_seq > devices.size:
        raise ValueError(
            f"mesh needs {n_model * n_seq} devices, only {devices.size} "
            f"visible"
        )
    devices = devices[: n_model * n_seq]
    if n_model > 1:
        return Mesh(devices.reshape(n_model, n_seq), (MODEL_AXIS, SEQ_AXIS))
    return Mesh(devices.reshape(n_seq), (SEQ_AXIS,))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, C) activations sharded along T."""
    return NamedSharding(mesh, P(None, SEQ_AXIS, None))


def sp_param_shardings(params: dict, mesh: Mesh):
    """Estimator param shardings for the mesh: TP-sharded over "model" when
    the mesh has that axis (dist/tp.py specs), replicated otherwise."""
    if MODEL_AXIS in mesh.axis_names:
        from jyutvoice_tpu.dist.tp import estimator_partition_specs

        specs = estimator_partition_specs(params, MODEL_AXIS)
        return jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            specs,
            is_leaf=lambda s: isinstance(s, P),
        )
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)


def sp_cfm_solve(
    params,
    cfm_cfg,
    mesh: Mesh,
    *,
    n_timesteps: int,
    streaming: bool = False,
    attention: str = "scores",
):
    """Build a jitted sequence-parallel `cfm_forward` for `mesh`.

    Returns fn(params_sharded, mu, mask, spks, cond, noise) -> mel with
    mu/mask/cond (and the result) sharded along T; `params` is the decoder
    (estimator) subtree and `noise` the seed-0 buffer pre-sliced to
    (1, T, 80) (weights/noise.py). T must be a multiple of the mesh's
    "seq" size (bucket tables already guarantee power-of-two frame counts).
    Place the params once with
    `jax.device_put(params, sp_param_shardings(params, mesh))` and reuse.

    attention="scores" (default): GSPMD shards the dense score path on the
    query axis — per-chip score memory (2B, H, T/n, T), K/V all-gathered.
    attention="ring": shard_map ring attention (dist/ring.py) — K/V blocks
    rotate over ICI with ppermute, per-chip score tile (2B, H, T/n, T/n),
    enabling ~n-fold longer one-pass decodes before the memory wall.
    Requires a 1-D ("seq",) mesh (ring inside a TP-sharded estimator would
    need the qkv projections to run under the same shard_map; not built).
    attention="banded": the linear chunk-band (nn/attention.py::
    banded_sdpa, geometry from cfm_cfg.estimator.banded_*) — per-chip
    work AND memory (2B, H, T/n, w): linear in T and sharded; slab
    slices crossing shard boundaries become GSPMD halo exchanges.
    Approximate (~2% mel divergence vs full attention, docs/design.md
    round 4); full attention only.
    """
    import dataclasses

    from jyutvoice_tpu.models.cfm import solve_euler_cfg, cosine_t_span

    if attention == "ring":
        if MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1:
            raise ValueError("ring attention composes with 1-D seq meshes "
                             "only (no model axis)")
        if streaming:
            # the estimator's chunk-mask path asserts its way out of the
            # ring backend deep in the trace (and an assert vanishes under
            # python -O) — enforce the contract here with a real error
            raise ValueError(
                "attention='ring' does not support streaming chunk masks; "
                "use attention='scores' for the chunk-masked solve"
            )
        backend = "ring"
    elif attention == "banded":
        # linear chunk-band (nn/attention.py::banded_sdpa): dense XLA
        # einsums with no custom call, so GSPMD shards the chunk axis
        # directly — the slab slices crossing shard boundaries become
        # halo collective-permutes over ICI. Per-chip work is T/n * w
        # (vs T/n * T for "scores"): the linear long-form path, sharded.
        if streaming:
            raise ValueError(
                "attention='banded' supports full attention only; use "
                "attention='scores' for the chunk-masked solve"
            )
        backend = "banded"
    elif attention == "scores":
        backend = "xla_scores"
    else:
        raise ValueError(
            f"unknown attention={attention!r}: expected 'scores', 'ring' "
            "or 'banded'"
        )
    # "scores": unconditionally force the score-materializing path — no
    # pallas custom call may land inside this GSPMD-sharded graph (the
    # stock-flash gate would fire on the GLOBAL trace shape and XLA would
    # gather the full sequence onto every chip, defeating SP; same hazard
    # class as dist/gspmd.py)
    cfm_cfg = dataclasses.replace(
        cfm_cfg,
        estimator=dataclasses.replace(
            cfm_cfg.estimator, attention_backend=backend
        ),
    )
    n_seq = mesh.shape[SEQ_AXIS]
    seq = seq_sharding(mesh)
    rep = NamedSharding(mesh, P())
    p_shard = sp_param_shardings(params, mesh)

    def fn(params, mu, mask, spks, cond, noise):
        # noise comes pre-sliced to (1, T, 80): slicing a T-sharded buffer
        # inside the jit would force a resharding gather
        z = jax.numpy.broadcast_to(noise.astype(mu.dtype), mu.shape)
        t_span = cosine_t_span(n_timesteps).astype(mu.dtype)
        return solve_euler_cfg(
            params, cfm_cfg, z, t_span, mu, mask, spks, cond, streaming
        )

    jitted = jax.jit(
        fn,
        in_shardings=(p_shard, seq, seq, rep, seq, seq),
        out_shardings=seq,
    )

    def run(params_sharded, mu, mask, spks, cond, noise):
        if mu.shape[1] % n_seq:
            raise ValueError(
                f"T={mu.shape[1]} not divisible by seq mesh size {n_seq}"
            )
        if backend == "ring":
            # jax.jit traces lazily on FIRST CALL, and the estimator's
            # ring branch reads the process-global ring context at trace
            # time — re-bind OUR mesh here so building several ring
            # solvers before calling them cannot cross-wire meshes
            from jyutvoice_tpu.dist.ring import set_ring_context

            set_ring_context(mesh, SEQ_AXIS)
        with mesh:
            return jitted(params_sharded, mu, mask, spks, cond, noise)

    return run
