"""Worker process for the REAL multi-process jax.distributed test.

Launched N times by tests/test_multihost.py (one OS process per "host",
1 CPU device each, Gloo collectives over localhost). Each worker:

  * init_distributed(coordinator, N, pid)  — the true multi-process branch,
  * builds the SAME tiny train state + 2-row dummy batch as the parent,
  * contributes its local batch row via host_local_array_to_global_array,
  * runs one DP train step over the global (cross-process) mesh,
  * pid 0 writes {loss, grad_norm, checksum, sample} for the parent to
    compare against its own single-process run of the identical batch.

The shared build recipe lives here so worker and parent can't drift.
"""

import json
import sys

import jax
import numpy as np

TINY_SEED = 0
BATCH_ROWS = 2


def build_state_step_batch():
    """(state, step_fn, batch_numpy) — identical in every process."""
    import jax.numpy as jnp

    from jyutvoice_tpu.config import (
        CFMConfig,
        EstimatorConfig,
        TextEncoderConfig,
        TrainConfig,
        TTSConfig,
    )
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.train.datamodule import (
        DataConfig,
        collate,
        dummy_rows,
        row_to_example,
    )
    from jyutvoice_tpu.train.step import (
        gspmd_safe_tts_cfg,
        init_train_state,
        make_train_step,
    )

    tiny = TTSConfig(
        encoder=TextEncoderConfig(n_layers=2, filter_channels=128),
        cfm=CFMConfig(estimator=EstimatorConfig(n_blocks=1, num_mid_blocks=1)),
    )
    train = TrainConfig(warmup_steps=4)
    params = init_tts(jax.random.PRNGKey(TINY_SEED), tiny)
    state, tx = init_train_state(params, tiny, train)
    step = make_train_step(gspmd_safe_tts_cfg(tiny), train, tx)

    dm_cfg = DataConfig(batch_size=BATCH_ROWS, bucket_text=False)
    rows = dummy_rows(BATCH_ROWS)
    batch = collate([row_to_example(r, dm_cfg) for r in rows], dm_cfg)
    batch = {k: np.asarray(v) for k, v in batch.items()}
    state = jax.tree.map(np.asarray, state)
    del jnp
    return state, step, batch


def summarize(new_state, loss, grad_norm):
    """Scalar fingerprints of the trainable update, process-local readable."""

    def _np(leaf):
        x = jax.numpy.asarray(leaf)
        if hasattr(x, "addressable_data") and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    leaves = jax.tree.leaves(new_state.params["encoder"]) + jax.tree.leaves(
        new_state.params["dp"]
    )
    checksum = float(sum(np.abs(_np(l)).sum() for l in leaves))
    sample = _np(jax.tree.leaves(new_state.params["encoder"])[0]).ravel()[:5]
    return {
        "loss": float(loss),
        "grad_norm": float(grad_norm),
        "checksum": checksum,
        "sample": [float(v) for v in sample],
    }


SP_T = 64  # sequence-parallel test: mel frames (divisible by any n)


def build_sp_inputs():
    """Identical-in-every-process tiny decoder + solve inputs for the
    sequence-parallel cross-process test."""
    from jyutvoice_tpu.config import (
        CFMConfig,
        EstimatorConfig,
        TextEncoderConfig,
        TTSConfig,
    )
    from jyutvoice_tpu.models.tts import init_tts
    from jyutvoice_tpu.weights.noise import rand_noise

    tiny = TTSConfig(
        encoder=TextEncoderConfig(n_layers=2, filter_channels=128),
        cfm=CFMConfig(estimator=EstimatorConfig(n_blocks=1, num_mid_blocks=1)),
    )
    params = init_tts(jax.random.PRNGKey(TINY_SEED), tiny)
    dec = jax.tree.map(np.asarray, params["decoder"])
    rng = np.random.default_rng(7)
    mu = rng.standard_normal((1, SP_T, 80)).astype(np.float32)
    mask = np.ones((1, SP_T, 1), np.float32)
    spks = rng.standard_normal((1, 80)).astype(np.float32)
    cond = np.zeros((1, SP_T, 80), np.float32)
    noise = np.asarray(rand_noise(SP_T))
    return tiny, dec, mu, mask, spks, cond, noise


def sp_summarize(mel: np.ndarray) -> dict:
    return {
        "checksum": float(np.abs(mel).sum()),
        "sample": [float(v) for v in mel.ravel()[:5]],
        "shape": list(mel.shape),
    }


def main_sp(pid: int, n: int, out_path: str) -> None:
    """One sequence-parallel CFM decode over the cross-process mesh:
    activations shard along T across the two Gloo processes, the gspmd
    rewrite (sp_cfm_solve forcing 'xla_scores') is exercised cross-host,
    and the output is re-gathered to replicated for comparison."""
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jyutvoice_tpu.dist.sp import SEQ_AXIS, make_sp_mesh, sp_cfm_solve

    tiny, dec, mu, mask, spks, cond, noise = build_sp_inputs()
    mesh = make_sp_mesh(n)  # global devices: one per process
    assert {d.process_index for d in mesh.devices.flatten()} == set(range(n))

    seq_spec = P(None, SEQ_AXIS, None)
    per = SP_T // n
    sl = slice(pid * per, (pid + 1) * per)
    gmu = multihost_utils.host_local_array_to_global_array(
        mu[:, sl], mesh, seq_spec
    )
    gmask = multihost_utils.host_local_array_to_global_array(
        mask[:, sl], mesh, seq_spec
    )
    gcond = multihost_utils.host_local_array_to_global_array(
        cond[:, sl], mesh, seq_spec
    )
    gdec = multihost_utils.host_local_array_to_global_array(dec, mesh, P())
    gspks = multihost_utils.host_local_array_to_global_array(spks, mesh, P())
    # sp_cfm_solve's in_shardings place the pre-sliced noise along T too
    gnoise = multihost_utils.host_local_array_to_global_array(
        noise[:, sl], mesh, seq_spec
    )

    run = sp_cfm_solve(dec, tiny.cfm, mesh, n_timesteps=2, attention="scores")
    mel = run(gdec, gmu, gmask, gspks, gcond, gnoise)
    # re-gather the T-sharded result to replicated so EVERY process holds
    # the full mel (a cross-process all-gather through GSPMD)
    rep = NamedSharding(mesh, P())
    with mesh:
        full = jax.jit(lambda x: x, out_shardings=rep)(mel)
    jax.block_until_ready(full)
    mel_np = np.asarray(full.addressable_data(0))

    if pid == 0:
        result = sp_summarize(mel_np)
        result["process_count"] = jax.process_count()
        with open(out_path, "w") as f:
            json.dump(result, f)
    multihost_utils.sync_global_devices("multihost_sp_test_done")


def main(pid: int, n: int, port: int, out_path: str, mode: str = "dp") -> None:
    from jyutvoice_tpu.dist.multihost import (
        global_batch_sharding,
        init_distributed,
    )

    assert init_distributed(f"localhost:{port}", n, pid) is True
    assert jax.process_count() == n, jax.process_count()
    assert jax.local_device_count() == 1
    assert jax.device_count() == n, jax.device_count()
    if mode == "sp":
        return main_sp(pid, n, out_path)

    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    state, step, batch = build_state_step_batch()
    assert BATCH_ROWS % n == 0
    per = BATCH_ROWS // n
    local = {k: v[pid * per : (pid + 1) * per] for k, v in batch.items()}

    mesh, bsh = global_batch_sharding()
    gbatch = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data")
    )
    gstate = multihost_utils.host_local_array_to_global_array(state, mesh, P())
    key = multihost_utils.host_local_array_to_global_array(
        np.asarray(jax.random.PRNGKey(1)), mesh, P()
    )

    rep = NamedSharding(mesh, P())
    jit_step = jax.jit(
        step, in_shardings=(rep, rep, bsh), out_shardings=(rep, rep)
    )
    new_state, metrics = jit_step(gstate, key, gbatch)
    jax.block_until_ready(new_state.params)

    if pid == 0:
        result = summarize(new_state, metrics["loss"], metrics["grad_norm"])
        result["process_count"] = jax.process_count()
        with open(out_path, "w") as f:
            json.dump(result, f)
    # all processes must stay alive until everyone is done collecting
    multihost_utils.sync_global_devices("multihost_test_done")


if __name__ == "__main__":
    # must precede any backend use; env vars alone are overridden by the
    # axon plugin (CLAUDE.md) and the parent's 8-device XLA_FLAGS are
    # scrubbed from our env by the launcher. Only in the subprocess — the
    # parent test imports this module with its backend already live.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    main(
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5] if len(sys.argv) > 5 else "dp",
    )
