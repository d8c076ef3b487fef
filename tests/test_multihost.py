"""dist/multihost.py: env-var parsing, the single-process no-op branch, and
a REAL 2-process jax.distributed run (two OS processes, 1 CPU device each,
Gloo collectives over localhost) compared against a single-process step."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from jyutvoice_tpu.dist.multihost import global_batch_sharding, init_distributed


def test_single_process_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.append(kw)
    )
    assert init_distributed() is False
    assert called == []


def test_explicit_num_processes_1_is_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: (_ for _ in ()).throw(AssertionError("should not init")),
    )
    assert init_distributed(num_processes=1) is False


def test_env_vars_trigger_initialize(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.append(kw)
    )
    # the post-init logging reads process_index/count; patch to fixed values
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "local_device_count", lambda: 1)
    monkeypatch.setattr(jax, "device_count", lambda: 4)
    assert init_distributed() is True
    assert called == [
        {
            "coordinator_address": "10.0.0.1:8476",
            "num_processes": 4,
            "process_id": 2,
        }
    ]


def test_tpu_worker_hostnames_triggers(monkeypatch):
    """On Cloud TPU pods args stay None and auto-detection kicks in."""
    for var in ("JAX_COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.append(kw)
    )
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    monkeypatch.setattr(jax, "device_count", lambda: 8)
    assert init_distributed() is True
    assert called[0]["coordinator_address"] is None  # auto-detected


def test_global_batch_sharding_single_device():
    mesh, sharding = global_batch_sharding()
    assert mesh.devices.size >= 1
    assert sharding is not None


def _launch_workers(tmp_path, mode: str, timeout: int = 900):
    """Spawn the 2 Gloo worker processes in `mode`, return parsed result."""
    out = tmp_path / f"mh_{mode}.json"
    port = 13000 + (os.getpid() + (0 if mode == "dp" else 777)) % 10000
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    script = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port), str(out), mode],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return json.loads(out.read_text())


@pytest.mark.slow
def test_two_process_sp_decode_matches_single(tmp_path):
    """Sequence-parallel decode across 2 OS processes (1 CPU device each,
    Gloo): activations shard along T over the cross-process mesh,
    sp_cfm_solve's gspmd rewrite (forced 'xla_scores') runs cross-host,
    and the re-gathered mel must match this process's single-device solve
    of the identical inputs (VERDICT round-4 item 8)."""
    import dataclasses

    import _multihost_worker as worker

    result = _launch_workers(tmp_path, "sp")
    assert result["process_count"] == 2
    assert result["shape"] == [1, worker.SP_T, 80]

    # single-process baseline: same tiny decoder/inputs, same forced
    # score-materializing backend sp_cfm_solve uses
    from jyutvoice_tpu.models.cfm import cfm_forward

    tiny, dec, mu, mask, spks, cond, noise = worker.build_sp_inputs()
    cc = dataclasses.replace(
        tiny.cfm,
        estimator=dataclasses.replace(
            tiny.cfm.estimator, attention_backend="xla_scores"
        ),
    )
    mel = np.asarray(
        jax.jit(
            lambda d, mu_, mask_, spks_, cond_, z: cfm_forward(
                d, cc, mu_, mask_, spks_, cond_, n_timesteps=2, rand_noise=z
            )
        )(dec, mu, mask, spks, cond, noise)
    )
    base = worker.sp_summarize(mel)
    np.testing.assert_allclose(
        result["checksum"], base["checksum"], rtol=1e-4
    )
    np.testing.assert_allclose(
        result["sample"], base["sample"], atol=1e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_two_process_dp_step_matches_single(tmp_path):
    """True multi-host: two OS processes (1 device each) run one DP train
    step over a cross-process mesh; loss/grad-norm/updated-param
    fingerprints must match this process's single-device run of the same
    global batch (XLA all-reduces ride Gloo instead of ICI here)."""
    import _multihost_worker as worker

    result = _launch_workers(tmp_path, "dp")
    assert result["process_count"] == 2

    # single-process baseline on the identical state/batch
    state, step, batch = worker.build_state_step_batch()
    new_state, metrics = jax.jit(step)(
        state, jax.random.PRNGKey(1), batch
    )
    base = worker.summarize(new_state, metrics["loss"], metrics["grad_norm"])

    assert np.isfinite(result["loss"])
    np.testing.assert_allclose(result["loss"], base["loss"], rtol=1e-4)
    np.testing.assert_allclose(
        result["grad_norm"], base["grad_norm"], rtol=1e-4
    )
    np.testing.assert_allclose(
        result["checksum"], base["checksum"], rtol=1e-4
    )
    np.testing.assert_allclose(
        result["sample"], base["sample"], atol=1e-5, rtol=1e-4
    )
