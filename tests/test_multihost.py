"""dist/multihost.py: env-var parsing and the single-process no-op branch
(the multi-process branch needs real multi-host hardware; here we assert the
decision logic and that initialize() is invoked with the parsed values)."""

import jax
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
