"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

All tests run on CPU so CI needs no TPU; multi-chip sharding tests use the
virtual device mesh (see SURVEY.md §2.8 / the driver's dryrun_multichip).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone can be overridden by platform plugins (e.g. the axon TPU
# tunnel); the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
