"""Test config: run all tests on a virtual 8-device CPU mesh (no TPU needed).

Must set the env vars before jax initializes its backends.
"""

import os
import sys

# The session environment pre-sets JAX_PLATFORMS=axon (remote TPU) and its
# sitecustomize imports jax before conftest runs, so env vars are captured too early —
# jax.config.update is the only reliable way to force the CPU backend for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
