"""Force tests onto a virtual 8-device CPU mesh (the standard way to test
mesh-sharded JAX without TPU hardware); also keeps unit tests off the
tunneled TPU whose per-dispatch latency (~34ms) dominates small ops.

This machine's sitecustomize imports jax and registers the axon TPU plugin
at interpreter startup, so setting JAX_PLATFORMS in the environment here is
too late — jax.config must be updated directly (still before any backend is
used)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

assert all(d.platform == "cpu" for d in jax.devices()), (
    "tests must run on the virtual CPU mesh, got: " + str(jax.devices())
)
assert jax.device_count() >= 8, (
    "expected 8 virtual CPU devices, got " + str(jax.device_count())
)
