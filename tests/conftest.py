"""Force tests onto a virtual 8-device CPU mesh (the standard way to test
mesh-sharded JAX without TPU hardware); also keeps unit tests off the
tunneled TPU whose per-dispatch latency (~34ms) dominates small ops.

This environment presets JAX_PLATFORMS=axon and a sitecustomize that
registers the axon PJRT plugin whenever PALLAS_AXON_POOL_IPS is set, so both
must be overridden (not setdefault'd) before jax is imported.
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
