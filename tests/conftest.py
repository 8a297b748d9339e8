"""Force tests onto a virtual 8-device CPU mesh (the standard way to test
mesh-sharded JAX without TPU hardware); also keeps unit tests off the
tunneled TPU whose dispatch latency dominates small ops."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
