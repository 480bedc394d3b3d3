import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; bench.py runs on the real chip.
#
# The environment's sitecustomize imports jax (and registers the axon TPU
# plugin) before pytest loads this file, so setting env vars here is too
# late — flip the jax config directly instead (backends initialize lazily,
# so this still takes effect).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
