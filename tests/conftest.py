import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; bench.py runs on the real chip.
#
# NOTE: scripts/test.sh additionally clears PALLAS_AXON_POOL_IPS before
# python starts, skipping the (slow) axon PJRT registration entirely.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
