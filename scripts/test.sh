#!/bin/bash
# Fast test runner: skips axon PJRT registration (CPU-only) for quick startup.
cd "$(dirname "$0")/.."
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ "$@"
