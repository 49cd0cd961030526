#!/usr/bin/env bash
# Run the test suite on a CPU backend (8 virtual devices for sharding tests).
# PALLAS_AXON_POOL_IPS is cleared so the axon TPU-relay plugin is not
# registered (it slows interpreter startup and wedges under concurrency).
set -euo pipefail
cd "$(dirname "$0")/.."
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -q "$@"
