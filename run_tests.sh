#!/bin/sh
# CPU test runner: bypasses the container's TPU-claiming sitecustomize
# (PALLAS_AXON_POOL_IPS= skips axon.register) and forces an 8-virtual-device
# CPU backend for sharding tests.
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -x -q "$@"
