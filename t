#!/bin/sh
# Fast test runner: strip the axon PJRT hook (slow CPU-platform jax init)
# and run pytest on host CPU with an 8-device virtual mesh.
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "$@"
