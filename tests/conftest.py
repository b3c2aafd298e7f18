"""Test harness config: run JAX on CPU with an 8-device virtual mesh.

Kernels are integer-exact, so CPU results must equal TPU results; sharding
tests use the 8 virtual host devices (SURVEY.md §4.7 distributed testing).
"""

import os
import sys

# The session env pins JAX_PLATFORMS=axon (the tunneled TPU) and a
# sitecustomize hook registers the axon PJRT plugin in every interpreter,
# which stalls CPU-platform JAX init for minutes. Tests must run on host
# CPU (integer kernels give identical results), so if the axon hook is
# active, re-exec pytest in a cleaned environment before jax is imported.
# (Prefer running tests via ./t at the repo root, which strips the axon
# env up front — jax CPU init takes ~3 min when the axon plugin hook is
# active, ~5 s without it. Under the plain driver command this conftest
# still forces the CPU platform; it is just slower to initialize.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"
REFERENCE_BIN = pathlib.Path("/root/reference/bin")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


@pytest.fixture(scope="session")
def foreman_qcif():
    """Path to the 4:2:0 QCIF test clip shipped with the reference."""
    p = REFERENCE_BIN / "foreman_part_qcif.yuv"
    if not p.exists():
        pytest.skip("reference test clip unavailable")
    return p
