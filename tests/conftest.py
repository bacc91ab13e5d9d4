"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so that sharding paths compile
and execute without TPU hardware (SURVEY.md §4's multi-host test strategy),
and with x64 enabled so the "exact" float64 pipelines are available.
"""

import os

# The session environment pre-sets JAX_PLATFORMS to the TPU tunnel ("axon")
# and its sitecustomize imports jax at interpreter start, so env vars set
# here are too late — use the config API instead, which still wins as long
# as no backend has been initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
GOLDEN_INPUT = os.path.join(REFERENCE_ROOT, "Output-Input/input/input.txt")
GOLDEN_COMPRESSED = os.path.join(REFERENCE_ROOT, "Output-Input/out/compressed.bin")
GOLDEN_UNCOMPRESSED = os.path.join(REFERENCE_ROOT, "Output-Input/out/uncompressed.txt")
METAMORPHOSIS = os.path.join(REFERENCE_ROOT, "Output-Input/input/Metamorphosis.txt")


@pytest.fixture(scope="session")
def golden_input() -> bytes:
    with open(GOLDEN_INPUT, "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def golden_compressed() -> bytes:
    with open(GOLDEN_COMPRESSED, "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def metamorphosis() -> bytes:
    with open(METAMORPHOSIS, "rb") as f:
        return f.read()


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
