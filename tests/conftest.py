"""Test harness configuration.

Tests run on CPU with the Pallas interpreter and an 8-device virtual mesh —
the analogue of the reference executing its wasm backend under wasmtime in CI
(check.yml) and of testing multi-host logic on 1xN meshes (SURVEY.md §4).

NOTE: the platform MUST be switched via jax.config after import — setting
JAX_PLATFORMS=cpu in the environment hangs the axon boot hook.
"""

import os

import jax

# Default: CPU interpreter + 8 virtual devices (fast, hardware-free).
# SLICESLICE_TEST_TPU=1 runs the suite against the real chip instead
# (use for the @slow full-conformance sweeps).
if os.environ.get("SLICESLICE_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5EED)


@pytest.fixture(scope="session")
def i386_small():
    """First 48 KiB of the conformance corpus — enough to exercise the tiled
    kernel paths quickly under the interpreter."""
    with open("data/i386.txt", "rb") as f:
        return f.read(48 * 1024)


@pytest.fixture(scope="session")
def words():
    with open("data/words.txt", "rb") as f:
        return [w for w in f.read().split(b"\n") if w]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-corpus conformance sweeps (run on TPU)"
    )
