"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (the ``shard_map`` programs
compile identically).  Set ``QUADRS_TEST_TPU=1`` to run the suite
against the real attached accelerator instead.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not os.environ.get("QUADRS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_EXAMPLES = pathlib.Path("/root/reference/examples")


@pytest.fixture
def ook_capture() -> pathlib.Path:
    path = REFERENCE_EXAMPLES / "cupboard-superdec.sr400.cf32"
    if not path.exists():
        pytest.skip("reference OOK example capture not available")
    return path


@pytest.fixture
def fsk_capture() -> pathlib.Path:
    path = REFERENCE_EXAMPLES / "fsk-example.sr21M.fc32"
    if not path.exists():
        pytest.skip("reference FSK example capture not available")
    return path
