"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's "test RF without radios" strategy (SURVEY.md §4):
loopback + frozen fixtures on CPU, with multi-chip sharding logic validated
via ``--xla_force_host_platform_device_count`` instead of real hardware.

Note: this image's sitecustomize force-registers the axon TPU plugin and
ignores ``JAX_PLATFORMS`` from the environment, so the CPU pin must happen
through ``jax.config`` after import.
"""

import os
import pathlib
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR
