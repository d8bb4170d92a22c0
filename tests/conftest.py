"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: multi-host tests via
``xla_force_host_platform_device_count``).  Must run before jax is imported.
"""

import os

# The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (one
# real TPU via a tunnel), so a setdefault is not enough — force both the
# env var and the live config.  Set CRT_TEST_TPU=1 to run the suite on the
# real chip instead.
if not os.environ.get("CRT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
