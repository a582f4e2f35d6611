"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip hardware is unavailable in CI; sharding tests run against
XLA's host-platform device partitioning instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment prepends the experimental 'axon' TPU platform to
# JAX_PLATFORMS, so the env var alone cannot force CPU — use the config.
if os.environ.get("MULUT_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"
REF_MODELS = os.path.join(REFERENCE, "models", "sr_x2sdy")
REF_SET5 = os.path.join(REFERENCE, "data", "SRBenchmark", "Set5")
REF_GOLDEN = os.path.join(REFERENCE, "results", "sr_x2sdy", "Set5", "X4")


def require_reference():
    if not os.path.isdir(REF_MODELS):
        pytest.skip("reference artifacts not available")


@pytest.fixture(scope="session")
def reference_luts():
    require_reference()
    from mulut_tpu.utils import load_luts

    return load_luts(REF_MODELS, stages=2, modes="sdy", scale=4, interval=4)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
