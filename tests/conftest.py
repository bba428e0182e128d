"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Mirrors the reference's single-host multi-process DDP testing surface
(SURVEY.md §4): multi-chip sharding is validated on virtual CPU devices via
``--xla_force_host_platform_device_count``.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The session's sitecustomize pre-imports jax and registers the 'axon' TPU
# tunnel backend, overriding JAX_PLATFORMS — force the platform back to
# local CPU devices via config (env vars alone are read too early).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# Fast/slow lanes: the default run skips @pytest.mark.slow tests (heavy
# e2e CLI / mesh-parity / train-to-accuracy proofs, ~22 min of the ~32 min
# full suite on this 1-core host) so the edit-test loop stays under 10 min.
# `pytest --runslow` runs everything; the verify workflow and pre-snapshot
# checks use the full lane.


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run @pytest.mark.slow tests (full ~32 min lane)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow lane: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
