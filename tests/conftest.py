"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's forced host-platform device count (SURVEY.md §4 test
strategy).  The environment may pre-register an external TPU PJRT plugin and
force ``jax_platforms`` programmatically, so we both set the env vars *and*
override the config after import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Remote-compile relays intercept even CPU lowering when enabled; disable.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} ({jax.default_backend()})"


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite accumulates hundreds of distinct jitted programs (many
    track_step variants x 8 virtual devices); on small hosts the native
    resources behind them (mappings/threads) eventually segfault the
    process mid-compile (observed deterministically at ~140 tests in
    round 5, with every module green in isolation).  Per-module recompiles
    cost some wall time and buy a bounded footprint.
    """
    yield
    import jax

    jax.clear_caches()
