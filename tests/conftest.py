"""Test environment: force CPU JAX with 8 virtual devices.

Tests never require TPU hardware — Pallas kernels run in interpret mode on
CPU (selected automatically by messyerraytracer_tpu.kernels), and sharding
tests use an 8-device virtual CPU mesh (SURVEY.md §4 test plan).

On tunneled-TPU hosts a sitecustomize may have already imported jax and
registered/initialized a TPU backend before this conftest runs, so setting
environment variables is not enough: we must override via jax.config (which
resets the backend selection).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap process memory growth over the ~200-test suite: XLA:CPU
    compile artifacts accumulate per module and have produced a
    segfault in late large-kernel compiles (tall-tile cluster tests).
    Shapes rarely cross module boundaries, so per-module clearing
    costs little recompilation."""
    yield
    import jax

    jax.clear_caches()
