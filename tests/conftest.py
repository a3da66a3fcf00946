"""Test harness configuration.

By default tests run on the CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without a TPU pod (SURVEY.md §4.5),
and with x64 enabled so the reference's float64 epsilon ladder is
meaningful.

Set GJKEPA_TPU_TESTS=1 to instead run on the real TPU: the CPU forcing is
skipped, tests marked with the `tpu` marker (compiled-Mosaic kernel checks,
tests/test_fused_tpu.py) become active, and x64 stays OFF (TPU f64 is
emulated).  CPU-only differential suites still pass — they just run their
XLA programs on the TPU backend.
"""

import os

_TPU_MODE = os.environ.get("GJKEPA_TPU_TESTS", "") not in ("", "0")

if not _TPU_MODE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _TPU_MODE:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gjkepa_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
else:
    # The axon sitecustomize force-registers the TPU backend regardless of
    # JAX_PLATFORMS; override programmatically so tests are hermetic on the
    # 8-virtual-device CPU backend.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # NO persistent compile cache on the CPU tier: this jaxlib's XLA:CPU
    # executable (de)serialization segfaults non-deterministically on the
    # larger programs (observed in both compilation_cache.get_... line 238
    # — deserialize — and put_... line 265 — executable.serialize() —
    # during full-suite runs).  Correctness over warm-start speed; the TPU
    # tier keeps its cache (different, stable serialization path).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_hull(rng, n=16, center=(0, 0, 0), scale=1.0):
    """Random convex position cloud: points on a sphere scaled/offset.

    Every vertex is extreme (on the sphere), so the cloud is its own hull.
    """
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v *= scale * (0.5 + 0.5 * rng.random((n, 1)))
    return v + np.asarray(center, dtype=np.float64)


def cube(center=(0, 0, 0), half=0.5):
    c = np.asarray(center, dtype=np.float64)
    corners = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)]
    )
    return c + corners


def pytest_configure(config):
    # The TPU tier must stay single-process: xdist workers (the -n 4
    # default in pyproject, a workaround for this environment's flaky
    # XLA:CPU compiler in long single processes) would share the ONE
    # tunneled TPU chip and hang/corrupt each other.  xdist registers
    # before conftest hooks can zero numprocesses, so fail fast with the
    # right invocation instead of hanging.
    if _TPU_MODE and os.environ.get("PYTEST_XDIST_WORKER"):
        raise pytest.UsageError(
            "GJKEPA_TPU_TESTS=1 must run single-process: add '-n 0' "
            "(one tunneled TPU chip; xdist workers would contend)")
