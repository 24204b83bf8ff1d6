"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding paths are exercised
without TPU hardware (mirrors the driver's `dryrun_multichip` validation).
Must set XLA flags before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite compiles hundreds of programs on one
# CPU core; repeat runs (CI, driver re-runs, local iteration) reuse them.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_synference_tests")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def test_grid():
    """Small synthetic SPS grid (the miniature-real-asset pattern the reference
    uses with Synthesizer's official test grid; see reference tests/conftest.py:57-70)."""
    from synference_tpu.grids import make_synthetic_grid

    return make_synthetic_grid(n_ages=32, n_mets=5, n_wav=512, seed=0)


@pytest.fixture(scope="session")
def nircam_filters():
    """Mock instrument: 7 JWST/NIRCam-like wideband tophat filters
    (reference tests/conftest.py:73-87 uses real NIRCam curves)."""
    from synference_tpu.filters import FilterSet, tophat_filter

    centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
    widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
    codes = [
        "JWST/NIRCam.F090W",
        "JWST/NIRCam.F115W",
        "JWST/NIRCam.F150W",
        "JWST/NIRCam.F200W",
        "JWST/NIRCam.F277W",
        "JWST/NIRCam.F356W",
        "JWST/NIRCam.F444W",
    ]
    return FilterSet(
        [tophat_filter(code, c, w) for code, c, w in zip(codes, centers, widths)]
    )
