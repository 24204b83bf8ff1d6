"""Regression tests for the driver entry points (__graft_entry__.py).

The round-1 multi-chip gate failed because ``dryrun_multichip`` never forced
the CPU backend, so the axon TPU plugin initialized (and crashed) before the
virtual mesh could be provisioned. These tests run the entry points in FRESH
subprocesses *without* conftest's platform forcing, exactly as the driver
does, so a regression reproduces the driver's environment rather than the
test suite's.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Driver-like environment: no JAX_PLATFORMS / XLA_FLAGS forcing."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    # Keep subprocess compiles off any shared cache contention.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_graft_test")
    return env


@pytest.mark.slow
def test_dryrun_multichip_subprocess_no_forcing():
    """dryrun_multichip(8) must self-provision a CPU mesh with NO outside help
    (MULTICHIP_r01.json recorded ok=false because it didn't)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    ) % REPO
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "DRYRUN_OK" in proc.stdout


@pytest.mark.slow
def test_entry_compiles_subprocess():
    """entry() must return a jittable (fn, args) pair that compiles."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        # entry() itself must not require a TPU: force CPU like the mesh test
        # suite does, then compile-check.
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "assert bool(jax.numpy.isfinite(out).all())\n"
        "print('ENTRY_OK')\n"
    ) % REPO
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"entry() compile failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "ENTRY_OK" in proc.stdout
