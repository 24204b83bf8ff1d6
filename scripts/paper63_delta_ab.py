"""TPU A/B: paper-scale 63-filter conv engine vs knot spacing δ.

The conv engine's knot matmuls are the FLOP bottleneck at paper scale
(K ≈ max_shift/δ knots × 64 padded bands × 10⁴ λ). Cubic shift
interpolation (order=3) should hold accuracy at 2δ — this measures
SEDs/s + error vs the δ/2 reference across the prior box.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import synference_tpu as st
from synference_tpu.instruments import load_instrument_filters


def run(delta_mult, batch=16384, iters=4):
    grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10000,
                                  lam_min=150.0)
    filters = load_instrument_filters()
    dlog = float(np.diff(np.log10(np.asarray(grid.lam))).mean())
    delta = max(1, round(0.009 * delta_mult / dlog))
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"),
        photometry_variant="conv", photometry_knot_delta=delta)
    print(f"  delta={delta} cols ({0.009 * delta_mult:.4f} dex), "
          f"n_knots={sim._n_knots}", flush=True)
    rng = np.random.default_rng(0)
    theta = jnp.asarray(np.stack([
        rng.uniform(7.5, 11, batch), rng.uniform(0.05, 10, batch),
        rng.uniform(5e7, 1e9, batch), rng.uniform(0.1, 1.2, batch),
        rng.uniform(-3.9, -1.5, batch), rng.uniform(0, 3, batch)], axis=1),
        jnp.float32)
    fn = jax.jit(sim.photometry)
    p0 = fn(theta)
    p0.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        p = fn(theta)
    p.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"  {batch / dt / 1e3:.1f}k SEDs/s  ({dt * 1e3:.2f} ms/batch)",
          flush=True)
    return np.asarray(p0)


print("== paper63 conv, 64x12x10000, batch 16384 ==", flush=True)
ref = None
for mult in (0.5, 1.0, 2.0, 3.0):
    print(f" delta_mult={mult}:", flush=True)
    p = run(mult)
    if ref is None:
        ref = p
    else:
        # floor the denominator at 1e-4 x the row's brightest band:
        # IGM-dark bands carry ~zero flux and zero information -- a
        # relative error on them is meaningless (and they dominate raw
        # max/p99 at high z)
        floor = 1e-4 * np.abs(ref).max(axis=1, keepdims=True)
        rel = np.abs(p - ref) / np.maximum(np.abs(ref), floor)
        print(f"  floored err vs mult=0.5: max {rel.max():.3e} "
              f"median {np.median(rel):.3e} "
              f"p99 {np.quantile(rel, 0.99):.3e}", flush=True)
        bright = np.abs(ref) > 0.01 * np.abs(ref).max(axis=1, keepdims=True)
        rb = (np.abs(p - ref) / np.abs(ref))[bright]
        print(f"  bright-band (>1% row max) err: max {rb.max():.3e} "
              f"median {np.median(rb):.3e} "
              f"p99 {np.quantile(rb, 0.99):.3e}", flush=True)
