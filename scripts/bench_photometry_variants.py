"""Compare photometry variants on TPU: roll/bank vs interp at several deltas."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import synference_tpu as st

B = 65536
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])
kw = dict(grid=grid, filters=filters,
          param_names=("log10_mass", "redshift", "peak_age", "tau",
                       "log10_metallicity", "tau_v"),
          sfh="lognormal", zdist="delta",
          emission=st.EmissionConfig(igm="inoue14"))
rng = np.random.default_rng(0)
theta = jnp.asarray(np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B)], 1), jnp.float32)

ref = None
for label, extra in [("bank", dict(photometry_variant="bank")),
                     ("interp d8", dict(photometry_variant="interp", photometry_knot_delta=8)),
                     ("interp d4", dict(photometry_variant="interp", photometry_knot_delta=4)),
                     ("interp d2", dict(photometry_variant="interp", photometry_knot_delta=2))]:
    sim = st.BatchSEDSimulator(**kw, **extra)
    fn = jax.jit(sim.photometry)
    p = fn(theta); jax.block_until_ready(p)
    t0 = time.time()
    for _ in range(6):
        p = fn(theta)
    jax.block_until_ready(p)
    dt = (time.time() - t0) / 6
    p = np.asarray(p)
    if ref is None:
        ref = p
        msg = ""
    else:
        scale = np.abs(ref).max(axis=1, keepdims=True)
        sig = np.abs(ref) > 0.01 * scale
        rel = np.abs(p - ref) / np.maximum(np.abs(ref), 1e-3 * scale)
        msg = f" relerr med {np.median(rel[sig]):.2e} 99p {np.quantile(rel[sig],0.99):.2e}"
    print(f"{label:10s} {dt*1e3:7.1f} ms  {B/dt/1e6:5.2f} M/s{msg}", flush=True)
