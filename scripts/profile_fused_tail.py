"""Isolate the fused-path tail: why did profile_realistic.py measure
`photometry()` at ~2x the cost of its manually-staged core+knot-matmul
prefix?  Stages here add the remaining `_photometry_fused` pieces one at a
time (den interp, d19 lookup, final scale) plus the exact `simulate` wrapper,
so the jump is attributable to one component (or revealed as a
measurement/fusion artifact).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os, time  # noqa: E401
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import synference_tpu as st  # noqa: E402
from synference_tpu.ops.photometry_kernel import (  # noqa: E402
    interp_photometry_den, interp_photometry_num)

B = 16384
grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                              lam_min=150.0)
centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(igm="inoue14"))
print("engine:", sim._pallas_variant, "support", sim._lam_support,
      "K", sim._n_knots, flush=True)
rng = np.random.default_rng(0)
theta = jnp.asarray(np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 8, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 2, B)], 1), jnp.float32)


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.1f} ms  {B/dt/1e6:6.2f} M/s", flush=True)
    return out


def stage(th, upto):
    res = jax.vmap(lambda r: sim._core(r, False, fused=True))(th)
    lnu, z = res["_lnu"], res["_z"]
    s = jnp.log10(1.0 + jnp.maximum(z, 0.0)) / sim._filter_dlog
    fw = lnu * sim._wlam_sup
    num = interp_photometry_num(
        fw, sim._pallas_table[1], sim._n_knots, s, delta=sim._knot_delta,
        matmul_dtype=sim._knot_matmul_dtype,
        order=sim._interp_order)[:, : len(sim.filters)]
    if upto == "num":
        return num
    den = interp_photometry_den(
        sim._den_table, sim._n_knots, s, delta=sim._knot_delta,
        order=sim._interp_order)
    if upto == "den":
        return num / jnp.maximum(den, 1.0e-30)
    zp1 = 1.0 + z
    d19 = sim._d19_of_z(z)
    inv_d = 1.0 / d19
    scale = zp1 * (1.0e-6 / 12.566370614359172) * inv_d * inv_d
    return (num / jnp.maximum(den, 1.0e-30)) * scale[:, None]


timeit("core+num (repro)", jax.jit(lambda th: stage(th, "num")), theta)
timeit("+den", jax.jit(lambda th: stage(th, "den")), theta)
timeit("+d19+scale (= fused)", jax.jit(lambda th: stage(th, "all")), theta)
timeit("_photometry_fused direct",
       jax.jit(lambda th: sim._photometry_fused(
           *(lambda r: (r["_lnu"], r["_z"]))(
               jax.vmap(lambda x: sim._core(x, False, fused=True))(th)))),
       theta)
timeit("simulate (photometry())", jax.jit(sim.photometry), theta)
