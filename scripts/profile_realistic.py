"""Stage-by-stage timing of the REALISTIC-size (64x12x10^4 lambda) fused
generation path on the TPU — where does the gap to the roofline
(scripts/roofline.py: ~13.6M SEDs/s speed-of-light vs ~1.6M measured) go?

Stages are cumulative prefixes of the fused interp path
(`BatchSEDSimulator.simulate` -> `_core(fused=True)` ->
`_photometry_fused`), so stage N - stage N-1 isolates one component.
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
print("engine:", sim._pallas_variant,
      "mega" if sim._mega_supported() else "staged",
      "support", sim._lam_support, flush=True)
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


def core_lnu(row):
    res = sim._core(row, False, fused=True)
    return res


@jax.jit
def f_sfzh(th):
    return jax.vmap(lambda r: sim._sfzh(sim.theta_dict(r))[0])(th)


@jax.jit
def f_contract(th):
    w = jax.vmap(lambda r: sim._sfzh(sim.theta_dict(r))[0])(th)
    spec = sim._components["incident"]
    if sim._lam_support is not None:
        spec = spec[:, sim._lam_support[0]:sim._lam_support[1]]
    return w.astype(sim.compute_dtype) @ spec


@jax.jit
def f_core(th):
    """Everything up to rest-frame L_nu (sfzh + contraction + dust mix)."""
    res = jax.vmap(lambda r: sim._core(r, False, fused=True))(th)
    return res["_lnu"]


@jax.jit
def f_core_num(th):
    """Core + the knot matmul numerator (no den/distance)."""
    from synference_tpu.ops.photometry_kernel import interp_photometry_num
    res = jax.vmap(lambda r: sim._core(r, False, fused=True))(th)
    lnu, z = res["_lnu"], res["_z"]
    s = jnp.log10(1.0 + jnp.maximum(z, 0.0)) / sim._filter_dlog
    fw = lnu * sim._wlam_sup
    return interp_photometry_num(
        fw, sim._pallas_table[1], sim._n_knots, s, delta=sim._knot_delta,
        matmul_dtype=sim._knot_matmul_dtype, order=sim._interp_order)


@jax.jit
def f_full(th):
    return sim.photometry(th)


timeit("sfzh", f_sfzh, theta)
timeit("sfzh+contract", f_contract, theta)
timeit("core (lnu: +dust mix)", f_core, theta)
timeit("core+knot matmul", f_core_num, theta)
timeit("full fused photometry", f_full, theta)
