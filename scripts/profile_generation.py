"""Stage-by-stage timing of the generation hot path on the TPU."""
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
centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(igm="inoue14"))
rng = np.random.default_rng(0)
theta = jnp.asarray(np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B)], 1), jnp.float32)


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:24s} {dt*1e3:8.1f} ms  {B/dt/1e6:6.2f} M/s", flush=True)
    return out


@jax.jit
def f_sfzh(th):
    return jax.vmap(lambda r: sim._sfzh(sim.theta_dict(r))[0])(th)

@jax.jit
def f_contract(th):
    w = jax.vmap(lambda r: sim._sfzh(sim.theta_dict(r))[0])(th)
    return w.astype(sim.compute_dtype) @ sim._components["incident"]

@jax.jit
def f_emission(th):
    def one(r):
        p = sim.theta_dict(r)
        s, _ = sim._sfzh(p)
        return sim._apply_emission(p, s)[0]
    return jax.vmap(one)(th)

@jax.jit
def f_observe(th):
    def one(r):
        p = sim.theta_dict(r)
        s, _ = sim._sfzh(p)
        lnu, _ = sim._apply_emission(p, s)
        return sim._observe(p, lnu)[0]
    return jax.vmap(one)(th)

@jax.jit
def f_full(th):
    return sim.photometry(th)


timeit("sfzh", f_sfzh, theta)
timeit("sfzh+contract", f_contract, theta)
timeit("sfzh+emission", f_emission, theta)
timeit("sfzh+emission+observe", f_observe, theta)
timeit("full (with photometry)", f_full, theta)
