"""Micro-probe: what makes the SFZH weight stage cost 8 ms at B=65536?

Candidates: per-galaxy cosmology table gathers (scalar-unit on TPU), the
lognormal erf CDF, the delta-zdist scatter, the outer product."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import synference_tpu as st
from synference_tpu.sfh import sfh_weights, zdist_weights

B = 65536
grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                              lam_min=300.0)
sim = st.BatchSEDSimulator(
    grid=grid,
    filters=st.FilterSet([st.tophat_filter("F200W", 20000.0, 4600.0)]),
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig())

rng = np.random.default_rng(0)
theta = jnp.asarray(np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B),
], axis=1).astype(np.float32))


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(8):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 8
    print(f"  {label:34s}: {dt*1e3:7.2f} ms  {B/dt/1e6:6.1f} M/s", flush=True)
    return dt


@jax.jit
def full_weights(th):
    def one(row):
        p = sim.theta_dict(row)
        sfzh, _ = sim._sfzh(p)
        return jnp.sum(sfzh)
    return jax.vmap(one)(th)


@jax.jit
def weights_fixed_maxage(th):
    def one(row):
        p = sim.theta_dict(row)
        p["max_age"] = jnp.asarray(5.0e9)  # skip _age_of_z gather
        sfzh, _ = sim._sfzh(p)
        return jnp.sum(sfzh)
    return jax.vmap(one)(th)


@jax.jit
def age_of_z_only(th):
    return jax.vmap(lambda row: sim._age_of_z(row[1]))(th)


@jax.jit
def age_of_z_batched(th):
    return sim._age_of_z(th[:, 1])  # one batched gather op


@jax.jit
def sfh_only(th):
    def one(row):
        p = sim.theta_dict(row)
        p["max_age"] = jnp.asarray(5.0e9)
        return jnp.sum(sfh_weights("lognormal", p, sim._sampling))
    return jax.vmap(one)(th)


@jax.jit
def zdist_only(th):
    def one(row):
        p = sim.theta_dict(row)
        return jnp.sum(zdist_weights("delta", p, sim._log10_mets))
    return jax.vmap(one)(th)


@jax.jit
def outer_only(th):
    def one(row):
        wa = jnp.ones(64) / 64
        wm = jnp.ones(12) / 12
        return jnp.sum(jnp.outer(wa, wm) * (10.0 ** row[0]))
    return jax.vmap(one)(th)


@jax.jit
def theta_dict_only(th):
    def one(row):
        p = sim.theta_dict(row)
        return p["mass"] + p["peak_age"]
    return jax.vmap(one)(th)


print(f"B={B}, grid 64x12:", flush=True)
timeit("full weights (as production)", full_weights, theta)
timeit("weights, fixed max_age", weights_fixed_maxage, theta)
timeit("age_of_z (vmapped scalar lerp)", age_of_z_only, theta)
timeit("age_of_z (batched call)", age_of_z_batched, theta)
timeit("sfh_weights only", sfh_only, theta)
timeit("zdist_weights only", zdist_only, theta)
timeit("outer product only", outer_only, theta)
timeit("theta_dict only", theta_dict_only, theta)
