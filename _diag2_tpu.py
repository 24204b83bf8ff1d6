import time
import numpy as np, jax, jax.numpy as jnp
import synference_tpu as st
def log(*a): print(*a, flush=True)
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
fs = st.FilterSet([st.tophat_filter(f"F{i}", c, w) for i,(c,w) in enumerate(zip(centers,widths))])
sim = st.BatchSEDSimulator(grid, fs, ("log10_mass","redshift","peak_age","tau","log10_metallicity","tau_v"))
B=8192
rng = np.random.default_rng(1)
theta = jnp.asarray(np.stack([rng.uniform(7.5,11,B), rng.uniform(0.05,10,B), rng.uniform(5e7,1e9,B),
    rng.uniform(0.1,1.2,B), rng.uniform(-3.9,-1.5,B), rng.uniform(0,3,B)],axis=1), jnp.float32)

def time_fn(name, fn, *args, iters=10):
    jfn = jax.jit(fn)
    r = jfn(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(iters): r = jfn(*args)
    jax.block_until_ready(r); log(f"{name}: {(time.time()-t0)/iters*1000:.2f} ms")
    return r

def sfzh_only(th):
    return jax.vmap(lambda row: sim._sfzh(sim.theta_dict(row))[0])(th)
time_fn("1 sfzh weights", sfzh_only, theta)

def zdist_only(th):
    from synference_tpu.sfh import zdist_weights
    return jax.vmap(lambda row: zdist_weights("delta", sim.theta_dict(row), sim._log10_mets))(th)
time_fn("1a zdist only", zdist_only, theta)

def sfhw_only(th):
    from synference_tpu.sfh import sfh_weights
    def one(row):
        p = sim.theta_dict(row); p["max_age"] = sim._max_age(p)
        return sfh_weights("lognormal", p, sim._sampling)
    return jax.vmap(one)(th)
time_fn("1b sfh weights only", sfhw_only, theta)

def maxage_only(th):
    return jax.vmap(lambda row: sim._max_age(sim.theta_dict(row)))(th)
time_fn("1c max_age (cosmology)", maxage_only, theta)

def upto_lnu(th):
    def one(row):
        p = sim.theta_dict(row)
        s,_ = sim._sfzh(p)
        return sim._apply_emission(p, s)
    return jax.vmap(one)(th)
time_fn("2 +contraction+dust", upto_lnu, theta)

def upto_fnu(th):
    def one(row):
        p = sim.theta_dict(row)
        s,_ = sim._sfzh(p)
        lnu = sim._apply_emission(p, s)
        return sim._observe(p, lnu)[0]
    return jax.vmap(one)(th)
time_fn("3 +observe", upto_fnu, theta)
time_fn("4 full photometry", sim.photometry, theta)
