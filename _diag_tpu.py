import time
import numpy as np, jax, jax.numpy as jnp
import synference_tpu as st
def log(*a): print(*a, flush=True)

# 1. raw matmul of equivalent FLOPs
B, AZ, L = 8192, 384, 2048
w = jnp.ones((B, AZ), jnp.float32); S = jnp.ones((AZ, L), jnp.float32)
mm = jax.jit(lambda w: w @ S)
r = mm(w); r.block_until_ready()
t0=time.time()
for _ in range(10): r = mm(w)
r.block_until_ready(); log(f"raw matmul {(time.time()-t0)/10*1000:.2f} ms")

# 2. dispatch overhead
f0 = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8,)); f0(x).block_until_ready()
t0=time.time()
for _ in range(20): y = f0(x)
y.block_until_ready(); log(f"tiny dispatch {(time.time()-t0)/20*1000:.2f} ms")

# 3. pipeline pieces
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
fs = st.FilterSet([st.tophat_filter("a",11500.,2600.), st.tophat_filter("b",20000.,4600.), st.tophat_filter("c",35600.,7800.)])
sim = st.BatchSEDSimulator(grid, fs, ("log10_mass","redshift","peak_age","tau","log10_metallicity","tau_v"))
rng = np.random.default_rng(1)
theta = jnp.asarray(np.stack([rng.uniform(7.5,11,B), rng.uniform(0.05,10,B), rng.uniform(5e7,1e9,B),
    rng.uniform(0.1,1.2,B), rng.uniform(-3.9,-1.5,B), rng.uniform(0,3,B)],axis=1), jnp.float32)

def time_fn(name, fn, *args):
    jfn = jax.jit(fn)
    r = jfn(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(5): r = jfn(*args)
    jax.block_until_ready(r); log(f"{name}: {(time.time()-t0)/5*1000:.1f} ms")

def sfzh_only(th):
    return jax.vmap(lambda row: sim._sfzh(sim.theta_dict(row))[0])(th)
time_fn("sfzh weights", sfzh_only, theta)

def upto_lnu(th):
    def one(row):
        p = sim.theta_dict(row)
        s,_ = sim._sfzh(p)
        return sim._apply_emission(p, s)
    return jax.vmap(one)(th)
time_fn("sfzh+contraction+dust", upto_lnu, theta)

def upto_fnu(th):
    def one(row):
        p = sim.theta_dict(row)
        s,_ = sim._sfzh(p)
        lnu = sim._apply_emission(p, s)
        return sim._observe(p, lnu)[0]
    return jax.vmap(one)(th)
time_fn("...+observe(igm,dL)", upto_fnu, theta)
time_fn("full photometry", sim.photometry, theta)
