import time
import numpy as np, jax, jax.numpy as jnp
import synference_tpu as st
def log(*a): print(*a, flush=True)
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
fs = st.FilterSet([st.tophat_filter(f"F{i}", c, w) for i,(c,w) in enumerate(zip(centers,widths))])
sim = st.BatchSEDSimulator(grid, fs, ("log10_mass","redshift","peak_age","tau","log10_metallicity","tau_v"))
rng = np.random.default_rng(1)
f = jax.jit(sim.photometry)
for B in (8192, 32768, 65536):
    theta = jnp.asarray(np.stack([rng.uniform(7.5,11,B), rng.uniform(0.05,10,B), rng.uniform(5e7,1e9,B),
        rng.uniform(0.1,1.2,B), rng.uniform(-3.9,-1.5,B), rng.uniform(0,3,B)],axis=1), jnp.float32)
    p = f(theta); p.block_until_ready()
    t0=time.time()
    for _ in range(8): p = f(theta)
    p.block_until_ready(); t=(time.time()-t0)/8
    log(f"B={B}: {t*1000:.2f} ms -> {B/t:,.0f} SEDs/s")
