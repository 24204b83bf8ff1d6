import time
import numpy as np, jax, jax.numpy as jnp
import synference_tpu as st
def log(*a): print(*a, flush=True)
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
fs = st.FilterSet([st.tophat_filter("a",11500.,2600.), st.tophat_filter("b",20000.,4600.),
                   st.tophat_filter("c",35600.,7800.), st.tophat_filter("d",9000.,2000.),
                   st.tophat_filter("e",15000.,3300.), st.tophat_filter("f",27700.,7000.),
                   st.tophat_filter("g",44400.,10200.)])
sim = st.BatchSEDSimulator(grid, fs, ("log10_mass","redshift","peak_age","tau","log10_metallicity","tau_v"))
rng = np.random.default_rng(1)
B=8192
theta = jnp.asarray(np.stack([rng.uniform(7.5,11,B), rng.uniform(0.05,10,B), rng.uniform(5e7,1e9,B),
    rng.uniform(0.1,1.2,B), rng.uniform(-3.9,-1.5,B), rng.uniform(0,3,B)],axis=1), jnp.float32)
f = jax.jit(sim.photometry)
t0=time.time(); p=f(theta); p.block_until_ready(); log(f"compile+run {time.time()-t0:.1f}s")
t0=time.time()
for _ in range(10): p = f(theta)
p.block_until_ready(); t=(time.time()-t0)/10
log(f"steady {t*1000:.1f} ms/batch -> {B/t:,.0f} SEDs/sec (fp32, 7 bands, 1 chip)")
pa=np.asarray(p); log("finite", np.isfinite(pa).all(), "sample", pa[0][:4])
