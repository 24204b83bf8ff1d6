import time, sys
import numpy as np
import jax
import synference_tpu as st

def log(*a): print(*a, flush=True)

t0=time.time(); log("devices:", jax.devices(), f"({time.time()-t0:.1f}s)")

grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
filters = st.FilterSet([
    st.tophat_filter("F115W", 11500., 2600.),
    st.tophat_filter("F200W", 20000., 4600.),
    st.tophat_filter("F356W", 35600., 7800.),
])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass","redshift","peak_age","tau","log10_metallicity","tau_v"),
    sfh="lognormal", zdist="delta",
    emission=st.EmissionConfig(igm="madau95"),
)
rng = np.random.default_rng(1)
def make_theta(B):
    return np.stack([
        rng.uniform(7.5, 11.0, B), rng.uniform(0.05, 10.0, B),
        rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
        rng.uniform(-3.9, -1.5, B), rng.uniform(0.0, 3.0, B),
    ], axis=1).astype(np.float32)

log("warmup tiny batch...")
phot_fn = jax.jit(sim.photometry)
t0=time.time(); small = np.asarray(phot_fn(make_theta(8))); log(f"tiny compile+run {time.time()-t0:.1f}s; sample {small[0]}")

B = 8192
theta = make_theta(B)
t0=time.time(); p = phot_fn(theta); p.block_until_ready(); log(f"B={B} compile+run {time.time()-t0:.1f}s")
t0=time.time()
for _ in range(5): p = phot_fn(theta)
p.block_until_ready(); t = (time.time()-t0)/5
log(f"steady {t*1000:.1f} ms/batch -> {B/t:,.0f} SEDs/sec (fp32 1 chip)")
pa = np.asarray(p)
log("finite:", np.isfinite(pa).all(), "nonneg:", (pa>=0).all(), "sample:", pa[0])

one = np.asarray(jax.jit(sim.photometry)(theta[0]))
log("probe 1-D input -> shape", one.shape)
z0 = theta[:8].copy(); z0[:,1]=0.0
log("probe z=0 finite:", np.isfinite(np.asarray(phot_fn(z0))).all())
ext = theta[:8].copy(); ext[:,0]=13.0; ext[:,1]=15.0
log("probe extreme corner finite:", np.isfinite(np.asarray(phot_fn(ext))).all())
