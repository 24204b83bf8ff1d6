import numpy as np, jax, jax.numpy as jnp
import synference_tpu as st
def log(*a): print(*a, flush=True)
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
fs = st.FilterSet([st.tophat_filter(f"F{i}", c, w) for i,(c,w) in enumerate(zip(centers,widths))])
names = ("log10_mass","redshift","peak_age","tau","log10_metallicity","tau_v")
sim_p = st.BatchSEDSimulator(grid, fs, names, photometry_backend="pallas")
sim_x = st.BatchSEDSimulator(grid, fs, names, photometry_backend="xla")
B=2048
rng = np.random.default_rng(1)
theta = jnp.asarray(np.stack([rng.uniform(7.5,11,B), rng.uniform(0.05,10,B), rng.uniform(5e7,1e9,B),
    rng.uniform(0.1,1.2,B), rng.uniform(-3.9,-1.5,B), rng.uniform(0,3,B)],axis=1), jnp.float32)
pp = np.asarray(jax.jit(sim_p.photometry)(theta))
px = np.asarray(jax.jit(sim_x.photometry)(theta))
rel = np.abs(pp-px)/np.maximum(np.abs(px),1e-30)
row_scale = np.abs(px).max(axis=1, keepdims=True)
scaled = np.abs(pp-px)/row_scale
log("rel err: median", np.median(rel), "p99", np.percentile(rel,99), "max", rel.max())
log("row-scaled err: median", np.median(scaled), "p99", np.percentile(scaled,99), "max", scaled.max())
i,j = np.unravel_index(rel.argmax(), rel.shape)
log("worst: z=", float(theta[i,1]), "band", j, "xla", px[i,j], "pallas", pp[i,j], "rowmax", row_scale[i,0])
bright = px > 0.01*row_scale
log("rel err on bright fluxes: p99", np.percentile(rel[bright],99), "max", rel[bright].max())
