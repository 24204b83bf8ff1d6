"""TPU A/B: megakernel vs staged path at the realistic-size config.

The mega gate is `support length <= 4096` (measured crossover pre-
trimming). With λ-support trimming the realistic 64×12×10⁴ 7-band config
drops to ~4590 support columns — close enough to re-measure whether the
VMEM-resident block now beats the staged XLA path there.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
sys.path.insert(0, "/root/repo")
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import synference_tpu as st  # noqa: E402

PN = ("log10_mass", "redshift", "peak_age", "tau",
      "log10_metallicity", "tau_v")
B = 16384
rng = np.random.default_rng(0)
theta = jnp.asarray(np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B)], axis=1), jnp.float32)

grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10000,
                              lam_min=150.0)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
filt = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                     for i, (c, w) in enumerate(zip(centers, widths))])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filt, param_names=PN, sfh="lognormal",
    zdist="delta", emission=st.EmissionConfig(igm="inoue14"),
    photometry_backend="pallas")
print("support:", sim._lam_support, "gate:", sim._mega_supported(),
      flush=True)


def timeit(fn, label, iters=4):
    p = fn(theta)
    jax.block_until_ready(p)
    t0 = time.time()
    for _ in range(iters):
        p = fn(theta)
    jax.block_until_ready(p)
    dt = (time.time() - t0) / iters
    print(f"{label}: {B/dt/1e6:.3f}M SEDs/s ({dt*1e3:.2f} ms)", flush=True)
    return np.asarray(p)


p_staged = timeit(jax.jit(sim.photometry), "staged")

# force the megakernel by bypassing the support-length gate
sim2 = st.BatchSEDSimulator(
    grid=grid, filters=filt, param_names=PN, sfh="lognormal",
    zdist="delta", emission=st.EmissionConfig(igm="inoue14"),
    photometry_backend="pallas")
sim2._mega_supported = lambda: (sim2._mega_setup() is not None)
print("forced mega setup:", sim2._mega_setup() is not None, flush=True)
p_mega = timeit(jax.jit(sim2.photometry), "megakernel(forced)")

scale = np.abs(p_staged).max(axis=1, keepdims=True)
sig = np.abs(p_staged) > 0.01 * scale
rel = np.abs(p_mega - p_staged)[sig] / np.abs(p_staged)[sig]
print(f"mega-vs-staged rel err: median {np.median(rel):.2e} "
      f"p99 {np.percentile(rel, 99):.2e}", flush=True)
print("DONE", flush=True)
