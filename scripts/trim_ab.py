"""TPU A/B: λ-support trimming across the three benchmark configs.

Prior committed numbers (same chip, BASELINE.md round 3):
  headline 48×8×2048 λ, 7 bands, B=65536 (megakernel): 5.0-5.9M SEDs/s
  realistic 64×12×10⁴ λ, 7 bands, B=16384 (staged interp): 1.36-1.73M
  paper 63 filters, 64×12×10⁴ λ, B=16384 (conv, NON-fused): 367-494k
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


def theta_batch(b, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.stack([
        rng.uniform(7.5, 11, b), rng.uniform(0.05, 10, b),
        rng.uniform(5e7, 1e9, b), rng.uniform(0.1, 1.2, b),
        rng.uniform(-3.9, -1.5, b), rng.uniform(0, 3, b)], axis=1),
        jnp.float32)


def bench(sim, b, iters=4, seed=0, label=""):
    theta = theta_batch(b, seed)
    fn = jax.jit(sim.photometry)
    p = fn(theta)
    p.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        p = fn(theta)
    p.block_until_ready()
    dt = (time.time() - t0) / iters
    sup = sim._lam_support
    print(f"{label}: {b/dt/1e6:.3f}M SEDs/s ({dt*1e3:.2f} ms/b) "
          f"support={sup} L={sim.grid.n_wav}", flush=True)
    return np.asarray(p)


PN = ("log10_mass", "redshift", "peak_age", "tau",
      "log10_metallicity", "tau_v")

print("== headline 48x8x2048, 7 tophats, B=65536 ==", flush=True)
grid_h = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
filt7 = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                      for i, (c, w) in enumerate(zip(centers, widths))])
sim_h = st.BatchSEDSimulator(
    grid=grid_h, filters=filt7, param_names=PN, sfh="lognormal",
    zdist="delta", emission=st.EmissionConfig(igm="inoue14"),
    photometry_backend="pallas")
print("mega gate:", sim_h._mega_supported(), flush=True)
bench(sim_h, 65536, label="headline(mega)")

print("== realistic 64x12x10000, 7 tophats, B=16384 ==", flush=True)
grid_r = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10000,
                                lam_min=150.0)
sim_r = st.BatchSEDSimulator(
    grid=grid_r, filters=filt7, param_names=PN, sfh="lognormal",
    zdist="delta", emission=st.EmissionConfig(igm="inoue14"),
    photometry_backend="pallas")
print("variant:", sim_r._pallas_variant, "mega:", sim_r._mega_supported(),
      flush=True)
bench(sim_r, 16384, label="realistic")

print("== paper 63 filters, 64x12x10000, B=16384 ==", flush=True)
from synference_tpu.instruments import load_instrument_filters  # noqa: E402
filt63 = load_instrument_filters()
sim_p = st.BatchSEDSimulator(
    grid=grid_r, filters=filt63, param_names=PN, sfh="lognormal",
    zdist="delta", emission=st.EmissionConfig(igm="inoue14"),
    photometry_backend="pallas")
print("variant:", sim_p._pallas_variant, flush=True)
p_new = bench(sim_p, 16384, label="paper63(conv-fused)")

# accuracy spot check of the fused conv path vs the spectra path on-chip
theta = theta_batch(2048, seed=3)
p_f = np.asarray(jax.jit(sim_p.photometry)(theta))
p_s = np.asarray(jax.jit(
    lambda t: sim_p.simulate(t, want_spectra=True)["photometry_njy"])(theta))
scale = np.abs(p_s).max(axis=1, keepdims=True)
sig = np.abs(p_s) > 0.01 * scale
rel = np.abs(p_f - p_s)[sig] / np.abs(p_s)[sig]
print(f"fused-vs-spectra rel err: median {np.median(rel):.2e} "
      f"p99 {np.percentile(rel, 99):.2e} max {rel.max():.2e}", flush=True)
print("DONE", flush=True)
