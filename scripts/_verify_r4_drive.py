"""Verify drive (round 4): device-resident generation + catalogue recon +
simformer log_prob, end-to-end on the attached TPU."""
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import synference_tpu as st

print("devices:", jax.devices(), flush=True)

# ---- 1. device-resident z-sorted engine, realistic size ------------------
grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                              lam_min=300.0)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(igm="inoue14"))

B = 65536
rng = np.random.default_rng(0)
theta = np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B),
], axis=1).astype(np.float32)
th_sorted = theta[np.argsort(theta[:, 1], kind="stable")]
th_dev = jnp.asarray(th_sorted)

sub = 1024
span = sim.zsorted_max_span(th_sorted[:, 1], sub)
kc, w_cols = sim._zsorted_plan(span)
print(f"plan kc={kc} w_cols={w_cols}", flush=True)
p_dev = sim.photometry_zsorted_device(th_dev, sub_chunk=sub,
                                      kc=kc, w_cols=w_cols)
jax.block_until_ready(p_dev)
t0 = time.time()
for _ in range(4):
    p_dev = sim.photometry_zsorted_device(th_dev, sub_chunk=sub,
                                          kc=kc, w_cols=w_cols)
jax.block_until_ready(p_dev)
rate = B / ((time.time() - t0) / 4)
print(f"device zsorted realsize: {rate/1e6:.2f} M SEDs/s", flush=True)

# parity vs the dense fused path on a slice
p_ref = np.asarray(jax.jit(sim.photometry)(th_dev[:4096]))
p_zs = np.asarray(p_dev[:4096])
rel = np.abs(p_zs - p_ref) / np.maximum(np.abs(p_ref), 1e-30)
sig = p_ref > 1e-3 * p_ref.max(axis=1, keepdims=True)
print(f"parity vs dense: median {np.median(rel[sig]):.2e} "
      f"p99 {np.quantile(rel[sig], 0.99):.2e}", flush=True)
assert np.isfinite(p_zs).all() and np.quantile(rel[sig], 0.99) < 5e-3

# ---- 2. LibraryGenerator device path, end-to-end wall time ---------------
gen = st.LibraryGenerator(sim, {
    "log10_mass": (7.5, 11.0), "redshift": (0.05, 10.0),
    "log10_peak_age": (7.7, 9.0), "tau": (0.1, 1.2),
    "log10_metallicity": (-3.9, -1.5), "tau_v": (0.0, 3.0),
}, unlog_keys=["log10_peak_age"])
t0 = time.time()
lib = gen.generate(n=1_000_000, seed=1, out_path="/tmp/verify_r4_lib.h5")
dt = time.time() - t0
print(f"generate 1e6 (device path, incl. HDF5 write): {dt:.1f} s "
      f"= {1e6/dt/1e6:.2f} M SEDs/s end-to-end", flush=True)
th = lib["parameters"].T
assert np.all(np.diff(th[:, 1]) >= 0), "device path must be z-sorted"
assert np.isfinite(lib["photometry"]).all()
# spot parity on a slice
sel = slice(0, 2048)
p_chk = np.asarray(jax.jit(sim.photometry)(jnp.asarray(th[sel])))
rel = np.abs(lib["photometry"].T[sel] - p_chk) / np.maximum(p_chk, 1e-30)
sig = p_chk > 1e-3 * p_chk.max(axis=1, keepdims=True)
print(f"generate parity: p99 {np.quantile(rel[sig], 0.99):.2e}", flush=True)
assert np.quantile(rel[sig], 0.99) < 5e-3

# ---- 3. fit_catalogue with recon photometry + SED recovery ---------------
from synference_tpu.catalogue import fit_catalogue
from synference_tpu.features import FeatureConfig
from synference_tpu.fitter import SBIFitter
from synference_tpu.train import TrainConfig

small = st.make_synthetic_grid(n_ages=32, n_mets=6, n_wav=2048)
sim2 = st.BatchSEDSimulator(
    grid=small, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig())
gen2 = st.LibraryGenerator(sim2, {
    "log10_mass": (8.0, 10.5), "redshift": (0.5, 6.0),
    "peak_age": (1e8, 8e8), "tau": (0.2, 1.0),
    "log10_metallicity": (-3.5, -1.8), "tau_v": (0.0, 1.5),
})
lib2 = gen2.generate(n=4000, seed=0)
fitter = SBIFitter(
    photometry=lib2["photometry"].T, parameters=lib2["parameters"].T,
    parameter_names=lib2["parameter_names"],
    filter_codes=lib2["filter_codes"])
fitter.create_feature_array(FeatureConfig(
    filter_codes=tuple(fitter.filter_codes), unit="asinh",
    depths_ab=tuple([29.0] * 7), include_errors=True))
fitter.run_single_sbi(model_type="mdn", hidden_features=32,
                      num_components=4,
                      train_config=TrainConfig(max_epochs=15, batch_size=512,
                                               learning_rate=1e-3))
phot = lib2["photometry"].T
bright = np.argsort(phot.sum(axis=1))[-8:]
obs = phot[bright]
t0 = time.time()
table = fit_catalogue(fitter, obs, 0.05 * obs, "nJy", n_samples=200,
                      check_ood=False, simulator=sim2, recon_draws=64,
                      recover_seds=True, sed_draws=16)
print(f"fit_catalogue recon+seds: {time.time()-t0:.1f} s", flush=True)
med = np.stack([table[f"recon_{c}_q50"] for c in sim2.filters.codes], axis=1)
rel = np.abs(med - obs) / obs
print(f"recon median rel dev: {np.median(rel):.3f}", flush=True)
assert np.isfinite(med).all() and np.median(rel) < 1.0
seds = table["_recovered_seds"]
assert seds["fnu_quantiles"].shape == (8, 3, small.n_wav)
assert np.isfinite(seds["fnu_quantiles"]).all()

# ---- 4. simformer log_prob on TPU ----------------------------------------
from synference_tpu.simformer import (Simformer, SimformerConfig,
                                      SimformerPosterior, train_simformer)

rng = np.random.default_rng(1)
n, sig_n = 4000, 0.3
th_s = rng.standard_normal((n, 1)).astype(np.float32)
x_s = (th_s + sig_n * rng.standard_normal((n, 1))).astype(np.float32)
cfg = SimformerConfig(n_tokens=2, d_model=48, n_heads=4, n_layers=2, d_ff=96)
model = Simformer(cfg)
params, stdz, hist = train_simformer(model, th_s, x_s, jax.random.PRNGKey(0),
                                     batch_size=256, learning_rate=3e-4,
                                     max_epochs=60, stop_after_epochs=60)
post = SimformerPosterior(model, params, stdz, n_steps=200)
grid_t = np.linspace(-2, 3, 81, dtype=np.float32)
lp = np.asarray(post.log_prob(grid_t[:, None],
                              np.full((81, 1), 0.8, np.float32),
                              n_steps=128))
zint = float(np.trapezoid(np.exp(lp), grid_t))
mu_an = 0.8 / (1 + sig_n**2)
print(f"simformer log_prob: normalization {zint:.3f}, "
      f"argmax {grid_t[np.argmax(lp)]:.2f} vs analytic {mu_an:.2f}",
      flush=True)
assert np.isfinite(lp).all() and abs(zint - 1.0) < 0.25

print("VERIFY R4 DRIVE: ALL OK", flush=True)
