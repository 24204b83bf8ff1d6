"""Round-5 verify drive: public-surface end-to-end on the real TPU.

Covers this session's changes: whole-run training with injected lr
(traced argument) + the n_nets==1 no-vmap fast path, NPE-seeded
init_theta on HMC and batched MCMC, plus the standard photometry probes
(extreme corners, finiteness)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import synference_tpu as st
from synference_tpu.train import TrainConfig

t0 = time.time()
print("devices:", jax.devices(), flush=True)

# 1. photometry drive + corners
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig())
rng = np.random.default_rng(0)
theta = np.column_stack([
    rng.uniform(8, 11, 4096), rng.uniform(0.1, 7, 4096),
    rng.uniform(1e8, 8e8, 4096), rng.uniform(0.1, 1.2, 4096),
    rng.uniform(-3.5, -1.8, 4096), rng.uniform(0, 2, 4096),
]).astype(np.float32)
p = np.asarray(jax.jit(sim.photometry)(jnp.asarray(theta)))
assert np.isfinite(p).all() and (p >= 0).all(), "photometry basic"
corners = np.array([
    [13.0, 15.0, 1e8, 0.5, -2.5, 0.0],   # extreme mass+z
    [6.0, 0.0, 5e8, 0.5, -3.9, 2.0],     # z=0 exactly
    [11.0, 0.01, 1e10, 0.1, -1.6, 0.0],  # old age, tiny z
], np.float32)
pc = np.asarray(jax.jit(sim.photometry)(jnp.asarray(corners)))
assert np.isfinite(pc).all(), f"corner photometry: {pc}"
print(f"[{time.time()-t0:.0f}s] photometry drive OK "
      f"(median {np.median(p):.3g} nJy; corners finite)", flush=True)

# 2. whole-run training (traced lr + n_nets=1 fast path) -> posterior -> PIT
from synference_tpu.flows import build_flow
from synference_tpu.posterior import DirectPosterior
from synference_tpu.priors import priors_from_library
from synference_tpu.diagnostics import evaluate_posterior

sig = 0.05 * p
x = np.log10(np.maximum(p + sig * rng.standard_normal(p.shape), 1e-3)
             ).astype(np.float32)
flow = build_flow("nsf", 6, 7, hidden_features=48, num_transforms=6)
from synference_tpu.train import train_npe

res = train_npe(flow, theta[:-512], x[:-512], jax.random.PRNGKey(1),
                TrainConfig(max_epochs=30, stop_after_epochs=8,
                            batch_size=512, learning_rate=1e-3))
assert res.history.get("whole_run"), "whole-run path not taken"
print(f"[{time.time()-t0:.0f}s] whole-run train OK: "
      f"{len(res.val_losses)} epochs, best val "
      f"{float(np.min(res.val_losses)):.3f}", flush=True)

# lr actually matters through the traced path: a tiny-lr run must be worse
res_tiny = train_npe(flow, theta[:-512], x[:-512], jax.random.PRNGKey(1),
                     TrainConfig(max_epochs=6, stop_after_epochs=8,
                                 batch_size=512, learning_rate=1e-7))
assert float(np.min(res_tiny.val_losses)) > float(np.min(res.val_losses)), \
    "traced lr had no effect"
print(f"[{time.time()-t0:.0f}s] traced-lr sanity OK "
      f"(1e-7 lr val {float(np.min(res_tiny.val_losses)):.3f})", flush=True)

prior = priors_from_library(theta, sim.param_names)
post = DirectPosterior(flow, res.params, prior)
report = evaluate_posterior(post, x[-512:], theta[-512:], n_samples=128)
print(f"[{time.time()-t0:.0f}s] eval: TARP {report['tarp_deviation']:.3f} "
      f"PIT-KS max {max(report['pit_ks']):.3f}", flush=True)
assert report["tarp_deviation"] < 0.12, "coverage off"

# 3. gradient fitters + NPE-seeded init_theta
sub = slice(0, 8)
obs, err = p[sub], sig[sub]
fr = st.fisher_forecast(sim, theta[sub], err)
cr = fr["cramer_rao_sigma"]
# documented contract: NaN on singular (unidentifiable) directions is
# allowed; the flux-scale parameter must be constrained on every row, and
# nothing may be inf or negative
assert np.isfinite(cr[:, 0]).all(), f"mass CR not finite: {cr[:, 0]}"
assert not np.isinf(cr).any() and np.nanmin(cr) > 0, "CR inf/negative"
draws = np.asarray(post.sample_batch(
    jax.random.PRNGKey(3), jnp.asarray(x[sub]), 64))  # (8, 64, 6)
hmc_s, _, hmc_acc = st.fit_catalogue_hmc(
    sim, obs, err, prior, key=jax.random.PRNGKey(4), n_chains=8,
    n_warmup=100, n_samples=100, n_leapfrog=8,
    init_theta=draws[:, :8, :])
assert 0.3 < float(hmc_acc) < 0.99, f"hmc acc {hmc_acc}"
assert np.isfinite(np.asarray(hmc_s)).all()
print(f"[{time.time()-t0:.0f}s] HMC(init_theta) OK acc={float(hmc_acc):.2f}",
      flush=True)

from synference_tpu.mcmc import run_batched_mcmc

nf = obs.shape[1]


def loglike(th, xa):
    return -0.5 * jnp.sum(
        ((sim.photometry(th) - xa[:, :nf]) / xa[:, nf:]) ** 2, axis=-1)


sim._mega_off = True
xs_aug = np.concatenate([obs, err], axis=1)
mc_s, mc_acc, mc_d = run_batched_mcmc(
    loglike, prior, xs_aug, key=jax.random.PRNGKey(5), n_walkers=32,
    n_steps=400, burn_in=200, init_theta=draws[:, :32, :],
    return_diagnostics=True)
assert float(mc_acc) > 0.05 and np.isfinite(np.asarray(mc_s)).all()
print(f"[{time.time()-t0:.0f}s] MCMC(init_theta) OK acc={float(mc_acc):.2f} "
      f"rhat_med={float(np.nanmedian(np.asarray(mc_d['rhat']))):.2f}",
      flush=True)

print(f"VERIFY_R5_PASS in {time.time()-t0:.0f}s", flush=True)
