"""Verify drive (round 4c): fused-dispatch training + vmapped lr sweep on
the REAL TPU, end-to-end through the public package boundary."""
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

import synference_tpu as st
from synference_tpu.flows import build_flow
from synference_tpu.train import TrainConfig, train_ensemble
from synference_tpu.hpo import sweep_learning_rates

print("devices:", jax.devices(), flush=True)

# --- 1. generation sanity (library path used by examples) ------------------
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
filters = st.FilterSet([
    st.tophat_filter("F090W", 9000.0, 2000.0),
    st.tophat_filter("F200W", 20000.0, 4600.0),
    st.tophat_filter("F444W", 44400.0, 10200.0),
])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig())
rng = np.random.default_rng(0)
theta_g = np.column_stack([
    rng.uniform(8, 11, 4096), rng.uniform(0.1, 8, 4096),
    rng.uniform(0.05, 1.2, 4096), rng.uniform(0.1, 1.0, 4096),
    rng.uniform(-3.9, -1.6, 4096), rng.uniform(0, 2, 4096),
]).astype(np.float32)
phot = np.asarray(jax.jit(sim.photometry)(jnp.asarray(theta_g)))
assert np.isfinite(phot).all() and (phot >= 0).all(), "photometry broke"
print("photometry ok:", phot.shape, phot.mean(), flush=True)

# --- 2. fused-dispatch training on TPU: K=4 vs K=1 --------------------------
n = 100_000
theta = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
x = jnp.asarray(rng.standard_normal((n, 14)), jnp.float32)
flow = build_flow("nsf", 6, 14, hidden_features=69, num_transforms=15)

t0 = time.time()
res1 = train_ensemble(flow, theta, x, jax.random.PRNGKey(1),
                      TrainConfig(max_epochs=8, stop_after_epochs=8,
                                  batch_size=1024, learning_rate=3e-4))
t1 = time.time() - t0
t0 = time.time()
res4 = train_ensemble(flow, theta, x, jax.random.PRNGKey(1),
                      TrainConfig(max_epochs=8, stop_after_epochs=8,
                                  batch_size=1024, learning_rate=3e-4,
                                  epochs_per_dispatch=4))
t4 = time.time() - t0
steps = (n - n // 5) // 1024
print(f"K=1: {t1:.1f}s ({8*steps/t1:.0f} steps/s incl compile)  "
      f"K=4: {t4:.1f}s ({8*steps/t4:.0f} steps/s incl compile)", flush=True)
assert res4.val_losses.shape == (8, 1)
assert abs(min(res4.history["best_val"][0] for _ in [0])
           - min(res1.history["best_val"][0] for _ in [0])) < 1.0
# warm steady-state: rerun K=4 (program cached)
t0 = time.time()
res4b = train_ensemble(flow, theta, x, jax.random.PRNGKey(2),
                       TrainConfig(max_epochs=8, stop_after_epochs=8,
                                   batch_size=1024, learning_rate=3e-4,
                                   epochs_per_dispatch=4))
t4b = time.time() - t0
print(f"K=4 warm: {t4b:.1f}s ({8*steps/t4b:.0f} steps/s)", flush=True)
print("val K=1 tail:", res1.val_losses[-1], "K=4 tail:", res4.val_losses[-1],
      flush=True)
assert res4.val_losses[-1, 0] < res4.val_losses[0, 0]

# --- 3. vmapped lr sweep on TPU ---------------------------------------------
out = sweep_learning_rates(
    flow, np.asarray(theta[:20_000]), np.asarray(x[:20_000]),
    [1e-9, 1e-3, 3e-4],
    config=TrainConfig(max_epochs=6, stop_after_epochs=6, batch_size=1024),
    key=jax.random.PRNGKey(3))
print("lr sweep best:", out["best_lr"], "vals:", out["best_val"], flush=True)
assert out["best_lr"] != 1e-9
assert np.isfinite(out["best_val"]).all()

print("VERIFY-OK", flush=True)
