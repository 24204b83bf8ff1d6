"""Verify drive: exercise the package end-to-end on the real TPU,
including this session's new surface (zoo flows, SNLE/SNRE)."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time
import numpy as np
import jax, jax.numpy as jnp
import synference_tpu as st

print("devices:", jax.devices(), flush=True)
t0 = time.time()
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
filters = st.FilterSet([
    st.tophat_filter("F115W", 11500., 2600.),
    st.tophat_filter("F150W", 15000., 3300.),
    st.tophat_filter("F200W", 20000., 4600.),
    st.tophat_filter("F277W", 27700., 7000.),
    st.tophat_filter("F444W", 44400., 11000.),
])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig())
rng = np.random.default_rng(0)
B = 4096
theta = np.stack([
    rng.uniform(8, 11, B), rng.uniform(0.5, 8, B), rng.uniform(0.05, 1.5, B),
    rng.uniform(0.1, 1.0, B), rng.uniform(-3.5, -1.5, B), rng.uniform(0, 2, B),
], axis=1).astype(np.float32)
phot_fn = jax.jit(sim.photometry)
p = np.asarray(phot_fn(jnp.asarray(theta)))
assert p.shape == (B, 5) and np.isfinite(p).all() and (p >= 0).all()
print(f"photometry ok ({time.time()-t0:.1f}s): range {p.min():.3e}..{p.max():.3e}", flush=True)

# corners: z~0, extreme mass/redshift
corners = np.array([
    [13.0, 0.001, 0.5, 0.5, -2.0, 0.5],
    [13.0, 15.0, 0.05, 0.1, -3.5, 2.0],
    [6.0, 0.5, 1.5, 1.0, -1.5, 0.0],
], np.float32)
pc = np.asarray(phot_fn(jnp.asarray(corners)))
assert np.isfinite(pc).all() and (pc >= 0).all(), pc
print("corner probes ok", flush=True)

# NPE on a new zoo flow (naf), trained on simulated features
x = np.log10(np.maximum(p, 1e-6)) + 0.05 * rng.standard_normal(p.shape).astype(np.float32)
from synference_tpu.flows import build_flow
from synference_tpu.train import TrainConfig, train_npe
from synference_tpu.posterior import DirectPosterior
from synference_tpu.priors import BoxUniform
prior = BoxUniform([8, 0.5, 0.05, 0.1, -3.5, 0.0], [11, 8, 1.5, 1.0, -1.5, 2.0],
                   sim.param_names)
flow = build_flow("naf", theta_dim=6, context_dim=5, hidden_features=32,
                  num_transforms=2)
t1 = time.time()
res = train_npe(flow, theta, x.astype(np.float32), jax.random.PRNGKey(1),
                TrainConfig(max_epochs=30, batch_size=512))
post = DirectPosterior(flow, res.params, prior)
s = np.asarray(post.sample(jax.random.PRNGKey(2), x[0], 256))
assert s.shape == (256, 6) and np.isfinite(s).all()
err = np.abs(np.median(s, 0) - theta[0])
print(f"naf NPE ok ({time.time()-t1:.1f}s): median abs err {err.round(2)}", flush=True)

# SNLE round-trip on a tiny linear problem (runs the batched MCMC on TPU)
from synference_tpu.online import run_online_snle
A = jnp.asarray(np.array([[1.0, 0.4], [-0.3, 1.0], [0.5, 0.5]], np.float32))
def simf(th):
    # key folded from the batch content: independent noise per round
    k = jax.random.PRNGKey(int(abs(float(np.asarray(th).sum())) * 1e3) % 2**31)
    return th @ A.T + 0.1 * jax.random.normal(k, (th.shape[0], 3))
pri2 = BoxUniform([-2.0, -2.0], [2.0, 2.0], ("a", "b"))
fl2 = build_flow("maf", theta_dim=3, context_dim=2, hidden_features=32,
                 num_transforms=3)
tt = np.array([0.7, -0.9], np.float32)
post2, _, hist = run_online_snle(simf, pri2, fl2, tt @ np.asarray(A).T,
                                 n_rounds=2, sims_per_round=1500,
                                 train_config=TrainConfig(max_epochs=60, batch_size=256),
                                 key=jax.random.PRNGKey(3), verbose=False)
s2 = np.asarray(post2.sample(jax.random.PRNGKey(4), tt @ np.asarray(A).T, 300))
print("snle ok: mean", s2.mean(0).round(2), "truth", tt, flush=True)
assert np.abs(s2.mean(0) - tt).max() < 0.4
print(f"VERIFY_PASS total {time.time()-t0:.1f}s", flush=True)
