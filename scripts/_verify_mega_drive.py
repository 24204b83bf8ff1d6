"""Verify drive: megakernel photometry on the real TPU chip.

Exercises the new single-pass megakernel path (ops/fused_sed.py) through the
public BatchSEDSimulator surface, checks parity vs the staged XLA path, and
probes edge cases (z=0, extreme corner, 1-row batch).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import synference_tpu as st  # noqa: E402

print("devices:", jax.devices(), flush=True)

grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
filters = st.FilterSet([
    st.tophat_filter("F115W", 11540., 2250.),
    st.tophat_filter("F150W", 15010., 3180.),
    st.tophat_filter("F200W", 19890., 4610.),
    st.tophat_filter("F277W", 27620., 6830.),
    st.tophat_filter("F356W", 35680., 7870.),
    st.tophat_filter("F444W", 44040., 10240.),
    st.tophat_filter("F770W", 77000., 21000.),
])
pnames = ("log10_mass", "redshift", "peak_age", "tau",
          "log10_metallicity", "tau_v")

sim_mega = st.BatchSEDSimulator(
    grid=grid, filters=filters, param_names=pnames,
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(),
    photometry_backend="pallas")
sim_staged = st.BatchSEDSimulator(
    grid=grid, filters=filters, param_names=pnames,
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(),
    photometry_backend="xla")

assert sim_mega._mega_supported(), "megakernel gate OFF on the verify config"
print("megakernel gate: ON", flush=True)

rng = np.random.default_rng(7)
B = 8192
theta = np.column_stack([
    rng.uniform(7.0, 11.5, B),    # log10_mass
    rng.uniform(0.05, 12.0, B),   # redshift
    rng.uniform(0.05, 1.2, B),    # peak_age
    rng.uniform(0.1, 1.0, B),     # tau
    rng.uniform(-3.5, -1.5, B),   # log10_metallicity
    rng.uniform(0.0, 2.5, B),     # tau_v
]).astype(np.float32)

t0 = time.time()
f_mega = jax.jit(lambda t: sim_mega.simulate(t)["photometry_njy"])
f_staged = jax.jit(lambda t: sim_staged.simulate(t)["photometry_njy"])
p_mega = np.asarray(f_mega(theta))
print(f"mega compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
p_staged = np.asarray(f_staged(theta))
print(f"staged compile+run: {time.time()-t0:.1f}s", flush=True)

assert np.isfinite(p_mega).all(), "megakernel produced non-finite"
assert (p_mega >= 0).all(), "megakernel produced negative flux"

# parity on bands carrying real flux (>1% of row peak)
peak = p_staged.max(axis=1, keepdims=True)
mask = p_staged > 0.01 * peak
rel = np.abs(p_mega - p_staged)[mask] / p_staged[mask]
print(f"mega-vs-staged bright-band rel err: median {np.median(rel):.2e} "
      f"p99 {np.percentile(rel, 99):.2e} max {rel.max():.2e}", flush=True)
assert np.percentile(rel, 99) < 0.02, "parity p99 too large"

# edge probes: z=0 exactly, extreme corner, single row
edge = np.array([
    [8.0, 0.0, 0.3, 0.5, -2.0, 0.0],
    [13.0, 15.0, 0.05, 0.1, -1.5, 2.5],
    [7.0, 0.001, 1.2, 1.0, -3.5, 0.0],
], np.float32)
p_edge = np.asarray(f_mega(edge))
assert np.isfinite(p_edge).all() and (p_edge >= 0).all(), "edge probe failed"
one = np.asarray(f_mega(edge[:1]))
assert np.isfinite(one).all(), "1-row probe failed"
print("edge probes OK:", p_edge[:, 2], flush=True)

# throughput spot check (steady state)
big = np.repeat(theta, 8, axis=0)[:65536]
f_mega(big[:1024])  # warm compile for this shape? reuse same shape instead
t0 = time.time()
r = f_mega(big)
r.block_until_ready()
dt = time.time() - t0
# second call, compiled
t0 = time.time()
r = f_mega(big)
r.block_until_ready()
dt = time.time() - t0
print(f"steady-state: {65536/dt/1e6:.2f}M SEDs/s", flush=True)
print("VERIFY-OK", flush=True)
