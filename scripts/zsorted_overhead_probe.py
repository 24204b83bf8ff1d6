"""Probe: is photometry_zsorted dominated by per-call host->device staging?

Times (realsize config, 64x12x10^4, 7 bands, B=65536):
  1. h->d transfer bandwidth of a theta-sized array
  2. photometry_zsorted as-is (host numpy in, fresh jnp.asarray per call)
  3. the underlying jitted program with PRE-STAGED device args
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import synference_tpu as st

B = 65536
grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000, lam_min=300.0)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(igm="inoue14"))
rng = np.random.default_rng(0)
theta = np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B),
], axis=1).astype(np.float32)
th_sorted = theta[np.argsort(theta[:, 1], kind="stable")]

# 1. transfer bandwidth
x = np.ascontiguousarray(th_sorted)
d = jax.device_put(x); d.block_until_ready()
t0 = time.time()
for _ in range(4):
    d = jax.device_put(x); d.block_until_ready()
dt = (time.time() - t0) / 4
print(f"h->d {x.nbytes/1e6:.2f} MB in {dt*1e3:.1f} ms = {x.nbytes/dt/1e6:.0f} MB/s", flush=True)

# 2. photometry_zsorted as-is
np.asarray(sim.photometry_zsorted(th_sorted))  # compile
t0 = time.time()
iters = 4
for _ in range(iters):
    p = sim.photometry_zsorted(th_sorted)
jax.block_until_ready(p)
dt = (time.time() - t0) / iters
print(f"zsorted api       : {dt*1e3:8.1f} ms  {B/dt/1e6:.2f} M SEDs/s", flush=True)

# 3. pre-staged device args through the same compiled program
sub = 1024
z = th_sorted[:, 1]
plan = sim._zsorted_window_plan(z, sub)
kc, w_cols, k0, l0 = plan
print(f"plan: kc={kc} w_cols={w_cols}", flush=True)
t_mix, m_igm, den_knots = sim._zsorted_tables()
run = sim._zsorted_program(sub, w_cols, kc, fused=False)
n_sub = B // sub
ids = np.arange(B, dtype=np.int32).reshape(n_sub, sub)
args = [jax.device_put(jnp.asarray(th_sorted.reshape(n_sub, sub, -1))),
        jax.device_put(jnp.asarray(ids)),
        jax.device_put(jnp.asarray(l0)), jax.device_put(jnp.asarray(k0)),
        t_mix, m_igm, den_knots, sim._dust_curve_sup, sim._wlam_sup]
out = run(*args); out.block_until_ready()
t0 = time.time()
for _ in range(iters):
    out = run(*args)
out.block_until_ready()
dt = (time.time() - t0) / iters
print(f"staged, dev args  : {dt*1e3:8.1f} ms  {B/dt/1e6:.2f} M SEDs/s", flush=True)

# fused variant with device args
if sim._window_mega_supported():
    runf = sim._zsorted_program(sub, w_cols, kc, fused=True)
    out = runf(*args); out.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        out = runf(*args)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"fused,  dev args  : {dt*1e3:8.1f} ms  {B/dt/1e6:.2f} M SEDs/s", flush=True)

# larger sub-chunks with device args
for sub2 in (2048, 4096, 8192):
    plan2 = sim._zsorted_window_plan(z, sub2)
    if plan2 is None:
        print(f"sub={sub2}: window is full table", flush=True); continue
    kc2, w2, k02, l02 = plan2
    run2 = sim._zsorted_program(sub2, w2, kc2, fused=False)
    n2 = B // sub2
    args2 = [jax.device_put(jnp.asarray(th_sorted.reshape(n2, sub2, -1))),
             jax.device_put(jnp.asarray(np.arange(B, dtype=np.int32).reshape(n2, sub2))),
             jax.device_put(jnp.asarray(l02)), jax.device_put(jnp.asarray(k02)),
             t_mix, m_igm, den_knots, sim._dust_curve_sup, sim._wlam_sup]
    out = run2(*args2); out.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        out = run2(*args2)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"staged sub={sub2:5d} kc={kc2:3d} w={w2:5d}: {dt*1e3:8.1f} ms  {B/dt/1e6:.2f} M SEDs/s", flush=True)

# reference: unsorted fused path with device theta
fn = jax.jit(sim.photometry)
thd = jax.device_put(jnp.asarray(theta))
fn(thd).block_until_ready()
t0 = time.time()
for _ in range(iters):
    p = fn(thd)
p.block_until_ready()
dt = (time.time() - t0) / iters
print(f"unsorted fused    : {dt*1e3:8.1f} ms  {B/dt/1e6:.2f} M SEDs/s", flush=True)
