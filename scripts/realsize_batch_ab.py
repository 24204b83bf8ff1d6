"""Realistic-size fused path vs batch size: how much of the ~10 ms/call
is axon tunnel dispatch floor (measured with an empty jit) vs compute, and
does a larger batch amortize it?
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os, time  # noqa: E401
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import synference_tpu as st  # noqa: E402

grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000)
centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(igm="inoue14"))
print("engine:", sim._pallas_variant, "support", sim._lam_support, flush=True)


@jax.jit
def empty(x):
    return x + 1.0


tiny = jnp.zeros((8,), jnp.float32)
empty(tiny).block_until_ready()
t0 = time.time()
for _ in range(20):
    o = empty(tiny)
o.block_until_ready()
print(f"empty-jit dispatch floor: {(time.time()-t0)/20*1e3:.2f} ms/call",
      flush=True)

fn = jax.jit(sim.photometry)
rng = np.random.default_rng(0)
for B in (16384, 32768, 65536):
    theta = jnp.asarray(np.stack([
        rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
        rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
        rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B)], 1), jnp.float32)
    fn(theta).block_until_ready()
    iters = 6
    t0 = time.time()
    for _ in range(iters):
        p = fn(theta)
    p.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"B={B:6d}  {dt*1e3:8.1f} ms  {B/dt/1e6:6.2f} M SEDs/s", flush=True)
