"""TPU A/B: compute_dtype fp32 vs bf16 for the SFZH x spectra contraction
at the realistic grid size (VERDICT r2 item 9). Records SEDs/s + parity
vs the fp32 path; the float64-oracle accuracy test is
tests/test_grid_parity.py::TestBf16Contraction.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import synference_tpu as st


def run(compute_dtype, batch=16384, iters=4):
    grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10000, lam_min=300.0)
    centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
    widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
    filters = st.FilterSet(
        [st.tophat_filter(f"F{i}", c, w)
         for i, (c, w) in enumerate(zip(centers, widths))])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"),
        compute_dtype=compute_dtype)
    rng = np.random.default_rng(0)
    theta = jnp.asarray(np.stack([
        rng.uniform(7.5, 11, batch), rng.uniform(0.05, 10, batch),
        rng.uniform(5e7, 1e9, batch), rng.uniform(0.1, 1.2, batch),
        rng.uniform(-3.9, -1.5, batch), rng.uniform(0, 3, batch)], axis=1),
        jnp.float32)
    fn = jax.jit(sim.photometry)
    p0 = fn(theta)
    p0.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        p = fn(theta)
    p.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"  {batch / dt / 1e6:.3f} M SEDs/s  ({dt * 1e3:.2f} ms/batch)",
          flush=True)
    return np.asarray(p0)


print("== realistic 64x12x10000, batch 16384 ==", flush=True)
print(" fp32 contraction:", flush=True)
p32 = run(jnp.float32)
print(" bf16 contraction:", flush=True)
p16 = run(jnp.bfloat16)
rel = np.abs(p16 - p32) / np.maximum(np.abs(p32), 1e-30)
print(f" parity vs fp32: max {rel.max():.3e} median {np.median(rel):.3e}",
      flush=True)
