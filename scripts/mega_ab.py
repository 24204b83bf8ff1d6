import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import synference_tpu as st

def run(batch, n_ages, n_mets, n_wav, mega, iters=8):
    grid = st.make_synthetic_grid(n_ages=n_ages, n_mets=n_mets, n_wav=n_wav, lam_min=300.0)
    centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
    widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
    filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w) for i, (c, w) in enumerate(zip(centers, widths))])
    sim = st.BatchSEDSimulator(grid=grid, filters=filters,
        param_names=("log10_mass","redshift","peak_age","tau","log10_metallicity","tau_v"),
        sfh="lognormal", zdist="delta", emission=st.EmissionConfig(igm="inoue14"))
    if not mega:
        sim._mega_cache = None
    else:
        print("  mega supported:", sim._mega_supported(), flush=True)
    rng = np.random.default_rng(0)
    theta = jnp.asarray(np.stack([
        rng.uniform(7.5, 11, batch), rng.uniform(0.05, 10, batch),
        rng.uniform(5e7, 1e9, batch), rng.uniform(0.1, 1.2, batch),
        rng.uniform(-3.9, -1.5, batch), rng.uniform(0, 3, batch)], axis=1), jnp.float32)
    fn = jax.jit(sim.photometry)
    p0 = fn(theta)
    p0.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        p = fn(theta)
    p.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"  {batch/dt/1e6:.2f} M SEDs/s  ({dt*1e3:.2f} ms/batch)", flush=True)
    return np.asarray(p0)

print("== headline 48x8x2048 batch 65536 ==", flush=True)
print(" ref path:", flush=True)
pr = run(65536, 48, 8, 2048, mega=False)
print(" mega path:", flush=True)
pm = run(65536, 48, 8, 2048, mega=True)
rel = np.abs(pm - pr) / np.maximum(np.abs(pr), 1e-30)
print(f" parity: max {rel.max():.3e} median {np.median(rel):.3e}", flush=True)

print("== realistic 64x12x10000 batch 16384 ==", flush=True)
print(" ref path:", flush=True)
pr2 = run(16384, 64, 12, 10000, mega=False)
print(" mega path:", flush=True)
pm2 = run(16384, 64, 12, 10000, mega=True)
rel2 = np.abs(pm2 - pr2) / np.maximum(np.abs(pr2), 1e-30)
print(f" parity: max {rel2.max():.3e} median {np.median(rel2):.3e}", flush=True)
