"""Paper-scale (63-filter) engines vs batch size — same dispatch-floor
amortization question as realsize_batch_ab.py, for the conv engine and the
z-sorted window engine (whose per-sub-chunk dispatches hurt most).
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
from synference_tpu.instruments import load_instrument_filters  # noqa: E402

grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                              lam_min=150.0)
sim = st.BatchSEDSimulator(
    grid=grid, filters=load_instrument_filters(),
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(igm="inoue14"))
print("engine:", sim._pallas_variant, "support", sim._lam_support, flush=True)

rng = np.random.default_rng(0)
fn = jax.jit(sim.photometry)
for B in (16384, 32768, 65536):
    theta = jnp.asarray(np.stack([
        rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
        rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
        rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B)], 1), jnp.float32)
    fn(theta).block_until_ready()
    iters = 4
    t0 = time.time()
    for _ in range(iters):
        p = fn(theta)
    p.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"conv      B={B:6d}  {dt*1e3:8.1f} ms  {B/dt/1e3:7.0f} k SEDs/s",
          flush=True)
    # z-sorted fused window engine at matching batch; the SAME sub_chunk
    # grid is swept at every batch size (so per-batch sub-chunk count, and
    # with it the scan length, grows with B/sub — window tightness vs scan
    # overhead is what the sweep measures)
    th_np = np.asarray(theta)
    th_sorted = th_np[np.argsort(th_np[:, 1], kind="stable")]
    for sub in (1024, 2048, 4096):
        try:
            np.asarray(sim.photometry_zsorted(th_sorted, sub_chunk=sub,
                                              fused=True))
            t0 = time.time()
            for _ in range(iters):
                p = sim.photometry_zsorted(th_sorted, sub_chunk=sub,
                                           fused=True)
            jax.block_until_ready(p)
            dt = (time.time() - t0) / iters
            print(f"zs-fused  B={B:6d} sub={sub:5d}  {dt*1e3:8.1f} ms  "
                  f"{B/dt/1e3:7.0f} k SEDs/s", flush=True)
        except Exception as e:
            print(f"zs-fused  B={B} sub={sub} skipped: {type(e).__name__}",
                  flush=True)
