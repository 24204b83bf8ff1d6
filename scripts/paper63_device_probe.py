"""Paper-63 + realsize through the device-resident z-sorted engine:
sub-chunk sweep + fused megakernel body A/B (1x v5e)."""
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
from synference_tpu.instruments import load_instrument_filters

B = 65536
rng = np.random.default_rng(0)


def bench(sim, theta_sorted, sub, fused):
    th_dev = jnp.asarray(theta_sorted)
    span = sim.zsorted_max_span(theta_sorted[:, 1], sub)
    kc, w_cols = sim._zsorted_plan(span)
    kw = dict(sub_chunk=sub, kc=kc, w_cols=w_cols, fused=fused)
    try:
        out = sim.photometry_zsorted_device(th_dev, **kw)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"  sub={sub} fused={fused}: FAILED {type(e).__name__}",
              flush=True)
        return
    t0 = time.time()
    for _ in range(4):
        out = sim.photometry_zsorted_device(th_dev, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 4
    print(f"  sub={sub:5d} kc={kc:3d} w={w_cols:5d} fused={int(fused)}: "
          f"{dt*1e3:7.1f} ms  {B/dt/1e6:.2f} M SEDs/s", flush=True)


for label, filters, lam_min in (
    ("realsize-7band", None, 300.0),
    ("paper63", load_instrument_filters(), 150.0),
):
    grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                                  lam_min=lam_min)
    if filters is None:
        centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
        widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
        filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                                for i, (c, w) in
                                enumerate(zip(centers, widths))])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    theta = np.stack([
        rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
        rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
        rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B),
    ], axis=1).astype(np.float32)
    th_sorted = theta[np.argsort(theta[:, 1], kind="stable")]
    print(f"{label}: engine={sim._pallas_variant} "
          f"support={sim._lam_support}", flush=True)
    for sub in (1024, 2048, 4096):
        bench(sim, th_sorted, sub, fused=False)
    if sim._window_mega_supported():
        for sub in (1024, 2048):
            bench(sim, th_sorted, sub, fused=True)
