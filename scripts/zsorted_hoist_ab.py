"""A/B: z-sorted window body with weights computed IN-SCAN (current engine)
vs HOISTED (one whole-batch vmapped weight kernel feeding the scan).

The weights micro-probe showed the batched weight compute is ~1.5 ms at
B=65536 (after the ~3.4 ms dispatch floor), yet stage-0 of the scan engine
costs 8.1 ms — the scan serializes 32 small weight kernels. Hoisting pays a
(B, A*Z) fp32 slab (~200 MB) of HBM traffic to fuse them into one."""
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
from synference_tpu.ops.photometry_kernel import _knot_interp

B = 65536
SUB = 2048
grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                              lam_min=300.0)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta",
    emission=st.EmissionConfig(igm="inoue14"))

rng = np.random.default_rng(0)
theta = np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B),
], axis=1).astype(np.float32)
th_sorted = jnp.asarray(theta[np.argsort(theta[:, 1], kind="stable")])

em = sim.emission
fesc = float(em.fesc)
n_c = sim.grid.n_ages * sim.grid.cells_per_age
f8 = int(np.ceil(len(sim.filters) / 8) * 8)
n_f = len(sim.filters)
delta = sim._knot_delta
order = sim._interp_order
mm_dtype = sim._knot_matmul_dtype
cd = sim.compute_dtype
tau_name = em.tau_v_param

z_np = np.asarray(th_sorted[:, 1])
span = sim.zsorted_max_span(z_np, SUB)
kc, w_cols = sim._zsorted_plan(span)
t_mix, m_igm, den_knots = sim._zsorted_tables()
kc, w_cols, k0s, l0s = sim._zsorted_window_plan(z_np, SUB, kc=kc,
                                                w_cols=w_cols)
n_sub = B // SUB
print(f"kc={kc} w_cols={w_cols} n_sub={n_sub}", flush=True)


def weights_one(row, i):
    p = sim.theta_dict(row)
    p["_row_idx"] = i
    sfzh, _ = sim._sfzh(p)
    zz = p.get("redshift", jnp.asarray(0.0))
    tv = p[tau_name] if tau_name is not None else jnp.asarray(0.0)
    return sfzh, zz, tv


def window_tail(sfzh, z, tau_v, l0, k0, t_mix, m_igm, den_knots,
                dust_curve, wlam, early_cast=False):
    t_w = jax.lax.dynamic_slice(t_mix, (0, l0), (n_c, w_cols))
    curve_w = jax.lax.dynamic_slice(dust_curve, (l0,), (w_cols,))
    wl_w = jax.lax.dynamic_slice(wlam, (l0,), (w_cols,))
    m_w = jax.lax.dynamic_slice(m_igm, (l0, k0 * f8), (w_cols, kc * f8))
    s = (jnp.log10(1.0 + jnp.maximum(z, 0.0)) / sim._filter_dlog
         - k0.astype(jnp.float32) * delta)
    den_w = jax.lax.dynamic_slice(den_knots, (k0, 0),
                                  (kc, den_knots.shape[1]))
    lnu = jnp.matmul(sfzh.astype(cd), t_w.astype(cd),
                     preferred_element_type=jnp.float32)
    att = jnp.exp(-tau_v[:, None] * curve_w[None, :])
    if em.reprocessed_types:
        lnu = lnu * att
    else:
        lnu = lnu * (fesc + (1.0 - fesc) * att)
    fw = lnu * wl_w[None, :]
    if early_cast:
        # same single fp32->bf16 rounding as fw.astype below, but staged
        # through HBM at half width if XLA doesn't fuse the two matmuls
        fw = fw.astype(mm_dtype)
    num = jnp.matmul(fw.astype(mm_dtype), m_w.astype(mm_dtype),
                     preferred_element_type=jnp.float32
                     ).reshape(SUB, kc, f8)
    num_b = _knot_interp(num, s, kc, delta, order)
    den_b = _knot_interp(den_w, s, kc, delta, order)
    d19 = sim._d19_of_z(z)
    inv_d = 1.0 / d19
    scale = (1.0 + z) * (1.0e-6 / np.pi / 4.0) * inv_d * inv_d
    return (num_b[:, :n_f] / jnp.maximum(den_b[:, :n_f], 1.0e-30)
            * scale[:, None])


@jax.jit
def run_inscan(theta_s, ids_s, l0_s, k0_s, t_mix, m_igm, den_knots,
               dust_curve, wlam):
    def body(c, xs):
        th, ids, l0, k0 = xs
        sfzh, z, tau_v = jax.vmap(weights_one)(th, ids)
        return c, window_tail(sfzh, z, tau_v, l0, k0, t_mix, m_igm,
                              den_knots, dust_curve, wlam)
    _, out = jax.lax.scan(body, None, (theta_s, ids_s, l0_s, k0_s))
    return out.reshape(-1, n_f)


@jax.jit
def run_inscan_earlycast(theta_s, ids_s, l0_s, k0_s, t_mix, m_igm,
                         den_knots, dust_curve, wlam):
    def body(c, xs):
        th, ids, l0, k0 = xs
        sfzh, z, tau_v = jax.vmap(weights_one)(th, ids)
        return c, window_tail(sfzh, z, tau_v, l0, k0, t_mix, m_igm,
                              den_knots, dust_curve, wlam, early_cast=True)
    _, out = jax.lax.scan(body, None, (theta_s, ids_s, l0_s, k0_s))
    return out.reshape(-1, n_f)


@jax.jit
def run_hoisted(theta_s, ids_s, l0_s, k0_s, t_mix, m_igm, den_knots,
                dust_curve, wlam):
    th_flat = theta_s.reshape(-1, theta_s.shape[-1])
    ids_flat = ids_s.reshape(-1)
    sfzh_all, z_all, tv_all = jax.vmap(weights_one)(th_flat, ids_flat)
    sfzh_s = sfzh_all.reshape(n_sub, SUB, -1)
    z_s = z_all.reshape(n_sub, SUB)
    tv_s = tv_all.reshape(n_sub, SUB)

    def body(c, xs):
        sfzh, z, tau_v, l0, k0 = xs
        return c, window_tail(sfzh, z, tau_v, l0, k0, t_mix, m_igm,
                              den_knots, dust_curve, wlam)
    _, out = jax.lax.scan(body, None, (sfzh_s, z_s, tv_s, l0_s, k0_s))
    return out.reshape(-1, n_f)


args = [jnp.asarray(np.asarray(th_sorted).reshape(n_sub, SUB, -1)),
        jnp.asarray(np.arange(B, dtype=np.int32).reshape(n_sub, SUB)),
        jnp.asarray(l0s), jnp.asarray(k0s),
        t_mix, m_igm, den_knots, sim._dust_curve_sup, sim._wlam_sup]

for label, fn in (("in-scan (current)", run_inscan),
                  ("in-scan, early bf16 fw", run_inscan_earlycast),
                  ("hoisted weights", run_hoisted)):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(6):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 6
    print(f"  {label:22s}: {dt*1e3:7.1f} ms  {B/dt/1e6:.2f} M SEDs/s",
          flush=True)

ref = run_inscan(*args)
new = run_hoisted(*args)
rel = np.abs(np.asarray(new) - np.asarray(ref)) / np.maximum(
    np.abs(np.asarray(ref)), 1e-30)
print(f"  max rel diff vs in-scan: {rel.max():.2e}", flush=True)
