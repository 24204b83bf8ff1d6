"""Stage profile of the z-sorted window body at realistic size (1x v5e):
cumulative timings of weights -> contraction -> dust -> knot matmul ->
interp/den/scale, plus a bf16-contraction A/B.

Round-3's profile showed the UNSORTED fused path ~75% contraction-bound
with the (B, L) slab staged through HBM 3x; the windowed body shrinks L
per sub-chunk — this asks what's left."""
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

B = 65536
SUB = 2048
grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                              lam_min=300.0)
centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                        for i, (c, w) in enumerate(zip(centers, widths))])

rng = np.random.default_rng(0)
theta = np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B),
], axis=1).astype(np.float32)
th_sorted = theta[np.argsort(theta[:, 1], kind="stable")]


def run_stage(sim, stage, label):
    """Duplicate the _zsorted_run_raw body, truncated at `stage`."""
    from synference_tpu.ops.photometry_kernel import _knot_interp

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

    z_all = th_sorted[:, 1]
    span = sim.zsorted_max_span(z_all, SUB)
    kc, w_cols = sim._zsorted_plan(span)
    t_mix, m_igm, den_knots = sim._zsorted_tables()
    plan = sim._zsorted_window_plan(z_all, SUB, kc=kc, w_cols=w_cols)
    kc, w_cols, k0s, l0s = plan
    n_sub = B // SUB

    def body(carry, xs, t_mix, m_igm, den_knots, dust_curve, wlam):
        th, ids, l0, k0 = xs

        def weights_one(row, i):
            p = sim.theta_dict(row)
            p["_row_idx"] = i
            sfzh, _ = sim._sfzh(p)
            zz = p.get("redshift", jnp.asarray(0.0))
            tv = (p[tau_name] if tau_name is not None
                  else jnp.asarray(0.0))
            return sfzh, zz, tv

        sfzh, z, tau_v = jax.vmap(weights_one)(th, ids)
        if stage == 0:
            return carry, jnp.sum(sfzh, axis=1)[:, None] * jnp.ones((1, n_f))
        t_w = jax.lax.dynamic_slice(t_mix, (0, l0), (n_c, w_cols))
        curve_w = jax.lax.dynamic_slice(dust_curve, (l0,), (w_cols,))
        wl_w = jax.lax.dynamic_slice(wlam, (l0,), (w_cols,))
        lnu = jnp.matmul(sfzh.astype(cd), t_w.astype(cd),
                         preferred_element_type=jnp.float32)
        if stage == 1:
            return carry, jnp.sum(lnu, axis=1)[:, None] * jnp.ones((1, n_f))
        att = jnp.exp(-tau_v[:, None] * curve_w[None, :])
        lnu = lnu * (fesc + (1.0 - fesc) * att)
        fw = lnu * wl_w[None, :]
        if stage == 2:
            return carry, jnp.sum(fw, axis=1)[:, None] * jnp.ones((1, n_f))
        m_w = jax.lax.dynamic_slice(m_igm, (l0, k0 * f8), (w_cols, kc * f8))
        num = jnp.matmul(
            fw.astype(mm_dtype), m_w.astype(mm_dtype),
            preferred_element_type=jnp.float32).reshape(SUB, kc, f8)
        if stage == 3:
            return carry, num[:, 0, :n_f]
        s = (jnp.log10(1.0 + jnp.maximum(z, 0.0)) / sim._filter_dlog
             - k0.astype(jnp.float32) * delta)
        den_w = jax.lax.dynamic_slice(den_knots, (k0, 0),
                                      (kc, den_knots.shape[1]))
        num_b = _knot_interp(num, s, kc, delta, order)
        den_b = _knot_interp(den_w, s, kc, delta, order)
        d19 = sim._d19_of_z(z)
        inv_d = 1.0 / d19
        scale = (1.0 + z) * (1.0e-6 / 3.141592653589793 / 4.0) * inv_d * inv_d
        out = (num_b[:, :n_f] / jnp.maximum(den_b[:, :n_f], 1.0e-30)
               * scale[:, None])
        return carry, out

    @jax.jit
    def run(theta_s, ids_s, l0_s, k0_s, t_mix, m_igm, den_knots,
            dust_curve, wlam):
        _, out = jax.lax.scan(
            lambda c, xs: body(c, xs, t_mix, m_igm, den_knots,
                               dust_curve, wlam),
            None, (theta_s, ids_s, l0_s, k0_s))
        return out.reshape(-1, n_f)

    args = [jnp.asarray(th_sorted.reshape(n_sub, SUB, -1)),
            jnp.asarray(np.arange(B, dtype=np.int32).reshape(n_sub, SUB)),
            jnp.asarray(l0s), jnp.asarray(k0s),
            t_mix, m_igm, den_knots, sim._dust_curve_sup, sim._wlam_sup]
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(4):
        out = run(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 4
    print(f"  {label:28s}: {dt*1e3:7.1f} ms  {B/dt/1e6:.2f} M SEDs/s",
          flush=True)
    return dt


for cd_label, cd in (("fp32 contraction", jnp.float32),
                     ("bf16 contraction", jnp.bfloat16)):
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"),
        compute_dtype=cd)
    print(f"{cd_label} (sub={SUB}):", flush=True)
    for stage, label in ((0, "sfzh weights"),
                         (1, "+ contraction"),
                         (2, "+ dust + wlam"),
                         (3, "+ knot matmul"),
                         (4, "full body")):
        run_stage(sim, stage, label)
