"""Bisect the paper-63 conv path: where did the conv-fused regression go?"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
sys.path.insert(0, "/root/repo")
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import synference_tpu as st  # noqa: E402
from synference_tpu.instruments import load_instrument_filters  # noqa: E402

PN = ("log10_mass", "redshift", "peak_age", "tau",
      "log10_metallicity", "tau_v")
B = 16384
rng = np.random.default_rng(0)
theta = jnp.asarray(np.stack([
    rng.uniform(7.5, 11, B), rng.uniform(0.05, 10, B),
    rng.uniform(5e7, 1e9, B), rng.uniform(0.1, 1.2, B),
    rng.uniform(-3.9, -1.5, B), rng.uniform(0, 3, B)], axis=1), jnp.float32)

grid = st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10000,
                              lam_min=150.0)
filt = load_instrument_filters()
sim = st.BatchSEDSimulator(
    grid=grid, filters=filt, param_names=PN, sfh="lognormal",
    zdist="delta", emission=st.EmissionConfig(igm="inoue14"),
    photometry_backend="pallas")
print("variant:", sim._pallas_variant, "support:", sim._lam_support,
      flush=True)


def timeit(fn, *args, label="", iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms ({B/dt/1e3:.0f}k/s)", flush=True)
    return out


# (a) old non-fused path end to end
sim._fused_off = True
timeit(jax.jit(sim.photometry), theta, label="old nonfused e2e")
sim._fused_off = False

# (b) new fused path end to end
timeit(jax.jit(sim.photometry), theta, label="new fused e2e")


# (c) trimmed lnu production only (vmapped _core fused)
@jax.jit
def lnu_only(t):
    rows = jnp.arange(t.shape[0], dtype=jnp.int32)
    res = jax.vmap(lambda r, i: sim._core(r, False, fused=True, row_idx=i)
                   )(t, rows)
    return res["_lnu"], res["_z"]


lnu, z = timeit(lnu_only, theta, label="lnu (trimmed contraction)")

# (d) fused photometry stage alone from precomputed lnu
timeit(jax.jit(sim._photometry_fused), lnu, z, label="conv fused phot stage")


# (e) the conv num matmul alone (no igm/den/interp)
from synference_tpu.ops.photometry_kernel import conv_photometry_num  # noqa: E402

s = jnp.log10(1.0 + jnp.maximum(z, 0.0)) / sim._filter_dlog
fw = lnu * sim._wlam_sup


@jax.jit
def num_only(fw_, s_):
    return conv_photometry_num(fw_, sim._filter_table, sim._n_knots, s_,
                               delta=sim._knot_delta,
                               l_offset=sim._lam_support[0])


timeit(num_only, fw, s, label="conv num matmul+interp")


# (f) igm batched lerp alone
@jax.jit
def igm_only(z_):
    return jax.vmap(lambda zp: sim._igm_transmission(
        zp, sim._igm_table_sup))(1.0 + z_)


timeit(igm_only, z, label="igm batch lerp")

# (g) windowed engine tuning sweep: chunk_knots x group_filters
import functools  # noqa: E402

for ck in (16, 32, 52):
    for gf in (8, 16):
        f_n = jax.jit(functools.partial(
            conv_photometry_num, n_knots=sim._n_knots,
            delta=sim._knot_delta, l_offset=sim._lam_support[0],
            chunk_knots=ck, group_filters=gf,
            filter_cols=sim._filter_cols))
        try:
            timeit(lambda fw_, s_: f_n(fw_, sim._filter_table, s=s_),
                   fw, s, label=f"windowed ck={ck} gf={gf}")
        except Exception as e:  # noqa: BLE001
            print(f"windowed ck={ck} gf={gf}: FAILED {e}", flush=True)
# dense engine for comparison
f_d = jax.jit(functools.partial(
    conv_photometry_num, n_knots=sim._n_knots, delta=sim._knot_delta,
    l_offset=sim._lam_support[0]))
timeit(lambda fw_, s_: f_d(fw_, sim._filter_table, s=s_), fw, s,
       label="dense conv num")
print("DONE", flush=True)
