"""Speed-of-light analysis of the generation engines.

Counts the MXU FLOPs each photometry engine executes per SED for a given
(simulator, z-draw) configuration and converts measured SEDs/s into a
fraction of the chip's matmul peak — the honest "how much faster could this
possibly get" number behind BASELINE.md.

Stages counted (the two matmuls dominate; VPU elementwise work — dust, IGM
lerp, distance — is bandwidth-trivial beside them):
  1. SFZH x spectra contraction: 2 * (A*Z) * L_touched    [compute dtype]
  2. knot (or conv) photometry matmul: 2 * L_touched * K_touched * F8 [bf16]

Usage: python scripts/roofline.py            # CPU-safe, analysis only
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np

# v5e per-chip peaks (public spec): 394 TFLOP/s bf16, 197 TFLOP/s fp32,
# 819 GB/s HBM
PEAK_BF16 = 394e12
PEAK_FP32 = 197e12
HBM_BW = 819e9


def engine_flops(sim, z_draws, sub_chunk=1024, batch_size=16384):
    """Per-SED matmul FLOPs for the dense fused path and the z-sorted
    window engine, for redshift draws `z_draws`."""
    n_cells = sim.grid.n_ages * sim.grid.cells_per_age
    l_sup = int(sim._wlam_sup.shape[0])
    f8 = int(np.ceil(len(sim.filters) / 8) * 8)
    k = sim._n_knots

    # HBM bytes/SED: the (B, L) rest-frame flux slab is written by the
    # contraction and re-read by the dust/IGM elementwise pass and the knot
    # matmul (~3 L-length touches at fp32); the spectra table and knot
    # matrix stream once per batch/sub-chunk (amortized over its rows)
    dense = {
        "contraction": 2.0 * n_cells * l_sup,
        "knot_matmul": 2.0 * l_sup * k * f8,
        "bytes": 3.0 * l_sup * 4
        + (n_cells * l_sup * 4 + l_sup * k * f8 * 2) / batch_size,
    }

    zs = None
    z_sorted = np.sort(np.asarray(z_draws))
    span = sim.zsorted_max_span(z_sorted, sub_chunk, batch_size)
    kc, w_cols = sim._zsorted_plan(span)
    if kc < k and w_cols < l_sup:
        zs = {
            "contraction": 2.0 * n_cells * w_cols,
            "knot_matmul": 2.0 * w_cols * kc * f8,
            "bytes": 3.0 * w_cols * 4
            + (n_cells * w_cols * 4 + w_cols * kc * f8 * 2) / sub_chunk,
            "kc": kc, "w_cols": w_cols,
        }
    return dense, zs


def report(name, sim, z_draws, measured=None, sub_chunk=1024):
    dense, zs = engine_flops(sim, z_draws, sub_chunk=sub_chunk)
    print(f"\n== {name} ==")
    for label, d in (("dense fused", dense), ("z-sorted window", zs)):
        if d is None:
            print(f"  {label}: window is the whole table (not applicable)")
            continue
        fl_c, fl_k = d["contraction"], d["knot_matmul"]
        t_mxu = fl_c / PEAK_FP32 + fl_k / PEAK_BF16
        t_hbm = d["bytes"] / HBM_BW
        sol = 1.0 / max(t_mxu, t_hbm)
        bound = "HBM" if t_hbm > t_mxu else "MXU"
        extra = (f" (kc={d['kc']}, w_cols={d['w_cols']})"
                 if "kc" in d else "")
        print(f"  {label}{extra}: {fl_c / 1e6:.2f} MF contraction (fp32) + "
              f"{fl_k / 1e6:.2f} MF knots (bf16), "
              f"{d['bytes'] / 1e3:.1f} KB/SED -> "
              f"speed-of-light {sol / 1e6:.1f}M SEDs/s ({bound}-bound)")
        if measured and label in measured:
            m = measured[label]
            print(f"    measured {m / 1e6:.2f}M SEDs/s = "
                  f"{100.0 * m / sol:.0f}% of matmul speed-of-light")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import synference_tpu as st
    from synference_tpu.instruments import load_instrument_filters

    rng = np.random.default_rng(0)
    z = rng.uniform(0.05, 10.0, 65536)
    pn = ("log10_mass", "redshift", "peak_age", "tau",
          "log10_metallicity", "tau_v")

    centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
    widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
    tophats = st.FilterSet([
        st.tophat_filter(f"F{i}", c, w)
        for i, (c, w) in enumerate(zip(centers, widths))])

    sim_h = st.BatchSEDSimulator(
        grid=st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048,
                                    lam_min=300.0),
        filters=tophats, param_names=pn, sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"),
        photometry_backend="pallas", photometry_variant="interp")
    report("headline (48x8x2048, 7 bands)", sim_h, z)

    sim_r = st.BatchSEDSimulator(
        grid=st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                                    lam_min=300.0),
        filters=tophats, param_names=pn, sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"),
        photometry_backend="pallas", photometry_variant="interp")
    report("realistic (64x12x10k, 7 bands)", sim_r, z[:16384])

    sim_p = st.BatchSEDSimulator(
        grid=st.make_synthetic_grid(n_ages=64, n_mets=12, n_wav=10_000,
                                    lam_min=150.0),
        filters=load_instrument_filters(), param_names=pn,
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"),
        photometry_backend="pallas", photometry_variant="conv")
    report("paper-63 (64x12x10k, 63 filters)", sim_p, z[:16384])


if __name__ == "__main__":
    main()
