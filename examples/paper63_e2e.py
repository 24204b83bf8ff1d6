"""Paper-scale end-to-end run: the reference paper's 63-filter survey
configuration (VISTA+HSC+MegaCam+Euclid+HST+JWST NIRCam/MIRI+IRAC —
reference examples/library_generation/scripts/final_library_generation.py:39-103)
through the FULL pipeline: realistic-size multi-axis grid file -> 10^5-SED
library (the paper's library size) -> depth-scattered asinh features over
all 63 bands -> NSF NPE -> fused calibration (TARP/PIT).

The generation bench (bench.py paper63_*) only proves the photometry engine
at this filter count; this script proves the feature pipeline, training and
calibration hold up at paper scale too.

Run from anywhere: python examples/paper63_e2e.py [--n 100000]
"""

import argparse
import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import synference_tpu as st
from synference_tpu.features import FeatureConfig
from synference_tpu.train import TrainConfig


def _realistic_grid(cache="/tmp/ns_grid_r3.hdf5"):
    """Same real-layout multi-axis grid asset as examples/north_star.py."""
    from synference_tpu.grids import SPSGrid, make_synthetic_multiaxis_grid

    if not os.path.exists(cache):
        g = make_synthetic_multiaxis_grid(
            n_u=3, n_ages=64, n_mets=12, n_wav=10_000, lam_min=150.0)
        g.to_hdf5(cache + ".tmp")
        os.replace(cache + ".tmp", cache)
    return SPSGrid.from_hdf5(
        cache, fixed_axes={"ionisation_parameter": -2.0})


def _survey_depths(codes):
    """Plausible 5sigma AB depths per facility (the reference applies
    per-band survey depths the same way, sbi_runner.py:580-691)."""
    def depth(code):
        c = code.lower()
        if "nircam" in c:
            return 29.0
        if "miri" in c:
            return 25.5
        if "irac" in c or "spitzer" in c:
            return 24.5
        if "euclid" in c or "vista" in c:
            return 25.0
        if "hst" in c or "acs" in c or "wfc3" in c:
            return 27.5
        return 26.0  # ground-based optical (HSC/MegaCam)
    return tuple(depth(c) for c in codes)


def main(n_library: int, out: str, grid=None, max_epochs: int = 40,
         n_nets: int = 1, stop_after: int = 8):
    t_start = time.time()
    timings = {}

    grid = grid if grid is not None else _realistic_grid()
    from synference_tpu.instruments import load_instrument_filters

    filters = load_instrument_filters()  # all 63 survey curves
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(reprocessed_types=("total",)),
    )
    n_f = len(filters)
    timings["setup_s"] = round(time.time() - t_start, 1)
    print(f"[{timings['setup_s']}s] setup: {n_f} filters, "
          f"grid {grid.n_ages}x{grid.n_mets}x{grid.n_wav}", flush=True)

    t0 = time.time()
    gen = st.LibraryGenerator(sim, {
        "log10_mass": (7.5, 11.0), "redshift": (0.1, 8.0),
        "log10_peak_age": (7.6, 9.2), "tau": (0.1, 1.2),
        "log10_metallicity": (-3.9, -1.6), "tau_v": (0.0, 2.0),
    }, unlog_keys=["log10_peak_age"])
    lib = gen.generate(n=n_library, seed=0)  # auto batch (65536), device-resident z-sorted
    timings["generation_s"] = round(time.time() - t0, 1)
    print(f"[{timings['generation_s']}s] generated {n_library:,} x {n_f} "
          "band fluxes", flush=True)

    t0 = time.time()
    fitter = st.SBIFitter(
        photometry=lib["photometry"].T, parameters=lib["parameters"].T,
        parameter_names=lib["parameter_names"],
        filter_codes=lib["filter_codes"],
    )
    fitter.create_feature_array(FeatureConfig(
        filter_codes=tuple(fitter.filter_codes), unit="asinh",
        depths_ab=_survey_depths(fitter.filter_codes), n_scatters=1,
        include_errors=True,
    ))
    timings["features_s"] = round(time.time() - t0, 1)
    print(f"[{timings['features_s']}s] features {fitter.features.shape}",
          flush=True)

    t0 = time.time()
    res = fitter.run_single_sbi(
        model_type="nsf", hidden_features=69, num_transforms=15,
        n_nets=n_nets,
        train_config=TrainConfig(max_epochs=max_epochs,
                                 stop_after_epochs=stop_after,
                                 batch_size=2048, learning_rate=7e-4),
    )
    timings["training_s"] = round(time.time() - t0, 1)
    print(f"[{timings['training_s']}s] trained NSF 69x15 x{n_nets}: "
          f"{len(res.val_losses)} epochs, best val "
          f"{float(np.min(res.val_losses)):.3f}", flush=True)

    t0 = time.time()
    report = fitter.evaluate_model(n_samples=256, max_objects=512)
    members = (fitter.evaluate_members(n_samples=256, max_objects=512)
               if n_nets > 1 else None)
    timings["evaluation_s"] = round(time.time() - t0, 1)
    timings["total_s"] = round(time.time() - t_start, 1)

    result = {
        "n_library": n_library,
        "n_filters": n_f,
        "feature_dim": int(fitter.features.shape[1]),
        "timings": timings,
        "tarp_deviation": report["tarp_deviation"],
        "pit_ks": [round(v, 4) for v in report["pit_ks"]],
        "mean_log_prob": report["mean_log_prob"],
        "r2": [round(v, 3) for v in report["point"]["r2"]],
    }
    if members is not None:
        # seed-to-seed CIs across the vmapped members (VERDICT r4 item 3)
        result["tarp_ci"] = {k: members["tarp_deviation"][k]
                             for k in ("mean", "std", "ci95", "per_member")}
        result["pit_ks_max_ci"] = {k: members["pit_ks_max"][k]
                                   for k in ("mean", "std", "ci95")}
        result["r2_members_mean"] = members["r2"]["mean"]
        result["r2_members_std"] = members["r2"]["std"]
        result["n_members"] = n_nets
    print(json.dumps(result, indent=2), flush=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"total {timings['total_s']}s "
          f"({'PASS' if result['tarp_deviation'] < 0.05 else 'check'} "
          "TARP within ~1 sigma)", flush=True)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--out", type=str, default="paper63_result.json")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n-nets", type=int, default=1)
    ap.add_argument("--stop-after", type=int, default=8)
    args = ap.parse_args()
    main(args.n, args.out, max_epochs=args.epochs, n_nets=args.n_nets,
         stop_after=args.stop_after)
