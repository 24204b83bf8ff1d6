"""Pruner A/B: wall time + best objective for no-pruner vs Median vs
SuccessiveHalving vs Hyperband on a real NSF study (1x TPU or CPU).

VERDICT r3 item 10: show the pruner family saves wall time at equal best
objective. Same search space, same seed (same TPE suggestions), same trial
count — only the pruning policy differs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import synference_tpu as st
from synference_tpu.features import FeatureConfig
from synference_tpu.fitter import SBIFitter
from synference_tpu.hpo import (HyperbandPruner, MedianPruner,
                                SuccessiveHalvingPruner, optimize_sbi)


class NoPruner:
    def should_prune(self, step, value, study, trial=None):
        return False


def make_fitter():
    grid = st.make_synthetic_grid(n_ages=32, n_mets=6, n_wav=2048)
    centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
    widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
    filters = st.FilterSet([st.tophat_filter(f"F{i}", c, w)
                            for i, (c, w) in enumerate(zip(centers, widths))])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta", emission=st.EmissionConfig())
    lib = st.LibraryGenerator(sim, {
        "log10_mass": (8.0, 10.5), "redshift": (0.5, 6.0),
        "peak_age": (1e8, 8e8), "tau": (0.2, 1.0),
        "log10_metallicity": (-3.5, -1.8), "tau_v": (0.0, 1.5),
    }).generate(n=20_000, seed=0)
    f = SBIFitter(photometry=lib["photometry"].T,
                  parameters=lib["parameters"].T,
                  parameter_names=lib["parameter_names"],
                  filter_codes=lib["filter_codes"])
    f.create_feature_array(FeatureConfig(
        filter_codes=tuple(f.filter_codes), unit="asinh",
        depths_ab=tuple([29.0] * 7), include_errors=True))
    return f


SPACE = {
    "hidden_features": ("int", 16, 64),
    "num_transforms": ("int", 3, 10),
    "learning_rate": ("float", 1e-5, 1e-2, "log"),
    "batch_size": ("categorical", [512]),
}

fitter = make_fitter()
# warm the compile caches so the A/B times training, not compilation
optimize_sbi(fitter, model_type="nsf", search_space=SPACE, n_trials=1,
             max_epochs=2, verbose=False, seed=99)

N_TRIALS, MAX_EPOCHS = 12, 30
results = {}
for name, pruner in (
    ("none", NoPruner()),
    ("median", MedianPruner(n_startup_trials=2, n_warmup_steps=2)),
    ("sha", SuccessiveHalvingPruner(min_resource=2, reduction_factor=3)),
    ("hyperband", HyperbandPruner(min_resource=2, max_resource=MAX_EPOCHS,
                                  reduction_factor=3)),
):
    t0 = time.time()
    study, best = optimize_sbi(
        fitter, model_type="nsf", search_space=SPACE, n_trials=N_TRIALS,
        pruner=pruner, max_epochs=MAX_EPOCHS, verbose=False, seed=7)
    wall = time.time() - t0
    vals = [t["value"] for t in study.trials
            if t["state"] == "COMPLETE" and t["value"] is not None]
    pruned = sum(t["state"] == "PRUNED" for t in study.trials)
    epochs = sum(len(t.get("intermediate", {})) for t in study.trials)
    results[name] = (wall, min(vals), pruned, epochs)
    print(f"{name:10s}: wall {wall:7.1f} s  best {min(vals):8.4f}  "
          f"pruned {pruned:2d}/{N_TRIALS}  total epochs {epochs}",
          flush=True)

base_wall, base_best = results["none"][0], results["none"][1]
for name, (wall, best_v, _, _) in results.items():
    if name == "none":
        continue
    print(f"{name}: {base_wall/wall:.2f}x faster, best objective "
          f"{best_v - base_best:+.4f} vs no-pruner", flush=True)
