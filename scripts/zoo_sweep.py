"""Train every flow-zoo family on one mock library; report quality + speed.

Produces the model-zoo validation table (val log-prob, TARP deviation,
train wall time) recorded in BASELINE.md. Run on the TPU:
    timeout 3000 python scripts/zoo_sweep.py > /tmp/zoo_sweep.txt 2>&1
"""

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

import synference_tpu as st
from synference_tpu.diagnostics import evaluate_posterior
from synference_tpu.flows import build_flow
from synference_tpu.posterior import DirectPosterior
from synference_tpu.priors import priors_from_library
from synference_tpu.train import TrainConfig, train_npe

MODELS = {
    "nsf": dict(hidden_features=50, num_transforms=8),
    "maf": dict(hidden_features=50, num_transforms=8),
    "mdn": dict(hidden_features=64, num_components=8),
    "gaussian": dict(hidden_features=64),
    "made": dict(hidden_features=64),
    "realnvp": dict(hidden_features=50, num_transforms=8),
    "nice": dict(hidden_features=50, num_transforms=8),
    "ncsf": dict(hidden_features=50, num_transforms=8),
    "naf": dict(hidden_features=40, num_transforms=3),
    "unaf": dict(hidden_features=40, num_transforms=3),
    "sospf": dict(hidden_features=40, num_transforms=3),
    "gf": dict(hidden_features=40, num_transforms=4),
    "cnf": dict(hidden_features=64, num_steps=12),
}


def main(n_library: int = 40000):
    grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
    centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
    widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
    filters = st.FilterSet([
        st.tophat_filter(f"F{i}", c, w)
        for i, (c, w) in enumerate(zip(centers, widths))])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta", emission=st.EmissionConfig())
    gen = st.LibraryGenerator(sim, {
        "log10_mass": (7.5, 11.0), "redshift": (0.1, 8.0),
        "log10_peak_age": (7.6, 9.2), "tau": (0.1, 1.2),
        "log10_metallicity": (-3.9, -1.6), "tau_v": (0.0, 2.0),
    }, unlog_keys=["log10_peak_age"])
    lib = gen.generate(n=n_library, batch_size=16384)
    theta = lib["parameters"].T.astype(np.float32)
    phot = lib["photometry"].T
    rng = np.random.default_rng(0)
    x = phot * (1.0 + 0.05 * rng.standard_normal(phot.shape))
    x = np.arcsinh(x / 20.0).astype(np.float32)
    good = np.isfinite(x).all(axis=1)
    theta, x = theta[good], x[good]
    n_test = 512
    prior = priors_from_library(theta, sim.param_names)

    rows = []
    for name, cfg in MODELS.items():
        t0 = time.time()
        try:
            flow = build_flow(name, theta_dim=6, context_dim=7, **cfg)
            res = train_npe(
                flow, theta[:-n_test], x[:-n_test], jax.random.PRNGKey(2),
                TrainConfig(max_epochs=25, stop_after_epochs=5,
                            batch_size=512))
            post = DirectPosterior(flow, res.params, prior)
            report = evaluate_posterior(
                post, x[-n_test:], theta[-n_test:], n_samples=128,
                key=jax.random.PRNGKey(3))
            rows.append({
                "model": name,
                "best_val_loss": float(np.min(res.val_losses)),
                "tarp_deviation": float(report["tarp_deviation"]),
                "pit_ks_max": float(max(report["pit_ks"])),
                "train_s": round(time.time() - t0, 1),
                "epochs": int(len(res.val_losses)),
            })
        except Exception as e:  # keep sweeping; report the failure
            rows.append({"model": name, "error": repr(e)[:200],
                         "train_s": round(time.time() - t0, 1)})
        print(json.dumps(rows[-1]), flush=True)

    print("SWEEP_DONE", flush=True)
    with open("/tmp/zoo_sweep_results.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
