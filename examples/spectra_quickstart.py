"""Spectroscopic SBI quickstart: prism-like R~100 spectra → NPE posteriors.

The reference's spectral path (`create_feature_array_from_raw_spectra`,
`/root/reference/src/synference/sbi_runner.py:1180-1428`) resamples library
spectra onto a constant-R instrument grid with numba Gaussian LSF matching;
here the whole chain — mock spectra, LSF kernel-bank matching, instrument
resampling, embedding-net NPE — runs as jitted batch programs.

Run from anywhere: python examples/spectra_quickstart.py
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

if "--cpu" in sys.argv:  # force the host platform (the axon TPU plugin
    jax.config.update("jax_platforms", "cpu")  # ignores JAX_PLATFORMS)

import numpy as np

import synference_tpu as st
from synference_tpu.diagnostics import evaluate_posterior
from synference_tpu.posterior import DirectPosterior
from synference_tpu.priors import priors_from_library
from synference_tpu.spectra import (SpectralFeaturePipeline,
                                    generate_constant_r_grid)
from synference_tpu.train import TrainConfig, train_npe


# CI runs this at small n (docs/spectra.md is the prose walk-through)
N_LIBRARY = int(os.environ.get("SYNFERENCE_SPECTRA_N", 30_000))
MAX_EPOCHS = int(os.environ.get("SYNFERENCE_SPECTRA_EPOCHS", 25))


def main(n_library: int = N_LIBRARY):
    t0 = time.time()
    grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
    filters = st.FilterSet([st.tophat_filter("F200W", 20000.0, 4600.0)])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta", emission=st.EmissionConfig(),
    )
    # NIRSpec-prism-like instrument grid: R≈100 over 0.6-5.3 µm
    obs_lam = generate_constant_r_grid(r=100, start=6000.0, end=53000.0)
    pipe = SpectralFeaturePipeline(
        rest_lam=grid.lam, obs_lam=obs_lam, instrument_r=100.0,
        norm_window=(20000.0, 30000.0))

    gen = st.LibraryGenerator(sim, {
        "log10_mass": (8.0, 11.0), "redshift": (0.5, 6.0),
        "log10_peak_age": (7.8, 9.2), "tau": (0.1, 1.0),
        "log10_metallicity": (-3.5, -1.8), "tau_v": (0.0, 1.5),
    }, unlog_keys=["log10_peak_age"], spectral_pipeline=pipe)
    lib = gen.generate(n=n_library, batch_size=8192, want_spectra=True)
    spectra = lib["spectra"].T  # (N, n_pix)
    theta = lib["parameters"].T
    print(f"[{time.time()-t0:.0f}s] {n_library:,} spectra on "
          f"{spectra.shape[1]} prism pixels", flush=True)

    # noise + train an embedding-net NSF on the pixel vector
    rng = np.random.default_rng(0)
    x = spectra + 0.02 * np.abs(spectra) * rng.standard_normal(spectra.shape)
    x = np.log10(np.maximum(x, 1e-12)).astype(np.float32)
    good = np.isfinite(x).all(axis=1)
    x, theta = x[good], theta[good].astype(np.float32)

    from synference_tpu.flows import build_flow

    flow = build_flow("nsf", theta_dim=theta.shape[1],
                      context_dim=x.shape[1], hidden_features=64,
                      num_transforms=8, embedding_dim=32,
                      embedding_hidden=128)
    n_test = 512
    res = train_npe(flow, theta[:-n_test], x[:-n_test],
                    jax.random.PRNGKey(1),
                    TrainConfig(max_epochs=MAX_EPOCHS, stop_after_epochs=5,
                                batch_size=512))
    print(f"[{time.time()-t0:.0f}s] trained: best val "
          f"{float(np.min(res.val_losses)):.2f}", flush=True)

    prior = priors_from_library(theta, ("log10_mass", "redshift", "peak_age",
                                        "tau", "log10_metallicity", "tau_v"))
    post = DirectPosterior(flow, res.params, prior)
    report = evaluate_posterior(post, x[-n_test:], theta[-n_test:],
                                n_samples=128)
    print(f"[{time.time()-t0:.0f}s] TARP {report['tarp_deviation']:.3f} "
          f"PIT-KS max {max(report['pit_ks']):.3f} "
          f"z-R2 {report['point']['r2'][1]:.3f}", flush=True)
    if n_library >= 20_000:  # calibration band only meaningful at scale
        assert report["tarp_deviation"] < 0.1
    print("SPECTRA_QUICKSTART_PASS", flush=True)


if __name__ == "__main__":
    main()
