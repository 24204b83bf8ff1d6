"""Verify drive (round 4b): spectra normalization parity + flux-conserving
resampling + HPO pruner family, driven on the attached TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import synference_tpu as st
from synference_tpu.spectra import (SpectralFeaturePipeline,
                                    generate_constant_r_grid,
                                    resample_spectrum_conserve)

print("devices:", jax.devices(), flush=True)

# flux-conserving resampling on device: sharp line conserved
lam = np.linspace(4000.0, 7000.0, 3001)
flux = np.full_like(lam, 1.0)
flux[np.abs(lam - 5007.0) < 1.5] += 100.0
new_lam = np.linspace(4001.3, 6998.0, 334)
out = np.asarray(resample_spectrum_conserve(new_lam, lam, flux))
w_new = np.gradient(new_lam)
line = ((out - 1.0) * w_new)[np.abs(new_lam - 5007) < 40].sum()
total = np.trapezoid(flux - 1.0, lam)
print(f"line flux conservation: {line/total:.4f}", flush=True)
assert abs(line / total - 1.0) < 0.01

# full spectra pipeline with flux conservation through a simulator
grid = st.make_synthetic_grid(n_ages=16, n_mets=4, n_wav=2048)
sim = st.BatchSEDSimulator(
    grid=grid,
    filters=st.FilterSet([st.tophat_filter("F200W", 20000.0, 4600.0)]),
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig())
rest = np.asarray(grid.lam)
obs = generate_constant_r_grid(r=80, start=6000, end=50000)
pipe = SpectralFeaturePipeline(rest, obs, instrument_r=80.0,
                               flux_conserving=True)
gen = st.LibraryGenerator(sim, {
    "log10_mass": (8.0, 10.0), "redshift": (0.5, 3.0),
    "peak_age": (1e8, 8e8), "tau": (0.2, 1.0),
    "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
}, spectral_pipeline=pipe)
lib = gen.generate(n=256, batch_size=128, want_spectra=True,
                   out_path="/tmp/verify_r4b_spec.h5")
assert np.isfinite(lib["spectra"]).all()
print("spectral library (flux-conserving):", lib["spectra"].shape, flush=True)

# fitter spectra normalization options on the generated library
from synference_tpu.fitter import SBIFitter

fitter = SBIFitter.init_from_hdf5("/tmp/verify_r4b_spec.h5")
assert fitter.wavelengths is not None
for norm in (("tophat", 20000.0, 4000.0), ("bandpass", 12000.0, 30000.0),
             lambda s, w: s.max(axis=1)):
    feats = fitter.create_feature_array_from_raw_spectra(normalize=norm)
    assert np.isfinite(feats).all(), norm
    print(f"spectra features {getattr(norm, '__name__', norm)}: "
          f"{feats.shape}", flush=True)

# HPO pruner family on a tiny real study
from synference_tpu.features import FeatureConfig
from synference_tpu.hpo import (HyperbandPruner, PatientPruner,
                                SuccessiveHalvingPruner, ThresholdPruner,
                                optimize_sbi)

phot_lib = st.LibraryGenerator(sim, {
    "log10_mass": (8.0, 10.0), "redshift": (0.5, 3.0),
    "peak_age": (1e8, 8e8), "tau": (0.2, 1.0),
    "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
}).generate(n=2000, seed=0)
f2 = SBIFitter(photometry=phot_lib["photometry"].T,
               parameters=phot_lib["parameters"].T,
               parameter_names=phot_lib["parameter_names"],
               filter_codes=phot_lib["filter_codes"])
f2.create_feature_array(FeatureConfig(
    filter_codes=tuple(f2.filter_codes), unit="asinh",
    depths_ab=tuple([29.0]), include_errors=False))
for pruner in (SuccessiveHalvingPruner(min_resource=2, reduction_factor=2),
               HyperbandPruner(min_resource=1, max_resource=8),
               PatientPruner(ThresholdPruner(upper=50.0), patience=2)):
    study, best = optimize_sbi(
        f2, model_type="mdn", n_trials=5, pruner=pruner, max_epochs=8,
        verbose=False,
        search_space={"hidden_features": ("int", 8, 32),
                      "num_components": ("int", 2, 4),
                      "learning_rate": ("float", 1e-4, 3e-3, "log"),
                      "batch_size": ("categorical", [256])})
    states = [t["state"] for t in study.trials]
    print(f"{type(pruner).__name__}: states={states} best={best}",
          flush=True)
    assert any(s == "COMPLETE" for s in states)

print("VERIFY R4B DRIVE: ALL OK", flush=True)
