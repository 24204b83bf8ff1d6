"""Debug the paper63 e2e miscalibration: TARP 0.41, R2(z) = -130.

Reproduce at n=100k and print: feature sanity, flow support state, raw
sample ranges vs the prior box, per-param truth/median scatter."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import synference_tpu as st
from synference_tpu.features import FeatureConfig
from synference_tpu.train import TrainConfig

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))
from paper63_e2e import _realistic_grid, _survey_depths  # noqa: E402

grid = _realistic_grid()
from synference_tpu.instruments import load_instrument_filters  # noqa: E402

filters = load_instrument_filters()
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta",
    emission=st.EmissionConfig(reprocessed_types=("total",)),
)
gen = st.LibraryGenerator(sim, {
    "log10_mass": (7.5, 11.0), "redshift": (0.1, 8.0),
    "log10_peak_age": (7.6, 9.2), "tau": (0.1, 1.2),
    "log10_metallicity": (-3.9, -1.6), "tau_v": (0.0, 2.0),
}, unlog_keys=["log10_peak_age"])
lib = gen.generate(n=100_000, batch_size=16384, seed=0)
print("parameter_names:", lib["parameter_names"], flush=True)
P = lib["parameters"]
for i, nm in enumerate(lib["parameter_names"]):
    print(f"  theta[{i}] {nm:20s} min {P[i].min():.4g} max {P[i].max():.4g}",
          flush=True)
phot = lib["photometry"]
print("photometry finite:", np.isfinite(phot).all(),
      "min", phot.min(), "max", phot.max(), flush=True)

fitter = st.SBIFitter(
    photometry=phot.T, parameters=P.T,
    parameter_names=lib["parameter_names"],
    filter_codes=lib["filter_codes"],
)
fitter.create_feature_array(FeatureConfig(
    filter_codes=tuple(fitter.filter_codes), unit="asinh",
    depths_ab=_survey_depths(fitter.filter_codes), n_scatters=1,
    include_errors=True,
))
F = np.asarray(fitter.features)
print("features finite:", np.isfinite(F).all(), "shape", F.shape, flush=True)
print("feature col ranges: min", F.min(axis=0)[:8], "...", flush=True)
print("feature col maxes :", F.max(axis=0)[:8], "...", flush=True)
print("feature global min/max:", F.min(), F.max(), flush=True)

res = fitter.run_single_sbi(
    model_type="nsf", hidden_features=69, num_transforms=15,
    train_config=TrainConfig(max_epochs=12, stop_after_epochs=6,
                             batch_size=2048, learning_rate=7e-4),
)
print("val losses:", [round(float(v), 3) for v in res.val_losses], flush=True)
print("flow._support:", fitter.flow._support is not None, flush=True)
if fitter.flow._support is not None:
    lo, hi = fitter.flow._support
    print("  support lo:", np.asarray(lo), flush=True)
    print("  support hi:", np.asarray(hi), flush=True)
print("prior low :", np.asarray(fitter.prior.low), flush=True)
print("prior high:", np.asarray(fitter.prior.high), flush=True)

idx = fitter._split["test"][:256]
xs = fitter.features[idx]
truths = np.asarray(fitter.feature_params[idx])
samples = np.asarray(fitter.posterior.sample_batch(
    jax.random.PRNGKey(3), jnp.asarray(xs), 128))
print("samples shape:", samples.shape, "finite:",
      np.isfinite(samples).all(), flush=True)
for i, nm in enumerate(fitter.parameter_names):
    med = np.median(samples[:, :, i], axis=1)
    tr = truths[:, i]
    mse = float(np.mean((med - tr) ** 2))
    var = float(np.var(tr))
    print(f"  {nm:20s} samp[{samples[:, :, i].min():.4g},"
          f"{samples[:, :, i].max():.4g}] truth[{tr.min():.4g},{tr.max():.4g}]"
          f" r2 {1 - mse / max(var, 1e-12):+.3f}", flush=True)
rep = fitter.evaluate_model(n_samples=128, max_objects=256)
print("tarp:", rep["tarp_deviation"], "pit_ks:", rep["pit_ks"], flush=True)
print("r2:", rep["point"]["r2"], flush=True)
