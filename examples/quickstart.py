"""Quickstart: mock library -> NSF NPE -> coverage -> catalogue fit.

The reference README's Getting Started flow (10k-galaxy library, 7 NIRCam
widebands, lognormal SFH, LHC priors, NPE training), end to end on whatever
device JAX finds. Runs in ~2 minutes on a TPU chip.

Size knobs (CI executes this with small values — the reference executes
its docs notebooks via nbmake, pyproject.toml:73):
    SYNFERENCE_QUICKSTART_N       library size (default 10000)
    SYNFERENCE_QUICKSTART_EPOCHS  max training epochs (default 60)
"""

import os
import pathlib
import sys

N_LIBRARY = int(os.environ.get("SYNFERENCE_QUICKSTART_N", 10_000))
MAX_EPOCHS = int(os.environ.get("SYNFERENCE_QUICKSTART_EPOCHS", 60))

# persistent compile cache: repeat runs skip the multi-minute tunnel compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

if "--cpu" in sys.argv:  # force the host platform (the axon TPU plugin
    jax.config.update("jax_platforms", "cpu")  # ignores JAX_PLATFORMS)

import numpy as np

import synference_tpu as st
from synference_tpu.features import FeatureConfig
from synference_tpu.train import TrainConfig

# -- 1. forward model -------------------------------------------------------
grid = st.make_synthetic_grid(n_ages=48, n_mets=8, n_wav=2048)
centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
codes = ["F090W", "F115W", "F150W", "F200W", "F277W", "F356W", "F444W"]
filters = st.FilterSet(
    [st.tophat_filter(c, ctr, w) for c, ctr, w in zip(codes, centers, widths)]
)
sim = st.BatchSEDSimulator(
    grid=grid, filters=filters,
    param_names=("log10_mass", "redshift", "peak_age", "tau",
                 "log10_metallicity", "tau_v"),
    sfh="lognormal", zdist="delta", emission=st.EmissionConfig(),
)

# -- 2. library -------------------------------------------------------------
gen = st.LibraryGenerator(sim, {
    "log10_mass": (7.5, 11.0), "redshift": (0.1, 8.0),
    "log10_peak_age": (7.6, 9.2), "tau": (0.1, 1.2),
    "log10_metallicity": (-3.9, -1.6), "tau_v": (0.0, 2.0),
}, unlog_keys=["log10_peak_age"],
   supplementary=("m_uv", "sfr_100", "mass_weighted_age", "t50"))
gen.generate(n=N_LIBRARY, out_path="quickstart_library.h5",
             batch_size=min(4096, N_LIBRARY))
print("library written: quickstart_library.h5")

# -- 3. features + training -------------------------------------------------
fitter = st.SBIFitter.init_from_hdf5("quickstart_library.h5")
fitter.create_feature_array(FeatureConfig(
    filter_codes=tuple(fitter.filter_codes),
    unit="asinh", depths_ab=(29.0,) * 7, n_scatters=2,
    include_errors=True,
))
res = fitter.run_single_sbi(
    model_type="nsf", hidden_features=50, num_transforms=8,
    train_config=TrainConfig(max_epochs=MAX_EPOCHS, stop_after_epochs=12,
                             batch_size=512, learning_rate=5e-4),
)
print(f"trained: best val loss {float(np.min(res.val_losses)):.3f}")

# -- 4. evaluation + catalogue fit ------------------------------------------
report = fitter.evaluate_model(n_samples=256, max_objects=256)
print("TARP deviation:", report["tarp_deviation"])
print("PIT KS per param:", np.round(report["pit_ks"], 3))

# fit 50 noiseless library SEDs as a mock catalogue (raw rows, not the
# scatter-duplicated feature rows)
mock_obs = fitter.photometry[:50]
table = st.fit_catalogue(fitter, mock_obs, 0.05 * mock_obs, "nJy",
                         n_samples=500, ood_methods=("mahalanobis",))
z50 = table["redshift_q50"]
z_true = fitter.parameters[:50][:, fitter.parameter_names.index("redshift")]
print("redshift recovery r =", np.corrcoef(z50, z_true)[0, 1].round(3))

fitter.save_state("quickstart_model.pkl")
print("model saved: quickstart_model.pkl")
