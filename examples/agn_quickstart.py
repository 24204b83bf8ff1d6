"""AGN quickstart: Cloudy AGN grid -> mock library -> NPE -> coverage.

The grid-based AGN forward model (disk incident + NLR/BLR reprocessing
with per-region covering fractions — the analogue of the reference's
BlackHole components with Cloudy emission models, reference
library.py:1361-1419) driven end to end: generate an AGN photometry
library, train an NSF NPE on the AGN parameters, and check calibration.
Runs in a few minutes on a TPU chip (or CPU).
"""

import os
import pathlib
import sys

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

# CI runs this at small n (docs/agn.md is the prose walk-through)
N_LIBRARY = int(os.environ.get("SYNFERENCE_AGN_N", 20_000))
MAX_EPOCHS = int(os.environ.get("SYNFERENCE_AGN_EPOCHS", 60))

# -- 1. forward model: Cloudy-layout AGN grid --------------------------------
grid = st.make_synthetic_agn_grid(n_u=6, n_nh=4, n_wav=2048)
centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
codes = ["F090W", "F115W", "F150W", "F200W", "F277W", "F356W", "F444W"]
filters = st.FilterSet(
    [st.tophat_filter(c, ctr, w) for c, ctr, w in zip(codes, centers, widths)]
)
sim = st.AGNGridSimulator(grid, filters)
print("AGN θ:", sim.param_names)

# -- 2. library ---------------------------------------------------------------
gen = st.LibraryGenerator(sim, {
    "log10_l_agn": (43.5, 47.0), "redshift": (0.1, 6.0),
    "ionisation_parameter": (-3.0, 0.0), "hydrogen_density": (2.0, 6.0),
    "covering_fraction_blr": (0.02, 0.3), "covering_fraction_nlr": (0.05, 0.5),
    "tau_v": (0.0, 1.5),
})
gen.generate(n=N_LIBRARY, out_path="agn_library.h5", batch_size=4096)
print("library written: agn_library.h5")

# -- 3. features + training ---------------------------------------------------
fitter = st.SBIFitter.init_from_hdf5("agn_library.h5")
fitter.create_feature_array(FeatureConfig(
    filter_codes=tuple(fitter.filter_codes),
    unit="asinh", depths_ab=(28.5,) * 7, n_scatters=2,
    include_errors=True,
))
res = fitter.run_single_sbi(
    model_type="nsf", hidden_features=50, num_transforms=8,
    train_config=TrainConfig(max_epochs=MAX_EPOCHS, stop_after_epochs=12,
                             batch_size=512, learning_rate=5e-4),
)
print(f"trained: best val loss {float(np.min(res.val_losses)):.3f}")

# -- 4. evaluation -------------------------------------------------------------
report = fitter.evaluate_model(n_samples=256, max_objects=256)
print("TARP deviation:", report["tarp_deviation"])
print("PIT KS per param:", np.round(report["pit_ks"], 3))

# luminosity/redshift recovery on 50 noiseless library rows. (Covering
# fractions and U/n_H are weakly constrained by broadband photometry alone
# — the calibrated posterior correctly returns ≈ the prior for them; add
# emission-line features for line-region constraints.)
mock_obs = fitter.photometry[:50]
table = st.fit_catalogue(fitter, mock_obs, 0.05 * mock_obs, "nJy",
                         n_samples=500, ood_methods=("mahalanobis",))
for p in ("log10_l_agn", "redshift"):
    q50 = table[f"{p}_q50"]
    truth = fitter.parameters[:50][:, fitter.parameter_names.index(p)]
    print(f"{p} recovery r = {np.corrcoef(q50, truth)[0, 1]:.3f}")

fitter.save_state("agn_model.pkl")
print("model saved: agn_model.pkl")
