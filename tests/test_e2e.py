"""Full end-to-end pipeline test: LHC prior -> mock library -> features ->
NSF NPE training -> posterior sampling -> coverage. The analogue of the
reference's `TestFullPipeline.test_full_lhc` (tests/test_sbi.py:130-162)."""

import jax
import numpy as np
import pytest

from synference_tpu.features import FeatureConfig
from synference_tpu.fitter import SBIFitter
from synference_tpu.library import LibraryGenerator
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig
from synference_tpu.train import TrainConfig

PARAM_RANGES = {
    "log10_mass": (8.0, 10.5),
    "redshift": (0.5, 6.0),
    "log10_peak_age": (7.8, 8.9),
    "tau": (0.2, 1.0),
    "log10_metallicity": (-3.5, -1.8),
    "tau_v": (0.0, 1.5),
}


@pytest.fixture(scope="module")
def library_path(test_grid, nircam_filters, tmp_path_factory):
    sim = BatchSEDSimulator(
        grid=test_grid,
        filters=nircam_filters,
        param_names=(
            "log10_mass", "redshift", "peak_age", "tau",
            "log10_metallicity", "tau_v",
        ),
        sfh="lognormal",
        zdist="delta",
        emission=EmissionConfig(),
    )
    gen = LibraryGenerator(sim, PARAM_RANGES, unlog_keys=["log10_peak_age"])
    path = str(tmp_path_factory.mktemp("lib") / "e2e_library.h5")
    gen.generate(n=3000, batch_size=1024, seed=0, out_path=path)
    return path


@pytest.mark.slow
def test_full_pipeline(library_path, tmp_path):
    fitter = SBIFitter.init_from_hdf5(library_path)
    assert fitter.photometry.shape == (3000, 7)

    fitter.create_feature_array(FeatureConfig(
        filter_codes=tuple(fitter.filter_codes),
        unit="asinh",
        depths_ab=tuple([29.0] * 7),
        n_scatters=2,
        include_errors=True,
    ))
    assert fitter.features.shape[1] == 14

    res = fitter.run_single_sbi(
        model_type="nsf",
        hidden_features=32,
        num_transforms=4,
        train_config=TrainConfig(max_epochs=30, stop_after_epochs=8,
                                 batch_size=512, learning_rate=8e-4),
        key=jax.random.PRNGKey(0),
    )
    assert res.val_losses[-1] < res.val_losses[0]

    # posterior sampling on held-out sims
    idx = fitter._split["test"][:20]
    samples = fitter.sample_posterior(fitter.features[idx], n_samples=200)
    assert samples.shape == (20, 200, 6)
    assert np.isfinite(samples).all()
    # samples within prior box
    assert (samples >= np.asarray(fitter.prior.low) - 1e-4).all()
    assert (samples <= np.asarray(fitter.prior.high) + 1e-4).all()

    # redshift should be reasonably recovered (strongest feature signal)
    z_idx = fitter.parameter_names.index("redshift")
    z_med = np.median(samples[..., z_idx], axis=1)
    z_true = fitter.feature_params[idx][:, z_idx]
    corr = np.corrcoef(z_med, z_true)[0, 1]
    assert corr > 0.7, f"redshift recovery too weak: r={corr:.2f}"

    # evaluation report
    report = fitter.evaluate_model(n_samples=128, max_objects=128)
    # ~3x the measured value of this config (≈0.03); loose bounds would let
    # calibration regress 10x while CI stays green
    assert report["tarp_deviation"] < 0.1
    assert np.isfinite(report["mean_log_prob"])
    # support-aware flows put every draw inside the prior box — no leakage
    # warning, no clipping (round-3 verdict: min acceptance hit 0.17)
    assert report.get("sampling_acceptance_min", 1.0) > 0.9

    # save / load round trip preserves the posterior
    path = str(tmp_path / "model.pkl")
    fitter.save_state(path)
    loaded = SBIFitter.load_saved_model(path)
    x0 = fitter.features[idx[:1]]
    lp1 = np.asarray(fitter.posterior.log_prob(fitter.feature_params[idx[:1]], x0))
    lp2 = np.asarray(loaded.posterior.log_prob(fitter.feature_params[idx[:1]], x0))
    np.testing.assert_allclose(lp1, lp2, rtol=1e-5)

    # observation replay path produces matching feature dimensionality
    obs_feat = loaded.features_from_observations(
        fitter.photometry[:5], 0.05 * fitter.photometry[:5], "nJy"
    )
    assert obs_feat.shape[1] == fitter.features.shape[1]


@pytest.mark.slow
def test_ensemble_pipeline(library_path):
    fitter = SBIFitter.init_from_hdf5(library_path)
    fitter.create_feature_array(FeatureConfig(
        filter_codes=tuple(fitter.filter_codes),
        unit="asinh", include_errors=False,
    ))
    res = fitter.run_single_sbi(
        model_type="mdn",
        n_nets=2,
        hidden_features=24,
        num_components=4,
        train_config=TrainConfig(max_epochs=10, batch_size=512,
                                 learning_rate=1e-3),
    )
    assert res.n_members == 2
    s = fitter.sample_posterior(fitter.features[:3], n_samples=64)
    assert s.shape == (3, 64, 6)
