"""Fitter-level simformer / online / HPO integration tests."""

import jax
import numpy as np
import pytest

from synference_tpu.features import FeatureConfig
from synference_tpu.fitter import SBIFitter
from synference_tpu.hpo import MedianPruner, optimize_sbi
from synference_tpu.library import LibraryGenerator
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig
from synference_tpu.train import TrainConfig


@pytest.fixture(scope="module")
def small_fitter(test_grid, nircam_filters):
    sim = BatchSEDSimulator(
        grid=test_grid, filters=nircam_filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta", emission=EmissionConfig(),
    )
    gen = LibraryGenerator(sim, {
        "log10_mass": (8.0, 10.5), "redshift": (0.5, 6.0),
        "peak_age": (1e8, 8e8), "tau": (0.2, 1.0),
        "log10_metallicity": (-3.5, -1.8), "tau_v": (0.0, 1.5),
    })
    lib = gen.generate(n=800, batch_size=512, seed=0)
    fitter = SBIFitter(
        photometry=lib["photometry"].T,
        parameters=lib["parameters"].T,
        parameter_names=lib["parameter_names"],
        filter_codes=lib["filter_codes"],
    )
    fitter.create_feature_array(FeatureConfig(
        filter_codes=tuple(fitter.filter_codes), unit="asinh",
        include_errors=False,
    ))
    return fitter


@pytest.mark.slow
def test_fitter_simformer(small_fitter):
    hist = small_fitter.run_single_simformer(
        d_model=32, n_heads=2, n_layers=2, batch_size=256,
        learning_rate=1e-3, max_epochs=10, n_diffusion_steps=100,
    )
    assert hist["val"][-1] < hist["val"][0]
    s = small_fitter.sample_posterior(small_fitter.features[:3], n_samples=50)
    assert s.shape == (3, 50, 6)
    assert np.isfinite(s).all()
    # simformer now has a probability-flow-ODE log_prob, so evaluation
    # reports a finite mean_log_prob (reference sbi_runner.py:8783-8856)
    small_fitter.split_dataset(0.1)
    report = small_fitter.evaluate_model(n_samples=32, max_objects=32)
    assert report["mean_log_prob"] is not None
    assert np.isfinite(report["mean_log_prob"])


@pytest.mark.slow
def test_run_validation_from_file(small_fitter, tmp_path):
    """Saved model -> run_validation_from_file re-validates it on this
    fitter's held-out split and writes figures + metrics JSON (reference
    run_validation_from_file, sbi_runner.py:7347-7373)."""
    small_fitter.run_single_sbi(
        model_type="maf",
        train_config=TrainConfig(max_epochs=5, batch_size=256))
    mdl = str(tmp_path / "val_model.pkl")
    small_fitter.save_state(mdl)
    report, paths = small_fitter.run_validation_from_file(
        mdl, plots_dir=str(tmp_path), n_samples=32, max_objects=32)
    assert np.isfinite(report["mean_log_prob"])
    import json
    import os

    for p in paths.values():
        assert os.path.exists(p)
    with open(paths["metrics"]) as f:
        saved = json.load(f)
    assert "tarp_deviation" in saved or "mean_log_prob" in saved


@pytest.mark.slow
def test_fitter_hpo_smoke(small_fitter):
    study, best = optimize_sbi(
        small_fitter, model_type="mdn",
        search_space={
            # singleton architecture dims: both trials share one compiled
            # program (the HPO machinery, not the search breadth, is what
            # this smoke test covers)
            "hidden_features": ("categorical", [16]),
            "num_components": ("categorical", [3]),
            "learning_rate": ("float", 3e-4, 3e-3, "log"),
            "batch_size": ("categorical", [256]),
        },
        n_trials=2, max_epochs=6, verbose=False,
        pruner=MedianPruner(n_startup_trials=10),
    )
    assert len(study.trials) == 2
    assert "hidden_features" in best


@pytest.mark.slow
def test_fitter_online(small_fitter, test_grid, nircam_filters):
    """Online TSNPE through the jitted simulator at a fixed observation."""
    sim = BatchSEDSimulator(
        grid=test_grid, filters=nircam_filters,
        param_names=("log10_mass", "redshift"),
        sfh="constant", zdist="delta",
        fixed_params={"tau_v": 0.2, "log10_metallicity": -2.5},
    )
    import jax.numpy as jnp

    from synference_tpu import units as U

    def simulate(theta):
        p = sim.photometry(theta)
        return np.asarray(U.convert_flux(jnp.maximum(p, 1e-3), "nJy", "asinh"))

    true = np.array([[9.5, 2.0]], np.float32)
    x_obs = simulate(true)[0]
    small_fitter.prior = None
    small_fitter.parameter_names = ["log10_mass", "redshift"]
    small_fitter.create_priors(overrides={"log10_mass": (8.0, 11.0),
                                          "redshift": (0.5, 5.0)})
    post, data, hist = small_fitter.run_online_snpe(
        simulate, x_obs, model_type="mdn", hidden_features=24,
        num_components=3, n_rounds=2, sims_per_round=800,
        train_config=TrainConfig(max_epochs=15, stop_after_epochs=6,
                                 batch_size=256, learning_rate=1e-3),
        key=jax.random.PRNGKey(0),
    )
    s = np.asarray(post.sample(jax.random.PRNGKey(1), x_obs, 400))
    med = np.median(s, axis=0)
    assert abs(med[0] - 9.5) < 0.6
    assert abs(med[1] - 2.0) < 1.0


class TestConvenienceMethods:
    """Reference SBI_Fitter surface: detect_misspecification, lc2st,
    create_dataframe, log-prob accessors, MAP (sbi_runner.py:905, :986,
    :3377, :7376-7401, :7204)."""

    def test_create_dataframe(self, small_fitter):
        df = small_fitter.create_dataframe("parameters")
        assert df.shape[0] == small_fitter.parameters.shape[0]
        df_all = small_fitter.create_dataframe("all")
        assert df_all.shape[1] >= df.shape[1]

    def test_log_prob_accessors_and_map(self):
        from synference_tpu.train import TrainConfig

        rng = np.random.default_rng(0)
        theta = rng.uniform(-1, 1, (1200, 2)).astype(np.float32)
        x = (theta + 0.1 * rng.standard_normal((1200, 2))).astype(np.float32)
        fitter = SBIFitter(photometry=np.abs(x) + 1.0, parameters=theta,
                           parameter_names=("a", "b"),
                           filter_codes=("F1", "F2"))
        fitter.features = x
        fitter.feature_params = theta
        fitter.feature_source = np.arange(len(x))
        fitter.feature_flags = None
        fitter.run_single_sbi(model_type="mdn", hidden_features=16,
                              num_components=2,
                              train_config=TrainConfig(max_epochs=5))
        assert fitter.training_log_probs.ndim == 2
        assert fitter.validation_log_probs.ndim == 2
        m = fitter.calculate_map(fitter.features[0])
        assert m.shape == (2,)

    def test_detect_misspecification_flags_outlier(self, small_fitter):
        x0 = small_fitter.features[0]
        weird = np.asarray(x0) + 50.0
        flags, logp, thr = small_fitter.detect_misspecification(
            np.stack([np.asarray(x0), weird]))
        assert not flags[0] and flags[1]


class TestConfigDriven:
    """YAML-config training (reference SBICustomRunner.from_config,
    custom_runner.py:101; examples/sbi/configs/best_params.yaml schema)."""

    def _fitter(self):
        rng = np.random.default_rng(2)
        theta = rng.uniform(-1, 1, (1500, 2)).astype(np.float32)
        x = (theta + 0.1 * rng.standard_normal((1500, 2))).astype(np.float32)
        fitter = SBIFitter(photometry=np.abs(x) + 1.0, parameters=theta,
                           parameter_names=("a", "b"),
                           filter_codes=("F1", "F2"))
        fitter.features = x
        fitter.feature_params = theta
        fitter.feature_source = np.arange(len(x))
        fitter.feature_flags = None
        return fitter

    def test_reference_schema_yaml(self, tmp_path):
        from synference_tpu.config import run_from_config

        cfg_path = tmp_path / "best_params.yaml"
        cfg_path.write_text(
            "train_args:\n"
            "  skip_optimization: True\n"
            "  validation_fraction: 0.1\n"
            "  fixed_params:\n"
            "    model_choice: \"mdn\"\n"
            "    learning_rate: 0.001\n"
            "    training_batch_size: 128\n"
            "    stop_after_epochs: 4\n"
            "    clip_max_norm: 5.0\n"
            "    mdn_hidden_features: 16\n"
            "    mdn_num_components: 2\n"
            f"max_epochs: 5\n"
            f"output: {tmp_path / 'model.pkl'}\n")
        fitter = run_from_config(str(cfg_path), fitter=self._fitter())
        assert fitter.posterior is not None
        assert fitter.flow.spec()["model"] == "mdn"
        assert (tmp_path / "model.pkl").exists()
        loaded = SBIFitter.load_saved_model(str(tmp_path / "model.pkl"))
        assert loaded.flow.spec()["config"]["num_components"] == 2

    def test_optuna_block(self, tmp_path):
        from synference_tpu.config import run_from_config

        cfg = {
            "model_type": "mdn",
            "max_epochs": 3,
            "verbose": False,
            "train_args": {
                "skip_optimization": False,
                "optuna": {
                    "n_trials": 2,
                    "build_final_model": True,
                    "pruner": {"type": "Median", "n_startup_trials": 2},
                    # reference custom_loop.yaml-style explicit space;
                    # singleton architecture dims share one compile
                    "search_space": {
                        "hidden_features": ["categorical", [16]],
                        "num_components": ["categorical", [2]],
                        "learning_rate": ["float", 3e-4, 3e-3, "log"],
                        "batch_size": ["categorical", [256]],
                    },
                },
            },
        }
        fitter = run_from_config(cfg, fitter=self._fitter())
        assert len(fitter.hpo_study.trials) == 2
        assert fitter.posterior is not None
