"""Catalogue fitting, OOD, and SBI++ missing-data tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.catalogue import (
    MissingPhotometryHandler,
    fit_catalogue,
    mahalanobis_ood,
    ood_vote,
)
from synference_tpu.features import FeatureConfig
from synference_tpu.fitter import SBIFitter
from synference_tpu.library import LibraryGenerator
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig
from synference_tpu.train import TrainConfig

KEY = jax.random.PRNGKey(0)


class TestOOD:
    def test_mahalanobis_flags_outliers(self, rng):
        train = rng.standard_normal((2000, 5))
        test = np.vstack([rng.standard_normal((50, 5)),
                          10.0 + rng.standard_normal((10, 5))])
        flags, dist = mahalanobis_ood(train, test)
        assert flags[50:].all()
        assert flags[:50].mean() < 0.1
        assert (dist[50:] > dist[:50].mean()).all()

    def test_vote(self, rng):
        train = rng.standard_normal((1000, 4))
        test = np.vstack([rng.standard_normal((20, 4)),
                          8.0 + np.zeros((5, 4))])
        flags, votes = ood_vote(train, test, methods=("mahalanobis", "iforest"))
        assert flags[20:].all()
        assert votes.shape == (2, 25)

    def test_feature_contributions(self, rng):
        """The Mahalanobis decomposition is exact and attributes a
        single-feature shift to that feature (reference
        analyze_feature_contributions, utils.py:1478)."""
        from synference_tpu.catalogue import ood_feature_contributions

        train = rng.standard_normal((3000, 5))
        test = rng.standard_normal((30, 5))
        test[:, 2] += 8.0  # only feature 2 is shifted
        for method in ("mahalanobis", "robust_mahalanobis",
                       "standardized_euclidean"):
            res = ood_feature_contributions(
                train, test, method=method,
                feature_names=list("abcde"))
            assert res["outlier_mask"].all(), method
            # the shifted feature dominates the attribution
            assert res["feature_importance"].argmax() == 2, method
            assert res["feature_importance"][2] > 0.5, method
            # contributions decompose the squared distance exactly
            np.testing.assert_allclose(
                res["feature_contributions"].sum(1),
                res["total_distances"] ** 2, rtol=2e-3)

    def test_compare_methods_feature_importance(self, rng):
        """Cross-method comparison (reference utils.py:1914-1953): all
        three methods agree the shifted feature dominates."""
        from synference_tpu.catalogue import (
            compare_methods_feature_importance,
        )

        train = rng.standard_normal((2000, 4))
        test = rng.standard_normal((20, 4))
        test[:, 1] += 6.0
        out = compare_methods_feature_importance(
            train, test, feature_names=list("abcd"))
        for m in ("mahalanobis", "robust_mahalanobis",
                  "standardized_euclidean"):
            assert out[m]["feature_importance"].argmax() == 1, m
        assert -1.0 <= out["agreement"] <= 1.0
        assert out["agreement"] > 0.3  # methods broadly rank alike here

    def test_feature_contributions_bad_method(self, rng):
        from synference_tpu.catalogue import ood_feature_contributions

        with pytest.raises(ValueError, match="method"):
            ood_feature_contributions(
                rng.standard_normal((100, 3)),
                rng.standard_normal((5, 3)), method="nope")


class TestMissingHandler:
    def test_impute_preserves_valid_fills_missing(self, rng):
        lib = rng.uniform(100, 1000, (500, 4)).astype(np.float32)
        h = MissingPhotometryHandler(lib, k_neighbors=32, nmc=8)
        flux = np.array([[500.0, 0.0, 400.0, 300.0]], np.float32)
        err = np.full((1, 4), 20.0, np.float32)
        miss = np.array([[0, 1, 0, 0]], np.float32)
        imp = np.asarray(h.impute(KEY, flux, err, miss))
        assert imp.shape == (1, 8, 4)
        # valid bands unchanged
        np.testing.assert_allclose(imp[0, :, 0], 500.0)
        np.testing.assert_allclose(imp[0, :, 2], 400.0)
        # missing band filled within the library range (plus jitter slack)
        assert imp[0, :, 1].std() > 0
        assert (imp[0, :, 1] > 0).all() and (imp[0, :, 1] < 2000).all()

    def test_imputation_uses_correlations(self, rng):
        # library with strong band-band correlation: band1 = 2*band0
        b0 = rng.uniform(100, 1000, 2000).astype(np.float32)
        lib = np.stack([b0, 2 * b0], axis=1)
        h = MissingPhotometryHandler(lib, k_neighbors=32, nmc=32)
        flux = np.array([[300.0, 0.0]], np.float32)
        err = np.full((1, 2), 10.0, np.float32)
        miss = np.array([[0, 1]], np.float32)
        imp = np.asarray(h.impute(KEY, flux, err, miss))
        # imputed band1 should cluster near 600
        assert abs(np.median(imp[0, :, 1]) - 600.0) < 60.0

    def test_noise_model_rescatter(self, rng):
        """With per-band noise models, the missing-band KDE draw is
        rescattered through that band's model and σ comes from the model
        (reference generate_imputations Mode 2, sbi_runner.py:7839-7864)."""
        from synference_tpu.noise_models import DepthNoiseModel

        b0 = rng.uniform(100, 1000, 2000).astype(np.float32)
        lib = np.stack([b0, 2 * b0], axis=1)
        # 5σ depth of 25 AB -> σ ≈ 727 nJy: far larger than the KDE spread,
        # so the rescatter visibly widens the imputed distribution
        nm = DepthNoiseModel(depth_ab=25.0, depth_sigma_level=5.0)
        h_plain = MissingPhotometryHandler(lib, k_neighbors=32, nmc=64)
        h_noise = MissingPhotometryHandler(lib, k_neighbors=32, nmc=64,
                                           noise_models=[None, nm])
        flux = np.array([[300.0, 0.0]], np.float32)
        err = np.full((1, 2), 10.0, np.float32)
        miss = np.array([[0, 1]], np.float32)
        imp_p = np.asarray(h_plain.impute(KEY, flux, err, miss))
        imp_n, sig_n = h_noise.impute(KEY, flux, err, miss,
                                      return_errors=True)
        imp_n, sig_n = np.asarray(imp_n), np.asarray(sig_n)
        # valid band untouched by rescatter (model only hits missing bands)
        np.testing.assert_allclose(imp_n[0, :, 0], 300.0)
        np.testing.assert_allclose(sig_n[0, :, 0], 10.0)
        # missing band: σ equals the depth-model σ, spread widens
        expected_sigma = float(np.asarray(
            nm.apply(KEY, np.array([600.0], np.float32))[1])[0])
        np.testing.assert_allclose(sig_n[0, :, 1], expected_sigma, rtol=1e-5)
        assert imp_n[0, :, 1].std() > 2.0 * imp_p[0, :, 1].std()
        # nmc-consistency: still centred near the true 600
        assert abs(np.median(imp_n[0, :, 1]) - 600.0) < 0.6 * expected_sigma

    def test_rescatter_length_mismatch_raises(self, rng):
        lib = rng.uniform(100, 1000, (50, 3)).astype(np.float32)
        with pytest.raises(ValueError, match="noise_models"):
            MissingPhotometryHandler(lib, noise_models=[None])


@pytest.fixture(scope="module")
def trained_fitter(test_grid, nircam_filters):
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
    lib = gen.generate(n=1500, batch_size=512, seed=0)
    fitter = SBIFitter(
        photometry=lib["photometry"].T,
        parameters=lib["parameters"].T,
        parameter_names=lib["parameter_names"],
        filter_codes=lib["filter_codes"],
    )
    fitter.create_feature_array(FeatureConfig(
        filter_codes=tuple(fitter.filter_codes), unit="asinh",
        depths_ab=tuple([29.0] * 7), include_errors=True,
    ))
    fitter.run_single_sbi(
        model_type="mdn", hidden_features=32, num_components=4,
        train_config=TrainConfig(max_epochs=15, batch_size=512,
                                 learning_rate=1e-3),
    )
    return fitter, lib


class TestFitCatalogue:
    def test_basic_table(self, trained_fitter, rng):
        fitter, lib = trained_fitter
        phot = lib["photometry"].T[:10]
        errs = 0.05 * phot
        table = fit_catalogue(fitter, phot, errs, "nJy", n_samples=200,
                              check_ood=True,
                              ood_methods=("mahalanobis",))
        assert table["_samples"].shape == (10, 200, 6)
        for name in fitter.parameter_names:
            assert f"{name}_q50" in table
            lo, mid, hi = (table[f"{name}_q16"], table[f"{name}_q50"],
                           table[f"{name}_q84"])
            assert (lo <= mid).all() and (mid <= hi).all()
        # in-distribution inputs: few OOD flags
        assert table["flag_ood"].mean() < 0.5

    def test_dataframe_table_roundtrip(self, trained_fitter, tmp_path):
        """fit_catalogue_table: pandas in, pandas out with appended quantile
        columns, missing_data_flag -> mask, CSV persistence (reference
        fit_catalogue's Table workflow, sbi_runner.py:2948-3317)."""
        import pandas as pd

        from synference_tpu.catalogue import fit_catalogue_table

        fitter, lib = trained_fitter
        phot = lib["photometry"].T[:6].copy()
        codes = list(fitter.filter_codes)
        df = pd.DataFrame({"ID": np.arange(6) + 100})
        for j, c in enumerate(codes):
            df[f"flux_{c}"] = phot[:, j]
            df[f"err_{c}"] = 0.05 * phot[:, j]
        df.loc[0, f"flux_{codes[2]}"] = -99.0  # reference missing flag
        csv = str(tmp_path / "cat.csv")
        table, raw = fit_catalogue_table(
            fitter, df,
            flux_columns=[f"flux_{c}" for c in codes],
            err_columns=[f"err_{c}" for c in codes],
            missing_data_flag=-99.0, save_path=csv,
            n_samples=100, check_ood=False)
        # input columns survive, quantile columns appended, lengths match
        assert list(table["ID"]) == list(df["ID"])
        for name in fitter.parameter_names:
            assert f"{name}_q50" in table.columns
        assert len(table) == 6
        # the flagged band produced a missing-mask entry
        assert raw["n_missing"][0] == 1
        assert (np.asarray(raw["n_missing"][1:]) == 0).all()
        # CSV written and re-readable
        back = pd.read_csv(csv)
        assert f"{fitter.parameter_names[0]}_q50" in back.columns
        # append_to_input=False: ID + result columns only
        t2, _ = fit_catalogue_table(
            fitter, df,
            flux_columns=[f"flux_{c}" for c in codes],
            err_columns=[f"err_{c}" for c in codes],
            append_to_input=False, n_samples=50, check_ood=False)
        assert "ID" in t2.columns and f"flux_{codes[0]}" not in t2.columns

    def test_ood_flags_garbage(self, trained_fitter):
        fitter, lib = trained_fitter
        garbage = np.full((5, 7), 1.0e9, np.float32)
        errs = 0.05 * garbage
        table = fit_catalogue(fitter, garbage, errs, "nJy", n_samples=50,
                              ood_methods=("mahalanobis",))
        assert table["flag_ood"].all()

    def test_missing_data_path(self, trained_fitter):
        fitter, lib = trained_fitter
        phot = lib["photometry"].T[:6]
        errs = 0.05 * phot
        miss = np.zeros_like(phot)
        miss[:, 2] = 1.0
        handler = MissingPhotometryHandler(
            lib["photometry"].T, k_neighbors=32, nmc=4
        )
        table = fit_catalogue(
            fitter, phot, errs, "nJy", missing_mask=miss,
            n_samples=100, check_ood=False,
            missing_data_handler=handler,
        )
        assert table["_samples"].shape == (6, 100, 6)
        assert (table["n_missing"] == 1).all()
        assert np.isfinite(table["_samples"]).all()


class TestReconPhotometryAndSEDs:
    """Forward-modelled posterior columns (reference sbi_runner.py:3255-3373
    appends reconstructed photometry + loops recover_SED per object)."""

    def test_recon_columns_close_to_input_for_bright(self, trained_fitter,
                                                     test_grid,
                                                     nircam_filters):
        fitter, lib = trained_fitter
        sim = BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
        )
        phot = lib["photometry"].T
        bright = np.argsort(phot.sum(axis=1))[-8:]  # brightest objects
        obs = phot[bright]
        errs = 0.05 * obs
        table = fit_catalogue(fitter, obs, errs, "nJy", n_samples=200,
                              check_ood=False, simulator=sim,
                              recon_draws=64, recover_seds=True,
                              sed_draws=16)
        codes = sim.filters.codes
        med = np.stack([table[f"recon_{c}_q50"] for c in codes], axis=1)
        assert med.shape == obs.shape
        assert np.isfinite(med).all() and (med > 0).all()
        # the posterior median reconstruction tracks the observed
        # photometry for bright in-distribution objects (MDN at this tiny
        # budget: order-of-magnitude agreement on most bands)
        rel = np.abs(med - obs) / obs
        assert np.median(rel) < 1.0
        # quantile ordering per band
        for c in codes:
            assert (table[f"recon_{c}_q16"]
                    <= table[f"recon_{c}_q84"]).all()
        seds = table["_recovered_seds"]
        assert seds["fnu_quantiles"].shape == (8, 3, test_grid.n_wav)
        assert np.isfinite(seds["fnu_quantiles"]).all()
        # per-object OBSERVED-frame lam axis (rest grid x mean 1+z):
        # all library objects have z > 0, so every row sits redward of rest
        assert seds["lam"].shape == (8, test_grid.n_wav)
        assert (seds["lam"][:, 0] > seds["lam_rest"][0]).all()
        # band ordering holds pointwise in λ too
        assert (seds["fnu_quantiles"][:, 0] <=
                seds["fnu_quantiles"][:, 2] + 1e-30).all()

    def test_recover_seds_requires_simulator(self, trained_fitter):
        fitter, lib = trained_fitter
        phot = lib["photometry"].T[:2]
        with pytest.raises(ValueError, match="simulator"):
            fit_catalogue(fitter, phot, 0.05 * phot, "nJy", n_samples=20,
                          check_ood=False, recover_seds=True)

    def test_simulator_param_mismatch_raises(self, trained_fitter,
                                             test_grid, nircam_filters):
        fitter, lib = trained_fitter
        sim = BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v", "fesc"),
            sfh="lognormal", zdist="delta",
            emission=EmissionConfig(fesc="fesc"),
        )
        phot = lib["photometry"].T[:2]
        with pytest.raises(ValueError, match="fesc"):
            fit_catalogue(fitter, phot, 0.05 * phot, "nJy", n_samples=20,
                          check_ood=False, simulator=sim)


class TestOODMethods:
    """Native detector parity with the reference's 8-method PyOD vote
    (sbi_runner.py:3777-3831)."""

    def _data(self):
        rng = np.random.default_rng(0)
        train = rng.standard_normal((2000, 4))
        inliers = rng.standard_normal((50, 4))
        outliers = rng.standard_normal((50, 4)) + 8.0
        return train, np.concatenate([inliers, outliers])

    @pytest.mark.parametrize("method", ["ecod", "hbos", "knn", "pca",
                                        "elliptic"])
    def test_each_method_separates(self, method):
        from synference_tpu.catalogue import ood_vote

        train, test = self._data()
        flags, votes = ood_vote(train, test, methods=(method,),
                                vote_fraction=0.5)
        assert flags[50:].mean() > 0.9       # outliers flagged
        assert flags[:50].mean() < 0.2       # inliers mostly kept

    def test_eight_method_vote(self):
        from synference_tpu.catalogue import ood_vote

        train, test = self._data()
        flags, votes = ood_vote(train, test)
        assert votes.shape[0] == 8
        assert flags[50:].all()
        assert flags[:50].mean() < 0.1
