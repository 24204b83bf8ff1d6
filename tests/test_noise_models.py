"""Noise-model statistical tests (mirrors the reference's
tests/test_uncertainty_models.py strategy: pure statistics vs expected σ,
plus HDF5 round-trips)."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu import units as U
from synference_tpu.noise_models import (
    AsinhEmpiricalNoiseModel,
    DepthNoiseModel,
    EmpiricalNoiseModel,
    GeneralEmpiricalNoiseModel,
    SpectralNoiseModel,
    load_noise_model_hdf5,
    save_noise_model_hdf5,
)

KEY = jax.random.PRNGKey(0)


class TestDepthModel:
    def test_sigma_value(self):
        m = DepthNoiseModel(depth_ab=28.0, depth_sigma_level=5.0)
        expected = float(U.ab_to_njy(28.0)) / 5.0
        assert np.isclose(m.sigma_njy, expected)

    def test_noise_statistics(self):
        m = DepthNoiseModel(depth_ab=28.0)
        flux = jnp.full((20000,), 100.0)
        noisy, sigma = m.apply(KEY, flux)
        resid = np.asarray(noisy) - 100.0
        assert abs(resid.mean()) < 3 * m.sigma_njy / np.sqrt(20000)
        assert np.isclose(resid.std(), m.sigma_njy, rtol=0.03)
        np.testing.assert_allclose(np.asarray(sigma), m.sigma_njy)

    def test_error_clipping(self):
        m = DepthNoiseModel(depth_ab=28.0, min_flux_error_njy=1e4)
        _, sigma = m.apply(KEY, jnp.ones(10))
        assert np.all(np.asarray(sigma) == 1e4)

    def test_hdf5_roundtrip(self, tmp_path):
        m = DepthNoiseModel(depth_ab=27.5, depth_sigma_level=10.0)
        path = tmp_path / "m.h5"
        with h5py.File(path, "w") as f:
            save_noise_model_hdf5(m, f.create_group("model"))
        with h5py.File(path, "r") as f:
            m2 = load_noise_model_hdf5(f["model"])
        assert isinstance(m2, DepthNoiseModel)
        assert np.isclose(m2.sigma_njy, m.sigma_njy)


class TestSpectralModel:
    def test_per_pixel_sigma(self):
        kern = np.linspace(1.0, 10.0, 64).astype(np.float32)
        m = SpectralNoiseModel(kern)
        flux = jnp.zeros((5000, 64))
        noisy, sigma = m.apply(KEY, flux)
        np.testing.assert_allclose(
            np.asarray(noisy).std(axis=0), kern, rtol=0.1
        )
        np.testing.assert_allclose(np.asarray(sigma)[0], kern)

    def test_hdf5_roundtrip(self, tmp_path):
        m = SpectralNoiseModel(np.arange(8, dtype=np.float32))
        with h5py.File(tmp_path / "s.h5", "w") as f:
            save_noise_model_hdf5(m, f.create_group("m"))
        with h5py.File(tmp_path / "s.h5", "r") as f:
            m2 = load_noise_model_hdf5(f["m"])
        np.testing.assert_allclose(
            np.asarray(m2.error_kernel_njy), np.asarray(m.error_kernel_njy)
        )


def _mock_catalogue(rng, n=20000):
    """Catalogue where sigma ~ 0.05*flux + 2 nJy with small scatter.

    Fluxes are log-uniform so faint bins are well populated in magnitude
    space (needed for the upper-limit interpolators to cover the faint end).
    """
    flux = 10.0 ** rng.uniform(np.log10(5.0), 4.0, n)
    sig_true = 0.05 * flux + 2.0
    err = np.abs(sig_true * (1.0 + 0.1 * rng.standard_normal(n)))
    return flux, err


class TestEmpiricalModel:
    def test_learns_sigma_flux_relation(self, rng):
        flux, err = _mock_catalogue(rng)
        m = EmpiricalNoiseModel.from_catalogue(flux, err)
        test_flux = jnp.full((5000,), 1000.0)
        _, sigma = m.apply(KEY, test_flux)
        # median sampled sigma should be near 0.05*1000+2 = 52
        assert 40.0 < float(np.median(np.asarray(sigma))) < 65.0

    def test_sigma_nonnegative(self, rng):
        flux, err = _mock_catalogue(rng)
        m = EmpiricalNoiseModel.from_catalogue(flux, err)
        _, sigma = m.apply(KEY, jnp.linspace(5.0, 1e4, 2000))
        assert np.all(np.asarray(sigma) >= 0.0)

    def test_jittable(self, rng):
        flux, err = _mock_catalogue(rng)
        m = EmpiricalNoiseModel.from_catalogue(flux, err)
        f = jax.jit(lambda k, x: m.apply(k, x))
        noisy, sigma = f(KEY, jnp.full((100,), 500.0))
        assert np.isfinite(np.asarray(noisy)).all()

    def test_hdf5_roundtrip(self, rng, tmp_path):
        flux, err = _mock_catalogue(rng)
        m = EmpiricalNoiseModel.from_catalogue(flux, err)
        with h5py.File(tmp_path / "e.h5", "w") as f:
            save_noise_model_hdf5(m, f.create_group("m"))
        with h5py.File(tmp_path / "e.h5", "r") as f:
            m2 = load_noise_model_hdf5(f["m"])
        np.testing.assert_allclose(
            np.asarray(m2.bin_centers), np.asarray(m.bin_centers)
        )


class TestAsinhModel:
    def test_handles_negative_fluxes(self, rng):
        flux, err = _mock_catalogue(rng)
        m = AsinhEmpiricalNoiseModel.from_catalogue(flux, err)
        test = jnp.asarray([-5.0, 0.0, 3.0, 1000.0])
        noisy, sigma = m.apply(KEY, test)
        assert np.isfinite(np.asarray(noisy)).all()
        assert np.isfinite(np.asarray(sigma)).all()

    def test_b_factor(self, rng):
        flux, err = _mock_catalogue(rng)
        m = AsinhEmpiricalNoiseModel.from_catalogue(flux, err, asinh_b_factor=5.0)
        assert np.isclose(m.b_njy, 5.0 * np.median(err), rtol=1e-6)

    def test_statistics_match_learned(self, rng):
        flux, err = _mock_catalogue(rng)
        m = AsinhEmpiricalNoiseModel.from_catalogue(flux, err)
        test_flux = jnp.full((20000,), 1000.0)
        noisy, _ = m.apply(KEY, test_flux)
        resid = np.asarray(noisy) - 1000.0
        # expected sigma ~ 52 nJy at 1000 nJy
        assert 35.0 < resid.std() < 75.0

    def test_hdf5_roundtrip(self, rng, tmp_path):
        flux, err = _mock_catalogue(rng)
        m = AsinhEmpiricalNoiseModel.from_catalogue(flux, err)
        with h5py.File(tmp_path / "a.h5", "w") as f:
            save_noise_model_hdf5(m, f.create_group("m"))
        with h5py.File(tmp_path / "a.h5", "r") as f:
            m2 = load_noise_model_hdf5(f["m"])
        assert isinstance(m2, AsinhEmpiricalNoiseModel)
        assert np.isclose(m2.b_njy, m.b_njy)
        n1, s1 = m.apply(KEY, jnp.asarray([100.0]))
        n2, s2 = m2.apply(KEY, jnp.asarray([100.0]))
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), rtol=1e-5)


class TestGeneralModel:
    def _model(self, rng, **kw):
        flux, err = _mock_catalogue(rng)
        mag = np.asarray(U.njy_to_ab(flux))
        mag_err = np.asarray(U.jy_err_to_ab_err(flux, err))
        return GeneralEmpiricalNoiseModel.from_catalogue(
            mag, mag_err, flux_unit="AB", **kw
        )

    def test_basic_apply(self, rng):
        m = self._model(rng)
        noisy, sigma = m.apply(KEY, jnp.full((1000,), 1000.0))
        assert np.isfinite(np.asarray(noisy)).all()
        assert np.all(np.asarray(sigma) > 0)

    def test_upper_limit_replacement(self, rng):
        # interpolate in nJy so the faint-source SNR -> 0 and the mask is
        # deterministic (in AB space SNR = POGSON/sigma_AB, flux-independent)
        m = self._model(
            rng,
            interpolation_unit="nJy",
            upper_limits=True,
            treat_as_upper_limits_below=3.0,
            upper_limit_flux_behaviour="upper_limit",
            upper_limit_flux_err_behaviour="flux",
        )
        assert m.upper_limit_value is not None
        # very faint sources -> all become upper limits at the limit value
        noisy, sigma = m.apply(KEY, jnp.full((500,), 0.01))
        np.testing.assert_allclose(
            np.asarray(noisy), m.upper_limit_value, rtol=1e-5
        )
        expected_sig = float(
            np.interp(
                m.upper_limit_value,
                np.asarray(m.bin_centers),
                np.asarray(m.median_error_in_bin),
            )
        )
        np.testing.assert_allclose(np.asarray(sigma), expected_sig, rtol=1e-4)

    def test_upper_limit_sig_behaviour_ab(self, rng):
        """sig_N error behaviour in AB space gives mag err = POGSON/N for
        whichever sources get masked (mask is stochastic in AB space)."""
        m = self._model(
            rng,
            upper_limits=True,
            treat_as_upper_limits_below=3.0,
            upper_limit_flux_behaviour="upper_limit",
            upper_limit_flux_err_behaviour="sig_1",
        )
        noisy, sigma = m.apply(KEY, jnp.full((500,), 0.01))
        noisy_ab = np.asarray(U.convert_flux(noisy, "nJy", "AB"))
        masked = np.isclose(noisy_ab, m.upper_limit_value, atol=1e-3)
        assert masked.sum() > 100  # most faint sources should be masked
        sigma_ab = np.asarray(U.convert_flux_err(noisy, sigma, "nJy", "AB"))
        np.testing.assert_allclose(sigma_ab[masked], U.POGSON, rtol=1e-3)

    def test_bright_sources_unaffected_by_limits(self, rng):
        m = self._model(
            rng,
            upper_limits=True,
            treat_as_upper_limits_below=3.0,
            upper_limit_flux_behaviour="upper_limit",
        )
        noisy, _ = m.apply(KEY, jnp.full((500,), 1.0e5))
        # bright: scattered but nowhere near the limit
        lim_njy = float(U.convert_flux(m.upper_limit_value, "AB", "nJy"))
        assert np.all(np.abs(np.asarray(noisy) - 1.0e5) < 0.5e5)
        assert not np.any(np.isclose(np.asarray(noisy), lim_njy, rtol=1e-3))

    def test_sigma_clip(self, rng):
        m = self._model(rng, sigma_clip=2.0)
        flux = jnp.full((20000,), 1000.0)
        noisy, sigma = m.apply(KEY, flux)
        # residuals in AB space clipped at ~2 sigma
        mag = np.asarray(U.convert_flux(noisy, "nJy", "AB"))
        mag0 = float(U.njy_to_ab(1000.0))
        resid = np.abs(mag - mag0)
        med_sig = float(np.median(np.asarray(
            U.convert_flux_err(noisy, sigma, "nJy", "AB"))))
        assert resid.max() < 3.0 * med_sig

    def test_hdf5_roundtrip(self, rng, tmp_path):
        m = self._model(
            rng, upper_limits=True, treat_as_upper_limits_below=3.0
        )
        with h5py.File(tmp_path / "g.h5", "w") as f:
            save_noise_model_hdf5(m, f.create_group("m"))
        with h5py.File(tmp_path / "g.h5", "r") as f:
            m2 = load_noise_model_hdf5(f["m"])
        assert isinstance(m2, GeneralEmpiricalNoiseModel)
        assert m2.upper_limits == m.upper_limits
        assert np.isclose(m2.upper_limit_value, m.upper_limit_value)
        assert m2.interpolation_unit == m.interpolation_unit
