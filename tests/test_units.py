"""Unit-conversion tests: property tests + cross-checks against independent
numpy re-derivations of the reference formulas (utils.py:647-807)."""

import numpy as np
import pytest

from synference_tpu import units


def _ref_f_jy_to_asinh(f_jy, f_b):
    # independent numpy implementation of the reference formula
    return (
        -2.5
        * np.log10(np.e)
        * (np.arcsinh(f_jy / (2 * f_b)) + np.log(f_b / 3631.0))
    )


class TestABMags:
    def test_zero_point(self):
        assert np.isclose(float(units.jy_to_ab(3631.0)), 0.0, atol=1e-6)

    def test_roundtrip(self, rng):
        f = rng.uniform(1.0, 1e4, 100)
        back = np.asarray(units.ab_to_njy(units.njy_to_ab(f)))
        np.testing.assert_allclose(back, f, rtol=1e-5)

    def test_err_roundtrip(self, rng):
        f = rng.uniform(10.0, 1e4, 50)
        e = f * 0.1
        mag_err = np.asarray(units.jy_err_to_ab_err(f, e))
        back = np.asarray(units.ab_err_to_jy_err(units.jy_to_ab(f), mag_err))
        np.testing.assert_allclose(back, e, rtol=1e-5)


class TestAsinhMags:
    def test_matches_reference_formula(self, rng):
        f_jy = rng.uniform(-1e-8, 1e-6, 200)  # handles negative fluxes
        f_b = 5e-9
        ours = np.asarray(units.f_jy_to_asinh(f_jy, f_b))
        ref = _ref_f_jy_to_asinh(f_jy, f_b)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_roundtrip(self, rng):
        f_jy = rng.uniform(-1e-8, 1e-6, 200)
        m = units.f_jy_to_asinh(f_jy)
        back = np.asarray(units.asinh_to_f_jy(m))
        np.testing.assert_allclose(back, f_jy, rtol=1e-4, atol=1e-12)

    def test_err_roundtrip(self, rng):
        f_jy = rng.uniform(1e-9, 1e-6, 100)
        e_jy = f_jy * 0.2
        m = units.f_jy_to_asinh(f_jy)
        me = units.f_jy_err_to_asinh(f_jy, e_jy)
        back = np.asarray(units.asinh_err_to_f_jy_err(m, me))
        np.testing.assert_allclose(back, e_jy, rtol=1e-4)

    def test_snr(self, rng):
        f_jy = rng.uniform(1e-8, 1e-6, 50)
        e_jy = f_jy / 7.0  # SNR 7 everywhere
        m = units.f_jy_to_asinh(f_jy)
        me = units.f_jy_err_to_asinh(f_jy, e_jy)
        snr = np.asarray(units.asinh_to_snr(m, me))
        np.testing.assert_allclose(snr, 7.0, rtol=1e-3)

    def test_approaches_ab_at_high_snr(self):
        f_jy = np.array([1e-4])  # way above softening
        asinh_m = float(units.f_jy_to_asinh(f_jy)[0])
        ab_m = float(units.jy_to_ab(f_jy)[0])
        assert abs(asinh_m - ab_m) < 1e-3


class TestConvertGraph:
    @pytest.mark.parametrize("unit", ["nJy", "AB", "asinh", "log10_nJy", "Jy"])
    def test_roundtrip_all_units(self, unit, rng):
        f_njy = rng.uniform(10.0, 1e5, 64)
        x = units.convert_flux(f_njy, "nJy", unit)
        back = np.asarray(units.convert_flux(x, unit, "nJy"))
        np.testing.assert_allclose(back, f_njy, rtol=1e-4)

    @pytest.mark.parametrize("unit", ["AB", "asinh", "log10_nJy"])
    def test_err_conversion_consistent(self, unit, rng):
        f_njy = rng.uniform(100.0, 1e5, 32)
        e_njy = f_njy * 0.05
        x = units.convert_flux(f_njy, "nJy", unit)
        xe = units.convert_flux_err(f_njy, e_njy, "nJy", unit)
        back = np.asarray(units.convert_flux_err(x, xe, unit, "nJy"))
        np.testing.assert_allclose(back, e_njy, rtol=1e-3)

    def test_depth_to_sigma(self):
        # 5-sigma depth of 28.0 AB -> sigma = f(28)/5
        sig = float(units.ab_depth_to_sigma_njy(28.0, 5.0))
        f28 = float(units.ab_to_njy(28.0))
        assert np.isclose(sig, f28 / 5.0)
