"""Cosmology tests: Gauss-Legendre results vs scipy.integrate.quad references."""

import numpy as np
import pytest
from scipy import integrate

from synference_tpu.cosmology import PLANCK18, Cosmology


def _ref_comoving_mpc(cosmo, z):
    e = lambda zz: np.sqrt(cosmo.om0 * (1 + zz) ** 3 + cosmo.ode0)
    val, _ = integrate.quad(lambda zz: 1.0 / e(zz), 0.0, z)
    return cosmo.hubble_distance_mpc * val


def _ref_age_gyr(cosmo, z):
    integrand = lambda a: np.sqrt(a) / np.sqrt(cosmo.om0 + cosmo.ode0 * a**3)
    val, _ = integrate.quad(integrand, 0.0, 1.0 / (1.0 + z))
    return cosmo.hubble_time_gyr * val


@pytest.mark.parametrize("z", [0.01, 0.1, 0.5, 1.0, 3.0, 7.0, 12.0])
def test_luminosity_distance_matches_quad(z):
    ours = float(PLANCK18.luminosity_distance_mpc(z))
    ref = (1 + z) * _ref_comoving_mpc(PLANCK18, z)
    assert abs(ours - ref) / ref < 1e-4


@pytest.mark.parametrize("z", [0.0, 0.5, 2.0, 6.0, 10.0])
def test_age_matches_quad(z):
    ours = float(PLANCK18.age_gyr(z))
    ref = _ref_age_gyr(PLANCK18, z)
    assert abs(ours - ref) / ref < 1e-4


def test_age_today_reasonable():
    # Planck18 age of universe ~ 13.79 Gyr
    assert 13.5 < float(PLANCK18.age_gyr(0.0)) < 14.1


def test_vmappable_batch():
    import jax

    zs = np.linspace(0.1, 10.0, 64).astype(np.float32)
    batched = jax.jit(PLANCK18.luminosity_distance_mpc)(zs)
    singles = np.array([float(PLANCK18.luminosity_distance_mpc(z)) for z in zs[:5]])
    np.testing.assert_allclose(np.asarray(batched[:5]), singles, rtol=1e-5)
    assert np.all(np.diff(np.asarray(batched)) > 0)  # monotonic in z


def test_distance_modulus():
    c = Cosmology(h0=70.0, om0=0.3)
    z = 1.0
    dl_pc = float(c.luminosity_distance_mpc(z)) * 1e6
    assert np.isclose(
        float(c.distance_modulus(z)), 5 * np.log10(dl_pc / 10.0), rtol=1e-6
    )
