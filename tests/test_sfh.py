"""SFH/ZDist weight-kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.sfh import (
    SFH_FAMILIES,
    make_age_sampling,
    sfh_weights,
    zdist_weights,
)


@pytest.fixture(scope="module")
def sampling(test_grid):
    return make_age_sampling(test_grid.age_bin_edges_yr, n_sub=4)


PARAMS = {
    "constant": {"max_age": 1e9},
    "lognormal": {"max_age": 1e9, "peak_age": 3e8, "tau": 0.5},
    "delayed_tau": {"max_age": 1e9, "tau": 2e8},
    "exponential": {"max_age": 1e9, "tau": 3e8},
    "rising_exponential": {"max_age": 1e9, "tau": 3e8},
    "double_power_law": {"max_age": 1e9, "peak_age": 2e8},
    "gaussian_burst": {"max_age": 1e9, "burst_age": 1e8, "sigma": 3e7},
}


@pytest.mark.parametrize("family", list(SFH_FAMILIES))
def test_weights_normalized_nonneg(family, sampling):
    p = {k: jnp.asarray(v, jnp.float32) for k, v in PARAMS[family].items()}
    w = np.asarray(sfh_weights(family, p, sampling))
    assert w.shape == (sampling.n_bins,)
    assert np.all(w >= 0)
    assert np.isclose(w.sum(), 1.0, atol=1e-5)


def test_constant_max_age_cut(sampling, test_grid):
    w = np.asarray(
        sfh_weights("constant", {"max_age": jnp.asarray(1e8)}, sampling)
    )
    # no mass in bins entirely older than max_age
    edges = test_grid.age_bin_edges_yr
    old = edges[:-1] > 1e8
    assert w[old].sum() < 1e-6
    # mass distribution roughly uniform in linear time below the cut
    widths = np.diff(edges)
    young_full = edges[1:] < 1e8
    expected = widths[young_full] / 1e8
    np.testing.assert_allclose(w[young_full], expected, rtol=0.05)


def test_lognormal_peak_location(sampling, test_grid):
    p = {
        "max_age": jnp.asarray(5e9),
        "peak_age": jnp.asarray(1e9),
        "tau": jnp.asarray(0.3),
    }
    w = np.asarray(sfh_weights("lognormal", p, sampling))
    # peak mass-formation rate (w / bin width) should be near lookback 1e9
    widths = np.diff(test_grid.age_bin_edges_yr)
    rate = w / widths
    peak_age = test_grid.ages_yr[np.argmax(rate)]
    assert 3e8 < peak_age < 3e9


def test_dense_basis_fractions(sampling):
    fr = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    p = {"fractions": fr, "max_age": jnp.asarray(1e9), "min_age": jnp.asarray(1e7)}
    w = np.asarray(sfh_weights("dense_basis", p, sampling))
    assert np.isclose(w.sum(), 1.0, atol=1e-5)
    assert np.all(w >= 0)


def test_sfh_is_jittable_and_vmappable(sampling):
    @jax.jit
    def f(peak, tau):
        return sfh_weights(
            "lognormal",
            {"max_age": jnp.asarray(1e9), "peak_age": peak, "tau": tau},
            sampling,
        )

    batched = jax.vmap(f)(
        jnp.asarray([2e8, 4e8, 6e8]), jnp.asarray([0.3, 0.5, 0.7])
    )
    assert batched.shape[0] == 3
    np.testing.assert_allclose(np.asarray(batched.sum(axis=1)), 1.0, atol=1e-5)


class TestZDist:
    def test_delta_on_grid_point(self, test_grid):
        lz = test_grid.log10_metallicities
        w = np.asarray(
            zdist_weights("delta", {"log10_metallicity": jnp.asarray(lz[3])}, lz)
        )
        assert np.isclose(w[3], 1.0, atol=1e-5)
        assert np.isclose(w.sum(), 1.0, atol=1e-5)

    def test_delta_between_points(self, test_grid):
        lz = test_grid.log10_metallicities
        mid = 0.5 * (lz[2] + lz[3])
        w = np.asarray(
            zdist_weights("delta", {"log10_metallicity": jnp.asarray(mid)}, lz)
        )
        assert np.isclose(w[2], 0.5, atol=1e-4)
        assert np.isclose(w[3], 0.5, atol=1e-4)

    def test_delta_clips_out_of_range(self, test_grid):
        lz = test_grid.log10_metallicities
        w = np.asarray(
            zdist_weights("delta", {"log10_metallicity": jnp.asarray(-9.0)}, lz)
        )
        assert np.isclose(w[0], 1.0, atol=1e-5)

    def test_normal(self, test_grid):
        lz = test_grid.log10_metallicities
        w = np.asarray(
            zdist_weights(
                "normal",
                {"log10_metallicity": jnp.asarray(lz.mean()), "log10_sigma": jnp.asarray(0.3)},
                lz,
            )
        )
        assert np.isclose(w.sum(), 1.0, atol=1e-5)
        assert w.argmax() not in (0, len(lz) - 1)
