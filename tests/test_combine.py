"""Outer-product library combination tests (reference
`CombinedBasis.create_library`, library.py:3644-3974)."""

import jax
import numpy as np
import pytest

from synference_tpu.combine import combine_libraries, combine_libraries_matched
from synference_tpu.library import load_library_hdf5, save_library_hdf5


def _toy_library(name, param, n_per_z, zs, base_logmass=9.0, seed=0,
                 with_supp=False):
    """Photometry rows proportional to 10^base_logmass with a distinctive
    per-row signature so combination cells can be identified numerically."""
    rng = np.random.default_rng(seed)
    rows = []
    zcol, pcol = [], []
    for z in zs:
        p = rng.uniform(0.0, 1.0, n_per_z)
        for v in p:
            rows.append([1.0 + v, 2.0 + v, 3.0 + v])  # (F=3,) base shape
            zcol.append(z)
            pcol.append(v)
    phot = np.asarray(rows, np.float64).T * 10.0 ** base_logmass  # (F, N)
    params = np.stack([np.asarray(zcol), np.asarray(pcol)])  # (2, N)
    lib = {
        "photometry": phot.astype(np.float32),
        "parameters": params.astype(np.float32),
        "parameter_names": ["redshift", param],
        "filter_codes": ["F1", "F2", "F3"],
        "model_name": name,
    }
    if with_supp:
        # flux-like supplementary: proportional to mass
        lib["supplementary_parameters"] = (
            phot[:1] * 2.0
        ).astype(np.float32)
        lib["supplementary_parameter_names"] = ["line_flux"]
    return lib


class TestOuterProduct:
    def test_shapes_and_columns(self):
        zs = [0.5, 1.0]
        a = _toy_library("stellar", "alpha", 3, zs, seed=1)
        b = _toy_library("agn", "beta", 2, zs, seed=2)
        masses = [8.0, 10.0]
        weights = [[0.3, 0.7], [0.5, 0.5]]
        out = combine_libraries([a, b], masses, zs, weights)
        n_expected = len(zs) * len(masses) * len(weights) * 3 * 2
        assert out["photometry"].shape == (3, n_expected)
        assert out["parameters"].shape == (5, n_expected)
        assert out["parameter_names"] == [
            "redshift", "log_mass", "weight_fraction",
            "stellar/alpha", "agn/beta",
        ]

    def test_mass_scaling_exact(self):
        """Each output cell must equal w_i · 10^m / m_base × base photometry
        summed over bases — checked cell by cell against a hand computation."""
        zs = [1.0]
        a = _toy_library("stellar", "alpha", 2, zs, base_logmass=9.0, seed=3)
        b = _toy_library("agn", "beta", 2, zs, base_logmass=9.0, seed=4)
        masses = [10.0]
        weights = [[0.25, 0.75]]
        out = combine_libraries([a, b], masses, zs, weights,
                                log_base_masses=9.0)
        pa = np.asarray(a["photometry"], np.float64) / 1e9
        pb = np.asarray(b["photometry"], np.float64) / 1e9
        # outer-product ordering: meshgrid(ij) -> a-index slow, b-index fast
        k = 0
        for ia in range(2):
            for ib in range(2):
                expected = 0.25 * 1e10 * pa[:, ia] + 0.75 * 1e10 * pb[:, ib]
                np.testing.assert_allclose(
                    out["photometry"][:, k], expected, rtol=2e-5
                )
                assert out["parameters"][1, k] == pytest.approx(10.0)
                assert out["parameters"][2, k] == pytest.approx(0.25)
                k += 1

    def test_supplementary_scaled_and_summed(self):
        zs = [1.0]
        a = _toy_library("s", "alpha", 2, zs, seed=5, with_supp=True)
        b = _toy_library("g", "beta", 2, zs, seed=6, with_supp=True)
        out = combine_libraries([a, b], [9.0], zs, [[0.5, 0.5]])
        assert out["supplementary_parameter_names"] == ["line_flux"]
        sa = np.asarray(a["supplementary_parameters"], np.float64) / 1e9
        sb = np.asarray(b["supplementary_parameters"], np.float64) / 1e9
        expected = 0.5 * 1e9 * sa[0, 0] + 0.5 * 1e9 * sb[0, 0]
        assert out["supplementary_parameters"][0, 0] == pytest.approx(
            expected, rel=2e-5
        )

    def test_missing_redshift_raises(self):
        a = _toy_library("s", "alpha", 2, [0.5])
        with pytest.raises(ValueError, match="no rows at z"):
            combine_libraries([a], [9.0], [2.0])

    def test_single_base_mass_grid(self):
        zs = [0.5]
        a = _toy_library("s", "alpha", 3, zs, base_logmass=9.0)
        out = combine_libraries([a], [8.0, 9.0, 10.0], zs)
        assert out["photometry"].shape == (3, 9)
        assert "weight_fraction" not in out["parameter_names"]
        # the m=9 block reproduces the base photometry exactly
        block = out["photometry"][:, 3:6]
        np.testing.assert_allclose(block, a["photometry"], rtol=2e-5)

    def test_hdf5_roundtrip_schema(self, tmp_path):
        """Combined library must round-trip through the reference HDF5
        schema and feed SBIFitter.init_from_hdf5."""
        from synference_tpu.fitter import SBIFitter

        zs = [0.5, 1.0]
        a = _toy_library("stellar", "alpha", 3, zs, seed=7)
        b = _toy_library("agn", "beta", 2, zs, seed=8)
        path = str(tmp_path / "combined.h5")
        combine_libraries([a, b], [8.0, 10.0], zs, [[0.3, 0.7]],
                          out_path=path)
        lib = load_library_hdf5(path)
        assert lib["parameter_names"][:3] == [
            "redshift", "log_mass", "weight_fraction"
        ]
        fitter = SBIFitter.init_from_hdf5(path)
        assert fitter.photometry.shape[1] == 3
        assert fitter.parameters.shape[1] == 5


class TestSpectralMode:
    """Spectra-mode combination (reference `create_spectral_grid` ->
    `create_full_library(spectral_mode=True)`, library.py:4887-4919):
    the combined observable is the bases' observed spectra under the same
    mass renormalization; wavelengths stand in for filter codes."""

    def _spec_library(self, name, param, n_per_z, zs, base_logmass=9.0,
                      seed=0, n_lam=16):
        lib = _toy_library(name, param, n_per_z, zs, base_logmass, seed)
        rng = np.random.default_rng(seed + 100)
        n = lib["parameters"].shape[1]
        lam = np.geomspace(1e3, 1e5, n_lam)
        # per-row spectra proportional to mass with a distinctive shape
        shape = 1.0 + rng.uniform(0, 1, (n_lam, n))
        lib["spectra"] = (shape * 10.0 ** base_logmass).astype(np.float32)
        lib["wavelengths"] = lam
        return lib

    def test_matched_spectral(self, tmp_path):
        zs = [1.0]
        a = self._spec_library("s", "alpha", 4, zs, seed=11)
        b = self._spec_library("g", "beta", 4, zs, seed=12)
        log_m = np.array([8.0, 9.0, 10.0, 11.0])
        w = np.tile([[0.4, 0.6]], (4, 1))
        path = str(tmp_path / "spec_combined.h5")
        out = combine_libraries_matched([a, b], log_m, w, out_path=path,
                                        spectral_mode=True)
        assert "photometry" not in out
        assert out["spectra"].shape == (16, 4)
        np.testing.assert_allclose(out["wavelengths"], a["wavelengths"])
        sa = np.asarray(a["spectra"], np.float64) / 1e9
        sb = np.asarray(b["spectra"], np.float64) / 1e9
        for k in range(4):
            expected = (0.4 * sa[:, k] + 0.6 * sb[:, k]) * 10.0 ** log_m[k]
            np.testing.assert_allclose(out["spectra"][:, k], expected,
                                       rtol=2e-5)
        # round-trips through the reference schema with Grid/Spectra
        lib = load_library_hdf5(path)
        np.testing.assert_allclose(lib["spectra"], out["spectra"], rtol=1e-6)
        np.testing.assert_allclose(lib["wavelengths"], a["wavelengths"])

    def test_outer_product_spectral(self):
        zs = [0.5]
        a = self._spec_library("s", "alpha", 3, zs, base_logmass=9.0, seed=13)
        out = combine_libraries([a], [8.0, 9.0, 10.0], zs,
                                spectral_mode=True)
        assert out["spectra"].shape == (16, 9)
        # the m=9 block reproduces the base spectra exactly
        np.testing.assert_allclose(out["spectra"][:, 3:6], a["spectra"],
                                   rtol=2e-5)

    def test_mismatched_wavelength_grids_raise(self):
        zs = [1.0]
        a = self._spec_library("s", "alpha", 2, zs, seed=14)
        b = self._spec_library("g", "beta", 2, zs, seed=15)
        b["wavelengths"] = b["wavelengths"] * 1.01
        with pytest.raises(ValueError, match="wavelength grid"):
            combine_libraries_matched([a, b], np.full(2, 9.0),
                                      np.tile([[0.5, 0.5]], (2, 1)),
                                      spectral_mode=True)

    def test_missing_spectra_raise(self):
        a = _toy_library("s", "alpha", 2, [1.0])
        with pytest.raises(ValueError, match="spectra"):
            combine_libraries([a], [9.0], [1.0], spectral_mode=True)


class TestMatched:
    def test_matched_rows(self):
        zs = [1.0]
        a = _toy_library("s", "alpha", 4, zs, seed=9)
        b = _toy_library("g", "beta", 4, zs, seed=10)
        log_m = np.array([8.0, 9.0, 10.0, 11.0])
        w = np.tile([[0.4, 0.6]], (4, 1))
        out = combine_libraries_matched([a, b], log_m, w)
        assert out["photometry"].shape == (3, 4)
        pa = np.asarray(a["photometry"], np.float64) / 1e9
        pb = np.asarray(b["photometry"], np.float64) / 1e9
        for k in range(4):
            expected = (0.4 * pa[:, k] + 0.6 * pb[:, k]) * 10.0 ** log_m[k]
            np.testing.assert_allclose(out["photometry"][:, k], expected,
                                       rtol=2e-5)


class TestPhysicalConsistency:
    def test_single_base_rescaling_matches_simulator(self, test_grid,
                                                     nircam_filters):
        """Combining a base generated at log10_mass=9 up to log10_mass=11
        must reproduce the simulator run directly at log10_mass=11
        (photometry is linear in stellar mass at fixed θ — the assumption
        the whole combination machinery rests on)."""
        from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

        sim = BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
        )
        rng = np.random.default_rng(0)
        n = 8
        z = 1.5
        theta9 = np.stack([
            np.full(n, 9.0), np.full(n, z),
            rng.uniform(1e8, 5e8, n), rng.uniform(0.3, 0.8, n),
            rng.uniform(-3, -2, n), rng.uniform(0, 1, n),
        ], axis=1).astype(np.float32)
        phot9 = np.asarray(jax.jit(sim.photometry)(theta9))
        theta11 = theta9.copy()
        theta11[:, 0] = 11.0
        phot11 = np.asarray(jax.jit(sim.photometry)(theta11))

        lib = {
            "photometry": phot9.T,
            "parameters": theta9.T,
            "parameter_names": list(sim.param_names),
            "filter_codes": list(nircam_filters.codes),
            "model_name": "stellar",
        }
        out = combine_libraries(
            [lib], [11.0], [z], mass_params=["log10_mass"]
        )
        assert out["photometry"].shape == (phot9.shape[1], n)
        np.testing.assert_allclose(
            out["photometry"], phot11.T, rtol=2e-3
        )


class TestSelectiveSupplementaryScaling:
    """Per-quantity mass scaling (the reference scales only flux-like
    supplementary quantities, library.py:3865-3881)."""

    def _lib(self):
        lib = _toy_library("b", "p", 2, [1.0], with_supp=True)
        # add a mag-like column that must NOT scale with mass
        muv = np.full((1, lib["parameters"].shape[1]), -20.0, np.float32)
        lib["supplementary_parameters"] = np.concatenate(
            [lib["supplementary_parameters"], muv])
        lib["supplementary_parameter_names"] = ["line_flux", "m_uv"]
        return lib

    def test_named_columns_scale_selectively(self):
        lib = self._lib()
        out = combine_libraries(
            [lib], log_stellar_masses=[10.0], redshifts=[1.0],
            scale_supplementary=("line_flux",), log_base_masses=9.0)
        supp = out["supplementary_parameters"]
        names = out["supplementary_parameter_names"]
        i_flux = names.index("line_flux")
        i_muv = names.index("m_uv")
        # flux scaled by 10^(10-9) = 10; M_UV untouched
        base_flux = lib["supplementary_parameters"][0]
        np.testing.assert_allclose(
            np.sort(supp[i_flux]), np.sort(base_flux * 10.0), rtol=1e-5)
        np.testing.assert_allclose(supp[i_muv], -20.0, rtol=1e-6)

    def test_matched_selective(self):
        lib = self._lib()
        out = combine_libraries_matched(
            [lib], log_stellar_masses=10.0,
            scale_supplementary=("line_flux",), log_base_masses=9.0)
        names = out["supplementary_parameter_names"]
        supp = out["supplementary_parameters"]
        np.testing.assert_allclose(supp[names.index("m_uv")], -20.0)
        np.testing.assert_allclose(
            supp[names.index("line_flux")],
            lib["supplementary_parameters"][0] * 10.0, rtol=1e-5)

    def test_unknown_name_raises(self):
        lib = self._lib()
        with pytest.raises(ValueError, match="not in"):
            combine_libraries(
                [lib], log_stellar_masses=[10.0], redshifts=[1.0],
                scale_supplementary=("nope",))

    def test_auto_classifies_by_name_and_units(self):
        """"auto" scales flux-like columns (built-in names, line_flux_*,
        unit-string fallback) and leaves mags/ratios/ages untouched —
        mirroring the reference's unyt-dimension dispatch
        (library.py:3865-3881, utils.check_scaling)."""
        lib = self._lib()
        n = lib["parameters"].shape[1]
        extra = np.stack([
            np.full(n, 3.0, np.float32),   # sfr_10 (known: scales)
            np.full(n, 0.5, np.float32),   # beta_uv (known: invariant)
            np.full(n, 7.0, np.float32),   # line_flux_Ha (prefix: scales)
            np.full(n, 2.0, np.float32),   # custom, unit erg/s (scales)
            np.full(n, 9.0, np.float32),   # custom, unit Myr (invariant)
        ])
        lib["supplementary_parameters"] = np.concatenate(
            [lib["supplementary_parameters"], extra])
        lib["supplementary_parameter_names"] = [
            "line_flux", "m_uv", "sfr_10", "beta_uv", "line_flux_Ha",
            "custom_lum", "custom_age"]
        lib["supplementary_parameter_units"] = [
            "erg/s/cm**2", "mag", "Msun/yr", "", "erg/s/cm**2",
            "erg/s", "Myr"]
        out = combine_libraries_matched(
            [lib], log_stellar_masses=10.0,
            scale_supplementary="auto", log_base_masses=9.0)
        names = out["supplementary_parameter_names"]
        supp = out["supplementary_parameters"]

        def col(name):
            return supp[names.index(name)]

        np.testing.assert_allclose(
            col("line_flux"), lib["supplementary_parameters"][0] * 10.0,
            rtol=1e-5)
        np.testing.assert_allclose(col("sfr_10"), 30.0, rtol=1e-5)
        np.testing.assert_allclose(col("line_flux_Ha"), 70.0, rtol=1e-5)
        np.testing.assert_allclose(col("custom_lum"), 20.0, rtol=1e-5)
        np.testing.assert_allclose(col("m_uv"), -20.0, rtol=1e-6)
        np.testing.assert_allclose(col("beta_uv"), 0.5, rtol=1e-6)
        np.testing.assert_allclose(col("custom_age"), 9.0, rtol=1e-6)

    def test_auto_unclassifiable_raises(self):
        lib = self._lib()
        lib["supplementary_parameter_names"] = ["line_flux", "mystery"]
        with pytest.raises(ValueError, match="cannot classify"):
            combine_libraries(
                [lib], log_stellar_masses=[10.0], redshifts=[1.0],
                scale_supplementary="auto")
