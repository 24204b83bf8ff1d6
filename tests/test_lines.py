"""Emission-line table tests.

The reference records per-galaxy line quantities from the grid's Cloudy line
tables (`pipeline.get_lines`/`get_observed_lines`, reference
library.py:2611-2612). Here `SPSGrid.lines` carries the tables,
`BatchSEDSimulator.line_quantities` contracts them against the SFZH, and
`LibraryGenerator(emission_lines=...)` records flux/EW columns.
"""

import numpy as np
import pytest

import synference_tpu as st
from synference_tpu.grids import SPSGrid, make_synthetic_grid

PARAMS = ("log10_mass", "redshift", "burst_age", "sigma",
          "log10_metallicity", "tau_v")


def _sim(line_strength=50.0, **kw):
    grid = make_synthetic_grid(n_ages=24, n_mets=4, n_wav=4096,
                               line_strength=line_strength)
    filters = st.FilterSet([st.tophat_filter("F200W", 20000.0, 4600.0)])
    # reprocessed channel must carry the nebular component for the realized
    # spectrum to contain the lines the tables describe
    return st.BatchSEDSimulator(
        grid=grid, filters=filters, param_names=PARAMS,
        sfh="gaussian_burst", zdist="delta",
        emission=st.EmissionConfig(reprocessed_types=("total",)), **kw)


def _young_theta(n=8, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([
        rng.uniform(8, 10.5, n), rng.uniform(0.5, 4.0, n),
        rng.uniform(3e6, 8e6, n), rng.uniform(5e5, 2e6, n),
        rng.uniform(-3.5, -1.6, n), rng.uniform(0.0, 1.0, n),
    ], axis=1).astype(np.float32)


class TestGridLines:
    def test_synthetic_grid_has_tables(self):
        g = make_synthetic_grid(n_ages=12, n_mets=3, n_wav=512)
        assert g.lines is not None
        assert g.lines["luminosity"].shape == (12, 3, 5)
        assert "H 1 6562.80A" in g.lines["ids"]

    def test_hdf5_roundtrip(self, tmp_path):
        g = make_synthetic_grid(n_ages=12, n_mets=3, n_wav=512)
        p = str(tmp_path / "grid.h5")
        g.to_hdf5(p)
        g2 = SPSGrid.from_hdf5(p)
        assert g2.lines is not None
        assert list(g2.lines["ids"]) == list(g.lines["ids"])
        np.testing.assert_allclose(g2.lines["luminosity"],
                                   g.lines["luminosity"])
        np.testing.assert_allclose(g2.lines["wavelength"],
                                   g.lines["wavelength"])

    def test_per_line_subgroup_layout(self, tmp_path):
        """Synthesizer grids store lines as per-line subgroups."""
        import h5py

        g = make_synthetic_grid(n_ages=8, n_mets=3, n_wav=512)
        p = str(tmp_path / "grid_sub.h5")
        g.to_hdf5(p)
        with h5py.File(p, "a") as f:
            del f["lines"]
            lg = f.create_group("lines")
            for i, lid in enumerate(g.lines["ids"]):
                sub = lg.create_group(lid)
                sub.attrs["wavelength"] = g.lines["wavelength"][i]
                sub.create_dataset("luminosity",
                                   data=g.lines["luminosity"][..., i])
                sub.create_dataset("continuum",
                                   data=g.lines["continuum"][..., i])
        g2 = SPSGrid.from_hdf5(p)
        assert set(g2.lines["ids"]) == set(g.lines["ids"])
        order = [g2.lines["ids"].index(i) for i in g.lines["ids"]]
        np.testing.assert_allclose(
            g2.lines["luminosity"][..., order], g.lines["luminosity"],
            rtol=1e-6)

    def test_resample_preserves_lines(self):
        g = make_synthetic_grid(n_ages=8, n_mets=3, n_wav=512)
        g2 = g.resampled_loglam(256)
        assert g2.lines is not None


class TestLineQuantities:
    def test_shapes_and_finite(self):
        sim = _sim()
        theta = _young_theta()
        lq = sim.line_quantities(theta)
        assert lq["flux"].shape == (8, 5)
        for k in ("luminosity", "flux", "ew_rest", "ew_obs"):
            assert np.isfinite(lq[k]).all()
            assert (lq[k] >= 0).all()

    def test_subset_selection(self):
        sim = _sim()
        lq = sim.line_quantities(_young_theta(4),
                                 line_ids=["H 1 6562.80A"])
        assert lq["flux"].shape == (4, 1)
        assert lq["ids"] == ["H 1 6562.80A"]

    def test_ew_matches_window_integration(self):
        """Table-derived EWs must agree with continuum-window integration of
        the realized spectrum (the two measurement routes are independent).
        line_strength is cranked so the spikes dominate the window
        integration's continuum-slope systematics (~0.5 Å)."""
        sim = _sim(line_strength=5.0e5)
        theta = _young_theta(8)
        lq = sim.line_quantities(theta)
        out = sim.simulate(theta, want_spectra=True)
        from synference_tpu.supplementary import compute_supplementary

        win = np.asarray(compute_supplementary(
            ["ew_halpha", "ew_hbeta", "ew_oiii"], sim, theta, out))
        for j, lid in enumerate(["H 1 6562.80A", "H 1 4861.32A",
                                 "O 3 5006.84A"]):
            tab = lq["ew_rest"][:, lq["ids"].index(lid)]
            rel = np.abs(tab - win[:, j]) / np.maximum(win[:, j], 1e-10)
            # window integration on a coarse λ grid is ~10-20% accurate
            assert np.median(rel) < 0.3, (lid, tab, win[:, j])

    def test_ew_obs_redshift_scaling(self):
        sim = _sim()
        theta = _young_theta(4)
        lq = sim.line_quantities(theta)
        np.testing.assert_allclose(
            lq["ew_obs"], lq["ew_rest"] * (1.0 + theta[:, 1:2]), rtol=1e-5)

    def test_dust_attenuates_lines(self):
        sim = _sim()
        theta = _young_theta(4)
        dusty = theta.copy()
        dusty[:, 5] = 2.0
        clear = theta.copy()
        clear[:, 5] = 0.0
        f_dusty = sim.line_quantities(dusty)["flux"]
        f_clear = sim.line_quantities(clear)["flux"]
        assert (f_dusty < f_clear).all()

    def test_no_tables_raises(self):
        grid = make_synthetic_grid(n_ages=8, n_mets=3, n_wav=512)
        grid.lines = None
        filters = st.FilterSet([st.tophat_filter("F200W", 20000.0, 4600.0)])
        sim = st.BatchSEDSimulator(grid=grid, filters=filters,
                                   param_names=PARAMS, sfh="gaussian_burst")
        with pytest.raises(ValueError, match="line tables"):
            sim.line_quantities(_young_theta(2))


class TestLibraryLines:
    def test_generator_records_line_columns(self, tmp_path):
        from synference_tpu.library import LibraryGenerator, load_library_hdf5

        sim = _sim()
        gen = LibraryGenerator(
            sim,
            param_ranges={
                "log10_mass": (8.0, 10.5), "redshift": (0.5, 4.0),
                "burst_age": (3e6, 8e6), "sigma": (5e5, 2e6),
                "log10_metallicity": (-3.5, -1.6), "tau_v": (0.0, 1.0),
            },
            supplementary=("m_uv",),
            emission_lines=("H 1 6562.80A", "O 3 5006.84A"),
        )
        p = str(tmp_path / "lib.h5")
        gen.generate(64, batch_size=32, out_path=p)
        lib = load_library_hdf5(p)
        names = lib["supplementary_parameter_names"]
        assert "line_flux_H 1 6562.80A" in names
        assert "line_ew_O 3 5006.84A" in names
        cols = lib["supplementary_parameters"]
        assert cols.shape == (5, 64)  # m_uv + 2 fluxes + 2 EWs
        flux = cols[names.index("line_flux_H 1 6562.80A")]
        assert np.isfinite(flux).all() and (flux >= 0).all()
