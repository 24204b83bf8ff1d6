"""AGN component tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.agn import AGNSimulator, agn_fraction
from synference_tpu.composite import CompositeSEDSimulator
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig


@pytest.fixture(scope="module")
def agn(test_grid, nircam_filters):
    return AGNSimulator(test_grid, nircam_filters)


class TestAGN:
    def test_photometry_finite_positive(self, agn):
        theta = np.array([
            [44.0, 1.0, -0.5, 0.0],
            [46.0, 3.0, -0.3, 0.5],
        ], np.float32)
        p = np.asarray(agn.photometry(theta))
        assert p.shape == (2, 7)
        assert np.isfinite(p).all() and (p > 0).all()

    def test_luminosity_scaling(self, agn):
        t1 = np.array([[44.0, 1.0, -0.5, 0.0]], np.float32)
        t2 = np.array([[45.0, 1.0, -0.5, 0.0]], np.float32)
        p1 = np.asarray(agn.photometry(t1))
        p2 = np.asarray(agn.photometry(t2))
        np.testing.assert_allclose(p2 / p1, 10.0, rtol=1e-3)

    def test_bolometric_normalization(self, agn):
        """∫ L_ν dν should equal 10**log10_l_agn."""
        out = agn.simulate(
            np.array([[45.0, 1.0, -0.5, 0.0]], np.float32), want_spectra=True
        )
        lnu = np.asarray(out["lnu"][0], np.float64)
        lam = np.asarray(agn.grid.lam, np.float64)
        nu = 2.99792458e18 / lam
        lbol = np.trapezoid(lnu[::-1], nu[::-1])
        assert abs(np.log10(lbol) - 45.0) < 0.05

    def test_slope_changes_colors(self, test_grid, nircam_filters):
        # torus off so the local band ratio reflects the disk slope alone
        agn = AGNSimulator(
            test_grid, nircam_filters,
            param_names=("log10_l_agn", "redshift", "agn_slope", "tau_v",
                         "torus_fraction"),
        )
        blue = np.asarray(agn.photometry(
            np.array([[45.0, 1.0, 0.5, 0.0, 0.0]], np.float32)))[0]
        red = np.asarray(agn.photometry(
            np.array([[45.0, 1.0, -1.5, 0.0, 0.0]], np.float32)))[0]
        # adjacent blue bands: ν^α local ratio tracks the slope directly
        assert blue[0] / blue[1] > red[0] / red[1]

    def test_composite_stellar_plus_agn(self, test_grid, nircam_filters, agn):
        stellar = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
        )
        comp = CompositeSEDSimulator(
            {"stars": stellar, "agn": agn}, shared=("redshift",)
        )
        idx = {p: i for i, p in enumerate(comp.param_names)}
        theta = np.zeros((2, len(comp.param_names)), np.float32)
        theta[:, idx["redshift"]] = 1.0
        theta[:, idx["stars.log10_mass"]] = 9.0
        theta[:, idx["stars.peak_age"]] = 3e8
        theta[:, idx["stars.tau"]] = 0.5
        theta[:, idx["stars.log10_metallicity"]] = -2.5
        theta[:, idx["stars.tau_v"]] = 0.3
        theta[0, idx["agn.log10_l_agn"]] = 30.0  # negligible AGN
        theta[1, idx["agn.log10_l_agn"]] = 46.5  # AGN-dominated
        theta[:, idx["agn.agn_slope"]] = -0.5
        p = np.asarray(comp.photometry(theta))
        assert np.isfinite(p).all()
        assert p[1].sum() > 3.0 * p[0].sum()

    def test_agn_fraction(self, test_grid):
        lam = jnp.asarray(test_grid.lam, jnp.float32)
        stellar = jnp.ones((1, test_grid.n_wav))
        agn_l = 3.0 * jnp.ones((1, test_grid.n_wav))
        f = np.asarray(agn_fraction(stellar, agn_l, lam))
        np.testing.assert_allclose(f, 0.75, rtol=1e-5)


# ---------------------------------------------------------------------------
# Grid-based AGN (Cloudy NLR/BLR reprocessing)
# ---------------------------------------------------------------------------

from synference_tpu.agn import AGNGridSimulator  # noqa: E402
from synference_tpu.grids import make_synthetic_agn_grid  # noqa: E402
from synference_tpu.library import (LibraryGenerator,  # noqa: E402
                                    simulator_from_library)


@pytest.fixture(scope="module")
def agn_grid():
    return make_synthetic_agn_grid(n_wav=1024)


@pytest.fixture(scope="module")
def grid_agn(agn_grid, nircam_filters):
    return AGNGridSimulator(agn_grid, nircam_filters)


class TestAGNGrid:
    """AGN Cloudy-grid reprocessing through the standard pipeline
    (ref: BlackHole components w/ Cloudy NLR/BLR, library.py:1361-1419)."""

    def _theta(self, grid_agn, **over):
        base = {
            "log10_l_agn": 45.0, "redshift": 1.0,
            "ionisation_parameter": -2.0, "hydrogen_density": 4.0,
            "covering_fraction_blr": 0.1, "covering_fraction_nlr": 0.15,
            "tau_v": 0.1,
        }
        base.update(over)
        return np.asarray(
            [[base[p] for p in grid_agn.param_names]], np.float32)

    def test_param_names_autoderived(self, grid_agn):
        assert grid_agn.param_names == (
            "log10_l_agn", "redshift", "ionisation_parameter",
            "hydrogen_density", "covering_fraction_blr",
            "covering_fraction_nlr", "tau_v")

    def test_photometry_finite_positive(self, grid_agn):
        theta = np.vstack([
            self._theta(grid_agn),
            self._theta(grid_agn, log10_l_agn=46.5, redshift=4.0,
                        ionisation_parameter=-0.5, hydrogen_density=5.5,
                        covering_fraction_nlr=0.4, tau_v=0.8),
        ])
        p = np.asarray(grid_agn.photometry(theta))
        assert p.shape == (2, 7)
        assert np.isfinite(p).all() and (p > 0).all()

    def test_luminosity_scaling(self, grid_agn):
        p1 = np.asarray(grid_agn.photometry(self._theta(grid_agn)))
        p2 = np.asarray(grid_agn.photometry(
            self._theta(grid_agn, log10_l_agn=46.0)))
        np.testing.assert_allclose(p2 / p1, 10.0, rtol=1e-3)

    def test_axis_interp_matches_fixed_grid(self, agn_grid, grid_agn,
                                            nircam_filters):
        """θ at interior (off-node) axis values must match a grid collapsed
        there with fix_axes — the lerp-delta weights ARE the lerp."""
        u, nh = -1.7, 3.3
        fixed = agn_grid.fix_axes({"ionisation_parameter": u,
                                   "hydrogen_density": nh})
        sim_fixed = AGNGridSimulator(fixed, nircam_filters)
        th_full = self._theta(grid_agn, ionisation_parameter=u,
                              hydrogen_density=nh)
        th_fixed = np.asarray([[45.0, 1.0, 0.1, 0.15, 0.1]], np.float32)
        assert sim_fixed.param_names == (
            "log10_l_agn", "redshift", "covering_fraction_blr",
            "covering_fraction_nlr", "tau_v")
        p_full = np.asarray(grid_agn.photometry(th_full))
        p_fixed = np.asarray(sim_fixed.photometry(th_fixed))
        np.testing.assert_allclose(p_full, p_fixed, rtol=2e-3)

    def test_zero_covering_is_bare_disk(self, grid_agn):
        """cov=0 must reproduce a hand-built incident-only forward model
        (contract incident, dust screen, observe, convolve)."""
        import jax

        th = self._theta(grid_agn, covering_fraction_blr=0.0,
                         covering_fraction_nlr=0.0)
        p_cov0 = np.asarray(grid_agn.photometry(th))

        def disk_fnu(row):
            params = grid_agn.theta_dict(jnp.asarray(row))
            sfzh, _ = grid_agn._sfzh(params)
            lnu = jnp.matmul(sfzh, grid_agn._components["incident"],
                             preferred_element_type=jnp.float32)
            lnu = lnu * jnp.exp(-params["tau_v"] * grid_agn._dust_curve)
            fnu, _ = grid_agn._observe(params, lnu)
            return fnu

        fnu = jax.jit(jax.vmap(disk_fnu))(th)
        p_bands = np.asarray(grid_agn._photometry_batch(
            fnu, jnp.asarray(th[:, 1])))
        np.testing.assert_allclose(p_cov0, p_bands, rtol=2e-3)

    def test_covering_fraction_line_scaling(self, grid_agn, agn_grid):
        """NLR lines scale with cov_nlr; BLR lines don't."""
        lq1 = grid_agn.line_quantities(self._theta(grid_agn))
        lq2 = grid_agn.line_quantities(
            self._theta(grid_agn, covering_fraction_nlr=0.3))
        ids = lq1["ids"]
        regions = agn_grid.lines["region"]
        for i, (lid, reg) in enumerate(zip(ids, regions)):
            ratio = lq2["luminosity"][0, i] / lq1["luminosity"][0, i]
            if reg == "nlr":
                np.testing.assert_allclose(ratio, 2.0, rtol=1e-3,
                                           err_msg=lid)
            else:
                np.testing.assert_allclose(ratio, 1.0, rtol=1e-3,
                                           err_msg=lid)

    def test_line_physics_monotonic(self, grid_agn):
        """[OIII]/Hβ rises with U (the BPT-style response baked into the
        grid tables survives the simulator plumbing)."""
        lo = grid_agn.line_quantities(
            self._theta(grid_agn, ionisation_parameter=-2.8))
        hi = grid_agn.line_quantities(
            self._theta(grid_agn, ionisation_parameter=-1.2))
        ids = lo["ids"]
        i_o3 = ids.index("O 3 5006.84A")
        i_hb = ids.index("H 1 4861.32A")
        r_lo = lo["luminosity"][0, i_o3] / lo["luminosity"][0, i_hb]
        r_hi = hi["luminosity"][0, i_o3] / hi["luminosity"][0, i_hb]
        assert r_hi > 1.5 * r_lo

    def test_gradients_finite(self, grid_agn):
        """The AGN path is differentiable (gradient fitters use it)."""
        import jax

        th = jnp.asarray(self._theta(grid_agn)[0])

        def f(t):
            return jnp.log(grid_agn.photometry(t[None])[0]).sum()

        g = np.asarray(jax.grad(f)(th))
        assert np.isfinite(g).all()
        assert abs(g[0]) > 0.1  # log-luminosity derivative ~ n_bands·ln10

    def test_library_roundtrip(self, grid_agn, agn_grid, tmp_path):
        """LibraryGenerator + simulator_from_library reconstruct the AGN
        simulator class through the Model-group registry."""
        gen = LibraryGenerator(grid_agn, {
            "log10_l_agn": (44.0, 47.0),
            "redshift": (0.1, 6.0),
            "ionisation_parameter": (-3.0, 0.0),
            "hydrogen_density": (2.0, 6.0),
            "covering_fraction_blr": (0.0, 0.3),
            "covering_fraction_nlr": (0.0, 0.5),
            "tau_v": (0.0, 1.5),
        })
        path = str(tmp_path / "agn_lib.h5")
        lib = gen.generate(n=32, batch_size=32, seed=7, out_path=path)
        sim2 = simulator_from_library(path, grid=agn_grid)
        assert isinstance(sim2, AGNGridSimulator)
        assert sim2._log10_l_norm == grid_agn._log10_l_norm
        p_rec = np.asarray(sim2.photometry(lib["parameters"].T))
        np.testing.assert_allclose(p_rec, lib["photometry"].T, rtol=2e-3)

    def test_grid_hdf5_roundtrip(self, agn_grid, tmp_path):
        """AGN grid survives the Synthesizer-layout HDF5 round trip,
        including region tags and fp32-unsafe line luminosities."""
        from synference_tpu.grids import SPSGrid
        path = str(tmp_path / "agn_grid.h5")
        agn_grid.to_hdf5(path)
        g2 = SPSGrid.from_hdf5(path)
        assert g2.extra_axis_names == ("ionisation_parameter",
                                       "hydrogen_density")
        assert list(g2.lines["region"]) == list(agn_grid.lines["region"])
        np.testing.assert_allclose(g2.lines["luminosity"],
                                   agn_grid.lines["luminosity"], rtol=1e-6)
        for t in ("incident", "nlr", "blr"):
            np.testing.assert_allclose(g2.spectra[t], agn_grid.spectra[t],
                                       rtol=1e-6)

    def test_composite_stellar_plus_grid_agn(self, test_grid,
                                             nircam_filters, agn_grid):
        """Grid-AGN component sums with a stellar component inside one
        CompositeSEDSimulator program (the reference's Galaxy = Stars +
        BlackHole composition, library.py:1421-1424)."""
        stellar = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
        )
        agn = AGNGridSimulator(agn_grid, nircam_filters)
        comp = CompositeSEDSimulator(
            {"stars": stellar, "agn": agn}, shared=("redshift",))
        idx = {p: i for i, p in enumerate(comp.param_names)}
        theta = np.zeros((2, len(comp.param_names)), np.float32)
        theta[:, idx["redshift"]] = 1.0
        theta[:, idx["stars.log10_mass"]] = 9.5
        theta[:, idx["stars.peak_age"]] = 3e8
        theta[:, idx["stars.tau"]] = 0.5
        theta[:, idx["stars.log10_metallicity"]] = -2.5
        theta[:, idx["stars.tau_v"]] = 0.3
        theta[:, idx["agn.ionisation_parameter"]] = -2.0
        theta[:, idx["agn.hydrogen_density"]] = 4.0
        theta[:, idx["agn.covering_fraction_nlr"]] = 0.3
        theta[:, idx["agn.covering_fraction_blr"]] = 0.15
        theta[0, idx["agn.log10_l_agn"]] = 38.0   # negligible AGN
        theta[1, idx["agn.log10_l_agn"]] = 46.5   # AGN-dominated
        p = np.asarray(comp.photometry(theta))
        assert np.isfinite(p).all()
        assert p[1].sum() > 3.0 * p[0].sum()


class TestAGNLineMixingEdges:
    """Round-3 review regressions on AGNGridSimulator._line_mixing."""

    def test_unmodelled_region_lines_zero(self, agn_grid, nircam_filters):
        """A user modelling only the NLR: BLR-tagged lines must scale by
        covering fraction 0 (not crash on types.index)."""
        sim = AGNGridSimulator(
            agn_grid, nircam_filters,
            emission=EmissionConfig(incident_type="incident",
                                    reprocessed_types=("nlr",), fesc=0.0))
        theta = np.asarray([[
            45.0 if p == "log10_l_agn" else
            1.0 if p == "redshift" else
            -2.0 if p == "ionisation_parameter" else
            4.0 if p == "hydrogen_density" else
            0.2 if p == "covering_fraction_nlr" else
            0.1
            for p in sim.param_names]], np.float32)
        lq = sim.line_quantities(theta)
        regions = agn_grid.lines["region"]
        lum = lq["luminosity"][0]
        assert np.isfinite(lum).all()
        for i, reg in enumerate(regions):
            if reg == "blr":
                assert lum[i] == 0.0, lq["ids"][i]
            else:
                assert lum[i] > 0.0, lq["ids"][i]

    def test_continuum_screened_like_spectrum(self, grid_agn):
        """The AGN screen attenuates the incident channel too (matching
        _apply_emission) — EWs must be tau_v-consistent: with a grey-ish
        screen, rest EW barely changes with tau_v because line AND
        continuum are attenuated together."""
        th0 = np.asarray([[45.0, 1.0, -2.0, 4.0, 0.1, 0.15, 0.0]],
                         np.float32)
        th1 = th0.copy()
        th1[0, -1] = 1.0  # tau_v
        lq0 = grid_agn.line_quantities(th0)
        lq1 = grid_agn.line_quantities(th1)
        # both line and continuum sit behind the same screen, so the EW
        # ratio equals 1 exactly (same attenuation at the line λ)
        np.testing.assert_allclose(
            lq1["ew_rest"], lq0["ew_rest"], rtol=1e-4)


class TestAGNFastPathGates:
    def test_mega_gate_rejects_core_override(self, agn):
        """The megakernel computes stellar-grid SFZH photometry directly —
        a subclass overriding _core (AGNSimulator) must never be routed
        through it, or log10_l_agn/agn_slope are silently ignored. The
        gate must hold even when the backend resolves to pallas/interp
        (as on a real TPU)."""
        agn.__dict__["photometry_backend"] = "pallas"
        agn.__dict__["_pallas_variant"] = "interp"
        try:
            assert agn._mega_supported() is False
            assert agn._window_supported() is False
        finally:
            agn.__dict__.pop("photometry_backend")
            agn.__dict__.pop("_pallas_variant")

    def test_fused_core_returns_trimmed_support(self, test_grid,
                                                nircam_filters):
        """_photometry_fused expects the support-trimmed λ range from
        _core(fused=True); the AGN override must trim like the base class
        or the fused product shape-errors on trimmed grids. Build with the
        interp variant (the TPU default) so trimming is active, and check
        the fused photometry agrees with the exact spectra path."""
        agn_p = AGNSimulator(test_grid, nircam_filters,
                             photometry_backend="pallas",
                             photometry_variant="interp")
        if agn_p._lam_support is not None:
            l0, l1 = agn_p._lam_support
            theta = jnp.asarray([44.0, 1.0, -0.5, 0.2], jnp.float32)
            out = agn_p._core(theta, want_spectra=False, fused=True)
            assert out["_lnu"].shape == (l1 - l0,)
            assert bool(jnp.isfinite(out["_lnu"]).all())
        # end-to-end: the fused path must use the AGN forward model (the
        # mega gate must not reroute it onto the stellar grid)
        rng = np.random.default_rng(0)
        th = np.column_stack([
            rng.uniform(43, 45, 16), rng.uniform(0.5, 3.0, 16),
            rng.uniform(-1.0, 0.0, 16), rng.uniform(0.0, 1.0, 16),
        ]).astype(np.float32)
        p_fused = np.asarray(agn_p.photometry(th))
        p_exact = np.asarray(
            AGNSimulator(test_grid, nircam_filters).photometry(th))
        sig = p_exact > 1e-3 * p_exact.max(axis=1, keepdims=True)
        rel = np.abs(p_fused - p_exact)[sig] / p_exact[sig]
        assert np.quantile(rel, 0.99) < 2e-2
