"""N-axis (Cloudy-style) SPS grid support.

The reference inherits multi-axis grids (ionization parameter,
α-enhancement, ...) from `synthesizer.grid.Grid`
(reference library.py:2562-2619); here the extra axes either collapse at
load (`SPSGrid.fix_axes`) or become θ parameters whose lerp-delta weights
fold into the SFZH outer product.
"""

import numpy as np
import pytest

from synference_tpu.grids import SPSGrid, make_synthetic_multiaxis_grid
from synference_tpu.sed import BatchSEDSimulator

NAMES_U = ("log10_mass", "redshift", "peak_age", "tau",
           "log10_metallicity", "tau_v", "ionisation_parameter")
NAMES_2AX = NAMES_U[:-1]


@pytest.fixture(scope="module")
def grid3():
    return make_synthetic_multiaxis_grid(
        n_u=5, n_ages=24, n_mets=4, n_wav=512, seed=0)


def _theta(n, rng, log_u=None):
    cols = [
        rng.uniform(8, 10, n), rng.uniform(0.5, 3, n),
        rng.uniform(1e8, 5e8, n), rng.uniform(0.3, 0.8, n),
        rng.uniform(-3, -2, n), rng.uniform(0, 1, n),
    ]
    if log_u is not None:
        cols.append(np.full(n, log_u))
    return np.stack(cols, axis=1).astype(np.float32)


class TestGridIO:
    def test_round_trip(self, grid3, tmp_path):
        path = str(tmp_path / "g3.hdf5")
        grid3.to_hdf5(path)
        back = SPSGrid.from_hdf5(path)
        assert back.extra_axis_names == ("ionisation_parameter",)
        np.testing.assert_allclose(
            back.extra_axes["ionisation_parameter"],
            grid3.extra_axes["ionisation_parameter"])
        for t in grid3.spectra:
            np.testing.assert_allclose(back.spectra[t], grid3.spectra[t],
                                       rtol=1e-6)
        np.testing.assert_allclose(back.lines["luminosity"],
                                   grid3.lines["luminosity"], rtol=1e-6)

    def test_permuted_axis_order_normalized(self, grid3, tmp_path):
        """A file whose axes are stored (U, age, Z) must load as
        (age, Z, U) — the reference gets this normalization from
        synthesizer.grid.Grid."""
        import h5py

        path = str(tmp_path / "perm.hdf5")
        with h5py.File(path, "w") as f:
            f.attrs["axes"] = ["ionisation_parameter", "ages",
                               "metallicities"]
            f.attrs["grid_name"] = "perm"
            ax = f.create_group("axes")
            ax.create_dataset("ages", data=grid3.ages_yr)
            ax.create_dataset("metallicities", data=grid3.metallicities)
            ax.create_dataset("ionisation_parameter",
                              data=grid3.extra_axes["ionisation_parameter"])
            sp = f.create_group("spectra")
            sp.create_dataset("wavelength", data=grid3.lam)
            for t, s in grid3.spectra.items():
                sp.create_dataset(t, data=np.moveaxis(s, 2, 0))
        back = SPSGrid.from_hdf5(path)
        np.testing.assert_allclose(back.spectra["total"],
                                   grid3.spectra["total"], rtol=1e-6)

    def test_fixed_axes_at_load(self, grid3, tmp_path):
        path = str(tmp_path / "g3b.hdf5")
        grid3.to_hdf5(path)
        log_u = grid3.extra_axes["ionisation_parameter"]
        back = SPSGrid.from_hdf5(
            path, fixed_axes={"ionisation_parameter": float(log_u[2])})
        assert back.extra_axes == {}
        np.testing.assert_allclose(back.spectra["total"],
                                   grid3.spectra["total"][:, :, 2],
                                   rtol=1e-6)


class TestFixAxes:
    def test_slice_at_grid_point(self, grid3):
        log_u = grid3.extra_axes["ionisation_parameter"]
        g = grid3.fix_axes({"ionisation_parameter": float(log_u[1])})
        assert g.extra_axes == {}
        np.testing.assert_allclose(g.spectra["nebular"],
                                   grid3.spectra["nebular"][:, :, 1],
                                   rtol=1e-6)
        np.testing.assert_allclose(g.lines["luminosity"],
                                   grid3.lines["luminosity"][:, :, 1],
                                   rtol=1e-6)

    def test_lerp_between_points(self, grid3):
        log_u = grid3.extra_axes["ionisation_parameter"]
        mid = 0.5 * (log_u[1] + log_u[2])
        g = grid3.fix_axes({"ionisation_parameter": float(mid)})
        expect = 0.5 * (grid3.spectra["nebular"][:, :, 1]
                        + grid3.spectra["nebular"][:, :, 2])
        np.testing.assert_allclose(g.spectra["nebular"], expect, rtol=1e-5)

    def test_clamped_outside_range(self, grid3):
        g = grid3.fix_axes({"ionisation_parameter": -99.0})
        np.testing.assert_allclose(g.spectra["nebular"],
                                   grid3.spectra["nebular"][:, :, 0],
                                   rtol=1e-6)

    def test_unknown_axis_raises(self, grid3):
        with pytest.raises(KeyError):
            grid3.fix_axes({"alpha": 0.0})


class TestSimulatorFreeAxis:
    def test_free_axis_matches_fixed_slice(self, grid3, nircam_filters, rng):
        """Photometry with U free at a grid point == photometry on the
        2-axis grid sliced at that point."""
        log_u = grid3.extra_axes["ionisation_parameter"]
        em = dict(reprocessed_types=("total",), fesc=0.1)
        from synference_tpu.sed import EmissionConfig

        sim3 = BatchSEDSimulator(
            grid3, nircam_filters, NAMES_U,
            emission=EmissionConfig(**em))
        sim2 = BatchSEDSimulator(
            grid3.fix_axes({"ionisation_parameter": float(log_u[3])}),
            nircam_filters, NAMES_2AX, emission=EmissionConfig(**em))
        theta = _theta(6, rng, log_u=float(log_u[3]))
        p3 = np.asarray(sim3.photometry(theta))
        p2 = np.asarray(sim2.photometry(theta[:, :-1]))
        np.testing.assert_allclose(p3, p2, rtol=2e-3)

    def test_free_axis_interpolates(self, grid3, nircam_filters, rng):
        """Between grid points, the free-axis photometry lies between the
        bracketing fixed-slice photometries (linearity in the weights)."""
        from synference_tpu.sed import EmissionConfig

        log_u = grid3.extra_axes["ionisation_parameter"]
        mid = 0.5 * (log_u[1] + log_u[2])
        em = EmissionConfig(reprocessed_types=("total",), fesc=0.0)
        sim3 = BatchSEDSimulator(grid3, nircam_filters, NAMES_U, emission=em)
        theta_mid = _theta(4, rng, log_u=float(mid))
        p_mid = np.asarray(sim3.photometry(theta_mid))
        p_lo = np.asarray(sim3.photometry(
            np.concatenate([theta_mid[:, :-1],
                            np.full((4, 1), log_u[1], np.float32)], axis=1)))
        p_hi = np.asarray(sim3.photometry(
            np.concatenate([theta_mid[:, :-1],
                            np.full((4, 1), log_u[2], np.float32)], axis=1)))
        np.testing.assert_allclose(p_mid, 0.5 * (p_lo + p_hi), rtol=1e-3)

    def test_axis_without_param_raises(self, grid3, nircam_filters):
        with pytest.raises(ValueError, match="ionisation_parameter"):
            BatchSEDSimulator(grid3, nircam_filters, NAMES_2AX)

    def test_fixed_param_axis(self, grid3, nircam_filters, rng):
        """The axis can also be a fixed (non-θ) parameter."""
        from synference_tpu.sed import EmissionConfig

        log_u = grid3.extra_axes["ionisation_parameter"]
        em = EmissionConfig(reprocessed_types=("total",), fesc=0.0)
        sim = BatchSEDSimulator(
            grid3, nircam_filters, NAMES_2AX, emission=em,
            fixed_params={"ionisation_parameter": float(log_u[2])})
        theta = _theta(3, rng)
        p = np.asarray(sim.photometry(theta))
        assert np.isfinite(p).all() and (p > 0).any()

    def test_nebular_photometry_responds_to_u(self, grid3, nircam_filters,
                                              rng):
        """Nebular-channel photometry scales with the U axis by the grid's
        built-in g(U) law (≈11× between the axis ends)."""
        from synference_tpu.sed import EmissionConfig

        em = EmissionConfig(reprocessed_types=("nebular",), fesc=0.0)
        sim = BatchSEDSimulator(grid3, nircam_filters, NAMES_U, emission=em)
        base = _theta(4, rng)
        # young galaxies (strong nebular): force low peak_age
        base[:, 2] = 3e6
        lo = np.concatenate(
            [base, np.full((4, 1), -4.0, np.float32)], axis=1)
        hi = np.concatenate(
            [base, np.full((4, 1), -1.0, np.float32)], axis=1)
        p_lo = np.asarray(sim.photometry(lo))
        p_hi = np.asarray(sim.photometry(hi))
        ratio = p_hi / np.maximum(p_lo, 1e-30)
        assert (ratio > 5.0).all()  # g(-1)/g(-4) = 10^1.05 ≈ 11.2

    def test_line_quantities_multiaxis(self, grid3, rng, nircam_filters):
        from synference_tpu.sed import EmissionConfig

        em = EmissionConfig(reprocessed_types=("total",), fesc=0.0)
        sim = BatchSEDSimulator(grid3, nircam_filters, NAMES_U, emission=em)
        theta = _theta(3, rng, log_u=-2.0)
        theta[:, 2] = 3e6  # young: nonzero lines
        out = sim.line_quantities(theta)
        assert out["luminosity"].shape == (3, 5)
        assert np.isfinite(out["flux"]).all()
        # higher U -> stronger lines
        theta_hi = theta.copy()
        theta_hi[:, -1] = -1.0
        out_hi = sim.line_quantities(theta_hi)
        assert (out_hi["luminosity"] >= out["luminosity"] - 1e-9).all()


class TestPhotometryVariantSelection:
    """Auto engine choice: interp (knot matmul) at small table sizes, conv
    (table-free strided correlation) when the knot matrix would breach the
    remote-compile constant cap (paper-scale F × realistic λ)."""

    def test_small_config_selects_interp(self, test_grid, nircam_filters):
        from synference_tpu.sed import BatchSEDSimulator

        sim = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            photometry_backend="pallas")
        assert sim._pallas_variant == "interp"

    def test_paper_scale_selects_conv(self, test_grid):
        from synference_tpu.instruments import load_instrument_filters
        from synference_tpu.sed import BatchSEDSimulator

        # 63 filters x a 4096-λ grid: knot matrix would be > 64 MB
        import numpy as np

        from synference_tpu.grids import make_synthetic_grid

        grid = make_synthetic_grid(n_ages=8, n_mets=3, n_wav=4096,
                                   lam_min=150.0)
        sim = BatchSEDSimulator(
            grid, load_instrument_filters(),
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            photometry_backend="pallas")
        assert sim._pallas_variant == "conv"
        theta = np.array([[9.0, 1.0, 2e8, 0.5, -2.5, 0.3]], np.float32)
        p = np.asarray(sim.photometry(theta))
        assert p.shape == (1, 63) and np.isfinite(p).all()
