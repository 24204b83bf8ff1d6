"""Library generation + HDF5 schema tests (mirrors reference
tests/test_library.py's check_hdf5 schema validation pattern)."""

import h5py
import numpy as np
import pytest

from synference_tpu.library import (
    LibraryCreator,
    LibraryGenerator,
    draw_from_hypercube,
    load_library_hdf5,
    save_library_hdf5,
    simulator_from_library,
)
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

PARAM_RANGES = {
    "log10_mass": (7.5, 11.0),
    "redshift": (0.1, 8.0),
    "log10_peak_age": (7.5, 9.0),
    "tau": (0.1, 1.2),
    "log10_metallicity": (-3.9, -1.5),
    "tau_v": (0.0, 2.5),
}


def check_hdf5_schema(path, expect_supp=False):
    """Schema validation helper (reference test_library.py:27-44)."""
    with h5py.File(path, "r") as f:
        assert "Grid" in f
        assert "Photometry" in f["Grid"]
        assert "Parameters" in f["Grid"]
        assert f["Grid/Photometry"].ndim == 2
        assert f["Grid/Parameters"].ndim == 2
        assert "ParameterNames" in f.attrs
        assert "FilterCodes" in f.attrs
        assert "PhotometryUnits" in f.attrs
        if expect_supp:
            assert "SupplementaryParameters" in f["Grid"]
            assert "SupplementaryParameterNames" in f.attrs


def test_testdata_cli_generates_assets(tmp_path):
    """`synference-tpu-testdata` regenerates the reference's downloadable
    test assets locally (reference `synference-download-data`,
    utils.py:2789-2806): a loadable SPS grid + a schema-valid library."""
    from synference_tpu.grids import SPSGrid
    from synference_tpu.library import load_library_hdf5
    from synference_tpu.testdata import generate_test_data

    out = generate_test_data(str(tmp_path / "assets"), n=96, verbose=False)
    g = SPSGrid.from_hdf5(out["grid"])
    assert g.n_wav == 1024
    check_hdf5_schema(out["library"])
    lib = load_library_hdf5(out["library"])
    assert lib["photometry"].shape == (7, 96)
    assert np.isfinite(lib["photometry"]).all()


class TestHypercube:
    def test_ranges_and_shapes(self):
        d = draw_from_hypercube({"a": (0.0, 1.0), "b": (-5.0, 5.0)}, 100)
        assert set(d) == {"a", "b"}
        assert d["a"].shape == (100,)
        assert d["a"].min() >= 0.0 and d["a"].max() <= 1.0
        assert d["b"].min() >= -5.0 and d["b"].max() <= 5.0

    def test_unlog_renames_key(self):
        d = draw_from_hypercube(
            {"log10_mass": (8.0, 10.0)}, 50, unlog_keys=["log10_mass"]
        )
        assert "mass" in d and "log10_mass" not in d
        assert d["mass"].min() >= 10**8.0 - 1 and d["mass"].max() <= 10**10.0 + 1

    def test_lhc_stratification(self):
        # LHC: each of n equal bins contains exactly one sample
        d = draw_from_hypercube(
            {"x": (0.0, 1.0)}, 64, rng=np.random.default_rng(0)
        )
        counts, _ = np.histogram(d["x"], bins=64, range=(0, 1))
        assert (counts == 1).all()

    @pytest.mark.parametrize("engine", ["sobol", "halton", "random"])
    def test_other_engines(self, engine):
        d = draw_from_hypercube(
            {"x": (2.0, 3.0)}, 32, rng=np.random.default_rng(1), engine=engine
        )
        assert d["x"].shape == (32,) and (d["x"] >= 2.0).all()


class TestSchemaIO:
    def test_roundtrip(self, tmp_path, rng):
        phot = rng.random((7, 100)).astype(np.float32)
        params = rng.random((3, 100)).astype(np.float32)
        path = str(tmp_path / "lib.h5")
        save_library_hdf5(
            path,
            parameters=params,
            parameter_names=["a", "b", "c"],
            photometry=phot,
            filter_codes=[f"F{i}" for i in range(7)],
        )
        check_hdf5_schema(path)
        lib = load_library_hdf5(path)
        np.testing.assert_allclose(lib["photometry"], phot)
        np.testing.assert_allclose(lib["parameters"], params)
        assert lib["parameter_names"] == ["a", "b", "c"]
        assert lib["filter_codes"] == [f"F{i}" for i in range(7)]
        assert lib["photometry_units"] == "nJy"

    def test_library_creator_transposes(self, tmp_path, rng):
        # (N, P) input auto-transposed to reference (P, N) layout
        params = rng.random((50, 3))
        phot = rng.random((50, 7))
        lc = LibraryCreator(
            parameters=params,
            parameter_names=["a", "b", "c"],
            photometry=phot,
            filter_codes=[f"F{i}" for i in range(7)],
        )
        path = str(tmp_path / "byo.h5")
        lc.save(path)
        lib = load_library_hdf5(path)
        assert lib["parameters"].shape == (3, 50)
        assert lib["photometry"].shape == (7, 50)


@pytest.fixture(scope="module")
def generator(test_grid, nircam_filters):
    sim = BatchSEDSimulator(
        grid=test_grid,
        filters=nircam_filters,
        param_names=(
            "log10_mass", "redshift", "peak_age", "tau",
            "log10_metallicity", "tau_v",
        ),
        sfh="lognormal",
        zdist="delta",
        emission=EmissionConfig(),
    )
    return LibraryGenerator(
        sim, PARAM_RANGES, unlog_keys=["log10_peak_age"],
        supplementary=("m_uv", "sfr_100", "mass_weighted_age", "t50", "beta_uv"),
    )


class TestLibraryGenerator:
    def test_generate_small(self, generator, tmp_path):
        path = str(tmp_path / "mock.h5")
        lib = generator.generate(
            n=100, batch_size=64, seed=1, out_path=path
        )
        assert lib["photometry"].shape == (7, 100)
        assert lib["parameters"].shape == (6, 100)
        assert np.isfinite(lib["photometry"]).all()
        assert lib["supplementary_parameters"].shape == (5, 100)
        assert np.isfinite(lib["supplementary_parameters"]).all()
        check_hdf5_schema(path, expect_supp=True)

    def test_auto_batch_size(self, generator):
        from synference_tpu.library import auto_batch_size

        # small n never pads up to a huge chunk; large n caps at 65536
        assert auto_batch_size(100) == 256
        assert auto_batch_size(300) == 512
        assert auto_batch_size(65536) == 65536
        assert auto_batch_size(10**6) == 65536
        # default batch_size=None routes through the auto rule end-to-end
        lib = generator.generate(n=40, seed=7)
        assert lib["photometry"].shape == (7, 40)
        assert np.isfinite(lib["photometry"]).all()

    def test_auto_batch_size_spectra_width(self):
        from synference_tpu.library import auto_batch_size

        # spectra/supplementary chunks materialize (B, L) slabs: the cap
        # scales down with the λ-grid width (65536 was measured
        # photometry-only; see ADVICE round 3)
        assert auto_batch_size(10**6, spectra_width=2048) == 65536
        assert auto_batch_size(10**6, spectra_width=10_000) <= 16384
        assert auto_batch_size(10**6, spectra_width=10_000) >= 4096
        # still never pads a small n up
        assert auto_batch_size(100, spectra_width=10_000) == 256

    def test_generate_zero(self, generator, tmp_path):
        path = str(tmp_path / "empty.h5")
        lib = generator.generate(n=0, seed=3, out_path=path)
        assert lib["photometry"].shape == (7, 0)
        assert lib["parameters"].shape == (6, 0)
        assert lib["supplementary_parameters"].shape == (5, 0)
        import h5py

        with h5py.File(path, "r") as f:
            assert f["Grid/Photometry"].shape == (7, 0)

    def test_supplementary_sanity(self, generator):
        lib = generator.generate(n=64, batch_size=64, seed=2)
        supp = lib["supplementary_parameters"]
        names = lib["supplementary_parameter_names"]
        m_uv = supp[names.index("m_uv")]
        # heavily dust-attenuated low-mass draws can be very faint
        assert np.all((m_uv > -28) & (m_uv < 5))
        t50 = supp[names.index("t50")]
        assert np.all(t50 > 0) and np.all(t50 < 1.4e10)
        mwa = supp[names.index("mass_weighted_age")]
        assert np.all(mwa > 0) and np.all(mwa < 1.4e10)

    def test_simulator_roundtrip_from_library(self, generator, tmp_path):
        """Model group with embed_grid=True fully reconstructs the
        simulator from the file alone: same photometry."""
        path = str(tmp_path / "withmodel.h5")
        generator.embed_grid = True
        lib = generator.generate(n=32, batch_size=32, seed=3, out_path=path)
        generator.embed_grid = False
        sim2 = simulator_from_library(path)
        theta = lib["parameters"].T  # (N, P)
        p_orig = lib["photometry"].T
        p_rec = np.asarray(sim2.photometry(theta))
        np.testing.assert_allclose(p_rec, p_orig, rtol=2e-3)

    def test_grid_reference_mode(self, generator, test_grid, tmp_path):
        """Default (embed_grid=False): the file stores name+hash+axes only;
        reconstruction needs the external grid, whose hash is verified
        (reference stores grid name/dir only, library.py:2017-2132)."""
        path = str(tmp_path / "slim.h5")
        lib = generator.generate(n=32, batch_size=32, seed=3, out_path=path)
        # no grid supplied -> instructive error
        with pytest.raises(ValueError, match="grid reference"):
            simulator_from_library(path)
        # matching grid -> reconstructs and reproduces photometry
        sim2 = simulator_from_library(path, grid=test_grid)
        p_rec = np.asarray(sim2.photometry(lib["parameters"].T))
        np.testing.assert_allclose(p_rec, lib["photometry"].T, rtol=2e-3)

    def test_grid_hash_mismatch_raises(self, generator, tmp_path):
        from synference_tpu.grids import make_synthetic_grid

        path = str(tmp_path / "slim2.h5")
        generator.generate(n=16, batch_size=16, seed=3, out_path=path)
        # the builder is deterministic in its shape args (seed is unused),
        # so a *different-shape* grid is the mismatch case
        wrong = make_synthetic_grid(n_ages=24, n_mets=5, n_wav=512)
        with pytest.raises(ValueError, match="does not match"):
            simulator_from_library(path, grid=wrong)
        # explicit override allowed
        sim2 = simulator_from_library(path, grid=wrong, verify_grid=False)
        assert sim2.grid is not None or True

    def test_slim_file_is_small(self, generator, tmp_path):
        """The grid-reference Model group must not dominate the file: a
        32-row library stays well under the embedded-grid size."""
        import os

        slim = str(tmp_path / "small.h5")
        generator.generate(n=32, batch_size=32, seed=3, out_path=slim)
        fat = str(tmp_path / "fat.h5")
        generator.embed_grid = True
        generator.generate(n=32, batch_size=32, seed=3, out_path=fat)
        generator.embed_grid = False
        assert os.path.getsize(slim) < 0.25 * os.path.getsize(fat)

    def test_missing_param_raises(self, test_grid, nircam_filters):
        sim = BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
        )
        with pytest.raises(ValueError, match="not covered"):
            LibraryGenerator(sim, {"log10_mass": (8, 10)})

    def test_pmapped_fn_offset_is_name_opt_in(self, test_grid,
                                              nircam_filters):
        """The chunk row offset is passed ONLY to a second positional
        parameter literally named `row_offset`; a 2-positional callable
        whose second arg means something else keeps its default (a bare
        arity sniff silently flipped e.g. want_spectra mid-generation)."""
        sim = BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
        )
        gen = LibraryGenerator(sim, PARAM_RANGES,
                               unlog_keys=["log10_peak_age"])
        seen = []

        def fn_other(theta, want_spectra=False):
            seen.append(want_spectra)
            return {"photometry_njy": np.asarray(sim.photometry(theta))}

        gen.generate(n=48, batch_size=16, seed=5, pmapped_fn=fn_other)
        assert seen and all(ws is False for ws in seen)

        offs = []

        def fn_offset(theta, row_offset=0):
            offs.append(row_offset)
            return {"photometry_njy": np.asarray(sim.photometry(theta))}

        gen.generate(n=48, batch_size=16, seed=5, pmapped_fn=fn_offset)
        assert offs == [0, 16, 32]

    def test_zsorted_fused_downgrade_warns(self, nircam_filters):
        """generate(zsorted_fused=True) on a simulator whose megakernel
        gate is closed must say so, not silently measure the staged
        body."""
        from synference_tpu.grids import make_synthetic_grid

        grid = make_synthetic_grid(n_ages=16, n_mets=4, n_wav=1024)
        sim = BatchSEDSimulator(
            grid=grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp",
        )
        gen = LibraryGenerator(
            sim, {**PARAM_RANGES, "redshift": (0.5, 1.5)},
            unlog_keys=["log10_peak_age"])
        sim._mega_off = True  # close the megakernel gate only
        with pytest.warns(RuntimeWarning, match="megakernel"):
            lib = gen.generate(n=128, batch_size=64, seed=4,
                               zsorted_fused=True)
        assert np.isfinite(lib["photometry"]).all()
