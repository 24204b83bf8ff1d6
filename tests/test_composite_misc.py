"""Composite simulators, grid combinations, noise factory, generation
resume, runtime utilities, spectral library path."""

import os

import jax
import numpy as np
import pytest

from synference_tpu.composite import CompositeSEDSimulator, grid_combinations
from synference_tpu.library import LibraryGenerator
from synference_tpu.noise_models import (
    SpectralNoiseModel,
    create_noise_models_from_catalogue,
)
from synference_tpu.runtime import MetricsLogger, StepTimer, setup_logger
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig
from synference_tpu.spectra import SpectralFeaturePipeline, generate_constant_r_grid


@pytest.fixture(scope="module")
def base_sim(test_grid, nircam_filters):
    def make(**kw):
        return BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(), **kw,
        )

    return make


class TestComposite:
    def test_two_components_sum(self, base_sim, rng):
        s1, s2 = base_sim(), base_sim()
        comp = CompositeSEDSimulator({"young": s1, "old": s2})
        assert comp.param_names[0] == "redshift"
        assert "young.log10_mass" in comp.param_names
        n = len(comp.param_names)
        assert n == 1 + 2 * 5

        theta = np.zeros((4, n), np.float32)
        idx = {p: i for i, p in enumerate(comp.param_names)}
        theta[:, idx["redshift"]] = 1.0
        for c in ("young", "old"):
            theta[:, idx[f"{c}.log10_mass"]] = 9.0
            theta[:, idx[f"{c}.peak_age"]] = 3e8
            theta[:, idx[f"{c}.tau"]] = 0.5
            theta[:, idx[f"{c}.log10_metallicity"]] = -2.5
            theta[:, idx[f"{c}.tau_v"]] = 0.3

        p_comp = np.asarray(comp.photometry(theta))
        # identical components at equal mass = 2x single component
        single = np.zeros((4, 6), np.float32)
        single[:, 0] = 9.0
        single[:, 1] = 1.0
        single[:, 2] = 3e8
        single[:, 3] = 0.5
        single[:, 4] = -2.5
        single[:, 5] = 0.3
        p_single = np.asarray(s1.photometry(single))
        np.testing.assert_allclose(p_comp, 2.0 * p_single, rtol=1e-4)

    def test_filterset_mismatch_raises(self, base_sim, test_grid):
        from synference_tpu.filters import FilterSet, tophat_filter

        s1 = base_sim()
        other = FilterSet([tophat_filter("X", 5000.0, 1000.0)])
        s2 = BatchSEDSimulator(
            grid=test_grid, filters=other,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
        )
        with pytest.raises(ValueError, match="share a FilterSet"):
            CompositeSEDSimulator({"a": s1, "b": s2})


class TestGridCombinations:
    def test_cartesian(self):
        theta, names = grid_combinations(
            {"z": [0.5, 1.0, 2.0], "tau_v": [0.0, 0.5]}
        )
        assert theta.shape == (6, 2)
        assert names == ["z", "tau_v"]
        assert set(map(tuple, theta.tolist())) == {
            (z, t) for z in (0.5, 1.0, 2.0) for t in (0.0, 0.5)
        }


class TestNoiseFactory:
    def test_builds_per_band(self, rng):
        flux = {b: 10.0 ** rng.uniform(1, 4, 5000) for b in ("F090W", "F200W")}
        errs = {b: 0.05 * flux[b] + 2.0 for b in flux}
        for mtype in ("general", "asinh", "empirical", "depth"):
            models = create_noise_models_from_catalogue(flux, errs, mtype)
            assert set(models) == {"F090W", "F200W"}
            noisy, sig = models["F200W"].apply(
                jax.random.PRNGKey(0), np.full(10, 500.0, np.float32)
            )
            assert np.isfinite(np.asarray(noisy)).all()


class TestGenerationResume:
    def test_resume_skips_completed_chunks(self, base_sim, tmp_path):
        gen = LibraryGenerator(base_sim(), {
            "log10_mass": (8.0, 10.0), "redshift": (0.5, 4.0),
            "peak_age": (1e8, 5e8), "tau": (0.3, 0.8),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        })
        ck = str(tmp_path / "gen_ck")
        full = gen.generate(n=96, batch_size=32, seed=5)

        # simulate an interrupted run: one completed per-chunk file
        chunk0 = full["photometry"].T[:32]
        np.savez(ck + ".chunk000000.npz", n=96, batch_size=32, seed=5,
                 phot=np.asarray(chunk0))
        resumed = gen.generate(n=96, batch_size=32, seed=5, resume_path=ck)
        np.testing.assert_allclose(
            resumed["photometry"], full["photometry"], rtol=1e-5
        )
        assert not os.path.exists(ck + ".chunk000000.npz")  # cleaned up

    def test_stale_chunk_metadata_ignored(self, base_sim, tmp_path):
        """A chunk file from a different (n, batch, seed) run must not be
        consumed as progress."""
        gen = LibraryGenerator(base_sim(), {
            "log10_mass": (8.0, 10.0), "redshift": (0.5, 4.0),
            "peak_age": (1e8, 5e8), "tau": (0.3, 0.8),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        })
        ck = str(tmp_path / "stale_ck")
        np.savez(ck + ".chunk000000.npz", n=999, batch_size=32, seed=5,
                 phot=np.zeros((32, 7), np.float32))
        full = gen.generate(n=64, batch_size=32, seed=5)
        resumed = gen.generate(n=64, batch_size=32, seed=5, resume_path=ck)
        np.testing.assert_allclose(
            resumed["photometry"], full["photometry"], rtol=1e-5
        )


class TestSpectralLibrary:
    def test_generate_with_spectral_pipeline(self, base_sim, test_grid):
        obs = generate_constant_r_grid(r=100, start=5000, end=50000)
        pipe = SpectralFeaturePipeline(test_grid.lam, obs, instrument_r=100)
        gen = LibraryGenerator(base_sim(), {
            "log10_mass": (8.0, 10.0), "redshift": (0.5, 4.0),
            "peak_age": (1e8, 5e8), "tau": (0.3, 0.8),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        }, spectral_pipeline=pipe)
        lib = gen.generate(n=32, batch_size=32, want_spectra=True)
        assert lib["spectra"].shape == (len(obs), 32)
        assert np.isfinite(lib["spectra"]).all()

    def test_fitter_spectral_features(self, base_sim, test_grid, tmp_path):
        from synference_tpu.fitter import SBIFitter

        obs = generate_constant_r_grid(r=50, start=5000, end=50000)
        pipe = SpectralFeaturePipeline(test_grid.lam, obs, instrument_r=50)
        gen = LibraryGenerator(base_sim(), {
            "log10_mass": (8.0, 10.0), "redshift": (0.5, 4.0),
            "peak_age": (1e8, 5e8), "tau": (0.3, 0.8),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        }, spectral_pipeline=pipe)
        path = str(tmp_path / "spec_lib.h5")
        gen.generate(n=64, batch_size=64, want_spectra=True, out_path=path)
        fitter = SBIFitter.init_from_hdf5(path)
        assert fitter.spectra.shape == (64, len(obs))
        kern = np.full(len(obs), 5.0, np.float32)
        feats = fitter.create_feature_array_from_raw_spectra(
            noise_model=SpectralNoiseModel(kern), n_scatters=2,
            normalize_pixel=10,
        )
        assert feats.shape[0] <= 128
        assert feats.shape[1] == len(obs) + 1


class TestRuntime:
    def test_step_timer(self):
        t = StepTimer(window=5)
        t.tick()
        for _ in range(3):
            t.tick()
        assert t.steps_per_sec > 0
        assert t.eta_seconds(10) < np.inf

    def test_metrics_logger(self, tmp_path):
        m = MetricsLogger(str(tmp_path / "metrics.jsonl"))
        m.log(step=1, loss=0.5)
        m.log(step=2, loss=0.4)
        rows = m.read()
        assert len(rows) == 2 and rows[1]["loss"] == 0.4

    def test_logger(self):
        lg = setup_logger("test_logger_xyz")
        lg.info("hello")
        assert lg.name == "test_logger_xyz"

    def test_terminal_loss_plot(self):
        """Both render paths of the live loss chart (reference
        utils.py:2445-2546): ANSI in-place frame and non-TTY line mode."""
        import io

        from synference_tpu.runtime import TerminalLossPlot

        buf = io.StringIO()
        p = TerminalLossPlot(width=20, height=5, stream=buf, ansi=True)
        for e, (tr, va) in enumerate([(2.0, 2.2), (1.5, 1.8), (1.2, 1.7)]):
            p.update(e, tr, va)
        out = buf.getvalue()
        assert "train 1.2000" in out and "val 1.7000" in out
        assert "\x1b[2K" in out  # ANSI overdraw
        assert "·" in out and "●" in out

        buf2 = io.StringIO()
        p2 = TerminalLossPlot(stream=buf2, ansi=False)
        p2.update(0, np.array([2.0, 3.0]), np.array([2.5, 3.5]))
        assert buf2.getvalue().strip() == "epoch    0  train 2.5000  val 3.0000"

    def test_train_live_plot(self):
        """TrainConfig(live_plot=True) drives the chart through a real
        (tiny) training run without touching sys.stdout's TTY state."""
        import contextlib
        import io

        import synference_tpu as st
        from synference_tpu.flows import build_flow
        from synference_tpu.train import TrainConfig, train_npe

        rng = np.random.default_rng(0)
        theta = rng.standard_normal((256, 2)).astype(np.float32)
        x = (theta + 0.1 * rng.standard_normal((256, 2))).astype(np.float32)
        flow = build_flow("maf", 2, 2, hidden_features=8, num_transforms=2)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            train_npe(flow, theta, x,
                      config=TrainConfig(max_epochs=3, batch_size=64,
                                         live_plot=True))
        assert "epoch" in buf.getvalue() and "train" in buf.getvalue()
        del st


class TestNewParityHelpers:
    def test_min_max_wav_grid(self):
        import synference_tpu as st

        fs = st.FilterSet([st.tophat_filter("F200W", 20000.0, 4600.0),
                           st.tophat_filter("F444W", 44400.0, 11000.0)])
        lo, hi = fs.min_max_wav_grid(max_redshift=10.0)
        # bluest filter edge at z=10, reddest at z=0
        assert lo == pytest.approx(fs.lam_min / 11.0)
        assert hi == pytest.approx(fs.lam_max)
        assert lo < hi

    def test_agn_fraction(self):
        import numpy as np

        import synference_tpu as st
        from synference_tpu.agn import AGNSimulator
        from synference_tpu.composite import CompositeSEDSimulator

        grid = st.make_synthetic_grid(n_ages=16, n_mets=4, n_wav=1024)
        fs = st.FilterSet([st.tophat_filter("F444W", 44400.0, 11000.0)])
        stellar = st.BatchSEDSimulator(
            grid=grid, filters=fs,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta",
            emission=st.EmissionConfig())
        agn = AGNSimulator(grid, fs)
        comp = CompositeSEDSimulator(
            {"stellar": stellar, "agn": agn}, shared=("redshift",))
        rng = np.random.default_rng(0)
        B = 8
        theta = np.zeros((B, comp.n_params), np.float32)
        names = list(comp.param_names)
        vals = {
            "redshift": rng.uniform(0.5, 3, B),
            "stellar.log10_mass": rng.uniform(9, 10.5, B),
            "stellar.peak_age": rng.uniform(1e8, 5e8, B),
            "stellar.tau": rng.uniform(0.2, 0.8, B),
            "stellar.log10_metallicity": rng.uniform(-3, -2, B),
            "stellar.tau_v": rng.uniform(0, 1, B),
        }
        for k, v in vals.items():
            theta[:, names.index(k)] = v
        for p in names:
            if p.startswith("agn.") and theta[:, names.index(p)].sum() == 0:
                # fill AGN params mid-range
                theta[:, names.index(p)] = 1.0
        # bright AGN -> nonzero fraction; check bounds and monotonicity
        if "agn.log10_l_agn" in names:
            theta[:, names.index("agn.log10_l_agn")] = 45.0
        if "agn.agn_slope" in names:
            theta[:, names.index("agn.agn_slope")] = -0.5
        frac = comp.agn_fraction(theta)
        assert frac.shape == (B,)
        assert np.isfinite(frac).all()
        assert ((frac >= 0) & (frac <= 1)).all()

    def test_flux_weighted_age_supplementary(self):
        import numpy as np

        import synference_tpu as st
        from synference_tpu.supplementary import compute_supplementary

        grid = st.make_synthetic_grid(n_ages=24, n_mets=4, n_wav=1024)
        fs = st.FilterSet([st.tophat_filter("F444W", 44400.0, 11000.0)])
        sim = st.BatchSEDSimulator(
            grid=grid, filters=fs,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=st.EmissionConfig())
        rng = np.random.default_rng(1)
        B = 16
        theta = np.stack([
            rng.uniform(8, 10.5, B), rng.uniform(0.5, 3, B),
            rng.uniform(1e8, 8e8, B), rng.uniform(0.2, 0.8, B),
            rng.uniform(-3, -2, B), rng.uniform(0, 1, B),
        ], 1).astype(np.float32)
        out = sim.simulate(theta, want_spectra=True)
        supp = np.asarray(compute_supplementary(
            ["flux_weighted_age", "mass_weighted_age"], sim, theta, out))
        fwa, mwa = supp[:, 0], supp[:, 1]
        assert np.isfinite(fwa).all() and (fwa > 0).all()
        # red-band flux weighting favors OLDER stars than pure mass
        # weighting does young bursts — at minimum, same order of magnitude
        assert (fwa < 10 ** 10.3).all()
        assert np.median(np.abs(np.log10(fwa) - np.log10(mwa))) < 1.0
