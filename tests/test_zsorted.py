"""z-sorted window engine: per-chunk λ/knot-window photometry.

Library rows are exchangeable, so `LibraryGenerator` sorts its draws by
redshift and each narrow-z sub-chunk contracts only the λ columns its
filters can reach plus a few knots — numerically identical to the fused
interp path (same knots, same monotone-cubic shift interpolation, same
denominators) at ~6-8× fewer MXU FLOPs on production grids."""

import numpy as np
import pytest

from synference_tpu import (BatchSEDSimulator, EmissionConfig, FilterSet,
                            LibraryGenerator, tophat_filter)
from synference_tpu.grids import make_synthetic_grid

PNAMES = ("log10_mass", "redshift", "peak_age", "tau",
          "log10_metallicity", "tau_v")


@pytest.fixture(scope="module")
def grid():
    return make_synthetic_grid(n_ages=16, n_mets=4, n_wav=1024)


@pytest.fixture(scope="module")
def filters():
    codes = ["F090W", "F115W", "F150W", "F200W", "F277W", "F356W", "F444W"]
    centers = [9000., 11500., 15000., 20000., 27700., 35600., 44400.]
    widths = [2000., 2600., 3300., 4600., 7000., 7800., 10200.]
    return FilterSet([tophat_filter(c, ct, w)
                      for c, ct, w in zip(codes, centers, widths)])


def _sorted_theta(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.column_stack([
        rng.uniform(7.5, 11, n), np.sort(rng.uniform(0.05, 8, n)),
        rng.uniform(1e8, 1e9, n), rng.uniform(.1, 1.2, n),
        rng.uniform(-3.9, -1.6, n), rng.uniform(0, 2, n),
    ]).astype(np.float32)


def _assert_parity(p_zs, p_ref, p99=2e-3):
    rel = np.abs(p_zs - p_ref) / np.maximum(np.abs(p_ref), 1e-30)
    sig = p_ref > 1e-3 * p_ref.max(axis=1, keepdims=True)
    assert np.isfinite(p_zs).all()
    assert np.quantile(rel[sig], 0.99) < p99, np.quantile(rel[sig], 0.99)


class TestZSortedEngine:
    @pytest.fixture(scope="class")
    def sim(self, grid, filters):
        return BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")

    def test_parity_vs_fused(self, sim):
        theta = _sorted_theta(1536)
        # the windowed path must actually engage (not the whole-table
        # dense fallback, which would make this parity check vacuous)
        z = theta[:, PNAMES.index("redshift")]
        assert sim._zsorted_window_plan(z, 128) is not None
        p_ref = np.asarray(sim.photometry(theta))
        p_zs = np.asarray(sim.photometry_zsorted(theta, sub_chunk=128))
        _assert_parity(p_zs, p_ref)

    def test_unsorted_raises(self, sim):
        theta = _sorted_theta(64)[::-1].copy()
        with pytest.raises(ValueError, match="sorted"):
            sim.photometry_zsorted(theta)

    def test_non_multiple_batch_padding(self, sim):
        theta = _sorted_theta(1228, seed=3)
        p_ref = np.asarray(sim.photometry(theta))
        p_zs = np.asarray(sim.photometry_zsorted(theta, sub_chunk=128))
        assert p_zs.shape == p_ref.shape
        _assert_parity(p_zs, p_ref)


class TestEngineAutoProbe:
    """Data-driven fused-window selection (VERDICT r4 item 8): the
    "auto" default micro-probes both window bodies once per config and
    caches the winner on the simulator."""

    class FakeSim:
        def __init__(self, mega=True, fused_dt=0.0, staged_dt=0.02,
                     fail_fused=False):
            self.mega = mega
            self.dt = {True: fused_dt, False: staged_dt}
            self.fail_fused = fail_fused
            self.calls = []

        def _window_mega_supported(self):
            return self.mega

        def photometry_zsorted_device(self, t, sub_chunk, kc, w_cols,
                                      fused=False):
            import time

            if fused and self.fail_fused:
                raise RuntimeError("Mosaic lowering failed")
            self.calls.append(fused)
            time.sleep(self.dt[fused])
            return np.zeros((len(t), 2), np.float32)

    @staticmethod
    def _choose(sim, requested="auto", n_chunks=8):
        theta = np.zeros((64, 6), np.float32)
        return LibraryGenerator._choose_zsorted_fused(
            sim, requested, 32, 10, 100, theta, n_chunks, device=True)

    def test_probe_picks_faster_and_caches(self):
        sim = self.FakeSim(fused_dt=0.0, staged_dt=0.05)
        assert self._choose(sim) is True
        n_probe_calls = len(sim.calls)
        assert n_probe_calls == 4  # warmup + timed, per variant
        # cached: second resolution makes no further probe calls
        assert self._choose(sim) is True
        assert len(sim.calls) == n_probe_calls

        slow_fused = self.FakeSim(fused_dt=0.05, staged_dt=0.0)
        assert self._choose(slow_fused) is False

    def test_explicit_flags_skip_probe(self):
        sim = self.FakeSim()
        assert self._choose(sim, requested=True) is True
        assert self._choose(sim, requested=False) is False
        assert sim.calls == []  # no probing

    def test_short_runs_and_unsupported_skip_probe(self):
        sim = self.FakeSim()
        assert self._choose(sim, n_chunks=2) is False
        assert sim.calls == []
        no_mega = self.FakeSim(mega=False)
        assert self._choose(no_mega) is False
        assert no_mega.calls == []
        # explicit True on unsupported sim warns and degrades
        with pytest.warns(RuntimeWarning, match="megakernel"):
            assert self._choose(no_mega, requested=True) is False

    def test_failing_fused_never_picked(self):
        sim = self.FakeSim(fail_fused=True, staged_dt=0.05)
        assert self._choose(sim) is False

    def test_fixed_redshift(self, grid, filters):
        sim = BatchSEDSimulator(
            grid, filters, tuple(p for p in PNAMES if p != "redshift"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
            fixed_params={"redshift": 2.0},
            photometry_backend="pallas", photometry_variant="interp")
        theta = _sorted_theta(128)[:, [0, 2, 3, 4, 5]]
        p_ref = np.asarray(sim.photometry(theta))
        p_zs = np.asarray(sim.photometry_zsorted(theta))
        _assert_parity(p_zs, p_ref, p99=1e-4)

    def test_conv_variant_builds_matrix(self, grid, filters):
        """The conv engine has no persistent knot matrix; the window
        engine builds one lazily (as a jit argument, not a capture)."""
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="conv")
        theta = _sorted_theta(512, seed=1)
        p_ref = np.asarray(sim.photometry(theta))
        p_zs = np.asarray(sim.photometry_zsorted(theta, sub_chunk=256))
        _assert_parity(p_zs, p_ref)

    def test_unsupported_config_raises(self, grid, filters):
        sim = BatchSEDSimulator(
            grid, filters, PNAMES + ("fesc",), sfh="lognormal",
            zdist="delta",
            emission=EmissionConfig(fesc="fesc",
                                    reprocessed_types=("total",)),
            photometry_backend="pallas", photometry_variant="interp")
        with pytest.raises(ValueError, match="unsupported"):
            sim.photometry_zsorted(_sorted_theta(64)[:, :7])

    def test_static_fesc_no_reprocessed(self, grid, filters):
        """fesc ≠ 0 with no reprocessed channel: lnu = inc·(fesc+(1−f)att)
        — the one non-trivial static mixing the gate admits."""
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(fesc=0.25),
            photometry_backend="pallas", photometry_variant="interp")
        theta = _sorted_theta(256, seed=2)
        p_ref = np.asarray(sim.photometry(theta))
        p_zs = np.asarray(sim.photometry_zsorted(theta, sub_chunk=128))
        _assert_parity(p_zs, p_ref)


class TestDeviceResidentEngine:
    """Device-array twin (`photometry_zsorted_device`): in-jit window
    planning, no host staging — must match the host-planned path exactly
    (same clamped knot intervals, same window placement)."""

    @pytest.fixture(scope="class")
    def sim(self, grid, filters):
        return BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")

    def test_matches_host_planned_path(self, sim):
        import jax.numpy as jnp

        theta = _sorted_theta(1536, seed=6)
        p_host = np.asarray(sim.photometry_zsorted(theta, sub_chunk=128))
        p_dev = np.asarray(sim.photometry_zsorted_device(
            jnp.asarray(theta), sub_chunk=128))
        # identical plan + identical arithmetic; only a 1-ulp log10
        # difference (numpy vs XLA host planning) can flip a knot interval
        # at its boundary, where the cubic is continuous anyway
        np.testing.assert_allclose(p_dev, p_host, rtol=1e-5)

    def test_explicit_plan_and_padding(self, sim):
        import jax.numpy as jnp

        theta = _sorted_theta(1200, seed=8)  # non-multiple of sub_chunk
        z = theta[:, PNAMES.index("redshift")]
        span = sim.zsorted_max_span(np.sort(z), 128)
        kc, w_cols = sim._zsorted_plan(span)
        p_dev = np.asarray(sim.photometry_zsorted_device(
            jnp.asarray(theta), sub_chunk=128, kc=kc, w_cols=w_cols))
        p_ref = np.asarray(sim.photometry(theta))
        assert p_dev.shape == p_ref.shape
        _assert_parity(p_dev, p_ref)

    def test_fused_window_device(self, sim):
        import jax.numpy as jnp

        if not sim._window_mega_supported():
            pytest.skip("fused window unsupported for this config")
        theta = _sorted_theta(512, seed=9)
        p_dev = np.asarray(sim.photometry_zsorted_device(
            jnp.asarray(theta), sub_chunk=128, fused=True))
        p_ref = np.asarray(sim.photometry(theta))
        _assert_parity(p_dev, p_ref, p99=5e-3)


class TestGeneratorDeviceSampling:
    def test_device_generation_parity_and_sorted(self, grid, filters):
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")
        gen = LibraryGenerator(sim, {
            "log10_mass": (7.5, 11.0), "redshift": (0.1, 4.0),
            "log10_peak_age": (7.6, 9.2), "tau": (0.1, 1.2),
            "log10_metallicity": (-3.9, -1.6), "tau_v": (0.0, 2.0),
        }, unlog_keys=["log10_peak_age"])
        lib = gen.generate(n=1500, batch_size=512, seed=3)  # auto device
        th = lib["parameters"].T
        iz = PNAMES.index("redshift")
        assert np.all(np.diff(th[:, iz]) >= 0)
        # draws actually cover the box (stratified LHC on device)
        assert th[:, 0].min() < 7.7 and th[:, 0].max() > 10.8
        p_ref = np.asarray(sim.photometry(th))
        _assert_parity(lib["photometry"].T, p_ref)

    def test_device_resume_roundtrip(self, grid, filters, tmp_path):
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")
        gen = LibraryGenerator(sim, {
            "log10_mass": (8.0, 10.0), "redshift": (0.5, 3.0),
            "log10_peak_age": (7.8, 9.0), "tau": (0.2, 1.0),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        }, unlog_keys=["log10_peak_age"])
        full = gen.generate(n=1024, batch_size=256, seed=5)
        ck = str(tmp_path / "dev_ck")
        resumed = gen.generate(n=1024, batch_size=256, seed=5,
                               resume_path=ck)
        np.testing.assert_allclose(resumed["photometry"],
                                   full["photometry"], rtol=1e-5)
        # host-sampler chunks must not merge into a device-sampled run
        poison = np.full((256, len(filters.codes)), 1.0e9, np.float32)
        np.savez(ck + ".chunk000000.npz", n=1024, batch_size=256, seed=5,
                 order="zsorted", phot=poison)  # no sampler tag -> host
        resumed2 = gen.generate(n=1024, batch_size=256, seed=5,
                                resume_path=ck)
        np.testing.assert_allclose(resumed2["photometry"],
                                   full["photometry"], rtol=1e-5)

    def test_host_sampler_opt_out(self, grid, filters):
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")
        gen = LibraryGenerator(sim, {
            "log10_mass": (8.0, 10.0), "redshift": (0.5, 3.0),
            "log10_peak_age": (7.8, 9.0), "tau": (0.2, 1.0),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        }, unlog_keys=["log10_peak_age"])
        lib = gen.generate(n=256, batch_size=256, seed=4,
                           device_sampling=False)
        th = lib["parameters"].T
        p_ref = np.asarray(sim.photometry(th))
        _assert_parity(lib["photometry"].T, p_ref)


class TestGeneratorZSorted:
    def test_generate_sorted_and_consistent(self, grid, filters):
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")
        gen = LibraryGenerator(sim, {
            "log10_mass": (7.5, 11.0), "redshift": (0.1, 4.0),
            "log10_peak_age": (7.6, 9.2), "tau": (0.1, 1.2),
            "log10_metallicity": (-3.9, -1.6), "tau_v": (0.0, 2.0),
        }, unlog_keys=["log10_peak_age"])
        lib = gen.generate(n=2048, batch_size=512, seed=5)
        th = lib["parameters"].T
        iz = PNAMES.index("redshift")
        # generate sorts θ only when the engine is ON — proves activation
        assert np.all(np.diff(th[:, iz]) >= 0)
        p_ref = np.asarray(sim.photometry(th))
        _assert_parity(lib["photometry"].T, p_ref)

    def test_supplementary_path_unaffected(self, grid, filters):
        """Supplementary quantities need spectra intermediates — the
        generator must keep the standard path there."""
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")
        gen = LibraryGenerator(sim, {
            "log10_mass": (8.0, 10.0), "redshift": (0.5, 3.0),
            "log10_peak_age": (7.8, 9.0), "tau": (0.2, 1.0),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        }, unlog_keys=["log10_peak_age"], supplementary=("m_uv",))
        lib = gen.generate(n=96, batch_size=96, seed=2)
        assert np.isfinite(lib["supplementary_parameters"]).all()


class TestWindowGateAndEdges:
    """Round-3 review regressions: the support gate and the z_max edge."""

    def test_top_interval_redshift(self, grid, filters):
        # draws reaching z_max land in the knot table's LAST interval;
        # the window must reuse _knot_interp's hi-edge virtual neighbour
        # (like the dense path) instead of raising span-exceeded
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(), z_max=6.0,
            photometry_backend="pallas", photometry_variant="interp")
        rng = np.random.default_rng(7)
        n = 256
        theta = np.column_stack([
            rng.uniform(7.5, 11, n), np.sort(rng.uniform(5.0, 6.0, n)),
            rng.uniform(1e8, 1e9, n), rng.uniform(.1, 1.2, n),
            rng.uniform(-3.9, -1.6, n), rng.uniform(0, 2, n),
        ]).astype(np.float32)
        theta[-1, 1] = 6.0  # exactly z_max
        p_ref = np.asarray(sim.photometry(theta))
        p_zs = np.asarray(sim.photometry_zsorted(theta, sub_chunk=64))
        _assert_parity(p_zs, p_ref)

    def test_generate_full_z_range(self, grid, filters):
        # end-to-end: LibraryGenerator with a prior reaching z_max must
        # not crash on the final (top-z) chunk
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(), z_max=5.0,
            photometry_backend="pallas", photometry_variant="interp")
        gen = LibraryGenerator(sim, {
            "log10_mass": (8.0, 10.0), "redshift": (0.1, 5.0),
            "log10_peak_age": (7.8, 9.0), "tau": (0.2, 1.0),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        }, unlog_keys=["log10_peak_age"])
        lib = gen.generate(n=512, batch_size=256, seed=11)
        assert np.isfinite(lib["photometry"]).all()

    def test_fesc_with_reprocessed_unsupported(self, grid, filters):
        # the windowed body drops the escaped incident channel — the gate
        # must reject static fesc != 0 with reprocessed types (matching
        # _mega_supported)
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(fesc=0.3, reprocessed_types=("total",)),
            photometry_backend="pallas", photometry_variant="interp")
        assert not sim._window_supported()

    def test_custom_core_unsupported(self, test_grid, nircam_filters):
        # subclasses overriding the forward model (_core) must not pass the
        # gate: the windowed body would bypass their physics entirely
        from synference_tpu.agn import AGNSimulator

        agn = AGNSimulator(test_grid, nircam_filters,
                           photometry_backend="pallas",
                           photometry_variant="interp")
        assert not agn._window_supported()

    def test_resume_rejects_other_ordering(self, grid, filters, tmp_path):
        # chunks written under a DIFFERENT row ordering (input-order
        # pmapped run, or a pre-upgrade run without the tag) must not be
        # merged into a z-sorted run — rows would silently misalign
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")
        gen = LibraryGenerator(sim, {
            "log10_mass": (8.0, 10.0), "redshift": (0.5, 1.5),
            "log10_peak_age": (7.8, 9.0), "tau": (0.2, 1.0),
            "log10_metallicity": (-3.0, -2.0), "tau_v": (0.0, 1.0),
        }, unlog_keys=["log10_peak_age"])
        full = gen.generate(n=1024, batch_size=256, seed=5)
        iz = PNAMES.index("redshift")
        # generate sorts θ only when the window engine is ON — sortedness
        # proves this config genuinely ran z-sorted (not the dense fallback)
        assert np.all(np.diff(full["parameters"][iz]) >= 0)
        ck = str(tmp_path / "ord_ck")
        poison = np.full((256, len(filters.codes)), 1.0e9, np.float32)
        np.savez(ck + ".chunk000000.npz", n=1024, batch_size=256, seed=5,
                 order="input", phot=poison)
        resumed = gen.generate(n=1024, batch_size=256, seed=5,
                               resume_path=ck)
        np.testing.assert_allclose(
            resumed["photometry"], full["photometry"], rtol=1e-5)


class TestFusedWindow:
    """Windowed megakernel body (`fused=True`): one Pallas program per
    sub-chunk, every (B, w) intermediate VMEM-resident (interpret-mode on
    CPU). Must match the XLA window body knot-for-knot."""

    def test_parity_vs_window_xla(self, grid, filters):
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="interp")
        assert sim._window_mega_supported()
        theta = _sorted_theta(1536, seed=4)
        z = theta[:, PNAMES.index("redshift")]
        assert sim._zsorted_window_plan(z, 128) is not None  # windowed
        p_xla = np.asarray(sim.photometry_zsorted(theta, sub_chunk=128))
        p_fus = np.asarray(
            sim.photometry_zsorted(theta, sub_chunk=128, fused=True))
        rel = np.abs(p_fus - p_xla) / np.maximum(np.abs(p_xla), 1e-30)
        sig = p_xla > 1e-3 * p_xla.max(axis=1, keepdims=True)
        assert np.isfinite(p_fus).all()
        # same knots, same cubic, same dens — only bf16 summation order
        assert np.quantile(rel[sig], 0.99) < 5e-3, np.quantile(rel[sig], .99)
        p_ref = np.asarray(sim.photometry(theta))
        _assert_parity(p_fus, p_ref, p99=5e-3)

    def test_fused_static_fesc(self, grid, filters):
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(fesc=0.25),
            photometry_backend="pallas", photometry_variant="interp")
        theta = _sorted_theta(1536, seed=6)
        p_ref = np.asarray(sim.photometry(theta))
        p_fus = np.asarray(
            sim.photometry_zsorted(theta, sub_chunk=128, fused=True))
        _assert_parity(p_fus, p_ref, p99=5e-3)

    def test_fused_top_interval(self, grid, filters):
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(), z_max=6.0,
            photometry_backend="pallas", photometry_variant="interp")
        rng = np.random.default_rng(8)
        n = 256
        theta = np.column_stack([
            rng.uniform(7.5, 11, n), np.sort(rng.uniform(5.0, 6.0, n)),
            rng.uniform(1e8, 1e9, n), rng.uniform(.1, 1.2, n),
            rng.uniform(-3.9, -1.6, n), rng.uniform(0, 2, n),
        ]).astype(np.float32)
        theta[-1, 1] = 6.0
        p_ref = np.asarray(sim.photometry(theta))
        p_fus = np.asarray(
            sim.photometry_zsorted(theta, sub_chunk=64, fused=True))
        _assert_parity(p_fus, p_ref, p99=5e-3)

    def test_fused_conv_variant(self, grid, filters):
        """The conv engine (table-free dense path) builds its window knot
        matrix lazily; the fused body must consume it identically."""
        sim = BatchSEDSimulator(
            grid, filters, PNAMES, sfh="lognormal", zdist="delta",
            emission=EmissionConfig(),
            photometry_backend="pallas", photometry_variant="conv")
        assert sim._window_mega_supported()
        theta = _sorted_theta(1536, seed=5)
        p_ref = np.asarray(sim.photometry(theta))
        p_fus = np.asarray(
            sim.photometry_zsorted(theta, sub_chunk=128, fused=True))
        _assert_parity(p_fus, p_ref, p99=5e-3)
