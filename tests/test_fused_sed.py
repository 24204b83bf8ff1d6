"""Single-pass megakernel (`ops/fused_sed.py`): interpret-mode parity of
the whole-chain Pallas program against the staged XLA fused path, plus the
static support gate.

Reference counterpart: the per-galaxy Synthesizer pipeline loop the
reference drives via `pipeline.run()` (`library.py:2592-2619`); here the
entire SED→dust→IGM→photometry chain is one VMEM-resident program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synference_tpu as st


def _make_sim(**kw):
    grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                  lam_min=300.0)
    centers = [9000.0, 15000.0, 27700.0, 44400.0]
    widths = [2000.0, 3300.0, 7000.0, 10200.0]
    filters = st.FilterSet(
        [st.tophat_filter(f"F{i}", c, w)
         for i, (c, w) in enumerate(zip(centers, widths))])
    defaults = dict(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"),
        photometry_backend="pallas", photometry_variant="interp")
    defaults.update(kw)
    return st.BatchSEDSimulator(**defaults)


def _theta(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.stack([
        rng.uniform(7.5, 11, n), rng.uniform(0.05, 10, n),
        rng.uniform(5e7, 1e9, n), rng.uniform(0.1, 1.2, n),
        rng.uniform(-3.9, -1.5, n), rng.uniform(0, 3, n)], axis=1),
        jnp.float32)


class TestMegakernelParity:
    @pytest.mark.parametrize("order", [1, 3])
    def test_matches_staged_fused_path(self, order):
        """Interpret-mode megakernel vs the staged XLA/knot-matmul path:
        identical tables, same bf16 knot matmul — differences are only
        rounding-order in the contraction and the (equivalent) folded
        wlam multiply, plus Fritsch–Butland same-sign branch boundaries."""
        sim = _make_sim(photometry_interp_order=order)
        assert sim._mega_supported()
        theta = _theta(128)
        mega = np.asarray(jax.jit(sim.photometry)(theta))

        sim_ref = _make_sim(photometry_interp_order=order)
        sim_ref._mega_cache = None  # force the staged path
        ref = np.asarray(jax.jit(sim_ref.photometry)(theta))

        rel = np.abs(mega - ref) / np.maximum(np.abs(ref), 1e-30)
        assert np.median(rel) < 2e-3
        assert np.quantile(rel, 0.99) < 2e-2

    def test_jit_batch_invariance(self):
        """Same rows give the same fluxes regardless of batch padding —
        the block_b divisor loop must not change per-row results."""
        sim = _make_sim()
        theta = _theta(96, seed=1)
        full = np.asarray(sim.photometry(theta))
        half = np.asarray(sim.photometry(theta[:48]))
        np.testing.assert_allclose(full[:48], half, rtol=1e-6)

    @pytest.mark.parametrize("n", [1, 3, 7, 13])
    def test_small_odd_batches(self, n):
        """Batches not divisible by 8 must pad (Mosaic rejects galaxy
        blocks < 8 rows) and slice back — regression for the verify-drive
        failure at B=3."""
        sim = _make_sim()
        theta = _theta(16, seed=2)
        full = np.asarray(sim.photometry(theta))
        small = np.asarray(sim.photometry(theta[:n]))
        assert small.shape[0] == n
        assert np.isfinite(small).all()
        np.testing.assert_allclose(full[:n], small, rtol=1e-6)


class TestSupportGate:
    def test_unsupported_configs_fall_back(self):
        # traced fesc -> per-galaxy channel mixing not fused
        sim = _make_sim(
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v", "fesc"),
            emission=st.EmissionConfig(igm="inoue14", fesc="fesc"))
        assert not sim._mega_supported()
        # xla backend has no pallas tables at all
        sim = _make_sim(photometry_backend="xla")
        assert not sim._mega_supported()

    def test_fallback_still_computes(self):
        """Gated-off configs still produce finite photometry through the
        staged path."""
        sim = _make_sim(photometry_backend="xla")
        out = sim.photometry(_theta(16))
        assert np.isfinite(np.asarray(out)).all()


class TestMegaWithTrimming:
    @pytest.mark.slow
    def test_trimmed_large_grid_engages_mega(self):
        """λ-support trimming can bring a large grid under the megakernel
        gate; the mega tables must then align with the l_lo>0 knot matrix
        (absolute-column agreement between sed slice and knot rows)."""
        grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=6000,
                                      lam_min=150.0)
        # narrow blue filter set: support well under 4096 columns
        filters = st.FilterSet([
            st.tophat_filter("F090W", 9000.0, 2000.0),
            st.tophat_filter("F115W", 11500.0, 2600.0),
        ])
        kw = dict(
            grid=grid, filters=filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta",
            emission=st.EmissionConfig(igm="inoue14"),
            photometry_backend="pallas", photometry_variant="interp")
        sim = st.BatchSEDSimulator(**kw)
        assert sim._lam_support is not None
        l0, l1 = sim._lam_support
        assert l0 > 0 and (l1 - l0) <= 4096 < grid.n_wav
        assert sim._mega_supported()
        theta = _theta(64, seed=5)
        mega = np.asarray(jax.jit(sim.photometry)(theta))
        sim_ref = st.BatchSEDSimulator(**kw)
        sim_ref._mega_cache = None  # force the staged path
        ref = np.asarray(jax.jit(sim_ref.photometry)(theta))
        rel = np.abs(mega - ref) / np.maximum(np.abs(ref), 1e-30)
        assert np.median(rel) < 2e-3
        assert np.quantile(rel, 0.99) < 2e-2
