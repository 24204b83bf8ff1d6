"""Pallas photometry kernel: host-side table math + interpret-mode kernel
equivalence against the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from synference_tpu.ops.photometry_kernel import (
    N_ROLL,
    N_SUB,
    build_den_table,
    build_shift_tables,
    pallas_photometry_num,
    shift_decompose,
)
from synference_tpu.sed import BatchSEDSimulator


class TestShiftDecompose:
    def test_roundtrip(self):
        s = jnp.asarray([0.0, 1.3, 57.9, 300.26, 599.0])
        s4, tid, off = shift_decompose(s, 600)
        s4, tid, off = np.asarray(s4), np.asarray(tid), np.asarray(off)
        # recompose: total shift = off + (tid % 128) + (tid // 128)/N_SUB
        recomposed = off + (tid % N_ROLL) + (tid // N_ROLL) / N_SUB
        np.testing.assert_allclose(recomposed, np.asarray(s4) / N_SUB,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s4) / N_SUB,
                                   np.round(np.asarray(s) * N_SUB) / N_SUB)

    def test_clipping(self):
        s4, tid, off = shift_decompose(jnp.asarray([1e9]), 600)
        assert int(s4[0]) == N_SUB * 600 - 1


class TestTables:
    def test_bank_lookup_equals_direct_interp(self, nircam_filters, test_grid):
        dlogs = np.diff(np.log10(test_grid.lam))
        dlog = float(dlogs.mean())
        max_shift = 100
        bank, q_max = build_shift_tables(
            nircam_filters, test_grid.lam, dlog, max_shift, test_grid.n_wav
        )
        # pick a shift, verify bank windows == direct filter evaluation
        for s in (0.0, 13.37, 99.0):
            s4, tid, off = shift_decompose(jnp.asarray([s]), max_shift)
            tid_i, off_i = int(tid[0]), int(off[0])
            window = bank[tid_i, :, off_i : off_i + test_grid.n_wav]
            snapped = float(s4[0]) / N_SUB
            lam_eval = test_grid.lam[0] * 10.0 ** (
                (np.arange(test_grid.n_wav) + snapped) * dlog
            )
            for fi, filt in enumerate(nircam_filters.filters):
                direct = np.interp(lam_eval, filt.lam, filt.transmission,
                                   left=0.0, right=0.0)
                np.testing.assert_allclose(window[fi], direct, atol=1e-5)

    def test_den_table_matches_direct(self, nircam_filters, test_grid):
        dlog = float(np.diff(np.log10(test_grid.lam)).mean())
        wlam = np.gradient(test_grid.lam) / test_grid.lam
        den = build_den_table(nircam_filters, test_grid.lam, wlam, dlog, 50)
        for s4 in (0, 7, 400):
            lam_eval = test_grid.lam[0] * 10.0 ** (
                (np.arange(test_grid.n_wav) + s4 / N_SUB) * dlog
            )
            for fi, filt in enumerate(nircam_filters.filters):
                t = np.interp(lam_eval, filt.lam, filt.transmission,
                              left=0.0, right=0.0)
                np.testing.assert_allclose(
                    den[s4, fi], (t * wlam).sum(), rtol=1e-5
                )


class TestKernelInterpret:
    def test_matches_xla_path(self, nircam_filters, test_grid, rng):
        """Run the kernel in interpret mode on CPU; compare the pallas
        photometry path against the XLA path at matched (snapped) shifts."""
        sim_x = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            photometry_backend="xla",
        )
        sim_p = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            photometry_backend="pallas",
        )
        theta = np.stack([
            rng.uniform(8, 10, 8), rng.uniform(0.5, 5.0, 8),
            rng.uniform(1e8, 5e8, 8), rng.uniform(0.3, 0.8, 8),
            rng.uniform(-3, -2, 8), rng.uniform(0, 1, 8),
        ], axis=1).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            out_p = sim_p.simulate(theta, want_spectra=True)
        p_pallas = np.asarray(out_p["photometry_njy"])
        p_xla = np.asarray(sim_x.photometry(theta))

        # exact numpy reference: T evaluated directly at λ_l (1+z)
        fnu = np.asarray(out_p["fnu_njy"])
        lam = test_grid.lam
        wlam = np.gradient(lam) / lam
        z = theta[:, 1]
        ref = np.zeros_like(p_pallas)
        for b in range(len(theta)):
            lam_obs = lam * (1 + z[b])
            for fi, filt in enumerate(nircam_filters.filters):
                t = np.interp(lam_obs, filt.lam, filt.transmission,
                              left=0.0, right=0.0)
                ref[b, fi] = (fnu[b] * t * wlam).sum() / max(
                    (t * wlam).sum(), 1e-30
                )
        scale = np.abs(ref).max(axis=1, keepdims=True)
        # pallas: exact filter eval at 1/8-column-snapped shifts; the
        # 512-λ test grid is 4x coarser than production so snap error at
        # tophat edges reaches ~1.5% here (≲0.4% at production resolution)
        assert np.all(np.abs(p_pallas - ref) <= 2.5e-2 * scale + 1e-8)
        # xla path lerps the table between whole columns -> looser at edges
        assert np.all(np.abs(p_xla - ref) <= 6e-2 * scale + 1e-8)
