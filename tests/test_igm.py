"""IGM transmission tests: Inoue14 (reference default) vs Madau95.

Spot checks anchor the Inoue14 implementation to published/observed
effective optical depths (Inoue et al. 2014; Becker et al. 2013 mean-flux
measurements): τ_eff(Lyα) ≈ 0.24 at z_abs = 2.5 and ≈ 3 at z_abs = 5.5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.igm import igm_transmission

LYA = 1215.67


class TestInoue14:
    def test_transparent_redward_of_lya(self):
        lam = jnp.asarray([LYA * 4.0 + 50.0, 9000.0, 20000.0])
        t = np.asarray(igm_transmission(lam, 3.0, "inoue14"))
        np.testing.assert_allclose(t, 1.0, atol=1e-6)

    def test_forest_transmission_z3(self):
        """At source z=3, λ_obs = Lyα(1+2.5): mean forest transmission
        ≈ 0.78 (τ_eff ≈ 0.245, Inoue14 LAF A2·3.5^3.7 + DLA term)."""
        t = float(igm_transmission(
            jnp.asarray([LYA * 3.5]), 3.0, "inoue14")[0])
        assert 0.74 < t < 0.82

    def test_forest_transmission_z6(self):
        """At source z=6, λ_obs = Lyα(1+5.5): τ_eff ≈ 3.05 → T ≈ 0.05."""
        t = float(igm_transmission(
            jnp.asarray([LYA * 6.5]), 6.0, "inoue14")[0])
        assert 0.02 < t < 0.09

    def test_monotone_in_redshift(self):
        """Transmission at fixed λ_obs inside the forest decreases with z."""
        lam = jnp.asarray([5000.0])
        ts = [float(igm_transmission(lam, z, "inoue14")[0])
              for z in (3.2, 4.0, 5.0, 6.0)]
        assert all(a > b for a, b in zip(ts, ts[1:]))

    def test_continuum_absorbed_below_limit(self):
        """Below the Lyman limit (observed) transmission is heavily
        suppressed and bounded by the forest value just redward."""
        t_lc = float(igm_transmission(jnp.asarray([900.0]), 3.0,
                                      "inoue14")[0])
        t_forest = float(igm_transmission(jnp.asarray([3000.0]), 3.0,
                                          "inoue14")[0])
        assert t_lc < 0.3
        assert t_lc < t_forest

    def test_close_to_madau_at_z3(self):
        """The two prescriptions agree to tens of percent through the
        forest (they fit the same data)."""
        lam = jnp.linspace(3200.0, 4800.0, 64)
        ti = np.asarray(igm_transmission(lam, 3.0, "inoue14"))
        tm = np.asarray(igm_transmission(lam, 3.0, "madau95"))
        assert np.abs(ti - tm).max() < 0.25
        assert np.abs(np.log(ti / tm)).mean() < 0.25

    def test_jit_and_vmap_over_z(self):
        lam = jnp.linspace(800.0, 10000.0, 128)
        f = jax.jit(lambda z: igm_transmission(lam, z, "inoue14"))
        zs = jnp.asarray([0.5, 1.5, 3.0, 5.0, 7.0])
        t = np.asarray(jax.vmap(f)(zs))
        assert t.shape == (5, 128)
        assert np.isfinite(t).all()
        assert (t >= 0).all() and (t <= 1.0 + 1e-6).all()

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError, match="unknown IGM model"):
            igm_transmission(jnp.asarray([5000.0]), 1.0, "madau2099")

    def test_z_branch_continuity(self):
        """The piecewise z branches (1.2, 2.0, 4.7) must not produce large
        jumps in transmission."""
        lam = jnp.linspace(1000.0, 7000.0, 64)
        for z0 in (1.2, 2.0, 4.7):
            lo = np.asarray(igm_transmission(lam, z0 - 1e-3, "inoue14"))
            hi = np.asarray(igm_transmission(lam, z0 + 1e-3, "inoue14"))
            assert np.abs(lo - hi).max() < 0.05


class TestTabulatedIGM:
    def test_table_lerp_matches_direct(self, test_grid, nircam_filters):
        """The simulator's tabulated T(λ_rest, z) lookup must match the
        direct Inoue14 evaluation to ~1e-3 (interp error is second-order)."""
        from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

        sim = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            emission=EmissionConfig(igm="inoue14"), photometry_backend="xla",
        )
        assert sim._igm_table is not None
        lam = jnp.asarray(test_grid.lam, jnp.float32)
        for z in (0.0, 0.5, 1.19, 2.3, 4.69, 6.5, 11.0):
            direct = np.asarray(igm_transmission(lam * (1.0 + z), z,
                                                 "inoue14"))
            # replicate the in-simulator lookup
            zp1 = 1.0 + z
            s = np.log10(max(zp1, 1.0)) / sim._igm_dlog
            k = int(np.clip(np.floor(s), 0, sim._igm_table.shape[0] - 2))
            frac = s - k
            table = np.asarray(sim._igm_table)
            lerp = table[k] * (1 - frac) + table[k + 1] * frac
            assert np.abs(lerp - direct).max() < 2e-3, z

    def test_none_model_skips_table(self, test_grid, nircam_filters):
        from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

        sim = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            emission=EmissionConfig(igm="none"), photometry_backend="xla",
        )
        assert sim._igm_table is None
