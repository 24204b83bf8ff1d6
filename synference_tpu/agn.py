"""AGN emission component — accretion-disk power law + dusty torus.

Reference analogue: the BlackHole component the reference attaches through
Synthesizer (`bh_*` kwargs in `create_galaxy`,
`/root/reference/src/synference/library.py:1361-1419`, AGN fraction
supplementary `:581`). Here the AGN is a `BatchSEDSimulator` subclass that
replaces the stellar SFZH/grid contraction with an analytic disk+torus
L_ν, inheriting the whole observe/IGM/photometry machinery (including the
Pallas filter bank, shared via the bank cache) — so it plugs straight into
`composite.CompositeSEDSimulator` next to stellar components.

Model: disk L_ν ∝ ν^{α} between a Lyman-limit cutoff and an IR rolloff,
plus a torus greybody at `torus_temperature`; `torus_fraction` of the
bolometric output is re-emitted by the torus. Normalized to
10**log10_l_agn erg/s bolometric.

θ names: log10_l_agn [erg/s], redshift, agn_slope (α_ν, typ. −0.5),
tau_v (optional foreground dust), torus_fraction (optional, default 0.4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .dust import greybody_emission
from .sed import BatchSEDSimulator
from .units import C_AA_S

__all__ = ["AGNSimulator", "agn_fraction"]


class AGNSimulator(BatchSEDSimulator):
    """Analytic AGN SED through the standard observe/photometry pipeline."""

    def __init__(self, grid, filters, param_names=(
            "log10_l_agn", "redshift", "agn_slope", "tau_v"), **kwargs):
        kwargs.setdefault("sfh", "constant")  # unused; satisfies base ctor
        kwargs.setdefault("zdist", "delta")
        super().__init__(grid, filters, param_names, **kwargs)
        lam = np.asarray(grid.lam)
        nu_phz = C_AA_S / lam * 1.0e-15
        self._nu_phz = jnp.asarray(nu_phz, jnp.float32)
        self._dnu_phz_agn = jnp.asarray(-np.gradient(nu_phz), jnp.float32)
        # disk band: Lyman limit to 1 µm, smooth rolloffs
        self._disk_window = jnp.asarray(
            1.0 / (1.0 + np.exp(-(lam - 700.0) / 60.0))
            * 1.0 / (1.0 + np.exp((lam - 12000.0) / 1200.0)),
            jnp.float32,
        )

    def _agn_lnu(self, params):
        """(L,) rest-frame L_ν [erg/s/Hz], bolometric-normalized."""
        l_bol30 = 10.0 ** (params["log10_l_agn"] - 30.0)  # in 1e30 erg/s
        slope = params.get("agn_slope", jnp.asarray(-0.5))
        torus_frac = jnp.clip(
            params.get("torus_fraction", jnp.asarray(0.4)), 0.0, 0.95
        )
        # disk shape, unit bolometric in scaled (PHz) units
        shape = self._nu_phz**slope * self._disk_window
        norm = jnp.sum(shape * self._dnu_phz_agn)  # ∫ dν in PHz
        disk = shape / jnp.maximum(norm, 1.0e-30) * 1.0e-15  # per Hz, ∫=1
        torus = greybody_emission(
            self._lam, params.get("torus_temperature", jnp.asarray(300.0)),
            emissivity=1.6,
        )
        lnu_unit = (1.0 - torus_frac) * disk + torus_frac * torus
        # multiply 1e30 bolometric scale; split to stay in fp32 range
        return (l_bol30 * 1.0e15) * (lnu_unit * 1.0e15)

    def _core(self, theta_row, want_spectra: bool, fused: bool = False,
              row_idx=None):
        params = self.theta_dict(theta_row)
        lnu = self._agn_lnu(params)
        tau_v = params.get("tau_v", jnp.asarray(0.0))
        lnu = lnu * jnp.exp(-tau_v * self._dust_curve)
        z = params.get("redshift", jnp.asarray(0.0))
        if fused:
            # photometry-only fast path (see BatchSEDSimulator._core)
            return {"_lnu": lnu, "_z": z}
        fnu_njy, _ = self._observe(params, lnu)
        out = {"fnu_njy": fnu_njy, "_z": z}
        if want_spectra:
            out["lnu"] = lnu
            out["lnu_intrinsic"] = lnu
            # no stellar populations: zero SFH/SFZH placeholders
            out["sfh_mass"] = jnp.zeros(self.grid.n_ages)
            out["sfzh"] = jnp.zeros(self.grid.n_ages * self.grid.cells_per_age)
        return out


def agn_fraction(stellar_lnu, agn_lnu, lam, band=(4000.0, 6000.0)):
    """Fractional AGN contribution in a rest-frame band (the reference's
    `calculate_AGN_fraction` supplementary, library.py:581)."""
    lam = jnp.asarray(lam)
    m = ((lam >= band[0]) & (lam <= band[1])).astype(stellar_lnu.dtype)
    a = (agn_lnu * m).sum(-1)
    s = (stellar_lnu * m).sum(-1)
    return a / jnp.maximum(a + s, 1.0e-30)
