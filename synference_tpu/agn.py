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
from .sed import BatchSEDSimulator, register_simulator
from .units import C_AA_S

__all__ = ["AGNSimulator", "AGNGridSimulator", "agn_fraction"]


@register_simulator
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
            1.0 / (1.0 + np.exp(np.clip(-(lam - 700.0) / 60.0, -60, 60)))
            * 1.0 / (1.0 + np.exp(np.clip((lam - 12000.0) / 1200.0,
                                          -60, 60))),
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
            # photometry-only fast path (see BatchSEDSimulator._core):
            # _photometry_fused expects the SUPPORT-TRIMMED λ range — the
            # base _core trims, so this override must too or the
            # lnu · _wlam_sup product shape-errors whenever trimming is on
            if self._lam_support is not None:
                lnu = lnu[self._lam_support[0]:self._lam_support[1]]
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


@register_simulator
class AGNGridSimulator(BatchSEDSimulator):
    """AGN forward model from a Cloudy-processed AGN grid (disk incident +
    NLR/BLR reprocessing).

    The reference gets AGN line-region reprocessing by attaching
    Synthesizer BlackHole components whose emission models consume Cloudy
    AGN grids (reference library.py:1361-1419). Here the grid's AGN
    physics axes (ionisation parameter, hydrogen density, ...) ride
    `BatchSEDSimulator`'s generic extra-axis lerp-delta machinery — the
    stellar (age, Z) axes are degenerate 1×1 — and the Pacman fesc split
    generalizes to per-region covering fractions:

        L_ν = (1 − Σ_r c_r) · incident + Σ_r c_r · region_r

    with c_r = θ ``covering_fraction_<region>`` (default 0.1) and one
    foreground dust screen over everything. `emission.dust_emission=True`
    re-emits the absorbed energy as a greybody (set ``dust_temperature``
    to a few hundred K for a torus). Grid spectra/line tables are per
    unit 10**l_norm erg/s of bolometric disk luminosity and scale by
    10**(log10_l_agn − l_norm); line quantities scale by their emitting
    region's covering fraction (``grid.lines["region"]`` tags).

    θ names: log10_l_agn [erg/s], redshift, the grid's extra-axis names,
    covering_fraction_<region> per reprocessed type, tau_v.

    The single-pass megakernel is disabled: it implements one
    static-fesc channel mix, not per-galaxy traced covering fractions;
    photometry uses the staged fused paths instead.
    """

    def __init__(self, grid, filters, param_names=None, l_norm: float = 45.0,
                 emission=None, **kwargs):
        from .sed import EmissionConfig

        if emission is None:
            regions = tuple(sorted(t for t in grid.spectra
                                   if t != "incident"))
            emission = EmissionConfig(
                incident_type="incident", reprocessed_types=regions,
                fesc=0.0)
        if param_names is None:
            param_names = (
                "log10_l_agn", "redshift", *grid.extra_axis_names,
                *(f"covering_fraction_{t}"
                  for t in emission.reprocessed_types),
                "tau_v",
            )
        kwargs.setdefault("sfh", "constant")  # unused; _sfzh is overridden
        kwargs.setdefault("zdist", "delta")
        super().__init__(grid, filters, param_names, emission=emission,
                         **kwargs)
        self._mega_off = True
        self._log10_l_norm = float(l_norm)
        regs = (grid.lines or {}).get("region") if grid.lines else None
        self._line_regions = tuple(regs) if regs is not None else None

    def model_extra(self) -> dict:
        """Extra ctor kwargs persisted in the Model group."""
        return {"l_norm": self._log10_l_norm}

    # -- weights: pure axis interpolation × bolometric scale -------------
    def _sfzh(self, params):
        w = jnp.ones((1, 1), jnp.float32)
        for ax_name, ax_vals in self._extra_axes:
            w = w[..., None] * self._axis_delta_weights(
                ax_vals, params[ax_name])
        scale = 10.0 ** (params["log10_l_agn"] - self._log10_l_norm)
        flat = w.reshape(-1) * scale
        return flat, flat.sum(keepdims=True)

    def _covering_fractions(self, params):
        return [
            jnp.clip(params.get(f"covering_fraction_{t}",
                                jnp.asarray(0.1)), 0.0, 1.0)
            for t in self.emission.reprocessed_types
        ]

    # -- channel mixing: covering fractions instead of fesc --------------
    def _apply_emission(self, params, sfzh_flat, trimmed: bool = False):
        em = self.emission
        dust_curve = self._dust_curve_sup if trimmed else self._dust_curve
        comp = self._components_sup if trimmed else self._components
        w = sfzh_flat.astype(self.compute_dtype)

        def contract(stype):
            return jnp.matmul(w, comp[stype],
                              preferred_element_type=jnp.float32)

        covs = self._covering_fractions(params)
        cov_tot = jnp.clip(sum(covs), 0.0, 1.0)
        intrinsic = (1.0 - cov_tot) * contract(em.incident_type)
        for c, t in zip(covs, em.reprocessed_types):
            intrinsic = intrinsic + c * contract(t)
        tau_v = (
            params[em.tau_v_param] if em.tau_v_param is not None
            else jnp.asarray(0.0)
        )
        lnu = intrinsic * jnp.exp(-tau_v * dust_curve)
        if em.dust_emission:
            assert not trimmed, "dust_emission needs the full λ grid"
            lnu = self._add_dust_emission(lnu, intrinsic)
        return lnu, intrinsic

    def _line_mixing(self, params, lum, cont, inc_cont, sel,
                     sfzh_flat=None, att=None):
        """AGN mixing for line quantities: every channel sits behind the
        same foreground screen (matching `_apply_emission`, which
        attenuates the incident too — unlike Pacman's escaped channel), so
        the realized continuum is att·((1−cov_tot)·inc + cov_tot·cont).
        Known approximation: the grid's line table carries only the
        EMITTING region's transmitted continuum, so other regions'
        contributions use the same column (exact when regions share a
        transmitted continuum, as Cloudy NLR/BLR tables typically nearly
        do at line wavelengths)."""
        covs = self._covering_fractions(params)
        cov_tot = jnp.clip(sum(covs), 0.0, 1.0)
        att_l = att if att is not None else 1.0
        # `cont` arrives pre-attenuated; only the incident needs the screen
        cont_real = (1.0 - cov_tot) * inc_cont * att_l + cov_tot * cont
        if self._line_regions is None:
            return cov_tot * lum, cont_real
        # lines whose region is not among reprocessed_types are unmodelled:
        # covering fraction 0 (the user chose not to include that region).
        # One static index array + a gather with a zero sentinel row keeps
        # the HLO O(1) in line count (a per-line Python stack of traced
        # scalars would grow the trace with every selected line)
        types = list(self.emission.reprocessed_types)
        idx = np.asarray(
            [types.index(r) if r in types else len(types)
             for r in (self._line_regions[int(i)] for i in np.asarray(sel))],
            np.int32)
        cov_mat = jnp.concatenate(
            [jnp.stack(covs), jnp.zeros((1,), jnp.float32)])
        cov_vec = cov_mat[jnp.asarray(idx)]
        return cov_vec * lum, cont_real
