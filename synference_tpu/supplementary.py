"""Supplementary derived quantities recorded alongside photometry.

TPU-native re-implementation of the reference's 20 per-galaxy analysis
functions (`/root/reference/src/synference/library.py:172-686`,
`SUPP_FUNCTIONS` registry `:644-686`): there each is a Python function over
Synthesizer Galaxy/Sed objects run per galaxy inside the pipeline; here each
is a batched jnp function over the simulator's existing intermediates
(rest-frame L_ν, SFZH weights, f_ν), so recording supplementary parameters
costs one fused elementwise pass.

Registry names (reference analogues in parens):
    m_uv                absolute UV magnitude, 1500 Å tophat  (:199)
    app_m_uv            apparent UV magnitude                  (:172)
    sfr_10, sfr_100     SFR averaged over 10/100 Myr           (:223)
    burstiness          SFR10/SFR100                           (:427)
    mass_weighted_age   (:238)
    lum_weighted_age    bolometric-luminosity-weighted age     (:243)
    beta_uv             UV slope β (1250–3000 Å)               (:347)
    d4000               4000 Å break (F_ν ratio)               (:332)
    t10,t50,t90         SFH lookback quantiles                 (:468)
    u_minus_v, v_minus_j  rest-frame UVJ colors                (:257)
    balmer_decrement    Hα/Hβ line-flux ratio                  (:363)
    ew_halpha, ew_hbeta, ew_oiii  line equivalent widths [Å]   (:404)
    n_ion               ionizing photon rate [1/s]             (:559)
    xi_ion              ionizing photon production efficiency  (:529)
    surviving_mass      mass after stellar mass loss           (:512)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .units import C_AA_S

_H_ERG_S = 6.62607015e-27

__all__ = ["SUPP_FUNCTIONS", "compute_supplementary"]


def _window_mean(lam, lnu, lo, hi):
    """Mean L_ν in a rest-frame tophat [lo, hi] Å (batch, L) -> (batch,)."""
    m = ((lam >= lo) & (lam <= hi)).astype(lnu.dtype)
    return (lnu * m).sum(-1) / jnp.maximum(m.sum(), 1.0)


def _abs_mag_from_lnu(lnu_mean):
    """M_AB = -2.5 log10(L_ν [erg/s/Hz]) + 51.595 (flux at 10 pc)."""
    return -2.5 * jnp.log10(jnp.maximum(lnu_mean, 1.0e-30)) + 51.595


# each fn: (ctx) -> (B,) where ctx is a dict of batch intermediates


def _m_uv(ctx):
    return _abs_mag_from_lnu(_window_mean(ctx["lam"], ctx["lnu"], 1450.0, 1550.0))


def _app_m_uv(ctx):
    return _m_uv(ctx) + ctx["distance_modulus"]


def _sfr_timescale(ctx, t_yr):
    ages = ctx["age_bin_edges"]  # (A+1,)
    frac_in = jnp.clip(
        (t_yr - ages[:-1]) / jnp.maximum(ages[1:] - ages[:-1], 1.0), 0.0, 1.0
    )
    mass_young = (ctx["sfh_mass"] * frac_in).sum(-1)
    return mass_young / t_yr


def _sfr_10(ctx):
    return _sfr_timescale(ctx, 1.0e7)


def _sfr_100(ctx):
    return _sfr_timescale(ctx, 1.0e8)


def _burstiness(ctx):
    return _sfr_10(ctx) / jnp.maximum(_sfr_100(ctx), 1.0e-20)


def _mass_weighted_age(ctx):
    m = ctx["sfh_mass"]
    return (m * ctx["ages_yr"]).sum(-1) / jnp.maximum(m.sum(-1), 1.0e-20)


def _lum_weighted_age(ctx):
    # weight each (age, Z) cell by its bolometric grid luminosity
    w = ctx["sfzh"] * ctx["bol_lum_flat"]  # (B, A*Z)
    n_z = ctx["cells_per_age"]
    ages = jnp.repeat(ctx["ages_yr"], n_z)
    return (w * ages).sum(-1) / jnp.maximum(w.sum(-1), 1.0e-20)


def _beta_uv(ctx):
    """Least-squares slope of ln f_λ vs ln λ over 1250–3000 Å.
    f_λ ∝ L_ν / λ², so β = dln(L_ν)/dln(λ) − 2."""
    lam, lnu = ctx["lam"], ctx["lnu"]
    m = ((lam >= 1250.0) & (lam <= 3000.0)).astype(lnu.dtype)
    x = jnp.log(lam) * m
    y = jnp.log(jnp.maximum(lnu, 1.0e-30)) * m
    n = jnp.maximum(m.sum(), 1.0)
    sx, sy = x.sum(), y.sum(-1)
    sxx = (x * x).sum()
    sxy = (x * y).sum(-1)
    slope = (n * sxy - sx * sy) / jnp.maximum(n * sxx - sx * sx, 1.0e-10)
    return slope - 2.0


def _d4000(ctx):
    red = _window_mean(ctx["lam"], ctx["lnu"], 4000.0, 4100.0)
    blue = _window_mean(ctx["lam"], ctx["lnu"], 3850.0, 3950.0)
    return red / jnp.maximum(blue, 1.0e-30)


def _sfh_quantile(ctx, q):
    """Lookback time by which fraction q of the mass had formed (counting
    from the oldest stars): t_q s.t. mass(age > t_q) = q * total."""
    m = ctx["sfh_mass"]  # (B, A) young->old ordering follows grid ages asc
    total = jnp.maximum(m.sum(-1, keepdims=True), 1.0e-20)
    # cumulative from old end
    cum_from_old = jnp.cumsum(m[..., ::-1], axis=-1) / total  # old->young
    ages_desc = ctx["ages_yr"][::-1]

    def one(cm):
        return jnp.interp(q, cm, ages_desc)

    return jax.vmap(one)(cum_from_old)


def _t10(ctx):
    return _sfh_quantile(ctx, 0.1)


def _t50(ctx):
    return _sfh_quantile(ctx, 0.5)


def _t90(ctx):
    return _sfh_quantile(ctx, 0.9)


def _color(ctx, band1, band2):
    m1 = _abs_mag_from_lnu(_window_mean(ctx["lam"], ctx["lnu"], *band1))
    m2 = _abs_mag_from_lnu(_window_mean(ctx["lam"], ctx["lnu"], *band2))
    return m1 - m2


def _u_minus_v(ctx):
    return _color(ctx, (3400.0, 3900.0), (5300.0, 5700.0))


def _v_minus_j(ctx):
    return _color(ctx, (5300.0, 5700.0), (11800.0, 12600.0))


def _line_flux(ctx, lam0, width=30.0, cont_off=80.0, cont_w=50.0):
    """Continuum-subtracted integrated line luminosity around lam0, in
    1e10-SCALED units (flux [1e10 erg/s], continuum L_λ [1e10 erg/s/Å]).

    Continuum = mean of side windows; integrate (L_λ − cont) over the line
    window. L_λ = L_ν c/λ². Only RATIOS of these outputs are consumed
    (EWs, Balmer decrement), so the scale cancels — restoring the 1e10
    here would overflow fp32 for luminous young galaxies (≳1e43 erg/s).
    """
    lam, lnu = ctx["lam"], ctx["lnu"]
    # fold the 1e-10 into the conversion factor BEFORE multiplying lnu:
    # lnu·(c/λ²) alone reaches ~1e44 at the blue end and overflows fp32
    llam = lnu * ((C_AA_S * 1.0e-10) / lam**2)
    line_m = (jnp.abs(lam - lam0) < width).astype(lnu.dtype)
    cont_m = (
        (jnp.abs(lam - (lam0 - cont_off)) < cont_w)
        | (jnp.abs(lam - (lam0 + cont_off)) < cont_w)
    ).astype(lnu.dtype)
    cont = (llam * cont_m).sum(-1) / jnp.maximum(cont_m.sum(), 1.0)
    dlam = ctx["dlam"]
    excess = ((llam - cont[..., None]) * line_m * dlam).sum(-1)
    return excess, cont  # 1e10-scaled (flux, continuum L_λ)


def _balmer_decrement(ctx):
    ha, _ = _line_flux(ctx, 6563.0)
    hb, _ = _line_flux(ctx, 4861.0)
    return ha / jnp.maximum(hb, 1.0e-30)


def _ew(ctx, lam0):
    fl, cont = _line_flux(ctx, lam0)
    return fl / jnp.maximum(cont, 1.0e-30)


def _ew_halpha(ctx):
    return _ew(ctx, 6563.0)


def _ew_hbeta(ctx):
    return _ew(ctx, 4861.0)


def _ew_oiii(ctx):
    return _ew(ctx, 5007.0)


def _n_ion(ctx):
    """Ionizing photon rate from the intrinsic (pre-dust) spectrum:
    Ṅ = ∫_{λ<912} L_ν/(hν) dν = ∫ L_ν/(h λ) dλ ... computed per-Hz.

    Scaled arithmetic: L_ν ~ 1e30, 1/h ~ 1.5e26 — work in units of 1e40.
    """
    lam, lnu = ctx["lam"], ctx["lnu_intrinsic"]
    m = (lam < 912.0).astype(lnu.dtype)
    # dν/ν = dλ/λ ; Ṅ = ∫ (L_ν/h) dν/ν ... no: Ṅ = ∫ L_ν/(hν) dν.
    # Use dν = ν dλ/λ: Ṅ = ∫ L_ν/h dλ/λ.
    integrand = (lnu * 1.0e-30) * (ctx["dlam"] / lam) * m
    return integrand.sum(-1) * (1.0e30 / _H_ERG_S)


def _xi_ion(ctx):
    luv = _window_mean(ctx["lam"], ctx["lnu"], 1450.0, 1550.0)
    return _n_ion(ctx) / jnp.maximum(luv, 1.0e-30)


def _flux_weighted_age(ctx):
    """Age weighted by each SFZH cell's flux in an observed F444W-like
    window (reference `calculate_flux_weighted_age`, library.py:250-254,
    default filter JWST/NIRCam.F444W).

    Per-cell band luminosity comes from the precomputed cumulative grid
    integral: two per-galaxy column gathers at the redshifted window edges
    (the window maps to rest frame as λ_obs/(1+z)).
    """
    lam = ctx["lam"]
    cum = ctx["cum_lum"]  # (A·Z, L) cumulative ∫ L_ν dν per cell (scaled)
    zp1 = 1.0 + ctx["z"]  # (B,)
    lo_obs, hi_obs = 38900.0, 49900.0
    n_l = lam.shape[0]

    def edge_idx(lam_rest):
        # fractional index on the log-uniform λ grid
        s = (jnp.log(lam_rest) - jnp.log(lam[0])) / (
            jnp.log(lam[-1]) - jnp.log(lam[0]))
        return jnp.clip((s * (n_l - 1)).astype(jnp.int32), 0, n_l - 1)

    i_lo = edge_idx(lo_obs / zp1)  # (B,)
    i_hi = edge_idx(hi_obs / zp1)
    flux_cell = cum[:, i_hi].T - cum[:, i_lo].T  # (B, A·Z)
    w = ctx["sfzh"] * jnp.maximum(flux_cell, 0.0)
    ages_cell = jnp.repeat(ctx["ages_yr"], ctx["cells_per_age"])
    return (w * ages_cell).sum(-1) / jnp.maximum(w.sum(-1), 1.0e-30)


def _surviving_mass(ctx):
    """Mass surviving stellar mass loss, Behroozi+13 fitting formula
    f_loss(t) = 0.05 ln(1 + t/1.4 Myr) (the reference uses Synthesizer's
    IMF-tabulated surviving fractions, library.py:512)."""
    f_loss = 0.05 * jnp.log1p(ctx["ages_yr"] / 1.4e6)
    return (ctx["sfh_mass"] * (1.0 - f_loss)).sum(-1)


SUPP_FUNCTIONS = {
    "m_uv": _m_uv,
    "app_m_uv": _app_m_uv,
    "sfr_10": _sfr_10,
    "sfr_100": _sfr_100,
    "burstiness": _burstiness,
    "mass_weighted_age": _mass_weighted_age,
    "lum_weighted_age": _lum_weighted_age,
    "flux_weighted_age": _flux_weighted_age,
    "beta_uv": _beta_uv,
    "d4000": _d4000,
    "t10": _t10,
    "t50": _t50,
    "t90": _t90,
    "u_minus_v": _u_minus_v,
    "v_minus_j": _v_minus_j,
    "balmer_decrement": _balmer_decrement,
    "ew_halpha": _ew_halpha,
    "ew_hbeta": _ew_hbeta,
    "ew_oiii": _ew_oiii,
    "n_ion": _n_ion,
    "xi_ion": _xi_ion,
    "surviving_mass": _surviving_mass,
}


def compute_supplementary(names, sim, theta, out):
    """Compute named supplementary quantities for a simulated batch.

    Args:
        names: iterable of SUPP_FUNCTIONS keys.
        sim: the BatchSEDSimulator that produced `out`.
        theta: (B, P) parameter batch.
        out: simulate(..., want_spectra=True) outputs.
    Returns:
        (B, len(names)) array.
    """
    theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
    z_idx = (
        sim.param_names.index("redshift")
        if "redshift" in sim.param_names
        else None
    )
    z = theta[:, z_idx] if z_idx is not None else jnp.zeros(theta.shape[0])
    grid = sim.grid
    bol = {
        t: None for t in ()
    }
    # bolometric luminosity per grid cell for lum-weighted age
    lam = np.asarray(grid.lam)
    dlam = np.gradient(lam)
    nu_w = (C_AA_S / lam**2) * dlam  # dν magnitude per bin
    inc = grid.spectra[sim.emission.incident_type].reshape(-1, len(lam))
    bol_flat = jnp.asarray(
        (inc.astype(np.float64) * nu_w).sum(-1) / 1.0e40, jnp.float32
    )
    ctx = {
        "lam": jnp.asarray(lam, jnp.float32),
        "dlam": jnp.asarray(dlam, jnp.float32),
        "lnu": out["lnu"],
        "lnu_intrinsic": out.get("lnu_intrinsic", out["lnu"]),
        "sfh_mass": out["sfh_mass"],
        "sfzh": out["sfzh"],
        "ages_yr": jnp.asarray(grid.ages_yr, jnp.float32),
        "age_bin_edges": jnp.asarray(grid.age_bin_edges_yr, jnp.float32),
        "cells_per_age": grid.cells_per_age,
        "bol_lum_flat": bol_flat,
        "z": z,
        "distance_modulus": sim.cosmology.distance_modulus(
            jnp.maximum(z, 1.0e-4)
        ),
    }
    if "flux_weighted_age" in names:
        # cumulative ∫ L_ν dν per grid cell (float64 on host, scaled to
        # keep fp32 range), for windowed per-cell band fluxes
        cum = np.cumsum(inc.astype(np.float64) * nu_w, axis=-1) / 1.0e40
        ctx["cum_lum"] = jnp.asarray(cum, jnp.float32)
    del bol
    cols = [SUPP_FUNCTIONS[n](ctx) for n in names]
    return jnp.stack(cols, axis=1)
