"""Dust attenuation laws and energy-balance dust emission.

The reference's emission models wrap Synthesizer dust laws (PowerLaw,
Calzetti2000; `/root/reference/src/synference/library.py` emission-model
persistence `:1875-2132` stores the dust-curve class + params). Here each law
is a pure function λ → τ(λ)/τ_V evaluated once per grid wavelength array at
trace time, so attenuation is a fused elementwise `exp(-tau_v * k)` on the VPU.

All wavelengths in Angstrom (rest frame).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ATTENUATION_LAWS", "attenuation_curve", "greybody_emission"]


def _power_law(lam, params):
    """τ(λ)/τ_V = (λ/5500Å)^slope  (slope ≈ −1 typical)."""
    slope = params.get("slope", -1.0)
    return jnp.power(lam / 5500.0, slope)


def _calzetti2000(lam, params):
    """Calzetti et al. (2000) starburst attenuation curve, normalized to A_V.

    k(λ) piecewise in microns (0.12–0.63, 0.63–2.2 µm), R_V = 4.05; the ratio
    A(λ)/A_V = k(λ)/R_V. Outside the fitted range we extrapolate the
    polynomials and clamp at 0. Optional UV bump (Drude profile at 2175 Å with
    amplitude `bump`) and extra power-law tilt `delta` (Salim+18 style
    modified Calzetti), both default off.
    """
    rv = 4.05
    mu = lam * 1.0e-4  # microns
    inv = 1.0 / jnp.maximum(mu, 1.0e-4)
    k_short = 2.659 * (-2.156 + 1.509 * inv - 0.198 * inv**2 + 0.011 * inv**3) + rv
    k_long = 2.659 * (-1.857 + 1.040 * inv) + rv
    k = jnp.where(mu < 0.63, k_short, k_long)
    k = jnp.maximum(k, 0.0)

    delta = params.get("delta", 0.0)
    bump = params.get("bump", 0.0)
    if bump:
        lam0, fwhm = 2175.0, 350.0
        drude = (lam * fwhm) ** 2 / ((lam**2 - lam0**2) ** 2 + (lam * fwhm) ** 2)
        k = k + bump * drude
    curve = k / rv
    if delta:
        curve = curve * jnp.power(lam / 5500.0, delta)
    return curve


def _smc_like(lam, params):
    """Steep SMC-bar-like curve approximated as a λ^-1.24 power law
    (Gordon+03 mean slope), no bump."""
    return jnp.power(lam / 5500.0, -1.24)


ATTENUATION_LAWS = {
    "power_law": _power_law,
    "calzetti2000": _calzetti2000,
    "smc": _smc_like,
}


def attenuation_curve(law: str, lam, params: dict | None = None):
    """τ(λ)/τ_V for the named law at rest wavelengths `lam` [Å]."""
    params = params or {}
    return ATTENUATION_LAWS[law](jnp.asarray(lam), params)


# ---------------------------------------------------------------------------
# Dust emission: energy-balance greybody
# ---------------------------------------------------------------------------

_H_ERG_S = 6.62607015e-27  # Planck [erg s]
_K_ERG_K = 1.380649e-16  # Boltzmann [erg/K]
_C_AA_S = 2.99792458e18  # c [Å/s]


def greybody_emission(lam, temperature, emissivity=1.6):
    """Unit-energy greybody SED B_ν(T) ν^β on wavelengths `lam` [Å].

    Returns L_ν [1/Hz], shape (len(lam),), normalized so ∫ L_ν dν = 1 on this
    grid; multiply by the absorbed luminosity (energy balance) to conserve
    energy, the same balance Synthesizer's dust-emission models enforce for
    the reference (`library.py` emission-model persistence stores the
    dust_emission model).

    Internally frequencies are in PHz: ν³⁺ᵝ at ν ~ 1e18 Hz overflows fp32,
    and the scale cancels in the normalization.
    """
    lam = jnp.asarray(lam)
    nu_phz = _C_AA_S / lam * 1.0e-15  # PHz, descending in lam
    x = _H_ERG_S * 1.0e15 * nu_phz / (_K_ERG_K * temperature)
    # log-space evaluation: the Wien tail e^-x underflows fp32 for x ≳ 90,
    # and a grid that stops short of the FIR peak would otherwise hit 0/0.
    log_g = (3.0 + emissivity) * jnp.log(nu_phz) - jnp.where(
        x > 30.0, x, jnp.log(jnp.expm1(jnp.clip(x, 1.0e-6, 30.0)))
    )
    g = jnp.exp(log_g - jnp.max(log_g))
    dnu_phz = -jnp.gradient(nu_phz)
    norm = jnp.sum(g * dnu_phz)  # ∫ g dν in PHz
    return g / jnp.maximum(norm, 1.0e-30) * 1.0e-15  # per Hz
