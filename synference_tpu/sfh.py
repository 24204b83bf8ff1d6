"""Star-formation-history and metallicity-distribution weight kernels.

The reference builds per-galaxy Synthesizer SFH/ZDist *objects* and lets the
C/OpenMP extension turn them into SFZH weight grids one galaxy at a time
(`/root/reference/src/synference/library.py:1137-1334` `generate_sfh_basis`,
`:1340-1424` `create_galaxy`). Here each family is a pure function
θ → per-grid-age-bin mass weights, evaluated on precomputed sub-sample points,
so an entire batch of galaxies becomes one vmapped weight evaluation followed
by a single (B, A·Z) × (A·Z, L) MXU matmul (see `sed.py`).

Conventions (documented here because the reference inherits Synthesizer's):
- `t` is lookback time from the epoch of observation [yr].
- `x = max_age - t` is time since SFH onset.
- `max_age` is the age of the oldest stars; callers clip it to the age of the
  universe at the galaxy redshift (the reference does the same clipping,
  `library.py:1204-1311`).
- Weights are normalized to sum to 1 (unit total formed mass); the caller
  scales by 10**log10_mass.

Every family works on traced parameters; the family *name* is static.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "SFH_FAMILIES",
    "ZDIST_FAMILIES",
    "AgeGridSampling",
    "make_age_sampling",
    "sfh_weights",
    "zdist_weights",
]

_EPS = 1.0e-30


# ---------------------------------------------------------------------------
# Age-bin sub-sampling machinery
# ---------------------------------------------------------------------------


class AgeGridSampling:
    """Precomputed per-age-bin integration nodes.

    t_sub: (A, S) lookback-time sample points inside each grid age bin [yr].
    w_sub: (A, S) quadrature weights [yr] (midpoint rule on S equal slices).
    """

    def __init__(self, t_sub: np.ndarray, w_sub: np.ndarray):
        self.t_sub = jnp.asarray(t_sub, dtype=jnp.float32)
        self.w_sub = jnp.asarray(w_sub, dtype=jnp.float32)


def make_age_sampling(age_bin_edges_yr: np.ndarray, n_sub: int = 4) -> AgeGridSampling:
    """Midpoint-rule nodes for each [e_i, e_{i+1}] grid age bin."""
    lo = age_bin_edges_yr[:-1][:, None]
    hi = age_bin_edges_yr[1:][:, None]
    frac = (np.arange(n_sub) + 0.5)[None, :] / n_sub
    t_sub = lo + (hi - lo) * frac
    w_sub = np.broadcast_to((hi - lo) / n_sub, t_sub.shape)
    return AgeGridSampling(t_sub, w_sub)


# ---------------------------------------------------------------------------
# SFH families: each maps (params, t) -> unnormalized SFR(t)  [t = lookback yr]
# ---------------------------------------------------------------------------


def _x_since_onset(t, max_age):
    """Time since SFH onset, clamped positive."""
    return jnp.maximum(max_age - t, 0.0)


def _sfr_constant(p, t):
    max_age = p["max_age"]
    min_age = p.get("min_age", 0.0)
    return ((t < max_age) & (t >= min_age)).astype(jnp.float32)


def _sfr_lognormal(p, t):
    """SFR(x) ∝ (1/x) exp(-(ln x − μ)² / 2τ²), x = time since onset.

    `peak_age` is the lookback time of peak SFR, so the mode in x is
    x_peak = max_age − peak_age and μ = ln(x_peak) + τ².
    (Reference quickstart priors sample `peak_age` and `tau`,
    README Getting Started / `library.py` LogNormal usage.)
    """
    max_age = p["max_age"]
    tau = jnp.maximum(p["tau"], 1.0e-3)
    x = _x_since_onset(t, max_age)
    x_peak = jnp.maximum(max_age - p["peak_age"], 1.0e4)
    mu = jnp.log(x_peak) + tau**2
    safe_x = jnp.maximum(x, 1.0)
    lnx = jnp.log(safe_x)
    val = jnp.exp(-((lnx - mu) ** 2) / (2.0 * tau**2)) / safe_x
    return jnp.where(x > 0.0, val, 0.0)


def _sfr_delayed_tau(p, t):
    """SFR(x) ∝ x exp(−x/τ)."""
    max_age = p["max_age"]
    tau = jnp.maximum(p["tau"], 1.0e4)
    x = _x_since_onset(t, max_age)
    return jnp.where(x > 0.0, x / tau * jnp.exp(-x / tau), 0.0)


def _sfr_exponential(p, t):
    """Declining exponential: SFR(x) ∝ exp(−x/τ) (high at onset)."""
    max_age = p["max_age"]
    tau = jnp.maximum(p["tau"], 1.0e4)
    x = _x_since_onset(t, max_age)
    return jnp.where(x > 0.0, jnp.exp(-x / tau), 0.0)


def _sfr_rising_exponential(p, t):
    """Rising exponential toward observation: SFR(x) ∝ exp(+x/τ)."""
    max_age = p["max_age"]
    tau = jnp.maximum(p["tau"], 1.0e4)
    x = _x_since_onset(t, max_age)
    return jnp.where(x > 0.0, jnp.exp((x - max_age) / tau), 0.0)


def _sfr_double_power_law(p, t):
    """SFR(x) ∝ [(x/x₀)^α + (x/x₀)^−β]⁻¹ (Diemer+17 style)."""
    max_age = p["max_age"]
    x0 = jnp.maximum(p["peak_age"], 1.0e4)
    alpha = p.get("alpha", 5.0)
    beta = p.get("beta", 5.0)
    x = jnp.maximum(_x_since_onset(t, max_age), 1.0)
    r = x / x0
    val = 1.0 / (r**alpha + r ** (-beta))
    return jnp.where(_x_since_onset(t, max_age) > 0.0, val, 0.0)


def _sfr_gaussian_burst(p, t):
    """Gaussian burst centred at lookback `burst_age` with width σ."""
    mu = p["burst_age"]
    sigma = jnp.maximum(p.get("sigma", 1.0e7), 1.0e4)
    return jnp.exp(-0.5 * ((t - mu) / sigma) ** 2)


SFH_FAMILIES = {
    "constant": _sfr_constant,
    "lognormal": _sfr_lognormal,
    "delayed_tau": _sfr_delayed_tau,
    "exponential": _sfr_exponential,
    "rising_exponential": _sfr_rising_exponential,
    "double_power_law": _sfr_double_power_law,
    "gaussian_burst": _sfr_gaussian_burst,
}


def sfh_weights(name: str, params: dict, sampling: AgeGridSampling):
    """Mass-fraction weights over grid age bins for one galaxy.

    Args:
        name: static SFH family name (key of SFH_FAMILIES) or "dense_basis".
        params: dict of traced scalars (family-specific, see functions above).
        sampling: precomputed AgeGridSampling for the SPS grid.
    Returns:
        (A,) weights, sum = 1.
    """
    if name == "dense_basis":
        return _dense_basis_weights(params, sampling)
    sfr_fn = SFH_FAMILIES[name]
    sfr = sfr_fn(params, sampling.t_sub)  # (A, S)
    w = jnp.sum(sfr * sampling.w_sub, axis=-1)  # mass formed per bin
    return w / (jnp.sum(w) + _EPS)


def _dense_basis_weights(params: dict, sampling: AgeGridSampling):
    """Dense-Basis / non-parametric SFH: fractional masses in N lookback bins.

    `params["fractions"]` is an (N,) simplex of mass fractions over N
    equal-log lookback bins spanning [min_age, max_age]. SFR is constant
    within each bin. (Reference analogue: `generate_random_DB_sfh`,
    `library.py:692-739`, Dirichlet t_x fractions.)
    """
    fr = jnp.asarray(params["fractions"])
    n_bins = fr.shape[0]
    max_age = params["max_age"]
    min_age = params.get("min_age", 1.0e6)
    log_lo, log_hi = jnp.log10(min_age), jnp.log10(jnp.maximum(max_age, min_age * 1.01))
    edges = jnp.power(10.0, log_lo + (log_hi - log_lo) * jnp.arange(n_bins + 1) / n_bins)
    t = sampling.t_sub  # (A, S)
    # per-DB-bin constant SFR = fraction / bin width
    widths = edges[1:] - edges[:-1]  # (N,)
    sfr_levels = fr / jnp.maximum(widths, 1.0)  # (N,)
    # which DB bin each sample point falls in
    in_bin = (t[..., None] >= edges[:-1]) & (t[..., None] < edges[1:])  # (A,S,N)
    sfr = jnp.sum(in_bin * sfr_levels, axis=-1)
    # also allow mass below min_age in bin 0 (ongoing SF down to t=0)
    sfr = jnp.where(t < min_age, sfr_levels[0], sfr)
    w = jnp.sum(sfr * sampling.w_sub, axis=-1)
    return w / (jnp.sum(w) + _EPS)


# ---------------------------------------------------------------------------
# Metallicity distributions over the grid Z axis
# ---------------------------------------------------------------------------


def _zdist_delta(p, log10_mets):
    """Delta function at a metallicity: linear-in-log10Z weight sharing
    between the two neighbouring grid cells (Synthesizer DeltaConstant
    semantics; reference `tests/conftest.py:102-111` uses it as default)."""
    if "log10_metallicity" in p:
        lz = p["log10_metallicity"]
    else:
        lz = jnp.log10(jnp.maximum(p["metallicity"], 1.0e-12))
    lz = jnp.clip(lz, log10_mets[0], log10_mets[-1])
    idx = jnp.clip(jnp.searchsorted(log10_mets, lz, side="right") - 1, 0, len(log10_mets) - 2)
    lo, hi = log10_mets[idx], log10_mets[idx + 1]
    frac = (lz - lo) / jnp.maximum(hi - lo, 1.0e-12)
    w = jnp.zeros_like(log10_mets)
    w = w.at[idx].set(1.0 - frac)
    w = w.at[idx + 1].add(frac)
    return w


def _zdist_normal(p, log10_mets):
    """Gaussian in log10 Z over grid cells, renormalized."""
    mu = p["log10_metallicity"]
    sigma = jnp.maximum(p.get("log10_sigma", 0.2), 1.0e-3)
    w = jnp.exp(-0.5 * ((log10_mets - mu) / sigma) ** 2)
    return w / (jnp.sum(w) + _EPS)


ZDIST_FAMILIES = {
    "delta": _zdist_delta,
    "normal": _zdist_normal,
}


def zdist_weights(name: str, params: dict, log10_mets):
    """(Z,) metallicity weights, sum = 1."""
    return ZDIST_FAMILIES[name](params, jnp.asarray(log10_mets, jnp.float32))
