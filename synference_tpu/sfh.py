"""Star-formation-history and metallicity-distribution weight kernels.

The reference builds per-galaxy Synthesizer SFH/ZDist *objects* and lets the
C/OpenMP extension turn them into SFZH weight grids one galaxy at a time
(`/root/reference/src/synference/library.py:1137-1334` `generate_sfh_basis`,
`:1340-1424` `create_galaxy`). Here each family is a pure function
θ → per-grid-age-bin mass weights, so an entire batch of galaxies becomes one
vmapped weight evaluation followed by a single (B, A·Z) × (A·Z, L) MXU matmul
(see `sed.py`).

Per-bin masses are computed **exactly** from each family's cumulative mass
function evaluated at the grid age-bin edges — not by sampling the SFR inside
bins, which silently zeroes histories narrower than the sample spacing
(e.g. a τ=0.1 lognormal whose peak spans ~1e4 yr inside a 1e8-yr-wide old-age
bin). Families without a closed-form CDF integrate on a fine log grid.

Conventions (documented here because the reference inherits Synthesizer's):
- `t` is lookback time from the epoch of observation [yr].
- `x = max_age − t` is time since SFH onset.
- `max_age` is the age of the oldest stars; callers clip it to the age of the
  universe at the galaxy redshift (the reference does the same clipping,
  `library.py:1204-1311`).
- Weights are normalized to sum to 1 (unit total formed mass); the caller
  scales by 10**log10_mass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats.norm import cdf as _phi

__all__ = [
    "SFH_FAMILIES",
    "ZDIST_FAMILIES",
    "AgeGridSampling",
    "make_age_sampling",
    "sfh_weights",
    "zdist_weights",
]

_EPS = 1.0e-30


class AgeGridSampling:
    """Precomputed per-grid quantities for SFH weight evaluation.

    edges: (A+1,) age-bin edges [yr] (lookback time).
    """

    def __init__(self, edges: np.ndarray):
        self.edges = jnp.asarray(edges, dtype=jnp.float32)
        self.n_bins = len(edges) - 1


def make_age_sampling(age_bin_edges_yr: np.ndarray, n_sub: int = 4) -> AgeGridSampling:
    """Build the per-grid sampling structure (n_sub retained for API
    compatibility; bin masses now come from CDFs, not sub-sampling)."""
    del n_sub
    return AgeGridSampling(age_bin_edges_yr)


# ---------------------------------------------------------------------------
# SFH families: cumulative mass M(x) formed since onset, x = max_age - t.
# Each returns an unnormalized, monotonically non-decreasing function of x;
# per-bin mass = M(x_hi) - M(x_lo). Constant offsets cancel.
# ---------------------------------------------------------------------------


def _cdf_constant(p, x):
    max_age = p["max_age"]
    min_age = p.get("min_age", 0.0)
    span = jnp.maximum(max_age - min_age, 1.0)
    return jnp.clip(x, 0.0, span)


def _cdf_lognormal(p, x):
    """SFR(x) ∝ (1/x) exp(−(ln x − μ)²/2τ²) ⇒ M(x) ∝ Φ((ln x − μ)/τ).

    `peak_age` is the lookback time of peak SFR, so the mode in x is
    x_peak = max_age − peak_age and μ = ln(x_peak) + τ².
    (Reference quickstart priors sample `peak_age` and `tau`.)
    """
    max_age = p["max_age"]
    tau = jnp.maximum(p["tau"], 1.0e-3)
    x_peak = jnp.maximum(max_age - p["peak_age"], 1.0e4)
    mu = jnp.log(x_peak) + tau**2
    lnx = jnp.log(jnp.maximum(x, 1.0))
    return _phi((lnx - mu) / tau)


def _cdf_delayed_tau(p, x):
    """SFR(x) ∝ x e^{−x/τ} ⇒ M(x) ∝ 1 − (1 + x/τ) e^{−x/τ}."""
    tau = jnp.maximum(p["tau"], 1.0e4)
    r = jnp.maximum(x, 0.0) / tau
    return -jnp.expm1(-r) - r * jnp.exp(-r)


def _cdf_exponential(p, x):
    """Declining exponential SFR(x) ∝ e^{−x/τ} ⇒ M(x) ∝ 1 − e^{−x/τ}."""
    tau = jnp.maximum(p["tau"], 1.0e4)
    return -jnp.expm1(-jnp.maximum(x, 0.0) / tau)


def _cdf_rising_exponential(p, x):
    """Rising exponential SFR(x) ∝ e^{(x−max_age)/τ} ⇒
    M(x) ∝ e^{(x−max_age)/τ} (stable: exponent ≤ 0)."""
    tau = jnp.maximum(p["tau"], 1.0e4)
    max_age = p["max_age"]
    return jnp.exp((jnp.minimum(x, max_age) - max_age) / tau)


def _cdf_gaussian_burst(p, x):
    """Gaussian burst at lookback `burst_age`, width σ: in x-coordinates the
    burst sits at max_age − burst_age ⇒ M(x) ∝ Φ((x − x_b)/σ)."""
    sigma = jnp.maximum(p.get("sigma", 1.0e7), 1.0e4)
    x_b = p["max_age"] - p["burst_age"]
    return _phi((x - x_b) / sigma)


def _numeric_cdf(pdf_fn, p, x, n_nodes: int = 512):
    """Generic fallback: trapezoid-integrate SFR on a fine log-x grid from
    1 yr to max_age, then interpolate the cumulative at query points."""
    max_age = jnp.maximum(p["max_age"], 10.0)
    log_max = jnp.log(max_age)
    frac = jnp.arange(n_nodes, dtype=jnp.float32) / (n_nodes - 1)
    nodes = jnp.exp(log_max * frac)  # 1 .. max_age, log-spaced
    pdf = pdf_fn(p, nodes)
    seg = 0.5 * (pdf[1:] + pdf[:-1]) * jnp.diff(nodes)
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
    return jnp.interp(jnp.clip(x, 1.0, max_age), nodes, cum)


def _pdf_double_power_law(p, x):
    x0 = jnp.maximum(p["peak_age"], 1.0e4)
    alpha = p.get("alpha", 5.0)
    beta = p.get("beta", 5.0)
    r = jnp.maximum(x, 1.0) / x0
    return 1.0 / (r**alpha + r ** (-beta))


def _cdf_double_power_law(p, x):
    """Double power law (Diemer+17 style): no closed form; numeric CDF."""
    return _numeric_cdf(_pdf_double_power_law, p, x)


SFH_FAMILIES = {
    "constant": _cdf_constant,
    "lognormal": _cdf_lognormal,
    "delayed_tau": _cdf_delayed_tau,
    "exponential": _cdf_exponential,
    "rising_exponential": _cdf_rising_exponential,
    "double_power_law": _cdf_double_power_law,
    "gaussian_burst": _cdf_gaussian_burst,
}


def sfh_weights(name: str, params: dict, sampling: AgeGridSampling):
    """Mass-fraction weights over grid age bins for one galaxy.

    Args:
        name: static SFH family name (key of SFH_FAMILIES) or "dense_basis".
        params: dict of traced scalars (family-specific, see CDFs above).
        sampling: AgeGridSampling for the SPS grid.
    Returns:
        (A,) weights, sum = 1 (uniform fallback if the history carries no
        mass on the grid, e.g. max_age below the first bin edge).
    """
    if name == "dense_basis":
        w = _dense_basis_weights(params, sampling)
    else:
        cdf_fn = SFH_FAMILIES[name]
        max_age = params["max_age"]
        edges = sampling.edges
        # lookback bin [e_i, e_{i+1}] -> x interval [max_age-e_{i+1}, max_age-e_i]
        x_at_edges = jnp.clip(max_age - edges, 0.0, None)  # (A+1,) decreasing
        m = cdf_fn(params, x_at_edges)
        w = jnp.maximum(m[:-1] - m[1:], 0.0)
    total = jnp.sum(w)
    uniform = jnp.ones_like(w) / w.shape[0]
    return jnp.where(total > _EPS, w / jnp.maximum(total, _EPS), uniform)


def _dense_basis_weights(params: dict, sampling: AgeGridSampling):
    """Dense-Basis / non-parametric SFH: fractional masses in N lookback bins.

    `params["fractions"]` is an (N,) simplex of mass fractions over N
    equal-log lookback bins spanning [min_age, max_age]; SFR is constant
    within each bin and at the bin-0 level below min_age. Per-grid-bin masses
    come from exact interval overlaps. (Reference analogue:
    `generate_random_DB_sfh`, `library.py:692-739`, Dirichlet t_x fractions.)
    """
    fr = jnp.asarray(params["fractions"])
    n_bins = fr.shape[0]
    max_age = params["max_age"]
    min_age = params.get("min_age", 1.0e6)
    log_lo = jnp.log10(min_age)
    log_hi = jnp.log10(jnp.maximum(max_age, min_age * 1.01))
    db_edges = jnp.power(
        10.0, log_lo + (log_hi - log_lo) * jnp.arange(n_bins + 1) / n_bins
    )  # (N+1,) lookback
    levels = fr / jnp.maximum(db_edges[1:] - db_edges[:-1], 1.0)  # (N,)

    e = sampling.edges  # (A+1,)
    ge_lo, ge_hi = e[:-1][:, None], e[1:][:, None]  # (A,1)
    db_lo, db_hi = db_edges[:-1][None, :], db_edges[1:][None, :]  # (1,N)
    overlap = jnp.clip(
        jnp.minimum(ge_hi, db_hi) - jnp.maximum(ge_lo, db_lo), 0.0, None
    )  # (A,N)
    w = (overlap * levels[None, :]).sum(-1)
    # ongoing SF below min_age at the youngest-bin level
    below = jnp.clip(jnp.minimum(ge_hi[:, 0], min_age) - ge_lo[:, 0], 0.0, None)
    w = w + below * levels[0]
    return w


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
    idx = jnp.clip(
        jnp.searchsorted(log10_mets, lz, side="right") - 1,
        0,
        len(log10_mets) - 2,
    )
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
