"""Likelihood-based cross-check: affine-invariant ensemble MCMC on-device.

Reference analogue: `fit_observation_using_sampler`
(`/root/reference/src/synference/sbi_runner.py:5148-5578`) cross-checks SBI
posteriors with dynesty/nautilus/ultranest nested sampling through the same
simulator, using prior transforms incl. the Dirichlet cumsum transform
(`/root/reference/src/synference/utils.py:2549-2621`). Those samplers are
host-side and sequential; here the cross-check is an emcee-style
affine-invariant stretch-move ensemble (Goodman & Weare 2010) with ALL
walkers advanced in parallel and the whole chain as one `lax.scan` — each
likelihood call is a batched pass through the jitted SED simulator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .priors import BoxUniform

__all__ = [
    "run_ensemble_mcmc",
    "gaussian_loglike",
    "dirichlet_cumsum_transform",
    "fit_observation_mcmc",
]


def gaussian_loglike(sim_fn, x_obs, sigma):
    """Batched Gaussian χ² log-likelihood through a forward model.

    Args:
        sim_fn: θ (B, P) -> model x (B, D).
        x_obs: (D,) observed values; sigma: (D,) 1σ errors.
    """
    x_obs = jnp.asarray(x_obs, jnp.float32)
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1.0e-12)

    def loglike(theta):
        model = sim_fn(theta)
        chi2 = jnp.sum(((model - x_obs) / sigma) ** 2, axis=-1)
        return -0.5 * chi2

    return loglike


def run_ensemble_mcmc(
    log_prob_fn,
    prior: BoxUniform,
    key=None,
    n_walkers: int = 64,
    n_steps: int = 1000,
    burn_in: int = 300,
    thin: int = 2,
    stretch_a: float = 2.0,
):
    """Stretch-move ensemble sampler, fully jitted.

    `log_prob_fn` must be batched: θ (B, P) -> (B,) log posterior
    (log-likelihood + prior.log_prob is applied internally).

    Returns:
        samples (n_kept, P), log_probs (n_kept,), acceptance fraction.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    dim = prior.dim
    if n_walkers % 2:
        n_walkers += 1
    half = n_walkers // 2

    def full_log_prob(theta):
        lp = prior.log_prob(theta)
        ll = jnp.where(
            jnp.isfinite(lp), log_prob_fn(theta), 0.0
        )
        return jnp.where(jnp.isfinite(lp), ll, -jnp.inf)

    k_init, k_run = jax.random.split(key)
    walkers = prior.sample(k_init, n_walkers)
    lp = full_log_prob(walkers)

    def half_step(carry, k, first_half):
        walkers, lp = carry
        if first_half:
            movers, fixed = walkers[:half], walkers[half:]
            lp_m = lp[:half]
        else:
            movers, fixed = walkers[half:], walkers[:half]
            lp_m = lp[half:]
        k1, k2, k3 = jax.random.split(k, 3)
        # stretch move: z ~ g(z) ∝ 1/sqrt(z) on [1/a, a]
        u = jax.random.uniform(k1, (half,))
        z = ((stretch_a - 1.0) * u + 1.0) ** 2 / stretch_a
        partner = jax.random.randint(k2, (half,), 0, half)
        proposal = fixed[partner] + z[:, None] * (movers - fixed[partner])
        lp_p = full_log_prob(proposal)
        log_accept = (dim - 1) * jnp.log(z) + lp_p - lp_m
        accept = jnp.log(jax.random.uniform(k3, (half,))) < log_accept
        movers_new = jnp.where(accept[:, None], proposal, movers)
        lp_new = jnp.where(accept, lp_p, lp_m)
        if first_half:
            walkers = jnp.concatenate([movers_new, fixed])
            lp = jnp.concatenate([lp_new, lp[half:]])
        else:
            walkers = jnp.concatenate([fixed, movers_new])
            lp = jnp.concatenate([lp[:half], lp_new])
        return (walkers, lp), accept.mean()

    def step(carry, k):
        ka, kb = jax.random.split(k)
        carry, a1 = half_step(carry, ka, True)
        carry, a2 = half_step(carry, kb, False)
        walkers, lp = carry
        return carry, (walkers, lp, 0.5 * (a1 + a2))

    keys = jax.random.split(k_run, n_steps)
    (_, _), (chain, chain_lp, acc) = jax.lax.scan(step, (walkers, lp), keys)

    kept = chain[burn_in::thin].reshape(-1, dim)
    kept_lp = chain_lp[burn_in::thin].reshape(-1)
    return np.asarray(kept), np.asarray(kept_lp), float(acc.mean())


def dirichlet_cumsum_transform(u):
    """Unit-cube -> Dirichlet simplex via the cumulative-sum trick
    (reference `utils.py:2549-2621`, used for dense-basis SFH fraction
    priors in nested sampling). u (..., N-1) -> fractions (..., N)."""
    u = jnp.asarray(u)
    n = u.shape[-1] + 1
    # order statistics of N-1 uniforms partition [0,1] into N fractions
    sorted_u = jnp.sort(u, axis=-1)
    zeros = jnp.zeros(u.shape[:-1] + (1,))
    ones = jnp.ones(u.shape[:-1] + (1,))
    edges = jnp.concatenate([zeros, sorted_u, ones], axis=-1)
    fr = jnp.diff(edges, axis=-1)
    del n
    return fr


def fit_observation_mcmc(
    simulator,
    x_obs_njy,
    sigma_njy,
    prior: BoxUniform,
    key=None,
    n_walkers: int = 64,
    n_steps: int = 1500,
    burn_in: int = 500,
):
    """End-to-end likelihood fit of one observation through the SED
    simulator (the reference's nested-sampling cross-check, TPU-style).

    Returns (samples, log_probs, acceptance)."""
    loglike = gaussian_loglike(
        lambda th: simulator.photometry(th), x_obs_njy, sigma_njy
    )
    return run_ensemble_mcmc(
        loglike, prior, key=key, n_walkers=n_walkers,
        n_steps=n_steps, burn_in=burn_in,
    )
