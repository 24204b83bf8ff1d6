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
    "run_batched_mcmc",
    "split_rhat_ess",
    "run_smc",
    "model_comparison",
    "gaussian_loglike",
    "censored_gaussian_loglike_rows",
    "dirichlet_cumsum_transform",
    "fit_observation_mcmc",
    "fit_observation_hmc",
    "fit_catalogue_hmc",
    "fit_catalogue_map",
    "fit_catalogue_vi",
]


def gaussian_loglike(sim_fn, x_obs, sigma, upper_limits=None):
    """Batched Gaussian χ² log-likelihood through a forward model.

    Args:
        sim_fn: θ (B, P) -> model x (B, D).
        x_obs: (D,) observed values; sigma: (D,) 1σ errors.
        upper_limits: optional (D,) bool mask — those bands are treated
            as non-detections at limiting flux x_obs (censored term, see
            `censored_gaussian_loglike_rows`).
    """
    x_obs = jnp.asarray(x_obs, jnp.float32)
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1.0e-12)
    lim = None if upper_limits is None else jnp.asarray(upper_limits, bool)

    def loglike(theta):
        model = sim_fn(theta)
        return censored_gaussian_loglike_rows(model, x_obs, sigma, lim)

    return loglike


def censored_gaussian_loglike_rows(model, x_obs, sigma, upper_limits=None):
    """(B, F) model vs observed -> (B,) log-likelihood with optional
    censoring: bands flagged in `upper_limits` carry only the one-sided
    information "flux below the limit", L = Φ((x_lim − model)/σ), written
    with `log_ndtr` so it stays differentiable and finite however far the
    model overshoots the limit (a plain log(Φ) underflows to −inf at
    ~8σ and kills the gradient the fitters need to walk back down)."""
    resid = (model - x_obs) / sigma
    gauss = -0.5 * resid**2
    if upper_limits is None:
        return jnp.sum(gauss, axis=-1)
    cens = jax.scipy.special.log_ndtr(-resid)
    return jnp.sum(jnp.where(upper_limits, cens, gauss), axis=-1)


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


def split_rhat_ess(chain):
    """Split-R̂ and ESS for per-walker chains, fully batched.

    Args:
        chain: (T, M, W, P) post-burn-in walker chains (T kept steps, M
            objects, W walkers, P parameters).
    Returns:
        (rhat (M, P), ess (M, P)). Split-R̂ treats walkers as chains and
        halves each in time (Gelman-Rubin; values ≲1.05 indicate
        convergence). ESS follows the emcee convention — walker-averaged
        autocorrelation, Geyer initial-positive-pair truncation,
        ess = W·T/τ. The reference inherits these from its sampler
        libraries (dynesty/emcee, sbi_runner.py:5148-5578); here they are
        computed on-device so `fit_catalogue` can flag non-converged
        objects whose quantile columns would silently be wrong.
    """
    chain = jnp.asarray(chain)
    t = int(chain.shape[0])
    m, w, p = chain.shape[1], chain.shape[2], chain.shape[3]
    if t < 4:
        nan = jnp.full((m, p), jnp.nan, jnp.float32)
        return nan, nan
    t2 = (t // 2) * 2
    c = chain[:t2].astype(jnp.float32)

    # ---- split-R̂: 2W chains of length t2/2 ------------------------------
    n = t2 // 2
    halves = jnp.concatenate([c[:n], c[n:t2]], axis=2)  # (n, M, 2W, P)
    mean_c = halves.mean(axis=0)
    var_c = halves.var(axis=0, ddof=1)
    w_var = var_c.mean(axis=1)  # (M, P)
    b_var = n * mean_c.var(axis=1, ddof=1)
    var_hat = (n - 1) / n * w_var + b_var / n
    rhat = jnp.sqrt(var_hat / jnp.maximum(w_var, 1.0e-30))

    # ---- ESS: walker-averaged autocorrelation, Geyer pairs ---------------
    x = c - c.mean(axis=0)
    nfft = 1 << (2 * t2 - 1).bit_length()
    f = jnp.fft.rfft(x, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:t2].real / t2
    denom = jnp.maximum(acov[0].mean(axis=1), 1.0e-30)  # (M, P)
    rho = acov.mean(axis=2) / denom[None]  # (t2, M, P)
    n_pairs = t2 // 2
    gamma = rho[0:2 * n_pairs:2] + rho[1:2 * n_pairs:2]  # (n_pairs, M, P)
    pos = jnp.cumprod(gamma > 0.0, axis=0)  # stop at first negative pair
    tau = jnp.maximum(2.0 * jnp.sum(gamma * pos, axis=0) - 1.0, 1.0)
    ess = w * t2 / tau
    return rhat, ess


def run_batched_mcmc(
    loglike_fn,
    prior: BoxUniform,
    xs,
    key=None,
    n_walkers: int = 64,
    n_steps: int = 600,
    burn_in: int = 300,
    thin: int = 2,
    stretch_a: float = 2.0,
    return_diagnostics: bool = False,
    init_theta=None,
):
    """Stretch-move MCMC for M conditions AT ONCE: the NLE/NRE posterior
    sampler (the reference samples each object's MCMC posterior serially
    through sbi; here every object's walker ensemble advances in lockstep
    inside one jitted `lax.scan`, so each likelihood call is a single
    (M*W, ·) batched network evaluation).

    Args:
        loglike_fn: (theta (B, P), x (B, C)) -> (B,) log-likelihood
            (or any unnormalized log-density term to add to the prior's).
        xs: (M, C) conditions.
        return_diagnostics: also return per-object convergence diagnostics
            `{"rhat": (M, P), "ess": (M, P)}` from `split_rhat_ess` on the
            kept walker chains.
        init_theta: optional (M, n_walkers, P) walker initialization
            (clipped just inside the prior box). Seeding walkers from an
            amortized posterior's draws ("NPE proposes, exact likelihood
            refines") localizes the ensemble in peaked/multimodal
            posteriors that prior-initialized walkers cannot find within
            the run budget.
    Returns:
        samples (M, n_kept, P), acceptance fraction (scalar)
        [, diagnostics dict].
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
    m = xs.shape[0]
    dim = prior.dim
    if n_walkers % 2:
        n_walkers += 1
    half = n_walkers // 2

    def full_lp(theta, x):
        """theta (W, P), x (C,) -> (W,) log prior × likelihood."""
        lp = prior.log_prob(theta)
        xt = jnp.broadcast_to(x, (theta.shape[0],) + x.shape)
        ll = jnp.where(jnp.isfinite(lp), loglike_fn(theta, xt), 0.0)
        return jnp.where(jnp.isfinite(lp), ll + lp, -jnp.inf)

    k_init, k_run = jax.random.split(key)
    if init_theta is None:
        walkers = prior.sample(k_init, m * n_walkers
                               ).reshape(m, n_walkers, dim)
    else:
        walkers = jnp.asarray(init_theta, jnp.float32)
        if walkers.shape != (m, n_walkers, dim):
            raise ValueError(
                f"init_theta must be ({m}, {n_walkers}, {dim}), "
                f"got {walkers.shape}")
        pad = 1.0e-4 * (prior.high - prior.low)
        walkers = jnp.clip(walkers, prior.low + pad, prior.high - pad)
    lp = jax.vmap(full_lp)(walkers, xs)  # (M, W)

    def half_step(walkers, lp, k, first_half):
        """walkers (M, W, P), lp (M, W): move one half against the other."""
        if first_half:
            movers, fixed = walkers[:, :half], walkers[:, half:]
            lp_m = lp[:, :half]
        else:
            movers, fixed = walkers[:, half:], walkers[:, :half]
            lp_m = lp[:, half:]
        k1, k2, k3 = jax.random.split(k, 3)
        u = jax.random.uniform(k1, (m, half))
        z = ((stretch_a - 1.0) * u + 1.0) ** 2 / stretch_a
        partner = jax.random.randint(k2, (m, half), 0, half)
        anchor = jnp.take_along_axis(fixed, partner[..., None], axis=1)
        proposal = anchor + z[..., None] * (movers - anchor)
        lp_p = jax.vmap(full_lp)(proposal, xs)
        log_accept = (dim - 1) * jnp.log(z) + lp_p - lp_m
        accept = jnp.log(jax.random.uniform(k3, (m, half))) < log_accept
        movers_new = jnp.where(accept[..., None], proposal, movers)
        lp_new = jnp.where(accept, lp_p, lp_m)
        if first_half:
            walkers = jnp.concatenate([movers_new, fixed], axis=1)
            lp = jnp.concatenate([lp_new, lp[:, half:]], axis=1)
        else:
            walkers = jnp.concatenate([fixed, movers_new], axis=1)
            lp = jnp.concatenate([lp[:, :half], lp_new], axis=1)
        return walkers, lp, accept.mean()

    def step(carry, k):
        walkers, lp = carry
        ka, kb = jax.random.split(k)
        walkers, lp, a1 = half_step(walkers, lp, ka, True)
        walkers, lp, a2 = half_step(walkers, lp, kb, False)
        return (walkers, lp), (walkers, 0.5 * (a1 + a2))

    keys = jax.random.split(k_run, n_steps)
    (_, _), (chain, acc) = jax.lax.scan(step, (walkers, lp), keys)
    # chain (n_steps, M, W, P) -> kept (M, n_kept, P)
    kept = chain[burn_in::thin]
    if return_diagnostics:
        rhat, ess = split_rhat_ess(kept)
        diag = {"rhat": rhat, "ess": ess}
        kept = jnp.moveaxis(kept, 1, 0).reshape(m, -1, dim)
        return kept, acc.mean(), diag
    kept = jnp.moveaxis(kept, 1, 0).reshape(m, -1, dim)
    return kept, acc.mean()


def run_smc(
    loglike_fn,
    prior: BoxUniform,
    key=None,
    n_particles: int = 1024,
    ess_target: float = 0.5,
    n_moves: int = 3,
    stretch_a: float = 2.0,
    max_stages: int = 100,
):
    """Tempered Sequential Monte Carlo: posterior samples AND log-evidence.

    The reference's nested-sampling cross-check returns evidences
    (dynesty/nautilus logZ, `/root/reference/src/synference/
    sbi_runner.py:5148-5578`); those samplers are inherently sequential.
    SMC is the TPU-shaped equivalent: N particles anneal from the prior to
    the posterior through likelihood tempering p_β ∝ prior × L^β, every
    stage advancing ALL particles at once (reweight → systematic resample →
    K jitted stretch-move sweeps), and log Z accumulates from the
    incremental weights: log Z = Σ_stages log E[exp(Δβ ll)].

    Args:
        loglike_fn: batched θ (B, P) -> (B,) log-likelihood.
        ess_target: next β chosen by bisection so the incremental-weight
            effective sample size stays at this fraction of N.
    Returns:
        (samples (N, P), log_z, info) with info = {betas, acceptance, ess}.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    n = n_particles + (n_particles % 2)
    half = n // 2
    dim = prior.dim

    @jax.jit
    def eval_both(theta):
        plp = prior.log_prob(theta)
        ll = jnp.where(jnp.isfinite(plp), loglike_fn(theta), -jnp.inf)
        return plp, ll

    @jax.jit
    def move(particles, plp, ll, beta, key):
        """n_moves red-black stretch sweeps targeting prior × L^beta."""

        def half_step(carry, inp):
            particles, plp, ll = carry
            k, first = inp
            movers = jnp.where(first, 0, half)
            k1, k2, k3 = jax.random.split(k, 3)
            u = jax.random.uniform(k1, (half,))
            z = ((stretch_a - 1.0) * u + 1.0) ** 2 / stretch_a
            partner = jax.random.randint(k2, (half,), 0, half)
            mov = jax.lax.dynamic_slice(particles, (movers, 0), (half, dim))
            fixed_start = jnp.where(first, half, 0)
            fix = jax.lax.dynamic_slice(particles, (fixed_start, 0),
                                        (half, dim))
            anchor = fix[partner]
            prop = anchor + z[:, None] * (mov - anchor)
            p_plp, p_ll = eval_both(prop)
            cur_plp = jax.lax.dynamic_slice(plp, (movers,), (half,))
            cur_ll = jax.lax.dynamic_slice(ll, (movers,), (half,))
            log_acc = (
                (dim - 1) * jnp.log(z)
                + (p_plp + beta * p_ll)
                - (cur_plp + beta * cur_ll)
            )
            acc = jnp.log(jax.random.uniform(k3, (half,))) < log_acc
            mov_new = jnp.where(acc[:, None], prop, mov)
            plp_new = jnp.where(acc, p_plp, cur_plp)
            ll_new = jnp.where(acc, p_ll, cur_ll)
            particles = jax.lax.dynamic_update_slice(
                particles, mov_new, (movers, 0)
            )
            plp = jax.lax.dynamic_update_slice(plp, plp_new, (movers,))
            ll = jax.lax.dynamic_update_slice(ll, ll_new, (movers,))
            return (particles, plp, ll), acc.mean()

        keys = jax.random.split(key, 2 * n_moves)
        firsts = jnp.tile(jnp.asarray([True, False]), n_moves)
        (particles, plp, ll), accs = jax.lax.scan(
            half_step, (particles, plp, ll), (keys, firsts)
        )
        return particles, plp, ll, accs.mean()

    k_init, k_loop = jax.random.split(key)
    particles = prior.sample(k_init, n)
    plp, ll = eval_both(particles)

    beta = 0.0
    log_z = 0.0
    betas, ess_hist, acc_hist = [0.0], [], []
    rng = np.random.default_rng(
        int(jax.random.randint(k_loop, (), 0, 2**31 - 1))
    )
    for _ in range(max_stages):
        ll_host = np.asarray(ll, np.float64)
        finite = np.isfinite(ll_host)

        def ess_frac(db):
            w = db * (ll_host - ll_host[finite].max())
            w[~finite] = -np.inf
            w = np.exp(w - w.max())
            return (w.sum() ** 2 / (w**2).sum()) / n

        # bisect the largest Δβ keeping ESS at the target
        if ess_frac(1.0 - beta) >= ess_target:
            dbeta = 1.0 - beta
        else:
            lo, hi = 0.0, 1.0 - beta
            for _ in range(40):
                mid = 0.5 * (lo + hi)
                if ess_frac(mid) >= ess_target:
                    lo = mid
                else:
                    hi = mid
            dbeta = max(lo, 1.0e-6)
        # evidence increment: log mean exp(Δβ ll) under uniform weights
        # (weights are uniform after every-stage resampling)
        shift = ll_host[finite].max()
        inc = dbeta * (ll_host - shift)
        inc[~finite] = -np.inf
        log_z += float(
            np.log(np.mean(np.exp(inc - inc.max()))) + inc.max()
            + dbeta * shift
        )
        beta += dbeta
        betas.append(float(beta))

        # systematic resampling
        w = np.exp(inc - inc.max())
        w = w / w.sum()
        cum = np.cumsum(w)
        pos = (np.arange(n) + rng.random()) / n
        idx = np.searchsorted(cum, pos)
        idx = jnp.asarray(np.clip(idx, 0, n - 1))
        particles = particles[idx]
        plp, ll = plp[idx], ll[idx]

        k_loop, k_m = jax.random.split(k_loop)
        particles, plp, ll, acc = move(particles, plp, ll, beta, k_m)
        ess_hist.append(ess_frac(dbeta))
        acc_hist.append(float(acc))
        if beta >= 1.0 - 1.0e-9:
            break

    info = {
        "betas": betas,
        "acceptance": acc_hist,
        "ess": ess_hist,
        "n_stages": len(acc_hist),
    }
    return np.asarray(particles), float(log_z), info


def model_comparison(
    simulators: dict,
    x_obs_njy,
    sigma_njy,
    priors: dict,
    key=None,
    **smc_kwargs,
):
    """Bayesian model comparison via SMC evidences (functional replacement
    for the reference's `ModelComparison` stub, sbi_runner.py:8007-8026).

    Args:
        simulators: {name: BatchSEDSimulator-like with .photometry}.
        priors: {name: BoxUniform} matching each simulator's θ.
    Returns:
        dict name -> {"log_z", "samples", "info"} plus
        "log_bayes_factors" relative to the best model.
    """
    import jax as _jax

    key = key if key is not None else _jax.random.PRNGKey(0)
    out = {}
    for name, sim in simulators.items():
        key, k = _jax.random.split(key)
        loglike = gaussian_loglike(
            lambda th, s=sim: s.photometry(th), x_obs_njy, sigma_njy
        )
        samples, log_z, info = run_smc(loglike, priors[name], key=k,
                                       **smc_kwargs)
        out[name] = {"log_z": log_z, "samples": samples, "info": info}
    best = max(out, key=lambda k2: out[k2]["log_z"])
    out["log_bayes_factors"] = {
        k2: out[k2]["log_z"] - out[best]["log_z"]
        for k2 in out if k2 != "log_bayes_factors"
    }
    out["best_model"] = best
    return out


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


def fit_observation_hmc(
    simulator,
    x_obs_njy,
    sigma_njy,
    prior: BoxUniform,
    key=None,
    n_chains: int = 16,
    n_warmup: int = 150,
    n_samples: int = 400,
    n_leapfrog: int = 12,
    target_accept: float = 0.8,
    upper_limits=None,
    init_theta=None,
):
    """Gradient-based HMC straight through the DIFFERENTIABLE simulator.

    A capability the reference cannot have: its forward model is
    Synthesizer's C/OpenMP pipeline, opaque to autodiff, so its
    simulator-space cross-checks are gradient-free nested sampling
    (`/root/reference/src/synference/sbi_runner.py:5148-5578`). Here the
    whole θ → photometry chain is pure jnp (the distance and Fritsch–
    Butland VJPs are written scale-safely — see `_observe` and
    `_knot_interp.slope`), so ∂flux/∂θ costs one backward pass and HMC
    explores the exact likelihood with O(√d) scaling instead of random
    walks. One-observation wrapper over `fit_catalogue_hmc`.

    Returns:
        samples (n_chains·n_samples, P), log-posteriors (same length),
        mean acceptance probability (float).
    """
    samples, lps, acc = fit_catalogue_hmc(
        simulator, jnp.atleast_2d(jnp.asarray(x_obs_njy, jnp.float32)),
        sigma_njy, prior, key=key, n_chains=n_chains, n_warmup=n_warmup,
        n_samples=n_samples, n_leapfrog=n_leapfrog,
        target_accept=target_accept,
        upper_limits=(None if upper_limits is None
                      else jnp.atleast_2d(jnp.asarray(upper_limits, bool))),
        init_theta=(None if init_theta is None
                    else jnp.asarray(init_theta, jnp.float32)[None]))
    return samples[0], lps[0], acc


def fit_catalogue_hmc(
    simulator,
    x_obs_njy,
    sigma_njy,
    prior: BoxUniform,
    key=None,
    n_chains: int = 8,
    n_warmup: int = 150,
    n_samples: int = 400,
    n_leapfrog: int = 12,
    target_accept: float = 0.8,
    upper_limits=None,
    init_theta=None,
):
    """Exact-likelihood HMC posteriors for a WHOLE CATALOGUE at once:
    M objects × C chains advance as one `lax.scan` program — every
    leapfrog step is a single (M·C, P) batched photometry + VJP on the
    MXU. Chains sample in the prior box's logit space (softplus-stable
    Jacobian), start at each object's best-of-prior-sweep candidates, and
    adapt a PER-OBJECT dual-averaged step size plus a per-object diagonal
    mass matrix in a two-phase warmup (scalar eps first while accumulating
    per-coordinate u variance, then eps against the adapted mass —
    without the mass a single scalar eps serves the stiffest coordinate
    and soft directions freeze; divergent trajectories reject).

    Args:
        x_obs_njy: (M, F) observed fluxes; sigma_njy: (F,) or (M, F).
        init_theta: optional (M, K, P), K >= n_chains, chain-start
            candidates replacing the prior-sweep initialization — seed
            from an amortized posterior's draws when the likelihood is too
            peaked for 256 prior candidates to land near the typical set
            (63-band survey depths concentrate the posterior to ~1e-6 of
            the prior box). With K > n_chains the top-likelihood C
            candidates start the chains (tail draws with huge χ² would
            collapse the object's adapted step size).
    Returns:
        samples (M, n_chains·n_samples, P), log-posteriors
        (M, n_chains·n_samples), mean acceptance (float).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    dim = prior.dim
    lo, hi = prior.low, prior.high
    width = hi - lo
    x_obs = jnp.atleast_2d(jnp.asarray(x_obs_njy, jnp.float32))
    sigma = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(sigma_njy, jnp.float32), x_obs.shape),
        1.0e-12)
    m = x_obs.shape[0]
    c = n_chains
    x_rep = jnp.repeat(x_obs, c, axis=0)  # (M·C, F)
    sg_rep = jnp.repeat(sigma, c, axis=0)
    lim = (None if upper_limits is None
           else jnp.broadcast_to(jnp.asarray(upper_limits, bool),
                                 x_obs.shape))
    lim_rep = None if lim is None else jnp.repeat(lim, c, axis=0)

    # the Pallas megakernel has no AD rule; route through the staged paths
    had_flag = getattr(simulator, "_mega_off", False)
    simulator._mega_off = True

    def theta_of(u):  # (B, P) unconstrained -> box
        return lo + width * jax.nn.sigmoid(u)

    def logpost(u):
        """(M·C, P) -> (M·C,) log posterior in u-space.

        log σ(u) + log(1−σ(u)) written as −softplus(u) − softplus(−u):
        the sigmoid saturates to exactly 0/1 in fp32 at |u| ≳ 17, and a
        −inf Jacobian freezes a chain permanently (its Hamiltonian is
        −inf, so every proposal comparison is NaN/inf)."""
        model = simulator.photometry(theta_of(u))
        ll = censored_gaussian_loglike_rows(model, x_rep, sg_rep, lim_rep)
        log_jac = jnp.sum(
            jnp.log(width) - jax.nn.softplus(u) - jax.nn.softplus(-u),
            axis=-1)
        return ll + log_jac

    def _lp_sum(u):
        lp = logpost(u)
        return jnp.sum(lp), lp

    # has_aux threads the PER-CHAIN log-posteriors out of the same forward
    # pass the gradient needs — without it the acceptance test would spend
    # one extra full batched photometry pass per HMC step
    val_grad = jax.value_and_grad(_lp_sum, has_aux=True)

    def leapfrog(u, p, eps_v):
        # eps_v: scalar·s_vec — per-coordinate step sizes ARE a diagonal
        # mass matrix (the map stays symplectic for the separable H)
        (_, _), g = val_grad(u)
        p = p + 0.5 * eps_v * g
        for _ in range(n_leapfrog - 1):
            u = u + eps_v * p
            (_, _), g = val_grad(u)
            p = p + eps_v * g
        u = u + eps_v * p
        (_, lp_new), g = val_grad(u)
        p = p + 0.5 * eps_v * g
        return u, p, lp_new

    def hmc_step(u, lp_vec, key_s, eps_v):
        k1, k2 = jax.random.split(key_s)
        p0 = jax.random.normal(k1, u.shape)
        u_new, p_new, lp_new = leapfrog(u, p0, eps_v)
        h0 = lp_vec - 0.5 * jnp.sum(p0**2, axis=-1)
        h1 = lp_new - 0.5 * jnp.sum(p_new**2, axis=-1)
        # a diverged trajectory gives a NaN Hamiltonian difference ->
        # reject; +inf (escaping a -inf state) -> accept. Rejecting ALL
        # non-finite values would freeze a chain at -inf forever. Also
        # reject proposals past |u| = 12 (θ within 6e-6 widths of the box
        # edge, mass ~ e^-12): an early-warmup step-size spike can launch
        # a chain to |u| ~ 80 where the likelihood gradient vanishes and
        # the walk back would take the whole run.
        diverged = (jnp.isnan(h1 - h0)
                    | (jnp.abs(u_new).max(axis=-1) > 12.0))
        log_alpha = jnp.where(diverged, -jnp.inf,
                              jnp.minimum(h1 - h0, 0.0))
        accept = (jnp.log(jax.random.uniform(k2, (u.shape[0],)))
                  < log_alpha)
        u = jnp.where(accept[:, None], u_new, u)
        lp_vec = jnp.where(accept, lp_new, lp_vec)
        # per-OBJECT mean acceptance (M,): step sizes adapt per object, so
        # one object's pathological chains cannot freeze the others
        a_obj = jnp.exp(log_alpha).reshape(m, c).mean(axis=1)
        return u, lp_vec, a_obj

    k_init, k_warm, k_run = jax.random.split(key, 3)
    if init_theta is not None:
        theta0 = jnp.asarray(init_theta, jnp.float32)
        if (theta0.ndim != 3 or theta0.shape[0] != m
                or theta0.shape[1] < c or theta0.shape[2] != dim):
            raise ValueError(
                f"init_theta must be ({m}, >= {c}, {dim}), "
                f"got {theta0.shape}")
        if theta0.shape[1] > c:
            # K > C candidates per object (e.g. amortized-posterior
            # draws): rank by likelihood and start chains at the top C —
            # a tail draw with chi^2 ~ 1e6 has u-space gradients that
            # collapse the adapted step size for every chain of the
            # object (measured on the 63-band crosscheck: shared eps
            # froze ALL chains at split-R-hat ~ 1e6)
            kk = theta0.shape[1]
            flat = theta0.reshape(m * kk, dim)
            ll0 = censored_gaussian_loglike_rows(
                simulator.photometry(flat),
                jnp.repeat(x_obs, kk, axis=0),
                jnp.repeat(sigma, kk, axis=0),
                None if lim is None else jnp.repeat(lim, kk, axis=0),
            ).reshape(m, kk)
            top0 = jnp.argsort(-ll0, axis=1)[:, :c]  # (M, C)
            theta0 = jnp.take_along_axis(
                theta0, top0[:, :, None], axis=1)
        theta0 = theta0.reshape(m * c, dim)
    else:
        # initialize each object's chains at its best-of-prior-sweep points
        # (one vectorized forward pass): a chain started in an e^-500 tail
        # where the logit geometry collapses (∂θ/∂u → 0 near the box edge)
        # can random-walk for the entire run before reaching the typical set
        n_cand = max(256, 8 * c)
        cand = prior.sample(k_init, n_cand)
        model_c = simulator.photometry(cand)  # (n_cand, F)
        ll_c = censored_gaussian_loglike_rows(
            jnp.broadcast_to(model_c[None], (m,) + model_c.shape
                             ).reshape(m * n_cand, -1),
            jnp.repeat(x_obs, n_cand, axis=0),
            jnp.repeat(sigma, n_cand, axis=0),
            None if lim is None else jnp.repeat(lim, n_cand, axis=0),
        ).reshape(m, n_cand)
        top = jnp.argsort(-ll_c, axis=1)[:, :c]  # (M, C)
        theta0 = cand[top].reshape(m * c, dim)
    frac = jnp.clip((theta0 - lo) / width, 0.02, 0.98)
    u = jnp.log(frac) - jnp.log1p(-frac)
    lp_vec = logpost(u)

    # Two-phase warmup: (A) scalar dual-averaging (Hoffman & Gelman 2014)
    # with unit mass while Welford-accumulating per-coordinate u variance,
    # then (B) dual-averaging again against the adapted DIAGONAL MASS
    # (per-object posterior scales). Without the mass adaptation a single
    # scalar eps serves the stiffest coordinate: on a 63-band survey-depth
    # posterior the per-coordinate scales span ~2-3 decades, so soft
    # directions would need (s_max/s_min)² ~ 1e4-1e6 steps to diffuse —
    # chains LOOK converged (acceptance on target) while split-R̂ is 1e6
    # (measured; posterior_width_crosscheck round 5).
    # Per-OBJECT dual averaging: log_eps/h_bar are (M,) vectors, expanded
    # to chains via repeat. One object's divergence-prone chains shrink
    # only their own eps.
    def _expand(log_eps):  # (M,) -> (M·C, 1)
        return jnp.repeat(jnp.exp(log_eps), c)[:, None]

    def make_warm(s_vec):
        def warm_step(carry, xs):
            u, lp_vec, log_eps, h_bar, log_eps_bar, mu0, cnt, mean, m2 = \
                carry
            i, kw = xs
            i = i.astype(jnp.float32)
            u, lp_vec, a_obj = hmc_step(
                u, lp_vec, kw, _expand(log_eps) * s_vec)
            h_bar = ((1.0 - 1.0 / (i + 11.0)) * h_bar
                     + (target_accept - a_obj) / (i + 11.0))
            # cap at 0.5: early H-bar noise can briefly explode eps, and
            # one huge trajectory is what strands chains at the u-wall
            log_eps = jnp.minimum(
                mu0 - jnp.sqrt(i + 1.0) / 0.05 * h_bar, jnp.log(0.5))
            w = (i + 1.0) ** -0.75
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            cnt = cnt + 1.0
            d = u - mean
            mean = mean + d / cnt
            m2 = m2 + d * (u - mean)
            return (u, lp_vec, log_eps, h_bar, log_eps_bar, mu0, cnt,
                    mean, m2), a_obj
        return warm_step

    def run_warm(u, lp_vec, s_vec, log_eps0, mu0, n_steps, k):
        z = jnp.zeros_like(u)
        state0 = (u, lp_vec, log_eps0, jnp.zeros((m,), jnp.float32),
                  log_eps0, mu0, jnp.float32(0.0), z, jnp.zeros_like(u))
        (u, lp_vec, _, _, log_eps_bar, _, cnt, mean, m2), _ = jax.lax.scan(
            make_warm(s_vec), state0,
            (jnp.arange(n_steps), jax.random.split(k, n_steps)))
        return u, lp_vec, log_eps_bar, cnt, mean, m2

    k_wa, k_wb = jax.random.split(k_warm)
    n_wa = max(n_warmup // 2, 1)
    n_wb = max(n_warmup - n_wa, 1)
    ones = jnp.ones((1, dim), jnp.float32)
    mvec = jnp.full((m,), jnp.log(0.1), jnp.float32)
    u, lp_vec, log_eps_a, cnt, mean, m2 = run_warm(
        u, lp_vec, ones, mvec, mvec + jnp.log(10.0), n_wa, k_wa)
    # per-object scale: within-chain variance + between-chain-mean variance
    var_w = (m2 / jnp.maximum(cnt - 1.0, 1.0)).reshape(m, c, dim)
    mean_o = mean.reshape(m, c, dim)
    var_o = var_w.mean(axis=1) + mean_o.var(axis=1)
    s_obj = jnp.sqrt(var_o + 1.0e-8)
    # geometric-mean-normalize (keeps the scalar eps comparable across
    # phases) and cap the condition number at ~1e3
    s_obj = s_obj / jnp.exp(
        jnp.log(s_obj).mean(axis=-1, keepdims=True))
    s_obj = jnp.clip(s_obj, 1.0 / 30.0, 30.0)
    s_vec = jnp.repeat(s_obj, c, axis=0)  # (M·C, P)
    u, lp_vec, log_eps_bar, _, _, _ = run_warm(
        u, lp_vec, s_vec, log_eps_a, jnp.log(10.0) + log_eps_a, n_wb,
        k_wb)
    eps = _expand(log_eps_bar) * s_vec

    def run_step(carry, kr):
        u, lp_vec = carry
        u, lp_vec, a_obj = hmc_step(u, lp_vec, kr, eps)
        return (u, lp_vec), (u, lp_vec, a_obj)

    (_, _), (chain_u, chain_lp, accs) = jax.lax.scan(
        run_step, (u, lp_vec), jax.random.split(k_run, n_samples))
    # (S, M·C, P) -> (M, C·S, P)
    theta_chain = theta_of(chain_u).reshape(n_samples, m, c, dim)
    samples = jnp.moveaxis(theta_chain, 0, 2).reshape(m, c * n_samples, dim)
    lps = jnp.moveaxis(
        chain_lp.reshape(n_samples, m, c), 0, 2).reshape(m, c * n_samples)
    simulator._mega_off = had_flag
    return np.asarray(samples), np.asarray(lps), float(accs.mean())


def fit_catalogue_map(
    simulator,
    x_obs_njy,
    sigma_njy,
    prior: BoxUniform,
    key=None,
    n_steps: int = 400,
    n_restarts: int = 4,
    learning_rate: float = 0.05,
    upper_limits=None,
):
    """Batched MAP + Laplace fits straight through the differentiable
    simulator: gradient descent in the prior's logit space for EVERY
    object and EVERY restart simultaneously — one jitted program whose
    each step is a single (M·R, P) batched photometry + VJP.

    The reference fits catalogues only through trained posteriors or
    per-object nested sampling; an exact-likelihood point fit with a
    curvature error bar for 10⁴ objects is a few seconds here.

    Args:
        x_obs_njy: (M, F) observed fluxes; sigma_njy: (M, F) 1σ errors.
    Returns:
        dict: "theta_map" (M, P), "laplace_sigma" (M, P) (sqrt diag of
        the inverse θ-space Hessian at the MAP; NaN where not positive
        definite), "log_like" (M,) at the MAP.
    """
    import optax

    key = key if key is not None else jax.random.PRNGKey(0)
    x_obs = jnp.atleast_2d(jnp.asarray(x_obs_njy, jnp.float32))
    sigma = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(sigma_njy, jnp.float32), x_obs.shape),
        1.0e-12)
    m = x_obs.shape[0]
    dim = prior.dim
    lo, width = prior.low, prior.high - prior.low
    lim = (None if upper_limits is None
           else jnp.broadcast_to(jnp.asarray(upper_limits, bool),
                                 x_obs.shape))

    had_flag = getattr(simulator, "_mega_off", False)
    simulator._mega_off = True

    def theta_of(u):
        return lo + width * jax.nn.sigmoid(u)

    def neg_logpost_rows(u_rows, x_rows, sg_rows, lim_rows=None):
        """(B, P) u + (B, F) obs -> (B,) -log posterior (logit space)."""
        model = simulator.photometry(theta_of(u_rows))
        ll = censored_gaussian_loglike_rows(model, x_rows, sg_rows,
                                            lim_rows)
        log_jac = jnp.sum(
            jnp.log(width) - jax.nn.softplus(u_rows)
            - jax.nn.softplus(-u_rows), axis=-1)
        return -ll - log_jac

    # best-of-prior init per (object, restart)
    r = int(n_restarts)
    n_cand = max(64, 8 * r)
    cand = prior.sample(key, n_cand)  # shared candidate set
    model_c = simulator.photometry(cand)  # (n_cand, F)
    ll_c = censored_gaussian_loglike_rows(
        jnp.broadcast_to(model_c[None], (m,) + model_c.shape
                         ).reshape(m * n_cand, -1),
        jnp.repeat(x_obs, n_cand, axis=0),
        jnp.repeat(sigma, n_cand, axis=0),
        None if lim is None else jnp.repeat(lim, n_cand, axis=0),
    ).reshape(m, n_cand)
    top = jnp.argsort(-ll_c, axis=1)[:, :r]  # (M, R)
    theta0 = cand[top]  # (M, R, P)
    frac = jnp.clip((theta0 - lo) / width, 0.02, 0.98)
    u0 = (jnp.log(frac) - jnp.log1p(-frac)).reshape(m * r, dim)
    x_rep = jnp.repeat(x_obs, r, axis=0)
    sg_rep = jnp.repeat(sigma, r, axis=0)
    lim_rep = None if lim is None else jnp.repeat(lim, r, axis=0)

    tx = optax.adam(learning_rate)

    @jax.jit
    def optimize(u0):
        opt0 = tx.init(u0)

        def step(carry, _):
            u, opt = carry
            g = jax.grad(
                lambda uu: jnp.sum(neg_logpost_rows(
                    uu, x_rep, sg_rep, lim_rep)))(u)
            upd, opt = tx.update(g, opt, u)
            return (optax.apply_updates(u, upd), opt), None

        (u, _), _ = jax.lax.scan(step, (u0, opt0), None, length=n_steps)
        nlp = neg_logpost_rows(u, x_rep, sg_rep, lim_rep)
        return u, nlp

    u_fit, nlp = optimize(u0)
    nlp = nlp.reshape(m, r)
    best = jnp.argmin(nlp, axis=1)  # (M,)
    u_best = u_fit.reshape(m, r, dim)[jnp.arange(m), best]
    theta_map = theta_of(u_best)

    # Laplace in θ space: per-object Gauss-Newton Hessian J^T Σ^-1 J of
    # the χ² term (exact for Gaussian noise up to model curvature), same
    # scale-safe Jacobian path as diagnostics.fisher_forecast
    @jax.jit
    def laplace(th, sg_rows):
        def one(row, sg_row):
            j = jax.jacfwd(
                lambda p: simulator.photometry(p[None, :])[0])(row)
            jw = j / sg_row[:, None]
            return jw.T @ jw

        h = jax.vmap(one)(th, sg_rows)  # (M, P, P)
        eye = jnp.eye(dim, dtype=jnp.float32)
        cov = jax.vmap(lambda f: jnp.linalg.solve(f + 1e-12 * eye, eye))(h)
        d = jax.vmap(jnp.diag)(cov)
        return jnp.where(d > 0, jnp.sqrt(jnp.maximum(d, 0.0)), jnp.nan)

    lap = laplace(theta_map, sigma)
    model_map = simulator.photometry(theta_map)
    ll = censored_gaussian_loglike_rows(model_map, x_obs, sigma, lim)
    simulator._mega_off = had_flag
    return {"theta_map": np.asarray(theta_map),
            "laplace_sigma": np.asarray(lap),
            "neg_logpost": np.asarray(nlp[jnp.arange(m), best]),
            "log_like": np.asarray(ll)}


def fit_catalogue_vi(
    simulator,
    x_obs_njy,
    sigma_njy,
    prior: BoxUniform,
    key=None,
    n_steps: int = 500,
    n_mc: int = 8,
    learning_rate: float = 0.03,
    upper_limits=None,
):
    """Batched full-rank Gaussian variational inference through the
    differentiable simulator: maximize the reparameterized ELBO of
    q(u) = N(m, L Lᵀ) in the prior's logit space for EVERY object
    simultaneously — each step is one (M·n_mc, P) batched photometry +
    VJP. Sits between `fit_catalogue_map` (point + curvature) and
    `fit_catalogue_hmc` (exact sampling): a full posterior approximation
    that captures correlations and skewness-through-the-logit at a fixed,
    small step count.

    Returns:
        dict: "mean"/"sigma" (M, P) θ-space posterior mean and std from
        q-samples, "samples" (M, 256, P), "elbo" (M,) final per-object
        ELBO (up to the constant entropy of the base normal).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    x_obs = jnp.atleast_2d(jnp.asarray(x_obs_njy, jnp.float32))
    sigma = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(sigma_njy, jnp.float32), x_obs.shape),
        1.0e-12)
    m_obj = x_obs.shape[0]
    dim = prior.dim
    lo, width = prior.low, prior.high - prior.low

    had_flag = getattr(simulator, "_mega_off", False)
    simulator._mega_off = True

    def theta_of(u):
        return lo + width * jax.nn.sigmoid(u)

    lim = (None if upper_limits is None
           else jnp.broadcast_to(jnp.asarray(upper_limits, bool),
                                 x_obs.shape))

    def logpost_rows(u_rows, x_rows, sg_rows, lim_rows=None):
        model = simulator.photometry(theta_of(u_rows))
        ll = censored_gaussian_loglike_rows(model, x_rows, sg_rows,
                                            lim_rows)
        log_jac = jnp.sum(
            jnp.log(width) - jax.nn.softplus(u_rows)
            - jax.nn.softplus(-u_rows), axis=-1)
        return ll + log_jac

    # init q at the best prior candidate per object, unit-ish covariance
    k_init, k_run = jax.random.split(key)
    cand = prior.sample(k_init, 256)
    model_c = simulator.photometry(cand)
    ll_c = censored_gaussian_loglike_rows(
        jnp.broadcast_to(model_c[None], (m_obj,) + model_c.shape
                         ).reshape(m_obj * 256, -1),
        jnp.repeat(x_obs, 256, axis=0), jnp.repeat(sigma, 256, axis=0),
        None if lim is None else jnp.repeat(lim, 256, axis=0),
    ).reshape(m_obj, 256)
    theta0 = cand[jnp.argmax(ll_c, axis=1)]  # (M, P)
    frac = jnp.clip((theta0 - lo) / width, 0.02, 0.98)
    mean0 = jnp.log(frac) - jnp.log1p(-frac)
    # L parameterized as diag-softplus + strictly-lower triangle
    tril0 = jnp.zeros((m_obj, dim, dim), jnp.float32)
    raw_diag0 = jnp.full((m_obj, dim), -1.0, jnp.float32)  # softplus ~ 0.31

    import optax

    tx = optax.adam(learning_rate)
    x_rep = jnp.repeat(x_obs, n_mc, axis=0)
    sg_rep = jnp.repeat(sigma, n_mc, axis=0)
    lim_rep = None if lim is None else jnp.repeat(lim, n_mc, axis=0)

    def build_l(tril, raw_diag):
        l_mat = jnp.tril(tril, -1)
        return l_mat + jax.vmap(jnp.diag)(jax.nn.softplus(raw_diag))

    def neg_elbo(params, eps):
        mean, tril, raw_diag = params
        l_mat = build_l(tril, raw_diag)  # (M, P, P)
        # eps (M, n_mc, P) -> u = m + L eps, entropy = sum log diag L
        u = mean[:, None, :] + jnp.einsum("mij,mnj->mni", l_mat, eps)
        lp = logpost_rows(u.reshape(m_obj * n_mc, dim), x_rep, sg_rep,
                          lim_rep)
        ent = jnp.sum(jnp.log(jax.nn.softplus(raw_diag)), axis=-1)  # (M,)
        elbo = lp.reshape(m_obj, n_mc).mean(axis=1) + ent
        return -jnp.sum(elbo), elbo

    @jax.jit
    def optimize(params, key):
        opt = tx.init(params)

        def step(carry, k):
            params, opt = carry
            eps = jax.random.normal(k, (m_obj, n_mc, dim))
            (_, elbo), g = jax.value_and_grad(
                neg_elbo, has_aux=True)(params, eps)
            upd, opt = tx.update(g, opt, params)
            return (optax.apply_updates(params, upd), opt), elbo

        keys = jax.random.split(key, n_steps)
        (params, _), elbos = jax.lax.scan(step, (params, opt), keys)
        return params, elbos[-1]

    params, elbo = optimize((mean0, tril0, raw_diag0), k_run)
    mean, tril, raw_diag = params
    l_mat = build_l(tril, raw_diag)
    k_samp = jax.random.fold_in(k_run, 1)
    eps = jax.random.normal(k_samp, (m_obj, 256, dim))
    u = mean[:, None, :] + jnp.einsum("mij,mnj->mni", l_mat, eps)
    th = theta_of(u)  # (M, 256, P)
    simulator._mega_off = had_flag
    return {"mean": np.asarray(th.mean(axis=1)),
            "sigma": np.asarray(th.std(axis=1)),
            "samples": np.asarray(th),
            "elbo": np.asarray(elbo)}
