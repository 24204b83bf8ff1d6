"""Online (sequential) NPE — truncated SNPE rounds with the jitted simulator.

The reference's online path (`run_single_sbi(learning_type="online")`,
`/root/reference/src/synference/sbi_runner.py:4710-4803`) wraps
`GalaxySimulator` so every θ draw runs the full Python/Synthesizer stack —
its slowest configuration (SURVEY §3.4). Here the simulator is a jitted
batch function, so sequential rounds are cheap: this implements TSNPE
(truncated sequential NPE, Deistler et al. 2022) — each round's proposal is
UNIFORM over the current posterior's (1−ε) highest-density region (the prior
restricted to a subset), which keeps the plain NPE loss valid with no
importance reweighting or atomic corrections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .posterior import DirectPosterior
from .priors import BoxUniform
from .train import TrainConfig, train_npe

__all__ = ["run_online_snpe", "run_online_snle", "run_online_snre"]


def _truncated_prior_sample(key, prior, posterior, x_obs, n,
                            epsilon: float = 1.0e-3, max_tries: int = 200):
    """Uniform draws from the prior restricted to the posterior's (1−ε)
    highest-density region (TSNPE, Deistler et al. 2022): estimate the HPR
    log-prob threshold from posterior samples, then rejection-sample the
    prior against it. Falls back to prior draws if acceptance collapses.
    """
    import jax as _jax

    key, k_thresh = _jax.random.split(key)
    ref = posterior.sample(k_thresh, x_obs, 512)
    x_rep = jnp.tile(jnp.asarray(x_obs)[None], (ref.shape[0], 1))
    lp_ref = np.asarray(posterior.log_prob(ref, x_rep))
    lp_ref = lp_ref[np.isfinite(lp_ref)]
    if lp_ref.size == 0:
        return prior.sample(key, n)
    threshold = float(np.quantile(lp_ref, epsilon))

    out = np.empty((0, prior.dim), np.float32)
    for _ in range(max_tries):
        key, k = _jax.random.split(key)
        cand = prior.sample(k, max(2 * n, 512))
        x_rep = jnp.tile(jnp.asarray(x_obs)[None], (cand.shape[0], 1))
        lp = np.asarray(posterior.log_prob(cand, x_rep))
        out = np.concatenate([out, np.asarray(cand)[lp >= threshold]])
        if len(out) >= n:
            return jnp.asarray(out[:n])
    # acceptance too low: pad with prior draws (still a valid NPE proposal
    # mixture of uniform restrictions)
    key, k = _jax.random.split(key)
    pad = np.asarray(prior.sample(k, n - len(out)))
    return jnp.asarray(np.concatenate([out, pad]))


def run_online_snpe(
    simulate_fn,
    prior: BoxUniform,
    flow,
    x_obs,
    n_rounds: int = 3,
    sims_per_round: int = 2000,
    train_config: TrainConfig | None = None,
    key=None,
    verbose: bool = True,
):
    """Sequential NPE focused on one observation.

    Args:
        simulate_fn: θ (B, P) -> x (B, D) batched (jit-compatible) simulator
            INCLUDING the feature transform (so x matches `x_obs`).
        prior: BoxUniform over θ.
        flow: ConditionalFlow (untrained; re-trained from scratch each round
            on the accumulated dataset).
        x_obs: (D,) the target observation.
    Returns:
        (posterior, data dict with all θ/x rounds, per-round history).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    x_obs = jnp.asarray(x_obs, jnp.float32)
    cfg = train_config or TrainConfig()

    all_theta, all_x, history = [], [], []
    posterior = None
    for rnd in range(n_rounds):
        key, k_prop, k_train = jax.random.split(key, 3)
        if posterior is None:
            theta = prior.sample(k_prop, sims_per_round)
        else:
            # TSNPE proposal: UNIFORM over the (1−ε) highest-posterior
            # region. The plain NPE loss stays unbiased only when the
            # proposal is the prior restricted to a subset (uniform on it),
            # NOT the posterior itself — sampling θ ~ q(θ|x_obs) and training
            # with -E[log q] would converge to p(x|θ)q(θ), overconcentrating.
            theta = _truncated_prior_sample(
                k_prop, prior, posterior, x_obs, sims_per_round
            )
        x = simulate_fn(theta)
        all_theta.append(np.asarray(theta))
        all_x.append(np.asarray(x))

        theta_cat = np.concatenate(all_theta)
        x_cat = np.concatenate(all_x)
        good = np.isfinite(x_cat).all(axis=1) & np.isfinite(theta_cat).all(axis=1)
        res = train_npe(flow, theta_cat[good], x_cat[good], k_train, cfg)
        posterior = DirectPosterior(flow, res.params, prior)
        history.append({
            "round": rnd,
            "n_sims": int(good.sum()),
            "best_val": float(np.min(res.val_losses)),
        })
        if verbose:
            print(f"round {rnd}: n={good.sum()} "
                  f"val={history[-1]['best_val']:.3f}", flush=True)

    return posterior, {"theta": all_theta, "x": all_x}, history


def _run_online_likelihood_family(
    simulate_fn, prior, make_posterior, train_round, x_obs,
    n_rounds, sims_per_round, key, verbose,
):
    """Shared SNLE/SNRE round loop.

    Unlike SNPE, likelihood- and ratio-based losses stay valid under ANY
    proposal, so each round draws θ directly from the current MCMC posterior
    (the reference defers to sbi's SNLE/SNRE here,
    `/root/reference/src/synference/sbi_runner.py:4713-4715`).
    """
    x_obs = jnp.asarray(x_obs, jnp.float32)
    all_theta, all_x, history = [], [], []
    posterior = None
    for rnd in range(n_rounds):
        key, k_prop, k_train = jax.random.split(key, 3)
        if posterior is None:
            theta = prior.sample(k_prop, sims_per_round)
        else:
            theta = posterior.sample(k_prop, x_obs, sims_per_round)
        x = simulate_fn(theta)
        all_theta.append(np.asarray(theta))
        all_x.append(np.asarray(x))

        theta_cat = np.concatenate(all_theta)
        x_cat = np.concatenate(all_x)
        good = np.isfinite(x_cat).all(axis=1) & np.isfinite(theta_cat).all(axis=1)
        result = train_round(theta_cat[good], x_cat[good], k_train)
        posterior = make_posterior(result)
        history.append({
            "round": rnd,
            "n_sims": int(good.sum()),
            "best_val": float(np.min(result.val_losses)),
        })
        if verbose:
            print(f"round {rnd}: n={good.sum()} "
                  f"val={history[-1]['best_val']:.3f}", flush=True)
    return posterior, {"theta": all_theta, "x": all_x}, history


def run_online_snle(
    simulate_fn,
    prior: BoxUniform,
    flow,
    x_obs,
    n_rounds: int = 3,
    sims_per_round: int = 2000,
    train_config: TrainConfig | None = None,
    key=None,
    verbose: bool = True,
    n_walkers: int = 64,
    mcmc_burn_in: int = 256,
):
    """Sequential NLE: train q(x|θ) on proposal-focused simulations, sample
    the posterior ∝ q(x_obs|θ)·p(θ) with the batched ensemble MCMC.

    Args mirror `run_online_snpe`; `flow` models q(x|θ) so must be built
    with theta_dim = x-dim and context_dim = θ-dim.
    """
    from .posterior import LikelihoodPosterior

    key = key if key is not None else jax.random.PRNGKey(0)
    cfg = train_config or TrainConfig()

    def train_round(theta_cat, x_cat, k):
        # roles swap: the flow's modeled variable is x, conditioned on θ
        return train_npe(flow, x_cat, theta_cat, k, cfg)

    def make_posterior(result):
        return LikelihoodPosterior(flow, result.params, prior,
                                   n_walkers=n_walkers,
                                   burn_in=mcmc_burn_in)

    return _run_online_likelihood_family(
        simulate_fn, prior, make_posterior, train_round, x_obs,
        n_rounds, sims_per_round, key, verbose)


def run_online_snre(
    simulate_fn,
    prior: BoxUniform,
    estimator,
    x_obs,
    n_rounds: int = 3,
    sims_per_round: int = 2000,
    train_config: TrainConfig | None = None,
    key=None,
    verbose: bool = True,
    n_walkers: int = 64,
    mcmc_burn_in: int = 256,
):
    """Sequential NRE: train the classifier log-ratio on proposal-focused
    simulations (joint vs pooled-marginal pairs), sample the posterior
    ∝ exp(logit)·p(θ) with the batched ensemble MCMC."""
    from .posterior import RatioPosterior
    from .ratio import nre_loss
    from .train import train_ensemble

    key = key if key is not None else jax.random.PRNGKey(0)
    cfg = train_config or TrainConfig()
    loss_fn = nre_loss(estimator)

    def train_round(theta_cat, x_cat, k):
        res = train_ensemble(estimator, theta_cat, x_cat, key=k, config=cfg,
                             n_nets=1, loss_fn=loss_fn)
        return res

    def make_posterior(result):
        params = jax.tree_util.tree_map(lambda a: a[0], result.params)
        return RatioPosterior(estimator, params, prior,
                              n_walkers=n_walkers, burn_in=mcmc_burn_in)

    return _run_online_likelihood_family(
        simulate_fn, prior, make_posterior, train_round, x_obs,
        n_rounds, sims_per_round, key, verbose)
