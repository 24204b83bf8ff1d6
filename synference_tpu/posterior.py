"""Amortized posteriors: direct flow posteriors with prior truncation,
ensembles, and fully batched sampling.

Reference analogues: sbi's rejection-corrected `DirectPosterior` wrapped into
`EnsemblePosterior` (`/root/reference/src/synference/custom_runner.py:278-283`)
and the per-object `sample_posterior` loop
(`/root/reference/src/synference/sbi_runner.py:6350-6474` — the reference
disables batched sampling as slower in torch; here batched sampling over all
objects is one fused TPU program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .flows.base import ConditionalFlow
from .priors import BoxUniform

__all__ = [
    "DirectPosterior",
    "EnsemblePosterior",
    "LikelihoodPosterior",
    "RatioPosterior",
]


class DirectPosterior:
    """q(θ|x) truncated to the prior support.

    Sampling uses iterative rejection against the prior box (the flow's
    leakage outside the box is replaced by resampling, matching sbi's
    rejection-corrected DirectPosterior semantics). `log_prob` returns the
    *unnormalized* truncated density by default; pass `norm_x` to estimate
    the leakage correction Z(x) by Monte Carlo.
    """

    def __init__(self, flow: ConditionalFlow, params, prior: BoxUniform):
        self.flow = flow
        self.params = params
        self.prior = prior

    # -- density ---------------------------------------------------------
    def log_prob(self, theta, x, normalize: bool = False, key=None,
                 n_norm: int = 512):
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        lp = self.flow.log_prob(self.params, theta, x)
        inside = self.prior.support_mask(theta)
        lp = jnp.where(inside, lp, -jnp.inf)
        if normalize:
            key = key if key is not None else jax.random.PRNGKey(0)
            accept = self._acceptance(key, x, n_norm)  # (B,)
            lp = lp - jnp.log(jnp.maximum(accept, 1.0e-6))
        return lp

    def _acceptance(self, key, x, n: int):
        """Monte-Carlo in-support fraction of the raw flow per condition."""
        def one(k, xi):
            s = self.flow.sample(self.params, k, xi, n)
            return self.prior.support_mask(s).mean()

        keys = jax.random.split(key, x.shape[0])
        return jax.vmap(one)(keys, x)

    # -- sampling --------------------------------------------------------
    def sample(self, key, x, n: int, max_tries: int = 20,
               oversample: float = 2.0):
        """n in-support draws for a single condition x (D,).

        Host loop of fixed-size device rounds: draw `round_n`, keep valid,
        repeat. Falls back to clipping into the box if acceptance ~ 0.
        """
        x = jnp.asarray(x, jnp.float32)
        round_n = int(max(n * oversample, 256))
        out = np.empty((0, self.prior.dim), np.float32)
        for _ in range(max_tries):
            key, k = jax.random.split(key)
            s = self.flow.sample(self.params, k, x, round_n)
            mask = np.asarray(self.prior.support_mask(s))
            out = np.concatenate([out, np.asarray(s)[mask]])[: 10 * n]
            if out.shape[0] >= n:
                return jnp.asarray(out[:n])
        # pathological leakage: clip the remainder into the support
        key, k = jax.random.split(key)
        s = self.flow.sample(self.params, k, x, n - out.shape[0])
        clipped = jnp.clip(s, self.prior.low, self.prior.high)
        return jnp.concatenate([jnp.asarray(out), clipped])[:n]

    def sample_batch(self, key, xs, n: int, batched_rounds: int = 4):
        """(M, C) conditions -> (M, n, D): one fused program.

        Each round draws n per object; invalid draws are replaced by valid
        ones via masked selection across rounds (fixed compute, no host
        sync per object — the TPU answer to the reference's per-object
        loop). Out-of-support leakage is silently clipped here; use
        `sample_batch_with_acceptance` to monitor it (sbi's DirectPosterior
        tracks leakage, reference custom_runner.py:278-283).
        """
        samples, _ = self.sample_batch_with_acceptance(
            key, xs, n, batched_rounds
        )
        return samples

    def sample_batch_with_acceptance(self, key, xs, n: int,
                                     batched_rounds: int = 4):
        """Like `sample_batch` but also returns the per-object in-support
        fraction of the *raw* flow draws (M,). Values well below 1 mean the
        flow leaks outside the prior box and some returned samples are
        clipped onto the box faces — coverage diagnostics alone cannot see
        this, so callers should surface it (`evaluate_posterior` does)."""
        xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
        m = xs.shape[0]

        def one(k, xi):
            ks = jax.random.split(k, batched_rounds)
            draws = jnp.concatenate(
                [self.flow.sample(self.params, kk, xi, n) for kk in ks]
            )  # (rounds*n, D)
            valid = self.prior.support_mask(draws)
            # order: valid draws first, then clipped invalid ones
            order = jnp.argsort(~valid)  # stable: valids first
            picked = draws[order[:n]]
            return (
                jnp.clip(picked, self.prior.low, self.prior.high),
                valid.mean(),
            )

        keys = jax.random.split(key, m)
        return jax.vmap(one)(keys, xs)

    def map_estimate(self, x, key=None, n_starts: int = 512):
        """Approximate MAP: best-of-N posterior draws refined is omitted;
        returns the highest-density draw (cheap, batched)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        s = self.sample(key, x, n_starts)
        lp = self.log_prob(s, jnp.tile(jnp.asarray(x)[None], (n_starts, 1)))
        return s[jnp.argmax(lp)]


class EnsemblePosterior:
    """Uniform mixture of member posteriors (reference wraps members into
    ili's EnsemblePosterior, custom_runner.py:278-283).

    `stacked_params` carries a leading member axis (as produced by
    `train_ensemble`).
    """

    def __init__(self, flow: ConditionalFlow, stacked_params, prior: BoxUniform,
                 n_members: int | None = None):
        self.flow = flow
        self.params = stacked_params
        self.prior = prior
        leaves = jax.tree_util.tree_leaves(stacked_params)
        self.n_members = n_members or int(leaves[0].shape[0])

    def _member(self, i) -> DirectPosterior:
        p = jax.tree_util.tree_map(lambda a: a[i], self.params)
        return DirectPosterior(self.flow, p, self.prior)

    def log_prob(self, theta, x, **kw):
        # one vmapped program over the stacked member axis (a Python loop
        # would cost n_members separate dispatches per call)
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        lps = jax.vmap(
            lambda p: self.flow.log_prob(p, theta, x)
        )(self.params)  # (K, B)
        lp = jax.scipy.special.logsumexp(lps, axis=0) - jnp.log(self.n_members)
        inside = self.prior.support_mask(theta)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, x, n: int, **kw):
        k_choice, k_draw = jax.random.split(key)
        counts = np.bincount(
            np.asarray(jax.random.randint(k_choice, (n,), 0, self.n_members)),
            minlength=self.n_members,
        )
        chunks = []
        for i, c in enumerate(counts):
            if c > 0:
                k_draw, k = jax.random.split(k_draw)
                chunks.append(self._member(i).sample(k, x, int(c), **kw))
        out = jnp.concatenate(chunks)
        # fresh key: permuting with the k_draw already consumed by the last
        # member's chunk draw would correlate the shuffle with those draws
        _, k_perm = jax.random.split(k_draw)
        return jax.random.permutation(k_perm, out)

    def sample_batch(self, key, xs, n: int, batched_rounds: int = 4):
        """(M, C) -> (M, n, D): every member draws per = ceil(n/K) samples in
        ONE vmapped program over the stacked member axis, then the member
        axis is folded into the sample axis."""
        samples, _ = self.sample_batch_with_acceptance(
            key, xs, n, batched_rounds
        )
        return samples

    def sample_batch_with_acceptance(self, key, xs, n: int,
                                     batched_rounds: int = 4):
        """Like `sample_batch` but also returns the per-object in-support
        fraction of the raw draws, averaged over members (M,)."""
        xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
        per = -(-n // self.n_members)
        keys = jax.random.split(key, self.n_members)

        def member(p, k):
            post = DirectPosterior(self.flow, p, self.prior)
            return post.sample_batch_with_acceptance(k, xs, per,
                                                     batched_rounds)

        s, acc = jax.vmap(member)(self.params, keys)  # (K, M, per, D), (K, M)
        # interleave per-major so truncation to n drops at most one sample
        # per member (member-major truncation would underrepresent or drop
        # trailing members whenever K does not divide n)
        s = jnp.moveaxis(s, 0, 2).reshape(xs.shape[0], -1, s.shape[-1])
        return s[:, :n], acc.mean(axis=0)


class _MCMCPosterior:
    """Shared machinery for likelihood/ratio posteriors: an unnormalized
    log-density term is combined with the prior and sampled by the batched
    stretch-move MCMC (`mcmc.run_batched_mcmc`) — the reference samples
    NLE/NRE posteriors through sbi's per-object MCMC
    (`/root/reference/src/synference/sbi_runner.py:4713-4715`); here all M
    objects advance in one fused program.
    """

    def __init__(self, prior: BoxUniform, n_walkers: int = 64,
                 burn_in: int = 256, thin: int = 2,
                 rhat_warn: float = 1.1):
        self.prior = prior
        self.n_walkers = n_walkers + (n_walkers % 2)
        self.burn_in = burn_in
        self.thin = thin
        self.rhat_warn = float(rhat_warn)
        self.last_acceptance: float | None = None
        # per-object convergence diagnostics of the most recent
        # sample_batch call: {"rhat": (M, P), "ess": (M, P)} numpy arrays
        self.last_diagnostics: dict | None = None

    # subclasses implement: _loglike(theta (B,P), x (B,C)) -> (B,)

    def log_prob(self, theta, x):
        """Unnormalized log posterior (log-likelihood/ratio + log prior);
        -inf outside the prior support. NOT comparable across different x
        (the evidence term is not subtracted)."""
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        lp = self.prior.log_prob(theta)
        ll = jnp.where(jnp.isfinite(lp), self._loglike(theta, x), 0.0)
        return jnp.where(jnp.isfinite(lp), ll + lp, -jnp.inf)

    def sample_batch(self, key, xs, n: int):
        """(M, C) -> (M, n, D) via batched MCMC; keeps the freshest n
        post-burn-in states per object. Sets `self.last_acceptance` and
        `self.last_diagnostics` (split-R̂/ESS per object; a chain set with
        max R̂ above `rhat_warn` logs a warning — its quantiles are not
        trustworthy, the failure mode the reference's sampler libraries
        would have surfaced)."""
        import numpy as _np

        from .mcmc import run_batched_mcmc
        from .runtime import setup_logger

        keep_steps = -(-n // self.n_walkers)
        n_steps = self.burn_in + keep_steps * self.thin
        kept, acc, diag = run_batched_mcmc(
            self._loglike, self.prior, xs, key=key,
            n_walkers=self.n_walkers, n_steps=n_steps,
            burn_in=self.burn_in, thin=self.thin,
            return_diagnostics=True,
        )
        self.last_acceptance = float(acc)
        self.last_diagnostics = {
            "rhat": _np.asarray(diag["rhat"]),
            "ess": _np.asarray(diag["ess"]),
        }
        rhat_arr = self.last_diagnostics["rhat"]
        finite = _np.isfinite(rhat_arr)
        rhat_max = float(rhat_arr[finite].max()) if finite.any() \
            else float("nan")
        if _np.isfinite(rhat_max) and rhat_max > self.rhat_warn:
            per_obj = _np.where(finite, rhat_arr, -_np.inf).max(axis=1)
            n_bad = int((per_obj > self.rhat_warn).sum())
            setup_logger("synference_tpu.mcmc").warning(
                "batched MCMC: %d/%d objects have split-R-hat > %.2f "
                "(max %.3f) — their posterior quantiles are unreliable; "
                "raise burn_in/n_steps", n_bad, kept.shape[0],
                self.rhat_warn, rhat_max)
        return kept[:, -n:]

    def sample(self, key, x, n: int, **kw):
        x = jnp.asarray(x, jnp.float32)
        return self.sample_batch(key, x[None], n)[0]


class LikelihoodPosterior(_MCMCPosterior):
    """NLE posterior: flow likelihood q(x|θ) × prior, MCMC-sampled.

    `params` may carry a leading member axis (stacked ensemble); the
    ensemble likelihood is the uniform mixture of member likelihoods.
    The flow is trained with roles swapped — its "theta" slot holds the
    features x and its context slot holds θ.
    """

    def __init__(self, flow: ConditionalFlow, params, prior: BoxUniform,
                 n_members: int = 1, **mcmc_kw):
        super().__init__(prior, **mcmc_kw)
        self.flow = flow
        self.params = params
        self.n_members = n_members

    def _loglike(self, theta, x):
        if self.n_members == 1:
            return self.flow.log_prob(self.params, x, theta)
        lps = jax.vmap(
            lambda p: self.flow.log_prob(p, x, theta)
        )(self.params)  # (K, B)
        return (
            jax.scipy.special.logsumexp(lps, axis=0)
            - jnp.log(self.n_members)
        )


class RatioPosterior(_MCMCPosterior):
    """NRE posterior: classifier logit log r(θ, x) + log prior, MCMC-sampled.

    Ensemble members' ratios are averaged in ratio space
    (logsumexp of logits − log K).
    """

    def __init__(self, estimator, params, prior: BoxUniform,
                 n_members: int = 1, **mcmc_kw):
        super().__init__(prior, **mcmc_kw)
        self.estimator = estimator
        self.params = params
        self.n_members = n_members

    def _loglike(self, theta, x):
        if self.n_members == 1:
            return self.estimator.logit(self.params, theta, x)
        logits = jax.vmap(
            lambda p: self.estimator.logit(p, theta, x)
        )(self.params)  # (K, B)
        return (
            jax.scipy.special.logsumexp(logits, axis=0)
            - jnp.log(self.n_members)
        )
