"""Priors: independent box-uniform over named parameters.

Reference analogue: `SBI_Fitter.create_priors`
(`/root/reference/src/synference/sbi_runner.py:3442-3569`) builds per-param
uniforms from library min/max (optionally extended by a percentage with
physical guards) and wraps them through torch/sbi `process_prior`. Here the
prior is a plain pytree-of-arrays with pure log_prob/sample/support —
everything the TPU posterior machinery needs.
"""

from __future__ import annotations

import jax  # noqa: F401  (used by RestrictedPrior.sample)
import jax.numpy as jnp
import numpy as np

__all__ = ["BoxUniform", "RestrictedPrior", "priors_from_library",
           "restricted_prior_from_simulations"]


class BoxUniform:
    """Independent uniform over [low, high]^D."""

    def __init__(self, low, high, names: tuple = ()):
        self.low = jnp.asarray(low, jnp.float32)
        self.high = jnp.asarray(high, jnp.float32)
        if not bool((self.high > self.low).all()):
            raise ValueError("prior requires high > low in every dimension")
        self.names = tuple(names)
        self._log_vol = float(jnp.sum(jnp.log(self.high - self.low)))

    @property
    def dim(self) -> int:
        return int(self.low.shape[0])

    def sample(self, key, n: int):
        u = jax.random.uniform(key, (n, self.dim))
        return self.low + u * (self.high - self.low)

    def log_prob(self, theta):
        theta = jnp.atleast_2d(theta)
        inside = self.support_mask(theta)
        return jnp.where(inside, -self._log_vol, -jnp.inf)

    def support_mask(self, theta):
        theta = jnp.atleast_2d(theta)
        return jnp.all(
            (theta >= self.low) & (theta <= self.high), axis=-1
        )

    def to_dict(self) -> dict:
        return {
            "low": np.asarray(self.low).tolist(),
            "high": np.asarray(self.high).tolist(),
            "names": list(self.names),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BoxUniform":
        return cls(d["low"], d["high"], tuple(d.get("names", ())))


class RestrictedPrior:
    """Base prior restricted to the region where simulations are valid.

    Reference analogue: `create_restricted_priors` via sbi's
    RestrictionEstimator (`sbi_runner.py:3571-3599`): a classifier learns
    p(valid | θ) from (θ, valid) pairs; sampling rejects θ the classifier
    deems invalid. log_prob keeps the base density on the accepted region
    (unnormalized, as sbi does).
    """

    def __init__(self, base: BoxUniform, classifier, threshold: float = 0.5):
        self.base = base
        self.classifier = classifier  # sklearn-style .predict_proba
        self.threshold = threshold
        self.names = base.names

    @property
    def dim(self):
        return self.base.dim

    def _valid(self, theta):
        proba = self.classifier.predict_proba(np.asarray(theta))[:, 1]
        return proba >= self.threshold

    def sample(self, key, n: int, max_tries: int = 50):
        import jax

        out = np.empty((0, self.dim), np.float32)
        for _ in range(max_tries):
            key, k = jax.random.split(key)
            cand = np.asarray(self.base.sample(k, max(2 * n, 256)))
            out = np.concatenate([out, cand[self._valid(cand)]])
            if len(out) >= n:
                return jnp.asarray(out[:n])
        raise RuntimeError("restricted prior acceptance too low")

    def log_prob(self, theta):
        lp = self.base.log_prob(theta)
        valid = jnp.asarray(self._valid(np.atleast_2d(np.asarray(theta))))
        return jnp.where(valid, lp, -jnp.inf)

    def support_mask(self, theta):
        base_ok = self.base.support_mask(theta)
        valid = jnp.asarray(self._valid(np.atleast_2d(np.asarray(theta))))
        return base_ok & valid


def restricted_prior_from_simulations(base: BoxUniform, theta, x,
                                      threshold: float = 0.5,
                                      random_state: int = 0):
    """Fit the validity classifier from simulation outputs: a θ is invalid
    when its simulation contains non-finite values (the reference's
    RestrictionEstimator use case)."""
    from sklearn.neural_network import MLPClassifier

    theta = np.asarray(theta)
    valid = np.isfinite(np.asarray(x)).all(axis=1)
    if valid.all() or (~valid).all():
        # degenerate labels: nothing to restrict
        class _Always:
            def predict_proba(self, t):
                p = np.full((len(t), 2), 0.0)
                p[:, 1] = 1.0 if valid.all() else 0.0
                return p

        return RestrictedPrior(base, _Always(), threshold)
    clf = MLPClassifier(hidden_layer_sizes=(64,), max_iter=300,
                        random_state=random_state)
    mu, sd = theta.mean(0), np.maximum(theta.std(0), 1e-8)
    clf.fit((theta - mu) / sd, valid.astype(int))

    class _Scaled:
        def predict_proba(self, t):
            return clf.predict_proba((np.asarray(t) - mu) / sd)

    return RestrictedPrior(base, _Scaled(), threshold)


def priors_from_library(
    parameters: np.ndarray,
    parameter_names,
    overrides: dict | None = None,
    extend_pct: float = 0.0,
    positive_params: tuple = (),
) -> BoxUniform:
    """Box prior from library parameter min/max (reference rule,
    sbi_runner.py:3442-3569).

    Args:
        parameters: (P, N) or (N, P) library θ array.
        overrides: {name: (lo, hi)} explicit ranges.
        extend_pct: extend each range by this fraction of its width on both
            sides (reference's percentage extension).
        positive_params: names whose lower bound is clamped at >= 0 when
            extended (the reference's physical guard).
    """
    parameters = np.asarray(parameters)
    names = list(parameter_names)
    if parameters.shape[0] != len(names):
        parameters = parameters.T
    overrides = overrides or {}
    low, high = [], []
    for i, name in enumerate(names):
        if name in overrides:
            lo, hi = overrides[name]
        else:
            lo, hi = float(parameters[i].min()), float(parameters[i].max())
            if extend_pct > 0:
                width = hi - lo
                lo -= extend_pct * width
                hi += extend_pct * width
                if name in positive_params:
                    lo = max(lo, 0.0)
        low.append(lo)
        high.append(hi)
    return BoxUniform(low, high, tuple(names))
