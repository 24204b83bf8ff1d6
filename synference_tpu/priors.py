"""Priors: independent box-uniform over named parameters.

Reference analogue: `SBI_Fitter.create_priors`
(`/root/reference/src/synference/sbi_runner.py:3442-3569`) builds per-param
uniforms from library min/max (optionally extended by a percentage with
physical guards) and wraps them through torch/sbi `process_prior`. Here the
prior is a plain pytree-of-arrays with pure log_prob/sample/support —
everything the TPU posterior machinery needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BoxUniform", "priors_from_library"]


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
