"""Neural ratio estimation (NRE): a classifier logit as log r(θ, x).

Reference analogue: `run_single_sbi(engine="NRE")` trains sbi's ratio
estimators (`/root/reference/src/synference/sbi_runner.py:4447`,
`:4713-4715`, `:5019`). Here the estimator is a pure-pytree MLP over the
standardized [θ, x] concatenation trained with the binary logistic loss on
joint vs product-of-marginals pairs; the logit converges to
log p(θ, x) / (p(θ) p(x)) = log p(x|θ) / p(x), so adding the prior log-density
gives the unnormalized posterior that `RatioPosterior` samples with the
batched ensemble MCMC (`mcmc.run_batched_mcmc`).

Marginal pairs are built by rolling θ within the minibatch (a fixed
derangement) instead of RNG shuffling — deterministic, fuses into the same
`lax.scan` epoch as the NPE loss, and matches the joint/marginal class
balance exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RatioEstimator", "build_ratio_estimator", "nre_loss"]


@dataclass
class RatioEstimator:
    """MLP log-ratio estimator with input standardization.

    Mirrors `ConditionalFlow`'s interface where it matters so it can ride
    the same vmapped `train_ensemble` loop: `init(key, theta_data, x_data)`
    returns a pure pytree; `spec()`/`from_spec()` persist the architecture.
    """

    theta_dim: int
    x_dim: int
    config: dict = field(default_factory=dict)

    def __post_init__(self):
        self.hidden_features = int(self.config.get("hidden_features", 64))
        self.num_layers = int(self.config.get("num_layers", 3))
        # classifier architecture, matching the reference zoo's NRE nets
        # ("linear", "mlp", "resnet"; sbi_runner.py:4846-4861)
        self.net = str(self.config.get("net", "mlp")).lower()
        if self.net not in ("mlp", "resnet", "linear"):
            raise ValueError(f"unknown NRE net {self.net!r}")
        if self.net == "linear":
            self.num_layers = 0

    # ------------------------------------------------------------------
    def init(self, key, theta_data=None, x_data=None):
        def stats(data, dim):
            if data is None:
                return jnp.zeros(dim), jnp.ones(dim)
            data = jnp.asarray(data, jnp.float32)
            return data.mean(0), jnp.maximum(data.std(0), 1.0e-6)

        tm, ts = stats(theta_data, self.theta_dim)
        xm, xs = stats(x_data, self.x_dim)
        sizes = (
            [self.theta_dim + self.x_dim]
            + [self.hidden_features] * self.num_layers
            + [1]
        )
        keys = jax.random.split(key, len(sizes) - 1)
        layers = []
        for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
            scale = np.sqrt(2.0 / a)
            layers.append({
                "w": scale * jax.random.normal(keys[i], (b, a)),
                "b": jnp.zeros(b),
            })
        return {
            "layers": layers,
            "theta_mean": tm, "theta_std": ts,
            "x_mean": xm, "x_std": xs,
        }

    # ------------------------------------------------------------------
    def logit(self, params, theta, x):
        """(B, P), (B, C) -> (B,) log-ratio estimate."""
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        z = (theta - params["theta_mean"]) / params["theta_std"]
        c = (x - params["x_mean"]) / params["x_std"]
        h = jnp.concatenate([z, c], axis=-1)
        layers = params["layers"]
        for i, layer in enumerate(layers):
            pre = h
            h = h @ layer["w"].T + layer["b"]
            if i < len(layers) - 1:
                h = jax.nn.relu(h)
                # residual connections on same-width hidden blocks
                if self.net == "resnet" and pre.shape[-1] == h.shape[-1]:
                    h = h + pre
        return h[..., 0]

    # `train_ensemble` calls flow.log_prob in its default loss; the NRE loss
    # below is passed explicitly instead, but alias for introspection.
    log_prob = logit

    # -- serialization ---------------------------------------------------
    def spec(self) -> dict:
        return {
            "model": "nre",
            "theta_dim": self.theta_dim,
            "x_dim": self.x_dim,
            "config": {
                "hidden_features": self.hidden_features,
                "num_layers": self.num_layers,
                "net": self.net,
            },
        }

    @classmethod
    def from_spec(cls, spec: dict) -> "RatioEstimator":
        return cls(
            theta_dim=int(spec["theta_dim"]),
            x_dim=int(spec["x_dim"]),
            config=dict(spec.get("config", {})),
        )


def build_ratio_estimator(theta_dim: int, x_dim: int, **config):
    return RatioEstimator(theta_dim=theta_dim, x_dim=x_dim, config=config)


def nre_loss(estimator: RatioEstimator):
    """Binary logistic NRE loss over joint vs rolled-marginal pairs.

    -E[log σ(l(θᵢ, xᵢ))] − E[log(1 − σ(l(θᵢ₊₁, xᵢ)))], averaged; the optimum
    of this loss is the exact log density ratio (Hermans et al. 2020).
    """

    def loss(params, tb, xb):
        l_joint = estimator.logit(params, tb, xb)
        l_marg = estimator.logit(params, jnp.roll(tb, 1, axis=0), xb)
        return 0.5 * (
            jax.nn.softplus(-l_joint).mean() + jax.nn.softplus(l_marg).mean()
        )

    return loss
