"""Flow wrapper: standardization + model registry.

sbi standardizes both θ and x internally before its flows (the reference
relies on that via ili); `ConditionalFlow` reproduces it explicitly — z-score
affine layers whose statistics are set from the training set, with the
Jacobian correction folded into log_prob. Everything stays a pure pytree so
ensembles vmap across member parameters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ConditionalFlow", "build_flow"]


@dataclass
class ConditionalFlow:
    """A conditional density estimator q(θ | x) with input standardization.

    Attributes:
        model: "maf" | "nsf" | "mdn" | "gaussian".
        theta_dim / context_dim: dimensions.
        config: model hyperparameters (hidden_features, num_transforms, ...).
    """

    model: str
    theta_dim: int
    context_dim: int
    config: dict = field(default_factory=dict)

    def __post_init__(self):
        from .cnf import make_cnf
        from .maf import make_maf
        from .mdn import make_mdn
        from .monotone import make_gf, make_naf, make_sospf, make_unaf
        from .nsf import make_affine_coupling, make_ncsf, make_nsf

        cfg = dict(self.config)
        # optional embedding net for high-dim contexts (e.g. spectra):
        # reference exposes ili/sbi embedding_net support
        self._embed_dim = cfg.pop("embedding_dim", None)
        self._embed_hidden = cfg.pop("embedding_hidden", 128)
        self._embed_layers = cfg.pop("embedding_layers", 2)
        # optional prior-box support transform: the flow models
        # u = logit((θ−lo)/(hi−lo)) so EVERY sample maps back inside the
        # box — leakage is fixed at the source instead of rejection-corrected
        # after the fact (the reference leans on sbi's rejection-corrected
        # DirectPosterior, custom_runner.py:278-283). For box-uniform
        # training draws u is logistic-distributed (light tails), so the
        # z-scored flow sees a well-conditioned base geometry.
        lo = cfg.pop("support_low", None)
        hi = cfg.pop("support_high", None)
        if (lo is None) != (hi is None):
            raise ValueError("support_low/support_high must come together")
        self._support = None
        if lo is not None:
            lo = np.asarray(lo, np.float32)
            hi = np.asarray(hi, np.float32)
            if lo.shape != (self.theta_dim,) or hi.shape != (self.theta_dim,):
                raise ValueError("support bounds must be (theta_dim,)")
            if not (lo < hi).all():
                raise ValueError("support_low must be < support_high")
            self._support = (jnp.asarray(lo), jnp.asarray(hi))
        flow_ctx = self._embed_dim or self.context_dim
        if self.model == "maf":
            fns = make_maf(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "made":
            cfg.setdefault("num_transforms", 1)
            fns = make_maf(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "nsf":
            fns = make_nsf(self.theta_dim, flow_ctx, **cfg)
        elif self.model in ("realnvp", "affine_coupling"):
            fns = make_affine_coupling(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "mdn":
            fns = make_mdn(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "gaussian":
            cfg.setdefault("num_components", 1)
            fns = make_mdn(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "ncsf":
            fns = make_ncsf(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "naf":
            fns = make_naf(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "unaf":
            fns = make_unaf(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "sospf":
            fns = make_sospf(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "gf":
            fns = make_gf(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "cnf":
            fns = make_cnf(self.theta_dim, flow_ctx, **cfg)
        elif self.model == "nice":
            # NICE = volume-preserving additive coupling: the affine coupling
            # with its log-scale clamped to zero.
            cfg["clamp_log_scale"] = 0.0
            fns = make_affine_coupling(self.theta_dim, flow_ctx, **cfg)
        else:
            raise ValueError(f"unknown flow model {self.model!r}")
        self._init, self._log_prob, self._sample = fns

    # -- support (prior box) transform -----------------------------------
    _SUPPORT_EPS = 1.0e-6

    def _to_unbounded(self, theta):
        lo, hi = self._support
        p = jnp.clip((theta - lo) / (hi - lo),
                     self._SUPPORT_EPS, 1.0 - self._SUPPORT_EPS)
        return jnp.log(p) - jnp.log1p(-p)

    def _from_unbounded(self, u):
        lo, hi = self._support
        return lo + (hi - lo) * jax.nn.sigmoid(u)

    def _support_log_det(self, theta):
        """Σ log|du/dθ| — the logit Jacobian, stable in log space."""
        lo, hi = self._support
        w = hi - lo
        p = jnp.clip((theta - lo) / w,
                     self._SUPPORT_EPS, 1.0 - self._SUPPORT_EPS)
        return jnp.sum(-jnp.log(w) - jnp.log(p) - jnp.log1p(-p), axis=-1)

    # ------------------------------------------------------------------
    def init(self, key, theta_data=None, x_data=None):
        """Initialize params; standardization stats from training data."""
        k_flow, k_embed = jax.random.split(key)
        flow_params = self._init(k_flow)

        def stats(data, dim):
            if data is None:
                return jnp.zeros(dim), jnp.ones(dim)
            data = jnp.asarray(data, jnp.float32)
            return data.mean(0), jnp.maximum(data.std(0), 1.0e-6)

        if theta_data is not None and self._support is not None:
            theta_data = self._to_unbounded(
                jnp.asarray(theta_data, jnp.float32))
        tm, ts = stats(theta_data, self.theta_dim)
        xm, xs = stats(x_data, self.context_dim)
        params = {
            "flow": flow_params,
            "theta_mean": tm,
            "theta_std": ts,
            "x_mean": xm,
            "x_std": xs,
        }
        if self._embed_dim is not None:
            sizes = (
                [self.context_dim]
                + [self._embed_hidden] * self._embed_layers
                + [self._embed_dim]
            )
            layers = []
            keys = jax.random.split(k_embed, len(sizes) - 1)
            for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
                scale = np.sqrt(2.0 / a)
                layers.append({
                    "w": scale * jax.random.normal(keys[i], (b, a)),
                    "b": jnp.zeros(b),
                })
            params["embed"] = layers
        return params

    def _apply_embedding(self, params, xs):
        if self._embed_dim is None:
            return xs
        h = xs
        layers = params["embed"]
        for i, layer in enumerate(layers):
            h = h @ layer["w"].T + layer["b"]
            if i < len(layers) - 1:
                h = jax.nn.relu(h)
        return h

    def _std_theta(self, params, theta):
        return (theta - params["theta_mean"]) / params["theta_std"]

    def _std_x(self, params, x):
        return (x - params["x_mean"]) / params["x_std"]

    def log_prob(self, params, theta, x):
        """(B, D), (B, C) -> (B,) log q(θ|x) in *raw* θ units."""
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        ldj = 0.0
        if self._support is not None:
            ldj = self._support_log_det(theta)
            theta = self._to_unbounded(theta)
        z = self._std_theta(params, theta)
        xs = self._apply_embedding(params, self._std_x(params, x))
        lp = self._log_prob(params["flow"], z, xs)
        return lp - jnp.sum(jnp.log(params["theta_std"])) + ldj

    def sample(self, params, key, x, n):
        """Sample n draws conditioned on a single x (C,) -> (n, D) raw units.
        With a support transform configured, every draw lies strictly inside
        the prior box by construction."""
        xs = self._apply_embedding(
            params, self._std_x(params, jnp.asarray(x, jnp.float32))
        )
        z = self._sample(params["flow"], key, xs, n)
        u = z * params["theta_std"] + params["theta_mean"]
        if self._support is not None:
            return self._from_unbounded(u)
        return u

    def sample_batch(self, params, key, xs, n):
        """Batched sampling: xs (M, C) -> (M, n, D); one fused program (the
        reference loops objects in Python, sbi_runner.py:6412-6424)."""
        xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
        keys = jax.random.split(key, xs.shape[0])
        return jax.vmap(lambda k, x: self.sample(params, k, x, n))(keys, xs)

    # -- serialization ---------------------------------------------------
    def spec(self) -> dict:
        return {
            "model": self.model,
            "theta_dim": self.theta_dim,
            "context_dim": self.context_dim,
            "config": dict(self.config),
        }

    @classmethod
    def from_spec(cls, spec: dict) -> "ConditionalFlow":
        return cls(
            model=spec["model"],
            theta_dim=int(spec["theta_dim"]),
            context_dim=int(spec["context_dim"]),
            config=dict(spec.get("config", {})),
        )


def build_flow(model: str, theta_dim: int, context_dim: int, **config):
    """Registry constructor mirroring the reference's model-zoo names
    (`sbi_runner.py:4816-4861`)."""
    return ConditionalFlow(
        model=model, theta_dim=theta_dim, context_dim=context_dim,
        config=config,
    )


def flatten_params(params) -> dict:
    """Pytree -> {path: np.ndarray} dict for npz persistence."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_params(template, flat: dict):
    """Inverse of flatten_params given a template pytree of same structure."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(str(p) for p in path)
        leaves.append(jnp.asarray(flat[key]))
    return jax.tree_util.tree_unflatten(treedef, leaves)
