"""Mixture density network (conditional mixture of full-covariance Gaussians).

Reference analogue: sbi's "mdn" model (Bishop 1994 MDN as used in SNPE-A/C;
loaded via ili, `/root/reference/src/synference/sbi_runner.py:4816-4861`).
Full covariances via Cholesky factors; log_prob and sampling are closed-form
single fused passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_mdn"]


def make_mdn(dim: int, context_dim: int, hidden_features: int = 50,
             num_components: int = 10, n_layers: int = 2):
    """Conditional MoG. Returns (init, log_prob, sample)."""
    n_tril = dim * (dim + 1) // 2
    n_out = num_components * (1 + dim + n_tril)
    tril_rows, tril_cols = np.tril_indices(dim)
    diag_pos = np.where(tril_rows == tril_cols)[0]

    def init(key):
        sizes = [context_dim] + [hidden_features] * n_layers + [n_out]
        params = []
        keys = jax.random.split(key, len(sizes) - 1)
        for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
            scale = np.sqrt(2.0 / a)
            params.append({
                "w": scale * jax.random.normal(keys[i], (b, a)),
                "b": jnp.zeros(b),
            })
        # zero-init the head so the initial mixture is ~ standard normal
        params[-1]["w"] = jnp.zeros_like(params[-1]["w"])
        # spread component means slightly so they can differentiate
        mu_slice = slice(num_components, num_components * (1 + dim))
        params[-1]["b"] = params[-1]["b"].at[mu_slice].set(
            0.1 * jax.random.normal(keys[-1], (num_components * dim,))
        )
        return {"mlp": params}

    def _heads(params, x):
        h = x
        mlp = params["mlp"]
        for i, layer in enumerate(mlp):
            h = h @ layer["w"].T + layer["b"]
            if i < len(mlp) - 1:
                h = jax.nn.relu(h)
        logits = h[..., :num_components]
        mus = h[
            ..., num_components : num_components * (1 + dim)
        ].reshape(h.shape[:-1] + (num_components, dim))
        tril_raw = h[..., num_components * (1 + dim) :].reshape(
            h.shape[:-1] + (num_components, n_tril)
        )
        return logits, mus, tril_raw

    _d_offset = float(np.log(np.expm1(1.0)))  # softplus^-1(1): unit diag at init

    def _tril_logdet(tril_raw):
        """Cholesky factor L from raw entries; returns (L, log|det Σ|/2)."""
        diag_raw = tril_raw[..., diag_pos]
        diag = 1.0e-3 + jax.nn.softplus(diag_raw + _d_offset)
        half_logdet = jnp.sum(jnp.log(diag), axis=-1)
        L = jnp.zeros(tril_raw.shape[:-1] + (dim, dim))
        L = L.at[..., tril_rows, tril_cols].set(tril_raw)
        L = L.at[..., np.arange(dim), np.arange(dim)].set(diag)
        return L, half_logdet

    _log_2pi = float(np.log(2.0 * np.pi))

    def log_prob(params, theta, x):
        theta = jnp.atleast_2d(theta)
        x = jnp.atleast_2d(x)
        logits, mus, tril_raw = _heads(params, x)
        L, half_logdet = _tril_logdet(tril_raw)
        diff = theta[:, None, :] - mus  # (B, K, D)
        # solve L y = diff  => y = L^-1 diff; mahalanobis = |y|^2
        y = jax.scipy.linalg.solve_triangular(
            L, diff[..., None], lower=True
        )[..., 0]
        maha = jnp.sum(y**2, axis=-1)
        log_comp = (
            -0.5 * maha - half_logdet - 0.5 * dim * _log_2pi
        )
        log_w = jax.nn.log_softmax(logits, axis=-1)
        return jax.scipy.special.logsumexp(log_w + log_comp, axis=-1)

    def sample(params, key, x, n):
        x = jnp.atleast_1d(x)
        xb = jnp.broadcast_to(x, (n,) + x.shape) if x.ndim == 1 else x
        logits, mus, tril_raw = _heads(params, xb)
        L, _ = _tril_logdet(tril_raw)
        k1, k2 = jax.random.split(key)
        comp = jax.random.categorical(k1, logits, axis=-1)  # (n,)
        eps = jax.random.normal(k2, (n, dim))
        mu_sel = jnp.take_along_axis(
            mus, comp[:, None, None].repeat(dim, -1), axis=1
        )[:, 0]
        L_sel = jnp.take_along_axis(
            L, comp[:, None, None, None].repeat(dim, -2).repeat(dim, -1), axis=1
        )[:, 0]
        return mu_sel + jnp.einsum("nij,nj->ni", L_sel, eps)

    return init, log_prob, sample
