"""Masked autoregressive flow (Papamakarios et al. 2017), conditional.

Reference analogue: `load_nde_sbi(model="maf")` torch flows
(`/root/reference/src/synference/sbi_runner.py:5119-5146`). Training-time
log_prob is a single fused pass per block (the autoregressive direction);
sampling inverts sequentially over the (small) parameter dimension with a
`lax.fori_loop`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .made import MADE_apply, MADE_init

__all__ = ["make_maf"]

_LOG_2PI = float(np.log(2.0 * np.pi))


def make_maf(dim: int, context_dim: int, hidden_features: int = 50,
             num_transforms: int = 5, n_layers: int = 2,
             clamp_log_scale: float = 5.0):
    """Build a conditional MAF. Returns (init, log_prob, sample, sample_one).

    init(key) -> params
    log_prob(params, theta (B,D), x (B,C)) -> (B,)
    sample(params, key, x (C,), n) -> (n, D)
    """
    hidden = tuple([hidden_features] * n_layers)
    # fixed alternating permutations (reverse), matching common MAF practice
    perms = []
    p = np.arange(dim)
    for _ in range(num_transforms):
        p = p[::-1].copy()
        perms.append(p.copy())
    inv_perms = [np.argsort(p) for p in perms]

    def init(key):
        keys = jax.random.split(key, num_transforms)
        blocks = []
        for k in keys:
            params, _ = MADE_init(k, dim, context_dim, hidden, 2)
            blocks.append(params)
        return {"blocks": blocks}

    # masks are deterministic given (dim, hidden): build once statically
    _, static_masks = MADE_init(jax.random.PRNGKey(0), dim, context_dim, hidden, 2)

    def _block_forward(bparams, theta, x):
        """θ -> z for one block; returns (z, logdet (B,))."""
        out = MADE_apply(bparams, static_masks, theta, x)
        mu, log_s = out[..., 0::2], out[..., 1::2]
        log_s = jnp.clip(log_s, -clamp_log_scale, clamp_log_scale)
        z = (theta - mu) * jnp.exp(-log_s)
        return z, -jnp.sum(log_s, axis=-1)

    def log_prob(params, theta, x):
        theta = jnp.atleast_2d(theta)
        x = jnp.atleast_2d(x)
        total = jnp.zeros(theta.shape[0])
        h = theta
        for t in range(num_transforms):
            h = h[..., perms[t]]
            h, ld = _block_forward(params["blocks"][t], h, x)
            total = total + ld
        total = total - 0.5 * jnp.sum(h**2, axis=-1) - 0.5 * dim * _LOG_2PI
        return total

    def _block_inverse(bparams, z, x):
        """z -> θ sequentially: θ_d depends on θ_<d."""
        def body(d, theta):
            out = MADE_apply(bparams, static_masks, theta, x)
            mu, log_s = out[..., 0::2], out[..., 1::2]
            log_s = jnp.clip(log_s, -clamp_log_scale, clamp_log_scale)
            new = mu[..., d] + z[..., d] * jnp.exp(log_s[..., d])
            return theta.at[..., d].set(new)

        theta0 = jnp.zeros_like(z)
        return jax.lax.fori_loop(0, dim, body, theta0)

    def sample(params, key, x, n):
        x = jnp.atleast_1d(x)
        xb = jnp.broadcast_to(x, (n,) + x.shape) if x.ndim == 1 else x
        z = jax.random.normal(key, (n, dim))
        h = z
        for t in reversed(range(num_transforms)):
            h = _block_inverse(params["blocks"][t], h, xb)
            h = h[..., inv_perms[t]]
        return h

    return init, log_prob, sample
