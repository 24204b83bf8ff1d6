"""MADE — masked autoregressive dense networks (Germain et al. 2015).

The autoregressive conditioner inside MAF. The reference uses sbi/lampe's
torch MADE kernels (via `ili.utils.load_nde_*`); this is an independent JAX
implementation: masks are static numpy, the apply is two fused matmuls that
XLA maps onto the MXU, and conditioning context enters every layer unmasked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MADE_init", "MADE_apply", "made_masks"]


def made_masks(dim: int, hidden: tuple, n_out_per_dim: int):
    """Build MADE masks for input degrees 1..dim, sequential hidden degrees.

    Returns list of (in_deg, out_deg) masks; output layer mask uses strict
    inequality so output d depends only on inputs < d.
    """
    degrees = [np.arange(1, dim + 1)]
    for h in hidden:
        # hidden degrees cycle 1..dim-1 (no unit may exceed dim-1 usefully)
        degrees.append((np.arange(h) % max(dim - 1, 1)) + 1)
    masks = []
    for d_in, d_out in zip(degrees[:-1], degrees[1:]):
        masks.append((d_out[:, None] >= d_in[None, :]).astype(np.float32))
    out_deg = np.repeat(np.arange(1, dim + 1), n_out_per_dim)
    masks.append((out_deg[:, None] > degrees[-1][None, :]).astype(np.float32))
    return masks


def MADE_init(key, dim: int, context_dim: int, hidden: tuple,
              n_out_per_dim: int = 2):
    """Initialize one MADE block. Returns a params pytree; masks are stored
    as numpy constants inside (closed over statically at trace time)."""
    masks = made_masks(dim, hidden, n_out_per_dim)
    sizes = [dim] + list(hidden) + [dim * n_out_per_dim]
    params = {"w": [], "b": [], "cw": []}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        k1, k2 = jax.random.split(keys[i])
        scale = 1.0 / np.sqrt(n_in + context_dim + 1)
        params["w"].append(scale * jax.random.normal(k1, (n_out, n_in)))
        params["b"].append(jnp.zeros(n_out))
        params["cw"].append(
            scale * jax.random.normal(k2, (n_out, context_dim))
            if context_dim > 0
            else jnp.zeros((n_out, 0))
        )
    # final-layer weights start at 0 so the flow begins near identity
    params["w"][-1] = jnp.zeros_like(params["w"][-1])
    params["cw"][-1] = jnp.zeros_like(params["cw"][-1])
    return params, masks


def MADE_apply(params, masks, theta, context):
    """(..., dim), (..., context_dim) -> (..., dim * n_out_per_dim)."""
    h = theta
    n_layers = len(params["w"])
    for i in range(n_layers):
        w = params["w"][i] * jnp.asarray(masks[i])
        z = h @ w.T + params["b"][i]
        if context is not None and params["cw"][i].shape[1] > 0:
            z = z + context @ params["cw"][i].T
        h = jax.nn.relu(z) if i < n_layers - 1 else z
    return h
