"""Shared He-init MLP scaffold for flow conditioners/hypernetworks.

One implementation of the sizes/√(2/fan_in)/zero-final-layer pattern that
the coupling conditioners (nsf.py), the CNF velocity field, the UNAF
integrand, and the GF hypernetwork all use — the zero-initialized output
layer makes every flow start near the identity map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mlp_init", "mlp_apply"]


def mlp_init(key, sizes, zero_last: bool = True):
    """He-initialized dense stack; `sizes` = [in, hidden..., out]."""
    keys = jax.random.split(key, len(sizes) - 1)
    layers = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        scale = np.sqrt(2.0 / a)
        layers.append({
            "w": scale * jax.random.normal(keys[i], (b, a)),
            "b": jnp.zeros(b),
        })
    if zero_last:
        layers[-1]["w"] = jnp.zeros_like(layers[-1]["w"])
    return layers


def mlp_apply(layers, x, activation=jax.nn.relu):
    """Apply the stack; `activation` on every layer but the last."""
    h = x
    for i, layer in enumerate(layers):
        h = h @ layer["w"].T + layer["b"]
        if i < len(layers) - 1:
            h = activation(h)
    return h
