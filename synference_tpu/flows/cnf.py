"""Continuous normalizing flow (CNF / FFJORD-style), conditional.

Reference zoo analogue: lampe's "cnf"
(`/root/reference/src/synference/sbi_runner.py:4816-4861`). Torch CNFs use
adaptive ODE solvers with stochastic (Hutchinson) trace estimates; on TPU we
want static shapes and straight-line programs, so this uses

* a FIXED-step RK4 integrator expressed as one `lax.scan` (compiles to a
  single fused loop, no host round-trips), and
* the EXACT Jacobian trace via `jax.jvp` against the D basis vectors — for
  SED-fitting θ dims (≲ 20) that is cheaper and lower-variance than
  Hutchinson.

log p(θ|x) = log N(z(1)) + ∫₀¹ tr(∂f/∂z) dt with dz/dt = f(z, t, x);
sampling integrates the same field backward from base draws.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import mlp_apply, mlp_init

__all__ = ["make_cnf"]

_LOG_2PI = float(np.log(2.0 * np.pi))


def make_cnf(dim: int, context_dim: int, hidden_features: int = 64,
             n_layers: int = 3, num_steps: int = 16,
             time_embed: int = 4):
    """Conditional CNF. Returns (init, log_prob, sample).

    num_steps: fixed RK4 steps over t ∈ [0, 1]. 16 is accurate to ~1e-5 in
    log-prob for smooth trained fields; raise for sharper posteriors.
    """

    freqs = np.pi * 2.0 ** np.arange(time_embed // 2, dtype=np.float32) \
        if time_embed > 0 else np.zeros(0, np.float32)
    t_feats = time_embed if time_embed > 0 else 1

    def init(key):
        sizes = ([dim + context_dim + t_feats]
                 + [hidden_features] * n_layers + [dim])
        # zero-init output layer: the flow starts as the identity map
        return {"layers": mlp_init(key, sizes)}

    def _t_embed(t, batch_shape):
        if time_embed > 0:
            e = jnp.concatenate([jnp.sin(freqs * t), jnp.cos(freqs * t)])
        else:
            e = jnp.asarray([t])
        return jnp.broadcast_to(e, batch_shape + (e.shape[0],))

    def field(params, h, t, x):
        """Velocity f(h, t, x): (B, D) -> (B, D)."""
        z = jnp.concatenate([h, x, _t_embed(t, h.shape[:-1])], axis=-1)
        return mlp_apply(params["layers"], z, activation=jnp.tanh)

    eye = jnp.eye(dim)

    def field_and_trace(params, h, t, x):
        """f and exact tr(∂f/∂h) via D forward-mode JVPs."""
        def f(hh):
            return field(params, hh, t, x)

        def one(e):
            y, jv = jax.jvp(f, (h,), (jnp.broadcast_to(e, h.shape),))
            return y, jnp.sum(jv * e, axis=-1)

        ys, traces = jax.vmap(one)(eye)
        return ys[0], jnp.sum(traces, axis=0)

    dt = 1.0 / num_steps
    ts = jnp.arange(num_steps, dtype=jnp.float32) * dt

    def _rk4(params, h0, x, reverse: bool):
        """Integrate (z, logdet) jointly with RK4 over the fixed grid.

        Reverse integration is forward integration of the negated,
        time-reflected field g(h, t) = −f(h, 1−t) — same straight-line
        program either direction.
        """

        def ft(h, t):
            y, tr = field_and_trace(params, h, 1.0 - t if reverse else t, x)
            return (-y, -tr) if reverse else (y, tr)

        def step(carry, t):
            h, ld = carry
            k1, tr1 = ft(h, t)
            k2, tr2 = ft(h + 0.5 * dt * k1, t + 0.5 * dt)
            k3, tr3 = ft(h + 0.5 * dt * k2, t + 0.5 * dt)
            k4, tr4 = ft(h + dt * k3, t + dt)
            h = h + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            ld = ld + (dt / 6.0) * (tr1 + 2 * tr2 + 2 * tr3 + tr4)
            return (h, ld), None

        (h, ld), _ = jax.lax.scan(step, (h0, jnp.zeros(h0.shape[:-1])), ts)
        return h, ld

    def log_prob(params, theta, x):
        theta = jnp.atleast_2d(theta)
        x = jnp.atleast_2d(x)
        z, ld = _rk4(params, theta, x, reverse=False)
        base = -0.5 * jnp.sum(z**2, axis=-1) - 0.5 * dim * _LOG_2PI
        return base + ld

    def sample(params, key, x, n):
        x = jnp.atleast_1d(x)
        xb = jnp.broadcast_to(x, (n,) + x.shape) if x.ndim == 1 else x
        z = jax.random.normal(key, (n, dim))
        h, _ = _rk4(params, z, xb, reverse=True)
        return h

    return init, log_prob, sample
