"""Neural spline flow — rational-quadratic coupling (Durkan et al. 2019).

Reference analogue: sbi's "nsf" loaded via ili
(`/root/reference/src/synference/sbi_runner.py:4816-4861`; the tuned paper
config is NSF hidden 69 / 15 transforms, `examples/sbi/configs/
best_params.yaml`). Coupling (not autoregressive) so both log_prob and
sampling are single fused passes — the right trade for TPU where sampling
throughput matters (reference samples per-object in a Python loop,
`sbi_runner.py:6412-6424`; here sampling is one batched program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import mlp_apply, mlp_init

__all__ = ["make_nsf", "make_ncsf", "rqs_forward", "rqs_inverse"]

_MIN_W = 1.0e-3  # min bin width/height fraction
_MIN_D = 1.0e-3  # min derivative
_D_OFFSET = float(np.log(np.expm1(1.0 - _MIN_D)))  # softplus^-1(1 - min)


def _spline_params(raw, n_bins, tail_bound, circular=False):
    """Split conditioner output into normalized widths/heights/derivs.

    raw: (..., 3K+1). Returns cumwidths (...,K+1), cumheights (...,K+1),
    derivs (...,K+1) with linear-tail boundary derivatives = 1; with
    `circular`, the two boundary derivatives are instead tied to one learned
    positive value (periodic C¹ continuity, Durkan et al. circular splines).
    """
    w_raw = raw[..., :n_bins]
    h_raw = raw[..., n_bins : 2 * n_bins]
    d_raw = raw[..., 2 * n_bins :]  # K+1 interior derivatives incl. ends
    widths = jax.nn.softmax(w_raw, axis=-1)
    widths = _MIN_W + (1.0 - _MIN_W * n_bins) * widths
    heights = jax.nn.softmax(h_raw, axis=-1)
    heights = _MIN_W + (1.0 - _MIN_W * n_bins) * heights
    cumw = jnp.cumsum(widths, axis=-1)
    cumw = jnp.concatenate([jnp.zeros_like(cumw[..., :1]), cumw], axis=-1)
    cumw = 2.0 * tail_bound * cumw - tail_bound
    cumh = jnp.cumsum(heights, axis=-1)
    cumh = jnp.concatenate([jnp.zeros_like(cumh[..., :1]), cumh], axis=-1)
    cumh = 2.0 * tail_bound * cumh - tail_bound
    # offset chosen so raw = 0 gives derivative exactly 1 (identity init)
    derivs = _MIN_D + jax.nn.softplus(d_raw + _D_OFFSET)
    if circular:
        # one learned boundary derivative shared by both ends
        edge = derivs[..., :1]
        derivs = jnp.concatenate([edge, derivs[..., 1:-1], edge], axis=-1)
    else:
        # boundary derivatives pinned to 1 for continuity with linear tails
        ones = jnp.ones_like(derivs[..., :1])
        derivs = jnp.concatenate([ones, derivs[..., 1:-1], ones], axis=-1)
    return cumw, cumh, derivs, 2.0 * tail_bound * widths, 2.0 * tail_bound * heights


def _bin_onehot(cum, x):
    """One-hot of the bin containing x over knots (...,K+1) -> (...,K).

    TPU-friendly: bin membership as a product of comparisons instead of
    searchsorted+gather (gathers serialize poorly on the VPU)."""
    ge_lo = x[..., None] >= cum[..., :-1]
    lt_hi = x[..., None] < cum[..., 1:]
    oh = (ge_lo & lt_hi).astype(x.dtype)
    # clamp outside-range points into the edge bins
    none_hot = 1.0 - jnp.sum(oh, axis=-1, keepdims=True)
    below = (x[..., None] < cum[..., :1]).astype(x.dtype)
    first = jnp.zeros_like(oh).at[..., 0].set(1.0)
    last = jnp.zeros_like(oh).at[..., -1].set(1.0)
    return oh + none_hot * jnp.where(below > 0, first, last)


def _sel(a, oh):
    """Select per-bin values: (...,K) coefficients × one-hot -> (...,)."""
    return jnp.sum(a * oh, axis=-1)


def rqs_forward(x, raw, n_bins, tail_bound, circular=False):
    """Elementwise RQ spline x -> y with log|dy/dx|; identity tails
    (or periodic wrapping when `circular`)."""
    cumw, cumh, derivs, widths, heights = _spline_params(
        raw, n_bins, tail_bound, circular)
    if circular:
        xc = jnp.mod(x + tail_bound, 2.0 * tail_bound) - tail_bound
        inside = jnp.ones_like(x, bool)
    else:
        inside = (x > -tail_bound) & (x < tail_bound)
        xc = jnp.clip(x, -tail_bound, tail_bound)
    oh = _bin_onehot(cumw, xc)
    xk = _sel(cumw[..., :-1], oh)
    wk = _sel(widths, oh)
    hk = _sel(heights, oh)
    yk = _sel(cumh[..., :-1], oh)
    dk = _sel(derivs[..., :-1], oh)
    dk1 = _sel(derivs[..., 1:], oh)
    sk = hk / wk
    xi = jnp.clip((xc - xk) / wk, 0.0, 1.0)
    xi1m = 1.0 - xi
    denom = sk + (dk1 + dk - 2.0 * sk) * xi * xi1m
    y = yk + hk * (sk * xi**2 + dk * xi * xi1m) / denom
    logdet = (
        2.0 * jnp.log(sk)
        + jnp.log(dk1 * xi**2 + 2.0 * sk * xi * xi1m + dk * xi1m**2)
        - 2.0 * jnp.log(denom)
    )
    y = jnp.where(inside, y, x)
    logdet = jnp.where(inside, logdet, 0.0)
    return y, logdet


def rqs_inverse(y, raw, n_bins, tail_bound, circular=False):
    """Elementwise RQ spline inverse y -> x with log|dx/dy|."""
    cumw, cumh, derivs, widths, heights = _spline_params(
        raw, n_bins, tail_bound, circular)
    if circular:
        yc = jnp.mod(y + tail_bound, 2.0 * tail_bound) - tail_bound
        inside = jnp.ones_like(y, bool)
    else:
        inside = (y > -tail_bound) & (y < tail_bound)
        yc = jnp.clip(y, -tail_bound, tail_bound)
    oh = _bin_onehot(cumh, yc)
    xk = _sel(cumw[..., :-1], oh)
    wk = _sel(widths, oh)
    hk = _sel(heights, oh)
    yk = _sel(cumh[..., :-1], oh)
    dk = _sel(derivs[..., :-1], oh)
    dk1 = _sel(derivs[..., 1:], oh)
    sk = hk / wk
    dy = yc - yk
    # solve a xi^2 + b xi + c = 0 (Durkan et al. eq. 6-8)
    a = hk * (sk - dk) + dy * (dk1 + dk - 2.0 * sk)
    b = hk * dk - dy * (dk1 + dk - 2.0 * sk)
    c = -sk * dy
    disc = jnp.maximum(b**2 - 4.0 * a * c, 0.0)
    xi = 2.0 * c / (-b - jnp.sqrt(disc))
    xi = jnp.clip(xi, 0.0, 1.0)
    x = xk + xi * wk
    xi1m = 1.0 - xi
    denom = sk + (dk1 + dk - 2.0 * sk) * xi * xi1m
    logdet_fwd = (
        2.0 * jnp.log(sk)
        + jnp.log(dk1 * xi**2 + 2.0 * sk * xi * xi1m + dk * xi1m**2)
        - 2.0 * jnp.log(denom)
    )
    x = jnp.where(inside, x, y)
    logdet = jnp.where(inside, -logdet_fwd, 0.0)
    return x, logdet


def _mlp_init(key, n_in, n_out, hidden, n_layers):
    # zero-init final layer -> identity flow at start (see flows/mlp.py)
    return mlp_init(key, [n_in] + [hidden] * n_layers + [n_out])


_mlp_apply = mlp_apply


def make_affine_coupling(dim: int, context_dim: int,
                         hidden_features: int = 50,
                         num_transforms: int = 5, n_layers: int = 2,
                         clamp_log_scale: float = 4.0):
    """RealNVP-style affine coupling flow (reference zoo's simpler coupling
    models). Same permutation/conditioner machinery as make_nsf with an
    affine (scale+shift) transform instead of splines."""
    half_a = dim // 2 if dim > 1 else 0
    half_b = dim - half_a
    rng = np.random.default_rng(11)
    perms = []
    for t in range(num_transforms):
        if t % 2 == 0:
            perms.append(rng.permutation(dim))
        else:
            perms.append(perms[-1][::-1].copy())
    inv_perms = [np.argsort(p) for p in perms]

    def init(key):
        keys = jax.random.split(key, num_transforms)
        blocks = [
            _mlp_init(keys[t], max(half_a + context_dim, 1), 2 * half_b,
                      hidden_features, n_layers)
            for t in range(num_transforms)
        ]
        return {"blocks": blocks}

    def _cond(ta, x):
        parts = ([ta] if half_a > 0 else []) + ([x] if context_dim > 0 else [])
        if not parts:
            parts = [jnp.ones(x.shape[:-1] + (1,))]
        return jnp.concatenate(parts, axis=-1)

    def _fwd(bp, theta, x):
        ta, tb = theta[..., :half_a], theta[..., half_a:]
        raw = _mlp_apply(bp, _cond(ta, x))
        s, t = raw[..., :half_b], raw[..., half_b:]
        s = jnp.clip(s, -clamp_log_scale, clamp_log_scale)
        yb = tb * jnp.exp(s) + t
        return jnp.concatenate([ta, yb], -1), jnp.sum(s, axis=-1)

    def _inv(bp, y, x):
        ya, yb = y[..., :half_a], y[..., half_a:]
        raw = _mlp_apply(bp, _cond(ya, x))
        s, t = raw[..., :half_b], raw[..., half_b:]
        s = jnp.clip(s, -clamp_log_scale, clamp_log_scale)
        tb = (yb - t) * jnp.exp(-s)
        return jnp.concatenate([ya, tb], -1), -jnp.sum(s, axis=-1)

    _log_2pi = float(np.log(2.0 * np.pi))

    def log_prob(params, theta, x):
        theta = jnp.atleast_2d(theta)
        x = jnp.atleast_2d(x)
        total = jnp.zeros(theta.shape[0])
        h = theta
        for t in range(num_transforms):
            h = h[..., perms[t]]
            h, ld = _fwd(params["blocks"][t], h, x)
            total = total + ld
        return total - 0.5 * jnp.sum(h**2, -1) - 0.5 * dim * _log_2pi

    def sample(params, key, x, n):
        x = jnp.atleast_1d(x)
        xb = jnp.broadcast_to(x, (n,) + x.shape) if x.ndim == 1 else x
        h = jax.random.normal(key, (n, dim))
        for t in reversed(range(num_transforms)):
            h, _ = _inv(params["blocks"][t], h, xb)
            h = h[..., inv_perms[t]]
        return h

    return init, log_prob, sample


def make_nsf(dim: int, context_dim: int, hidden_features: int = 50,
             num_transforms: int = 5, num_bins: int = 8,
             tail_bound: float = 3.5, n_layers: int = 2):
    """Conditional coupling-RQS flow. Returns (init, log_prob, sample).

    For dim == 1 the coupling has no pass-through half; the conditioner then
    depends on the context only (an "autoregressive" 1-D spline).
    """
    n_raw = 3 * num_bins + 1
    half_a = dim // 2 if dim > 1 else 0
    half_b = dim - half_a

    # Pair each random permutation with its reverse so every coordinate
    # falls in the transformed half at least once per two layers (a purely
    # random perm sequence can leave a coordinate untransformed).
    rng = np.random.default_rng(7)
    perms = []
    for t in range(num_transforms):
        if t % 2 == 0:
            p = rng.permutation(dim)
            perms.append(p)
        else:
            perms.append(perms[-1][::-1].copy())
    inv_perms = [np.argsort(p) for p in perms]

    def init(key):
        keys = jax.random.split(key, num_transforms)
        blocks = []
        for t in range(num_transforms):
            n_in = half_a + context_dim
            n_out = half_b * n_raw
            blocks.append(
                _mlp_init(keys[t], max(n_in, 1), n_out, hidden_features, n_layers)
            )
        return {"blocks": blocks}

    def _cond_input(theta_a, x):
        parts = []
        if half_a > 0:
            parts.append(theta_a)
        if context_dim > 0:
            parts.append(x)
        if not parts:
            parts = [jnp.ones(x.shape[:-1] + (1,))]
        return jnp.concatenate(parts, axis=-1)

    def _block_forward(bparams, theta, x):
        ta, tb = theta[..., :half_a], theta[..., half_a:]
        raw = _mlp_apply(bparams, _cond_input(ta, x))
        raw = raw.reshape(raw.shape[:-1] + (half_b, n_raw))
        yb, ld = rqs_forward(tb, raw, num_bins, tail_bound)
        y = jnp.concatenate([ta, yb], axis=-1)
        return y, jnp.sum(ld, axis=-1)

    def _block_inverse(bparams, y, x):
        ya, yb = y[..., :half_a], y[..., half_a:]
        raw = _mlp_apply(bparams, _cond_input(ya, x))
        raw = raw.reshape(raw.shape[:-1] + (half_b, n_raw))
        tb, ld = rqs_inverse(yb, raw, num_bins, tail_bound)
        theta = jnp.concatenate([ya, tb], axis=-1)
        return theta, jnp.sum(ld, axis=-1)

    _log_2pi = float(np.log(2.0 * np.pi))

    def log_prob(params, theta, x):
        theta = jnp.atleast_2d(theta)
        x = jnp.atleast_2d(x)
        total = jnp.zeros(theta.shape[0])
        h = theta
        for t in range(num_transforms):
            h = h[..., perms[t]]
            h, ld = _block_forward(params["blocks"][t], h, x)
            total = total + ld
        return total - 0.5 * jnp.sum(h**2, axis=-1) - 0.5 * dim * _log_2pi

    def sample(params, key, x, n):
        x = jnp.atleast_1d(x)
        xb = jnp.broadcast_to(x, (n,) + x.shape) if x.ndim == 1 else x
        h = jax.random.normal(key, (n, dim))
        for t in reversed(range(num_transforms)):
            h, _ = _block_inverse(params["blocks"][t], h, xb)
            h = h[..., inv_perms[t]]
        return h

    return init, log_prob, sample


def make_ncsf(dim: int, context_dim: int, hidden_features: int = 50,
              num_transforms: int = 5, num_bins: int = 8,
              tail_bound: float = 5.0, n_layers: int = 2):
    """Neural circular spline flow (lampe zoo "ncsf",
    `/root/reference/src/synference/sbi_runner.py:4858`).

    Coupling RQ splines with PERIODIC boundary conditions over
    [-tail_bound, tail_bound): inputs wrap, the two boundary derivatives are
    tied to one learned value, and the base density is uniform on the box —
    i.e. a normalizing flow on the torus. Intended for periodic/compact
    parameters (standardized θ lives well inside ±5σ, so wrapping is benign
    for bounded SED parameters too).
    """
    n_raw = 3 * num_bins + 1
    half_a = dim // 2 if dim > 1 else 0
    half_b = dim - half_a
    period = 2.0 * tail_bound

    rng = np.random.default_rng(13)
    perms = []
    for t in range(num_transforms):
        if t % 2 == 0:
            perms.append(rng.permutation(dim))
        else:
            perms.append(perms[-1][::-1].copy())
    inv_perms = [np.argsort(p) for p in perms]

    def init(key):
        keys = jax.random.split(key, num_transforms)
        return {"blocks": [
            _mlp_init(keys[t], max(half_a + context_dim, 1),
                      half_b * n_raw, hidden_features, n_layers)
            for t in range(num_transforms)
        ]}

    def _cond(ta, x):
        parts = ([ta] if half_a > 0 else []) + ([x] if context_dim > 0 else [])
        if not parts:
            parts = [jnp.ones(x.shape[:-1] + (1,))]
        return jnp.concatenate(parts, axis=-1)

    _log_box = float(dim * np.log(period))

    def log_prob(params, theta, x):
        theta = jnp.atleast_2d(theta)
        x = jnp.atleast_2d(x)
        total = jnp.zeros(theta.shape[0])
        h = jnp.mod(theta + tail_bound, period) - tail_bound
        for t in range(num_transforms):
            h = h[..., perms[t]]
            ta, tb = h[..., :half_a], h[..., half_a:]
            raw = _mlp_apply(params["blocks"][t], _cond(ta, x))
            raw = raw.reshape(raw.shape[:-1] + (half_b, n_raw))
            yb, ld = rqs_forward(tb, raw, num_bins, tail_bound, circular=True)
            h = jnp.concatenate([ta, yb], axis=-1)
            total = total + jnp.sum(ld, axis=-1)
        return total - _log_box

    def sample(params, key, x, n):
        x = jnp.atleast_1d(x)
        xb = jnp.broadcast_to(x, (n,) + x.shape) if x.ndim == 1 else x
        h = jax.random.uniform(key, (n, dim), minval=-tail_bound,
                               maxval=tail_bound)
        for t in reversed(range(num_transforms)):
            ya, yb = h[..., :half_a], h[..., half_a:]
            raw = _mlp_apply(params["blocks"][t], _cond(ya, xb))
            raw = raw.reshape(raw.shape[:-1] + (half_b, n_raw))
            tb, _ = rqs_inverse(yb, raw, num_bins, tail_bound, circular=True)
            h = jnp.concatenate([ya, tb], axis=-1)
            h = h[..., inv_perms[t]]
        return h

    return init, log_prob, sample
