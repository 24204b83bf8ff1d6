"""Monotone-transformer flows: NAF, UNAF, SOSPF, and Gaussianization (GF).

These fill out the reference's lampe model zoo
(`/root/reference/src/synference/sbi_runner.py:4816-4861`: "lampe = mdn, maf,
nsf, ncsf, cnf, nice, sospf, gf, naf[, unaf]") with independent JAX
implementations sharing one TPU-friendly scaffold:

* an autoregressive MADE conditioner emits per-dimension transformer
  parameters in ONE fused pass (training-time log_prob is matmuls on the MXU);
* the elementwise transformer T(x; p) is strictly monotone with a closed-form
  derivative, so log_prob is exact;
* sampling inverts T by fixed-iteration bisection inside the usual
  dim-sequential `fori_loop` — no data-dependent control flow, everything
  jits and vmaps (the reference relies on torch autograd root-finders here).

Transformers:
  NAF   — deep sigmoidal flow (Huang et al. 2018): logit of a convex
          combination of sigmoids.
  UNAF  — unconstrained monotone NN (Wehenkel & Louppe 2019): integral of a
          positive MLP, evaluated by fixed Gauss–Legendre quadrature.
  SOSPF — sum-of-squares polynomial flow (Jaini et al. 2019): closed-form
          integral of a sum of squared polynomials (plus a positive linear
          term so zero-init is near-identity).
  GF    — Gaussianization flow (Meng et al. 2020): elementwise
          mixture-of-logistics CDF → probit, alternated with trainable
          Householder rotations; context enters through a hypernetwork.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .made import MADE_apply, MADE_init
from .mlp import mlp_apply, mlp_init

__all__ = ["make_naf", "make_unaf", "make_sospf", "make_gf"]

_LOG_2PI = float(np.log(2.0 * np.pi))
_BISECT_LO, _BISECT_HI = -512.0, 512.0
_BISECT_ITERS = 50  # 1024 / 2^50 ≈ 1e-12, far below fp32 resolution


def _bisect_inverse(transformer, y, p):
    """Solve T(x; p) = y for monotone-increasing T by fixed bisection.

    transformer(x (...,D), p (...,D,n_p)) -> (T(x), logdet). Static
    iteration count keeps this a straight-line XLA program.
    """
    lo = jnp.full_like(y, _BISECT_LO)
    hi = jnp.full_like(y, _BISECT_HI)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        t, _ = transformer(mid, p)
        below = t < y
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    return 0.5 * (lo + hi)


def _make_autoregressive(dim, context_dim, n_p, hidden, num_transforms,
                         block_transformer, extra_init=None):
    """Shared scaffold: MADE conditioner -> per-dim monotone transformer.

    block_transformer(params, t) -> transformer for block t, where
    transformer(x (...,D), p (...,D,n_p)) -> (y (...,D), logdet (...,D)).
    extra_init(key) optionally adds non-MADE params (e.g. UNAF's integrand).
    Returns the standard (init, log_prob, sample) triple.
    """
    perms = []
    q = np.arange(dim)
    for _ in range(num_transforms):
        q = q[::-1].copy()
        perms.append(q.copy())
    inv_perms = [np.argsort(q) for q in perms]

    _, static_masks = MADE_init(jax.random.PRNGKey(0), dim, context_dim,
                                hidden, n_p)

    def init(key):
        k_blocks, k_extra = jax.random.split(key)
        keys = jax.random.split(k_blocks, num_transforms)
        blocks = []
        for k in keys:
            params, _ = MADE_init(k, dim, context_dim, hidden, n_p)
            blocks.append(params)
        out = {"blocks": blocks}
        if extra_init is not None:
            out.update(extra_init(k_extra))
        return out

    def _params_for(bparams, theta, x):
        out = MADE_apply(bparams, static_masks, theta, x)
        return out.reshape(out.shape[:-1] + (dim, n_p))

    def log_prob(params, theta, x):
        theta = jnp.atleast_2d(theta)
        x = jnp.atleast_2d(x)
        total = jnp.zeros(theta.shape[0])
        h = theta
        for t in range(num_transforms):
            transformer = block_transformer(params, t)
            h = h[..., perms[t]]
            p = _params_for(params["blocks"][t], h, x)
            h, ld = transformer(h, p)
            total = total + jnp.sum(ld, axis=-1)
        return total - 0.5 * jnp.sum(h**2, axis=-1) - 0.5 * dim * _LOG_2PI

    def sample(params, key, x, n):
        x = jnp.atleast_1d(x)
        xb = jnp.broadcast_to(x, (n,) + x.shape) if x.ndim == 1 else x
        h = jax.random.normal(key, (n, dim))
        for t in reversed(range(num_transforms)):
            transformer = block_transformer(params, t)
            bparams = params["blocks"][t]
            z = h

            def body(d, theta, _bp=bparams, _tr=transformer, _z=z):
                p = _params_for(_bp, theta, xb)
                zd = _z[..., d][..., None]            # (n, 1)
                pd = p[..., d, :][..., None, :]       # (n, 1, n_p)
                x_d = _bisect_inverse(_tr, zd, pd)[..., 0]
                return theta.at[..., d].set(x_d)

            h = jax.lax.fori_loop(0, dim, body, jnp.zeros_like(z))
            h = h[..., inv_perms[t]]
        return h

    return init, log_prob, sample


# ---------------------------------------------------------------------------
# NAF — deep sigmoidal flow
# ---------------------------------------------------------------------------
def make_naf(dim: int, context_dim: int, hidden_features: int = 50,
             num_transforms: int = 3, n_layers: int = 2,
             num_components: int = 8):
    """Deep sigmoidal flow: T(x) = logit(Σ_k w_k σ(s_k x + b_k)).

    w = softmax, s = softplus — strictly monotone; zero-initialized MADE
    output gives T(x) ≈ 0.69·x (a stable near-affine start).
    """
    K = num_components
    eps = 1.0e-6

    def transformer(xv, p):
        w = jax.nn.softmax(p[..., :K], axis=-1)
        s = jax.nn.softplus(p[..., K : 2 * K]) + eps
        b = p[..., 2 * K :]
        arg = s * xv[..., None] + b
        sig = jax.nn.sigmoid(arg)
        u = jnp.clip(jnp.sum(w * sig, axis=-1), eps, 1.0 - eps)
        y = jnp.log(u) - jnp.log1p(-u)
        du = jnp.sum(w * s * sig * (1.0 - sig), axis=-1)
        ld = jnp.log(du + 1.0e-20) - jnp.log(u) - jnp.log1p(-u)
        return y, ld

    return _make_autoregressive(dim, context_dim, 3 * K,
                                tuple([hidden_features] * n_layers),
                                num_transforms, lambda params, t: transformer)


# ---------------------------------------------------------------------------
# UNAF — unconstrained monotone NN (UMNN)
# ---------------------------------------------------------------------------
def make_unaf(dim: int, context_dim: int, hidden_features: int = 50,
              num_transforms: int = 3, n_layers: int = 2,
              embed_dim: int = 8, integrand_hidden: int = 32,
              n_quad: int = 24):
    """UMNN transformer: T(x) = b₀ + ∫₀ˣ g(t, h) dt with g a positive MLP.

    The MADE conditioner emits a per-dim embedding h (and offset b₀); the
    per-block integrand g is evaluated at fixed Gauss–Legendre nodes, so the
    quadrature is one batched MLP call over (..., D, Q) points — static
    shapes, MXU-friendly. Inversion is the scaffold's bisection.
    """
    E = embed_dim
    nodes, weights = np.polynomial.legendre.leggauss(n_quad)
    nodes = jnp.asarray(nodes, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)

    def g_init(key):
        return mlp_init(key, [1 + E, integrand_hidden, integrand_hidden, 1],
                        zero_last=False)

    def g_apply(gp, t, h):
        # t (..., Q), h (..., E) -> positive integrand (..., Q)
        hq = jnp.broadcast_to(h[..., None, :], t.shape + (h.shape[-1],))
        z = jnp.concatenate([t[..., None], hq], axis=-1)
        z = mlp_apply(gp, z, activation=jnp.tanh)
        return jax.nn.elu(z[..., 0]) + 1.0 + 1.0e-4

    def extra_init(key):
        return {"g": [g_init(k)
                      for k in jax.random.split(key, num_transforms)]}

    def block_transformer(params, t):
        gp = params["g"][t]

        def transformer(xv, p):
            h, b0 = p[..., :E], p[..., E]
            half = 0.5 * xv
            tq = half[..., None] * (nodes + 1.0)  # (..., Q) spanning [0, x]
            integral = half * jnp.sum(weights * g_apply(gp, tq, h), axis=-1)
            y = b0 + integral
            ld = jnp.log(g_apply(gp, xv[..., None], h)[..., 0])
            return y, ld

        return transformer

    return _make_autoregressive(dim, context_dim, E + 1,
                                tuple([hidden_features] * n_layers),
                                num_transforms, block_transformer, extra_init)


# ---------------------------------------------------------------------------
# SOSPF — sum-of-squares polynomial flow
# ---------------------------------------------------------------------------
def make_sospf(dim: int, context_dim: int, hidden_features: int = 50,
               num_transforms: int = 3, n_layers: int = 2,
               num_polys: int = 2, poly_degree: int = 2):
    """T(x) = c + softplus(λ)·x + Σ_k ∫₀ˣ P_k(t)² dt, P_k degree-R polys.

    The integral is closed form: Σ_{l,m} a_l a_m x^{l+m+1}/(l+m+1).
    Derivative Σ_k P_k(x)² ≥ 0 plus the softplus(λ) linear floor keeps T
    strictly monotone; zero-init gives T(x) ≈ 0.69·x.
    """
    K, R = num_polys, poly_degree
    n_p = K * (R + 1) + 2  # coeffs + c + lambda
    lpow = np.arange(R + 1)
    inv_lm = jnp.asarray(1.0 / (lpow[:, None] + lpow[None, :] + 1.0),
                         jnp.float32)

    sat = 4.0  # saturation scale of the polynomial argument

    def transformer(xv, p):
        # Stability: the raw x^{2R+1} integral explodes through stacked
        # transforms (x→1e3 in layer 1 ⇒ x⁵→1e15 in layer 2 ⇒ inf by
        # layer 3 — NaN'd training at scale). Evaluate the polynomial on a
        # SATURATING argument x̃ = B·tanh(x/B): the λ·x floor gives linear
        # tails (NSF's identity-tail pattern), monotonicity is preserved
        # (d/dx ∫P(x̃)² dx̃ = P(x̃)²·sech²(x/B) ≥ 0), and coefficients are
        # tanh-bounded so the in-range curvature stays O(1).
        a = 0.3 * jnp.tanh(
            p[..., : K * (R + 1)].reshape(p.shape[:-1] + (K, R + 1)))
        c = p[..., K * (R + 1)]
        # clamp the linear slope: an unbounded softplus(raw) cascades
        # multiplicatively through stacked transforms (λ₁λ₂λ₃·x → inf)
        lam = jax.nn.softplus(
            jnp.clip(p[..., K * (R + 1) + 1], -10.0, 3.0)) + 1.0e-4
        t = jnp.tanh(xv / sat)
        xs = sat * t  # x̃ ∈ (−B, B)
        # powers by iterated multiplication: jnp.power(x, float_k) lowers to
        # exp(k·log x) paths whose GRADIENT is NaN at x = 0 (0·inf) and for
        # negative bases on some backends — multiplies are clean everywhere
        pows = [jnp.ones_like(xs)]
        for _ in range(R):
            pows.append(pows[-1] * xs)
        xpow = jnp.stack(pows, axis=-1)  # (..., R+1), xs^0..xs^R
        # x^{l+m+1} = x^l · x^m · x
        x_lm = (xpow[..., :, None] * xpow[..., None, :]
                * xs[..., None, None])
        quad = jnp.einsum("...kl,...km,...lm->...", a, a, inv_lm * x_lm)
        y = c + lam * xv + quad
        pk = jnp.einsum("...kl,...l->...k", a, xpow)
        deriv = lam + jnp.sum(pk**2, axis=-1) * (1.0 - t**2)
        return y, jnp.log(deriv)

    return _make_autoregressive(dim, context_dim, n_p,
                                tuple([hidden_features] * n_layers),
                                num_transforms, lambda params, t: transformer)


# ---------------------------------------------------------------------------
# GF — Gaussianization flow
# ---------------------------------------------------------------------------
def make_gf(dim: int, context_dim: int, hidden_features: int = 50,
            num_transforms: int = 4, n_layers: int = 2,
            num_components: int = 8, n_householder: int = 2):
    """Gaussianization flow: per-dim mixture-of-logistics CDF → probit,
    alternated with trainable Householder rotations (logdet 0). Context
    conditions the MoL parameters through a plain MLP hypernetwork.
    """
    K = num_components
    n_p = 3 * K  # per-dim: weights, means, log-scales

    def hyper_init(key):
        return mlp_init(key, [max(context_dim, 1)]
                        + [hidden_features] * n_layers + [dim * n_p])

    def hyper_apply(hp, x):
        h = x if context_dim > 0 else jnp.ones(x.shape[:-1] + (1,))
        h = mlp_apply(hp, h)
        return h.reshape(h.shape[:-1] + (dim, n_p))

    eps = 1.0e-6

    beta = 0.05  # linear-tail blend weight

    def elementwise(xv, p):
        """MoL CDF then probit, blended with a small linear term;
        returns (y, logdet-per-dim).

        The 1.702 factor makes σ(1.702·x) ≈ Φ(x), so the zero-initialized
        hypernet gives a near-identity transform (stable start). The β·x
        blend keeps the transform surjective on ℝ (the pure probit∘CDF
        saturates at ±ndtri(1−ε), which strands base draws beyond the
        reachable range during inversion)."""
        w = jax.nn.softmax(p[..., :K], axis=-1)
        m = p[..., K : 2 * K]
        inv_s = 1.702 * jnp.exp(-jnp.clip(p[..., 2 * K :], -6.0, 6.0))
        arg = (xv[..., None] - m) * inv_s
        sig = jax.nn.sigmoid(arg)
        u = jnp.clip(jnp.sum(w * sig, axis=-1), eps, 1.0 - eps)
        yg = jax.scipy.special.ndtri(u)
        du = jnp.sum(w * inv_s * sig * (1.0 - sig), axis=-1)
        phi = jnp.exp(-0.5 * yg**2) / jnp.sqrt(2.0 * jnp.pi)
        y = (1.0 - beta) * yg + beta * xv
        dy = (1.0 - beta) * du / jnp.maximum(phi, 1.0e-30) + beta
        return y, jnp.log(dy)

    def _reflect(h, v):
        vn = v / (jnp.linalg.norm(v) + 1.0e-8)
        return h - 2.0 * jnp.einsum("...d,d->...", h, vn)[..., None] * vn

    def init(key):
        keys = jax.random.split(key, 2 * num_transforms)
        layers = []
        for t in range(num_transforms):
            vs = [jax.random.normal(jax.random.fold_in(keys[t], i), (dim,))
                  for i in range(n_householder)]
            layers.append({"hyper": hyper_init(keys[num_transforms + t]),
                           "v": vs})
        return {"layers": layers}

    def log_prob(params, theta, x):
        theta = jnp.atleast_2d(theta)
        x = jnp.atleast_2d(x)
        total = jnp.zeros(theta.shape[0])
        h = theta
        for layer in params["layers"]:
            p = hyper_apply(layer["hyper"], x)
            h, ld = elementwise(h, p)
            total = total + jnp.sum(ld, axis=-1)
            for v in layer["v"]:
                h = _reflect(h, v)
        return total - 0.5 * jnp.sum(h**2, axis=-1) - 0.5 * dim * _LOG_2PI

    def sample(params, key, x, n):
        x = jnp.atleast_1d(x)
        xb = jnp.broadcast_to(x, (n,) + x.shape) if x.ndim == 1 else x
        h = jax.random.normal(key, (n, dim))
        for layer in reversed(params["layers"]):
            # Householder reflections are involutions; the product inverts
            # by applying them in reverse order.
            for v in reversed(layer["v"]):
                h = _reflect(h, v)
            p = hyper_apply(layer["hyper"], xb)
            h = _bisect_inverse(elementwise, h, p)
        return h

    return init, log_prob, sample
