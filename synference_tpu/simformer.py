"""Simformer — score-based transformer joint posterior (all-in-one SBI).

Native JAX re-implementation of the capability the reference gets from
`scoresbibm` (`Simformer_Fitter`, `/root/reference/src/synference/
sbi_runner.py:8028-9051`; task/token/mask machinery
`/root/reference/src/synference/simformer.py:49-263`): parameters and
observations become one token sequence; a transformer denoiser is trained
with VPSDE score matching under random condition masks, so a single model
amortizes posterior, likelihood, and arbitrary partial conditionals
(missing bands = unconditioned tokens, for free).

Reference config (sbi_runner.py:8143-8186): d_model 128, 4 heads, 4 layers,
VPSDE β ∈ [0.1, 20], 1000 diffusion steps — the defaults here.

Attention masks: "full" or block masks over θ/x tokens mirroring
`get_base_mask_fn` (reference simformer.py:209-263).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SimformerConfig", "Simformer", "VPSDE", "train_simformer",
           "SimformerPosterior"]


# ---------------------------------------------------------------------------
# VPSDE
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VPSDE:
    """Variance-preserving SDE (Song et al. 2021).

    dβ(t) = β_min + t (β_max − β_min);
    x_t = e^{-½∫β} x_0 + sqrt(1 − e^{-∫β}) ε.
    """

    beta_min: float = 0.1
    beta_max: float = 20.0

    def _int_beta(self, t):
        return self.beta_min * t + 0.5 * (self.beta_max - self.beta_min) * t**2

    def alpha(self, t):
        return jnp.exp(-0.5 * self._int_beta(t))

    def sigma(self, t):
        return jnp.sqrt(jnp.maximum(1.0 - jnp.exp(-self._int_beta(t)), 1.0e-8))

    def beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def marginal(self, key, x0, t):
        """Sample x_t | x_0; returns (x_t, eps)."""
        eps = jax.random.normal(key, x0.shape)
        a = self.alpha(t)[..., None]
        s = self.sigma(t)[..., None]
        return a * x0 + s * eps, eps


# ---------------------------------------------------------------------------
# score transformer
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SimformerConfig:
    n_tokens: int  # P + F
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 4
    d_ff: int = 256
    t_embed_dim: int = 64


def _time_embedding(t, dim):
    """Sinusoidal embedding of diffusion time t in [0,1]."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.linspace(0.0, np.log(1000.0), half)
    )
    ang = t[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class Simformer:
    """Token-wise score network s(v_t, t, condition_mask)."""

    def __init__(self, config: SimformerConfig, sde: VPSDE = VPSDE()):
        self.cfg = config
        self.sde = sde

    # -- params --------------------------------------------------------
    def init(self, key):
        cfg = self.cfg
        d = cfg.d_model
        keys = jax.random.split(key, 4 + cfg.n_layers)

        def dense(k, n_in, n_out, zero=False):
            if zero:
                return {"w": jnp.zeros((n_out, n_in)), "b": jnp.zeros(n_out)}
            scale = 1.0 / np.sqrt(n_in)
            return {
                "w": scale * jax.random.normal(k, (n_out, n_in)),
                "b": jnp.zeros(n_out),
            }

        params = {
            "value_in": dense(keys[0], 1, d),
            # O(1) node/condition embeddings: tokens must be distinguishable
            # from the first step or the score net learns the token-averaged
            # (unconditional) denoiser and never picks up conditioning
            "node_embed": jax.random.normal(keys[1], (cfg.n_tokens, d)),
            "cond_embed": jax.random.normal(keys[2], (2, d)),
            "t_proj": dense(keys[3], cfg.t_embed_dim, d),
            "layers": [],
            "out": None,
        }
        for i in range(cfg.n_layers):
            lk = jax.random.split(keys[4 + i], 6)
            params["layers"].append({
                "qkv": dense(lk[0], d, 3 * d),
                "attn_out": dense(lk[1], d, d),
                "ff1": dense(lk[2], d, cfg.d_ff),
                "ff2": dense(lk[3], cfg.d_ff, d),
                "ln1": {"g": jnp.ones(d), "b": jnp.zeros(d)},
                "ln2": {"g": jnp.ones(d), "b": jnp.zeros(d)},
            })
        params["out"] = dense(jax.random.split(key)[1], d, 1, zero=True)
        return params

    # -- forward --------------------------------------------------------
    @staticmethod
    def _apply_dense(p, x):
        return x @ p["w"].T + p["b"]

    @staticmethod
    def _ln(p, x):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1.0e-6) * p["g"] + p["b"]

    def score(self, params, v_t, t, condition_mask, attn_mask=None):
        """Score of latent tokens.

        Args:
            v_t: (B, T) noisy token values (standardized space).
            t: (B,) diffusion times in (0, 1].
            condition_mask: (B, T) 1 = observed token.
            attn_mask: optional (T, T) boolean, True = attend.
        Returns:
            (B, T) score estimate (−ε/σ parametrized as −ε̂/σ).
        """
        cfg = self.cfg
        h = self._apply_dense(params["value_in"], v_t[..., None])  # (B,T,d)
        h = h + params["node_embed"][None]
        h = h + params["cond_embed"][condition_mask.astype(jnp.int32)]
        t_emb = self._apply_dense(
            params["t_proj"], _time_embedding(t, cfg.t_embed_dim)
        )  # (B, d)
        h = h + t_emb[:, None, :]

        d_head = cfg.d_model // cfg.n_heads
        for layer in params["layers"]:
            x = self._ln(layer["ln1"], h)
            qkv = self._apply_dense(layer["qkv"], x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(a):
                return a.reshape(a.shape[:-1] + (cfg.n_heads, d_head))

            q, k, v = heads(q), heads(k), heads(v)
            logits = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d_head)
            if attn_mask is not None:
                logits = jnp.where(attn_mask[None, None], logits, -1.0e9)
            attn = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", attn, v)
            o = o.reshape(o.shape[:-2] + (cfg.d_model,))
            h = h + self._apply_dense(layer["attn_out"], o)
            x = self._ln(layer["ln2"], h)
            x = jax.nn.gelu(self._apply_dense(layer["ff1"], x))
            h = h + self._apply_dense(layer["ff2"], x)

        eps_hat = self._apply_dense(params["out"], h)[..., 0]  # (B, T)
        return -eps_hat / jnp.maximum(self.sde.sigma(t)[..., None], 1.0e-4)

    def eps_pred(self, params, v_t, t, condition_mask, attn_mask=None):
        return -self.score(params, v_t, t, condition_mask, attn_mask) * (
            self.sde.sigma(t)[..., None]
        )


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def _random_condition_masks(key, batch, n_theta, n_x):
    """Mix of task masks per sample (Simformer recipe): posterior mask
    (x observed), joint (nothing observed), and random Bernoulli masks."""
    k1, k2, k3 = jax.random.split(key, 3)
    t_tokens = jnp.zeros((batch, n_theta))
    posterior = jnp.concatenate(
        [t_tokens, jnp.ones((batch, n_x))], axis=1
    )
    joint = jnp.zeros((batch, n_theta + n_x))
    rand = jax.random.bernoulli(
        k1, 0.3, (batch, n_theta + n_x)
    ).astype(jnp.float32)
    choice = jax.random.randint(k2, (batch,), 0, 3)
    mask = jnp.where(
        (choice == 0)[:, None], posterior,
        jnp.where((choice == 1)[:, None], joint, rand),
    )
    del k3
    return mask


def train_simformer(
    model: Simformer,
    theta,
    x,
    key=None,
    batch_size: int = 256,
    learning_rate: float = 1.0e-4,
    max_epochs: int = 100,
    stop_after_epochs: int = 15,
    validation_fraction: float = 0.1,
    attn_mask=None,
):
    """Denoising score-matching training over joint (θ, x) tokens.

    Returns (params, standardizer dict, history). Tokens are z-scored with
    training stats (stored alongside params, as the reference persists its
    z-score fns, sbi_runner.py:8341-8504).
    """
    import optax

    key = key if key is not None else jax.random.PRNGKey(0)
    theta = jnp.asarray(theta, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    v = jnp.concatenate([theta, x], axis=1)  # (N, T)
    n_theta, n_x = theta.shape[1], x.shape[1]
    assert v.shape[1] == model.cfg.n_tokens

    mu, sd = v.mean(0), jnp.maximum(v.std(0), 1.0e-6)
    v = (v - mu) / sd

    k_split, k_init, k_loop = jax.random.split(key, 3)
    n = v.shape[0]
    perm = jax.random.permutation(k_split, n)
    n_val = max(int(n * validation_fraction), 1)
    v_val, v_tr = v[perm[:n_val]], v[perm[n_val:]]
    n_tr = v_tr.shape[0]
    bs = min(batch_size, n_tr)
    steps = max(n_tr // bs, 1)

    params = model.init(k_init)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(learning_rate))
    opt_state = tx.init(params)
    sde = model.sde

    def loss_fn(p, kb, vb):
        k1, k2, k3 = jax.random.split(kb, 3)
        b = vb.shape[0]
        cond = _random_condition_masks(k1, b, n_theta, n_x)
        t = jax.random.uniform(k2, (b,), minval=1.0e-3, maxval=1.0)
        v_t, eps = sde.marginal(k3, vb, t)
        # observed tokens stay clean
        v_t = jnp.where(cond == 1.0, vb, v_t)
        eps_hat = model.eps_pred(p, v_t, t, cond, attn_mask)
        w = 1.0 - cond  # score matching only on latent tokens
        return jnp.sum(w * (eps_hat - eps) ** 2) / jnp.maximum(w.sum(), 1.0)

    @jax.jit
    def epoch(params, opt_state, key):
        kperm, kloss = jax.random.split(key)
        idx = jax.random.permutation(kperm, n_tr)[: steps * bs].reshape(
            steps, bs
        )
        kbs = jax.random.split(kloss, steps)

        def step(carry, inp):
            p, s = carry
            bidx, kb = inp
            l, g = jax.value_and_grad(loss_fn)(p, kb, v_tr[bidx])
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s), l

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (idx, kbs)
        )
        val = loss_fn(params, jax.random.PRNGKey(0), v_val)
        return params, opt_state, losses.mean(), val

    best_val, best_params, since_best = np.inf, params, 0
    hist = {"train": [], "val": []}
    for _ in range(max_epochs):
        k_loop, k_e = jax.random.split(k_loop)
        params, opt_state, tr, val = epoch(params, opt_state, k_e)
        tr, val = float(tr), float(val)
        hist["train"].append(tr)
        hist["val"].append(val)
        if val < best_val:
            best_val, best_params, since_best = val, params, 0
        else:
            since_best += 1
            if since_best >= stop_after_epochs:
                break

    standardizer = {"mu": np.asarray(mu), "sd": np.asarray(sd),
                    "n_theta": n_theta, "n_x": n_x}
    return best_params, standardizer, hist


# ---------------------------------------------------------------------------
# posterior sampling via reverse diffusion
# ---------------------------------------------------------------------------


class SimformerPosterior:
    """Conditional sampling by reverse-SDE diffusion of latent tokens with
    observed tokens clamped (the reference samples via
    `model.sample_batched(condition_mask)`, sbi_runner.py:8858)."""

    def __init__(self, model: Simformer, params, standardizer,
                 attn_mask=None, n_steps: int = 500):
        self.model = model
        self.params = params
        self.std = standardizer
        self.attn_mask = attn_mask
        self.n_steps = n_steps

    def sample(self, key, x_obs, n: int, condition_mask=None):
        """Draw n θ samples given observed x (F,). Returns (n, P)."""
        model, sde = self.model, self.model.sde
        n_theta = self.std["n_theta"]
        n_tok = model.cfg.n_tokens
        mu = jnp.asarray(self.std["mu"])
        sd = jnp.asarray(self.std["sd"])
        x_obs = jnp.asarray(x_obs, jnp.float32)
        if condition_mask is None:
            cond = jnp.concatenate(
                [jnp.zeros(n_theta), jnp.ones(n_tok - n_theta)]
            )
        else:
            cond = jnp.asarray(condition_mask, jnp.float32)
        v_obs = jnp.concatenate([jnp.zeros(n_theta), x_obs])
        v_obs = (v_obs - mu) / sd
        cond_b = jnp.broadcast_to(cond, (n, n_tok))
        v_obs_b = jnp.broadcast_to(v_obs, (n, n_tok))

        dt = 1.0 / self.n_steps
        k_init, k_loop = jax.random.split(key)
        v = jax.random.normal(k_init, (n, n_tok))
        v = jnp.where(cond_b == 1.0, v_obs_b, v)

        def body(i, carry):
            v, k = carry
            t = 1.0 - i * dt
            tb = jnp.full((n,), t)
            score = model.score(self.params, v, tb, cond_b, self.attn_mask)
            beta = sde.beta(t)
            drift = -0.5 * beta * v - beta * score
            k, ks = jax.random.split(k)
            noise = jax.random.normal(ks, v.shape)
            v_new = v - drift * dt + jnp.sqrt(beta * dt) * noise
            v_new = jnp.where(cond_b == 1.0, v_obs_b, v_new)
            return (v_new, k)

        v, _ = jax.lax.fori_loop(0, self.n_steps, body, (v, k_loop))
        theta = v[:, :n_theta] * sd[:n_theta] + mu[:n_theta]
        return theta

    def sample_batch(self, key, xs, n: int, condition_mask=None):
        xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
        keys = jax.random.split(key, xs.shape[0])
        return jax.vmap(
            lambda k, xi: self.sample(k, xi, n, condition_mask)
        )(keys, xs)

    def log_prob(self, theta, xs, condition_mask=None,
                 n_steps: int | None = None):
        """Conditional log p(θ | x) via the probability-flow ODE.

        The PF-ODE dv/dt = −½β(t)(v + s_θ(v, t)) shares the reverse SDE's
        marginals, so integrating a (θ, x) point from t≈0 to t=1 with the
        instantaneous change-of-variables term gives an exact log-density
        under the learned score (Song et al. 2021 §D.2). Observed tokens
        are frozen (zero drift); the divergence is the exact trace over
        latent tokens, computed with one JVP per LATENT token (observed
        tokens have identically zero drift rows, so their directions are
        skipped — at a 63-observed/6-latent paper-scale posterior mask
        that is ~10× fewer score-network passes per ODE step).

        Reference analogue: the condition-masked `log_prob` of
        `Simformer_Fitter` (sbi_runner.py:8783-8856). This is what lets
        `evaluate_posterior` report finite mean_log_prob for simformer
        models and HPO use log-prob objectives with them.

        Args:
            theta: (n, P) parameter points (original, unstandardized).
            xs: (n, F) paired observations.
            condition_mask: optional (T,) override; 1 = observed token.
                Default: posterior mask (x observed, θ latent).
        Returns:
            (n,) log densities in original θ units.
        """
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        xs = jnp.atleast_2d(jnp.asarray(xs, jnp.float32))
        n = theta.shape[0]
        n_theta = self.std["n_theta"]
        n_tok = self.model.cfg.n_tokens
        if condition_mask is None:
            cond = jnp.concatenate(
                [jnp.zeros(n_theta), jnp.ones(n_tok - n_theta)])
        else:
            cond = jnp.asarray(condition_mask, jnp.float32)
        steps = int(n_steps if n_steps is not None else self.n_steps)
        # latent-token indices are STATIC per condition pattern (part of the
        # jit cache key): the divergence basis then holds only latent rows
        lat_idx = tuple(int(i) for i in np.where(np.asarray(cond) == 0)[0])
        if not lat_idx:
            raise ValueError("condition_mask marks every token observed — "
                             "there is no latent density to evaluate")
        cache = self.__dict__.setdefault("_logprob_jit", {})
        fn = cache.get((n, steps, lat_idx))
        if fn is None:
            fn = jax.jit(functools.partial(self._log_prob_impl, steps=steps,
                                           lat_idx=lat_idx))
            cache[(n, steps, lat_idx)] = fn
        return fn(theta, xs, cond)

    def _log_prob_impl(self, theta, xs, cond, *, steps: int, lat_idx):
        model, sde = self.model, self.model.sde
        n_tok = model.cfg.n_tokens
        mu = jnp.asarray(self.std["mu"])
        sd = jnp.asarray(self.std["sd"])
        n = theta.shape[0]
        v0 = (jnp.concatenate([theta, xs], axis=1) - mu) / sd  # (n, T)
        cond_b = jnp.broadcast_to(cond, (n, n_tok))
        lat = 1.0 - cond  # (T,) 1 = latent token
        eps0 = 1.0e-3
        dt = (1.0 - eps0) / steps
        attn = self.attn_mask
        params = self.params

        def f(v, t):  # PF-ODE drift, zeroed on observed tokens
            tb = jnp.full((v.shape[0],), t)
            s = model.score(params, v, tb, cond_b, attn)
            return -0.5 * sde.beta(t) * (v + s) * lat[None, :]

        # basis holds ONLY latent directions (static lat_idx): observed
        # tokens' drift rows are identically zero, so their JVPs would be
        # wasted full score-network passes
        li = jnp.asarray(lat_idx, jnp.int32)
        basis = jnp.zeros((len(lat_idx), n_tok)).at[
            jnp.arange(len(lat_idx)), li].set(1.0)

        def step(carry, i):
            v, ld = carry
            t = eps0 + i * dt

            def one_dir(e):
                fv, dv = jax.jvp(
                    lambda u: f(u, t), (v,),
                    (jnp.broadcast_to(e, v.shape),))
                return fv, jnp.sum(dv * e[None, :], axis=1)

            fvs, divs = jax.vmap(one_dir)(basis)
            v = v + fvs[0] * dt  # primal identical across directions
            ld = ld + divs.sum(axis=0) * dt
            return (v, ld), None

        (v1, ld), _ = jax.lax.scan(
            step, (v0, jnp.zeros(n)),
            jnp.arange(steps, dtype=jnp.float32))
        # t = 1 marginal of the VPSDE is (numerically) standard normal
        logp1 = jnp.sum(
            lat[None, :] * (-0.5 * v1**2 - 0.5 * np.log(2.0 * np.pi)),
            axis=1)
        # standardization Jacobian back to original units
        return logp1 + ld - jnp.sum(lat * jnp.log(sd))

    # -- persistence ------------------------------------------------------
    # (the reference persists full simformer models via save_model_to_pkl /
    # load_full_model with z-score rebuild, sbi_runner.py:8341-8504)

    def state_dict(self) -> dict:
        from dataclasses import asdict

        return {
            "kind": "simformer",
            "config": asdict(self.model.cfg),
            "sde": {"beta_min": self.model.sde.beta_min,
                    "beta_max": self.model.sde.beta_max},
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "standardizer": {
                "mu": np.asarray(self.std["mu"]),
                "sd": np.asarray(self.std["sd"]),
                "n_theta": int(self.std["n_theta"]),
                "n_x": int(self.std["n_x"]),
            },
            "attn_mask": (
                None if self.attn_mask is None else np.asarray(self.attn_mask)
            ),
            "n_steps": int(self.n_steps),
        }

    @classmethod
    def from_state_dict(cls, state: dict) -> "SimformerPosterior":
        cfg = SimformerConfig(**state["config"])
        sde = VPSDE(**state["sde"])
        model = Simformer(cfg, sde)
        params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        return cls(
            model, params, dict(state["standardizer"]),
            attn_mask=state["attn_mask"], n_steps=state["n_steps"],
        )

    def save(self, path: str) -> None:
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self.state_dict(), f)

    @classmethod
    def load(cls, path: str) -> "SimformerPosterior":
        import pickle

        with open(path, "rb") as f:
            return cls.from_state_dict(pickle.load(f))


def train_noise_model_simformer(mags, log_errs, key=None, **train_kwargs):
    """Learn p(log σ | mag) as a simformer task (reference
    `UncertainityModelTask`, simformer.py:266-339): θ tokens are the
    per-band log-errors, x tokens the magnitudes. Full attention so the
    diffused error tokens can read the conditioning magnitudes (a causal
    x-mask in the reference's convention orders x before θ).

    Returns (model, posterior) — posterior.sample(key, mags, n) draws error
    vectors conditioned on a magnitude vector."""
    import jax as _jax

    mags = np.atleast_2d(np.asarray(mags, np.float32))
    log_errs = np.atleast_2d(np.asarray(log_errs, np.float32))
    n_theta, n_x = log_errs.shape[1], mags.shape[1]
    cfg = SimformerConfig(n_tokens=n_theta + n_x, d_model=64, n_heads=4,
                          n_layers=2)
    model = Simformer(cfg)
    params, std, hist = train_simformer(
        model, log_errs, mags,
        key if key is not None else _jax.random.PRNGKey(0),
        **train_kwargs,
    )
    posterior = SimformerPosterior(model, params, std, n_steps=300)
    return model, posterior


def block_attn_mask(n_theta: int, n_x: int, kind: str = "full"):
    """Attention masks over [θ | x] tokens (reference `get_base_mask_fn`,
    simformer.py:209-263): "full" or "causal" (x tokens attend to θ and
    earlier x; θ attends to θ)."""
    t = n_theta + n_x
    if kind == "full":
        return np.ones((t, t), dtype=bool)
    if kind == "causal":
        m = np.zeros((t, t), dtype=bool)
        m[:n_theta, :n_theta] = True
        for i in range(n_x):
            m[n_theta + i, : n_theta + i + 1] = True
        return m
    raise ValueError(kind)
