"""Isolate the ~9 ms/epoch gap between the raw while-loop body (23.0
ms/epoch, whole_run_variants.py 'full') and train_ensemble's production
whole-run path (32.3 ms/epoch, whole_run_sustained.py).

Variants, cumulative toward the production body:
  raw      — whole_run_variants 'full' (no vmap, no history)
  vmap1    — epoch wrapped in a 1-member vmap (production's member axis)
  hist     — vmap1 + (max_e, n) history buffers via dynamic_update
  prod     — the actual _make_epoch_all_body + _build_whole_run_fn
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import optax

from synference_tpu.flows import build_flow
from synference_tpu.train import (TrainConfig, _build_whole_run_fn,
                                  _make_epoch_all_body, _make_optimizer)

rng = np.random.default_rng(1)
N = 100_000
theta = jnp.asarray(rng.standard_normal((N, 6)), jnp.float32)
x = jnp.asarray(rng.standard_normal((N, 14)), jnp.float32)
n_tr = int(N * 0.8)
t_tr, x_tr = theta[:n_tr], x[:n_tr]
t_va, x_va = theta[n_tr:], x[n_tr:]
BS = 1024
steps = n_tr // BS
data = (t_tr, x_tr, t_va, x_va)

flow = build_flow("nsf", 6, 14, hidden_features=69, num_transforms=15)
tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(3e-4))


def loss_fn(p, tb, xb):
    return -flow.log_prob(p, tb, xb).mean()


def make_fn(n_epochs, variant):
    if variant == "prod":
        cfg = TrainConfig(batch_size=BS, learning_rate=3e-4,
                          max_epochs=n_epochs, stop_after_epochs=10_000)
        body = _make_epoch_all_body(loss_fn, _make_optimizer(cfg), 1,
                                    n_tr, BS, steps)

        def init_members(m_keys, d_t, d_x, lrs):
            p = jax.vmap(lambda k: flow.init(k, d_t, d_x))(m_keys)
            s = jax.vmap(_make_optimizer(cfg).init)(p)
            return p, s

        fn = _build_whole_run_fn(init_members, body, 1, n_epochs, 10_000)

        def run(key, data):
            return fn(jax.random.split(key, 1), key, data,
                      jnp.zeros((1,), jnp.float32))

        return jax.jit(run)

    @jax.jit
    def run(key, data):
        d_t, d_x, d_tv, d_xv = data
        params = jax.vmap(lambda k: flow.init(k, d_t, d_x))(
            jax.random.split(key, 1))
        opt = jax.vmap(tx.init)(params)
        if variant == "raw":
            params = jax.tree_util.tree_map(lambda a: a[0], params)
            opt = jax.tree_util.tree_map(lambda a: a[0], opt)

        def epoch_member(p, s, k):
            perm = jax.random.permutation(k, n_tr)
            idx = perm[: steps * BS].reshape(steps, BS)

            def step(c, bidx):
                p, s = c
                loss, g = jax.value_and_grad(loss_fn)(p, d_t[bidx],
                                                      d_x[bidx])
                u, s = tx.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (p, s), ls = jax.lax.scan(step, (p, s), idx)
            return p, s, ls.mean(), loss_fn(p, d_tv, d_xv)

        hist0 = jnp.full((n_epochs, 1), jnp.nan, jnp.float32)

        def body(carry):
            e, p, s, k, bp, bv, hist = carry
            k, ke = jax.random.split(k)
            if variant == "raw":
                p, s, tr, va = epoch_member(p, s, ke)
                va_v = va[None] if va.ndim == 0 else va
            else:
                kes = jax.random.split(ke, 1)
                p, s, tr, va_v = jax.vmap(
                    epoch_member, in_axes=(0, 0, 0))(p, s, kes)
                va = va_v[0]
            imp = va < bv
            bp = jax.tree_util.tree_map(
                lambda nw, od: jnp.where(imp, nw, od), p, bp)
            bv = jnp.where(imp, va, bv)
            if variant == "hist":
                hist = jax.lax.dynamic_update_index_in_dim(
                    hist, va_v, e, 0)
            return e + 1, p, s, k, bp, bv, hist

        def cond(c):
            return c[0] < n_epochs

        out = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), params, opt, key, params,
             jnp.float32(jnp.inf), hist0))
        return out[4], out[5]

    return run


def force(r):
    return float(np.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[0])


for variant in ("raw", "vmap1", "hist", "prod"):
    ts = {}
    for e in (40, 240):
        fn = make_fn(e, variant)
        force(fn(jax.random.PRNGKey(1), data))
        t0 = time.time()
        force(fn(jax.random.PRNGKey(2), data))
        ts[e] = time.time() - t0
    marg = (ts[240] - ts[40]) / 200 * 1000
    print(f"{variant}: warm40 {ts[40]:.2f}s warm240 {ts[240]:.2f}s "
          f"marginal {marg:.1f} ms/epoch -> {steps / marg * 1000:.0f} "
          "steps/s sustained", flush=True)
