"""Decompose the whole-run marginal epoch cost: which part of the
while-loop body costs the extra ~6 ms/epoch over the bare fused scan?

Variants (all: NSF 69x15, N=100k, batch 1024, marginal = (t240-t40)/200):
  full      — the production body (train scan + val loss + best tree_map +
              history writes) in a while_loop
  noval     — best tracking on TRAIN loss, no val forward
  nobest    — val loss computed, best tracking removed
  scan4     — production body, 4 epochs per while iteration (scan block)
  bare      — train scan only, lax.scan over epochs (the round-4 bench
              methodology; the fitted-asymptote upper bound)
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

rng = np.random.default_rng(1)
N = 100_000
theta = jnp.asarray(rng.standard_normal((N, 6)), jnp.float32)
x = jnp.asarray(rng.standard_normal((N, 14)), jnp.float32)
n_tr = int(N * 0.8)
t_tr, x_tr = theta[:n_tr], x[:n_tr]
t_va, x_va = theta[n_tr:], x[n_tr:]
BS = 1024
steps = n_tr // BS

flow = build_flow("nsf", 6, 14, hidden_features=69, num_transforms=15)
params0 = flow.init(jax.random.PRNGKey(0), t_tr, x_tr)
tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(3e-4))
opt0 = tx.init(params0)


def loss_fn(p, tb, xb):
    return -flow.log_prob(p, tb, xb).mean()


def train_epoch(p, s, k, d_t, d_x):
    perm = jax.random.permutation(k, n_tr)
    idx = perm[: steps * BS].reshape(steps, BS)

    def step(c, bidx):
        p, s = c
        l, g = jax.value_and_grad(loss_fn)(p, d_t[bidx], d_x[bidx])
        u, s = tx.update(g, s, p)
        return (optax.apply_updates(p, u), s), l

    (p, s), ls = jax.lax.scan(step, (p, s), idx)
    return p, s, ls.mean()


def make_whole(n_epochs, variant):
    @jax.jit
    def run(params, opt, key, data):
        d_t, d_x, d_tv, d_xv = data
        bp0 = params
        bv0 = jnp.inf

        def body_epoch(e, p, s, k, bp, bv):
            k, ke = jax.random.split(k)
            p, s, tr = train_epoch(p, s, ke, d_t, d_x)
            if variant == "noval":
                va = tr
            else:
                va = loss_fn(p, d_tv, d_xv)
            if variant != "nobest":
                imp = va < bv
                bp = jax.tree_util.tree_map(
                    lambda nw, od: jnp.where(imp, nw, od), p, bp)
                bv = jnp.where(imp, va, bv)
            return p, s, k, bp, bv, va

        if variant == "scan4":
            def wbody(carry):
                e, p, s, k, bp, bv, acc = carry

                def sbody(c, _):
                    p, s, k, bp, bv = c
                    p, s, k, bp, bv, va = body_epoch(0, p, s, k, bp, bv)
                    return (p, s, k, bp, bv), va

                (p, s, k, bp, bv), vas = jax.lax.scan(
                    sbody, (p, s, k, bp, bv), None, length=4)
                return e + 4, p, s, k, bp, bv, acc + vas.sum()

            def cond(carry):
                return carry[0] < n_epochs

            carry = (jnp.int32(0), params, opt, key, bp0, bv0,
                     jnp.float32(0))
            out = jax.lax.while_loop(cond, wbody, carry)
            return out[4], out[5], out[6]
        if variant == "bare":
            def sbody(c, _):
                p, s, k = c
                k, ke = jax.random.split(k)
                p, s, tr = train_epoch(p, s, ke, d_t, d_x)
                return (p, s, k), tr

            (p, s, k), trs = jax.lax.scan(
                sbody, (params, opt, key), None, length=n_epochs)
            return p, trs.sum(), trs[-1]

        def wbody(carry):
            e, p, s, k, bp, bv, acc = carry
            p, s, k, bp, bv, va = body_epoch(e, p, s, k, bp, bv)
            return e + 1, p, s, k, bp, bv, acc + va

        def cond(carry):
            return carry[0] < n_epochs

        carry = (jnp.int32(0), params, opt, key, bp0, bv0, jnp.float32(0))
        out = jax.lax.while_loop(cond, wbody, carry)
        return out[4], out[5], out[6]

    return run


def force(r):
    """Host-materialize: jax.block_until_ready returns immediately on
    axon-tunnel buffers (measured — a 240-epoch run 'completed' in 10 ms),
    so timings must round-trip a value to the host."""
    return float(np.asarray(r[1]))


data = (t_tr, x_tr, t_va, x_va)
for variant in ("full", "noval", "nobest", "scan4", "bare"):
    ts = {}
    for e in (40, 240):
        fn = make_whole(e, variant)
        force(fn(params0, opt0, jax.random.PRNGKey(1), data))
        t0 = time.time()
        force(fn(params0, opt0, jax.random.PRNGKey(2), data))
        ts[e] = time.time() - t0
    marg = (ts[240] - ts[40]) / 200 * 1000
    print(f"{variant}: warm40 {ts[40]:.2f}s warm240 {ts[240]:.2f}s "
          f"marginal {marg:.1f} ms/epoch -> {steps / marg * 1000:.0f} "
          "steps/s sustained", flush=True)
