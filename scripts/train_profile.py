"""Training throughput anatomy for NSF-69x15 (VERDICT r3 item 7).

Measures, on the attached TPU:
  1. warm single-epoch device rate (the bench number),
  2. host-loop overhead per epoch (dispatch + loss readbacks),
  3. XLA's own FLOP estimate -> MFU,
  4. a multi-epoch fused scan (4 epochs / dispatch),
  5. batch-size scaling (latency- vs FLOP-bound diagnosis),
  6. vmapped-member scaling (the ensemble/HPO lever).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from synference_tpu.flows import build_flow

N, D_THETA, D_X = 100_000, 6, 14
rng = np.random.default_rng(1)
theta = jnp.asarray(rng.standard_normal((N, D_THETA)), jnp.float32)
x = jnp.asarray(rng.standard_normal((N, D_X)), jnp.float32)
tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(3e-4))


def make_epoch(flow, batch, n_members=1, n_epochs=1):
    steps = N // batch
    idx_all = jnp.arange(steps * batch).reshape(steps, batch)

    def one_epoch(params, opt):
        def step(c, bidx):
            p, s = c

            def loss(p):
                return -flow.log_prob(p, theta[bidx], x[bidx]).mean()

            l, g = jax.value_and_grad(loss)(p)
            u, s = tx.update(g, s, p)
            return (optax.apply_updates(p, u), s), l

        (p, s), ls = jax.lax.scan(step, (params, opt), idx_all)
        return p, s, ls.mean()

    if n_members > 1:
        def member_epoch(params, opt):
            return jax.vmap(one_epoch)(params, opt)
        body = member_epoch
    else:
        body = one_epoch

    @jax.jit
    def epochs(params, opt):
        def e(c, _):
            p, s = c
            p, s, l = body(p, s)
            return (p, s), l
        (p, s), ls = jax.lax.scan(e, (params, opt), None, length=n_epochs)
        return p, s, ls

    return epochs, steps


def flops_of(fn, *args):
    try:
        comp = fn.lower(*args).compile()
        an = comp.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", float("nan")))
    except Exception:
        return float("nan")


flow = build_flow("nsf", D_THETA, D_X, hidden_features=69, num_transforms=15)
params = flow.init(jax.random.PRNGKey(0), theta, x)
opt = tx.init(params)

print("== NSF-69x15, N=100k ==", flush=True)
for batch in (512, 1024, 4096, 16384):
    ep, steps = make_epoch(flow, batch)
    p, o, l = ep(params, opt)
    jax.block_until_ready(l)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        p2, o2, l = ep(params, opt)
    jax.block_until_ready(l)
    dt = (time.time() - t0) / reps
    fl = flops_of(ep, params, opt)
    mfu = fl / dt / 197e12  # v5e bf16 peak; fp32 ~1/4 of this
    print(f"batch {batch:6d}: {steps:4d} steps in {dt*1e3:7.1f} ms -> "
          f"{steps/dt:7.0f} steps/s  {steps*batch/dt/1e6:6.2f} M samp/s  "
          f"XLA flops/epoch {fl:.2e}  'MFU' vs bf16 peak {mfu*100:5.2f}%",
          flush=True)

# host overhead: epoch-by-epoch python loop with readbacks (train.py shape)
ep1, steps = make_epoch(flow, 1024)
p, o, l = ep1(params, opt)
jax.block_until_ready(l)
t0 = time.time()
reps = 10
pp, oo = params, opt
for _ in range(reps):
    pp, oo, l = ep1(pp, oo)
    _ = float(np.asarray(l).mean())  # the readback train.py does per epoch
dt_host = (time.time() - t0) / reps
print(f"host loop w/ readback : {dt_host*1e3:7.1f} ms/epoch "
      f"({steps/dt_host:7.0f} steps/s)", flush=True)

ep4, _ = make_epoch(flow, 1024, n_epochs=4)
p, o, l = ep4(params, opt)
jax.block_until_ready(l)
t0 = time.time()
for _ in range(reps):
    p4, o4, l = ep4(params, opt)
jax.block_until_ready(l)
dt4 = (time.time() - t0) / reps / 4
print(f"4-epoch fused scan    : {dt4*1e3:7.1f} ms/epoch "
      f"({steps/dt4:7.0f} steps/s)", flush=True)

# member scaling: K flows in one vmapped program
for k in (2, 4, 8):
    epk, _ = make_epoch(flow, 1024, n_members=k)
    pk = jax.vmap(lambda s: flow.init(jax.random.PRNGKey(s), theta, x))(
        jnp.arange(k, dtype=jnp.uint32))
    ok = jax.vmap(tx.init)(pk)
    pk2, ok2, l = epk(pk, ok)
    jax.block_until_ready(l)
    t0 = time.time()
    for _ in range(3):
        pk2, ok2, l = epk(pk, ok)
    jax.block_until_ready(l)
    dtk = (time.time() - t0) / 3
    print(f"{k} vmapped members    : {dtk*1e3:7.1f} ms/epoch  "
          f"{k*steps/dtk:7.0f} member-steps/s", flush=True)
