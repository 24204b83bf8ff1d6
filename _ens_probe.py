import time
import numpy as np, jax, jax.numpy as jnp, optax
from synference_tpu.flows import build_flow
def log(*a): print(*a, flush=True)
n, d_theta, d_x = 100_000, 6, 14
rng = np.random.default_rng(1)
theta = jnp.asarray(rng.standard_normal((n, d_theta)), jnp.float32)
x = jnp.asarray(rng.standard_normal((n, d_x)), jnp.float32)
bs = 1024; steps = n // bs
idx_all = jnp.arange(steps * bs).reshape(steps, bs)
for n_nets in (1, 3, 8):
    flow = build_flow("nsf", d_theta, d_x, hidden_features=69, num_transforms=15)
    keys = jax.random.split(jax.random.PRNGKey(0), n_nets)
    params = jax.vmap(lambda k: flow.init(k, theta, x))(keys)
    tx = optax.adamw(3e-4)
    opt = jax.vmap(tx.init)(params)
    @jax.jit
    def epoch(params, opt):
        def member(p, s):
            def step(c, bidx):
                p, s = c
                l, g = jax.value_and_grad(lambda p: -flow.log_prob(p, theta[bidx], x[bidx]).mean())(p)
                u, s = tx.update(g, s, p)
                return (optax.apply_updates(p, u), s), l
            (p, s), ls = jax.lax.scan(step, (p, s), idx_all)
            return p, s, ls.mean()
        return jax.vmap(member)(params, opt)
    p, o, l = epoch(params, opt); jax.block_until_ready(l)
    t0=time.time()
    for _ in range(3): p, o, l = epoch(p, o)
    jax.block_until_ready(l)
    dt=(time.time()-t0)/3
    log(f"n_nets={n_nets}: {dt*1000:.0f} ms/epoch -> {n_nets*steps/dt:,.0f} member-steps/s")
