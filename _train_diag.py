import time
import numpy as np, jax, jax.numpy as jnp, optax
from synference_tpu.flows import build_flow
def log(*a): print(*a, flush=True)

n, d_theta, d_x = 100_000, 6, 14
rng = np.random.default_rng(1)
theta = jnp.asarray(rng.standard_normal((n, d_theta)), jnp.float32)
x = jnp.asarray(rng.standard_normal((n, d_x)), jnp.float32)

for model, kw in [("nsf", dict(hidden_features=69, num_transforms=15)),] or [
                  ("maf", dict(hidden_features=69, num_transforms=8))]:
    for bs in (1024, 8192):
        flow = build_flow(model, d_theta, d_x, **kw)
        params = flow.init(jax.random.PRNGKey(0), theta, x)
        tx = optax.adamw(3e-4)
        opt = tx.init(params)
        steps = n // bs
        idx_all = jnp.arange(steps * bs).reshape(steps, bs)

        @jax.jit
        def epoch(params, opt):
            def step(c, bidx):
                p, s = c
                def loss(p): return -flow.log_prob(p, theta[bidx], x[bidx]).mean()
                l, g = jax.value_and_grad(loss)(p)
                u, s = tx.update(g, s, p)
                return (optax.apply_updates(p, u), s), l
            (p, s), ls = jax.lax.scan(step, (params, opt), idx_all)
            return p, s, ls.mean()

        p, o, l = epoch(params, opt); jax.block_until_ready(l)
        t0=time.time()
        for _ in range(3): p, o, l = epoch(p, o)
        jax.block_until_ready(l)
        dt = (time.time()-t0)/3
        log(f"{model} bs={bs}: {dt*1000:.0f} ms/epoch ({steps} steps) -> {steps/dt:,.0f} steps/s, {steps*bs/dt:,.0f} samples/s")
