"""Sustained steps/s of the whole-run single-dispatch training path.

Methodology (matches the round-4 fitted-asymptote analysis): time warm
train_ensemble calls at two epoch counts and difference them — the fixed
per-call cost (retrace on first call only; the program cache makes repeat
calls trace-free) cancels, leaving the marginal on-device epoch rate.
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

from synference_tpu.flows import build_flow  # noqa: E402
from synference_tpu.train import TrainConfig, train_ensemble  # noqa: E402

rng = np.random.default_rng(1)
N = 100_000
theta = jnp.asarray(rng.standard_normal((N, 6)), jnp.float32)
x = jnp.asarray(rng.standard_normal((N, 14)), jnp.float32)
flow = build_flow("nsf", 6, 14, hidden_features=69, num_transforms=15)
steps_per_epoch = int(N * 0.8) // 1024

results = {}
for e in (40, 240):
    cfg = TrainConfig(max_epochs=e, stop_after_epochs=10_000,
                      batch_size=1024, learning_rate=3e-4)
    t0 = time.time()
    train_ensemble(flow, theta, x, jax.random.PRNGKey(0), cfg)
    cold = time.time() - t0
    t0 = time.time()
    res = train_ensemble(flow, theta, x, jax.random.PRNGKey(1), cfg)
    warm = time.time() - t0
    results[e] = warm
    print(f"epochs={e}: cold {cold:.1f}s warm {warm:.2f}s -> "
          f"{e * steps_per_epoch / warm:.0f} steps/s end-to-end", flush=True)

sustained = (240 - 40) * steps_per_epoch / (results[240] - results[40])
print(f"sustained (marginal) rate: {sustained:.0f} steps/s", flush=True)
