"""A/B: whole-run single-dispatch training vs host-loop dispatches.

Measures the REAL `train_ensemble` path (includes per-call retrace; XLA
compile amortized by the persistent cache + a warmup call) on the bench
config: N=100k, theta R^6, x R^14, NSF 69x15, batch 1024 — VERDICT r4
item 1 wants sustained npe_train_steps_per_sec >= 3600.
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

EPOCHS = 30
steps_per_epoch = int(N * 0.8) // 1024  # val fraction 0.2

for label, cfg in [
    ("whole_run", TrainConfig(max_epochs=EPOCHS, stop_after_epochs=10_000,
                              batch_size=1024, learning_rate=3e-4)),
    ("host_loop_k1", TrainConfig(max_epochs=EPOCHS, stop_after_epochs=10_000,
                                 batch_size=1024, learning_rate=3e-4,
                                 whole_run=False)),
    ("host_loop_k8", TrainConfig(max_epochs=32, stop_after_epochs=10_000,
                                 batch_size=1024, learning_rate=3e-4,
                                 whole_run=False, epochs_per_dispatch=8)),
]:
    t0 = time.time()
    res = train_ensemble(flow, theta, x, jax.random.PRNGKey(0), cfg)
    cold = time.time() - t0
    t0 = time.time()
    res = train_ensemble(flow, theta, x, jax.random.PRNGKey(1), cfg)
    warm = time.time() - t0
    n_ep = len(res.val_losses)
    rate = n_ep * steps_per_epoch / warm
    print(f"{label}: cold {cold:.1f}s warm {warm:.2f}s "
          f"({n_ep} epochs, {steps_per_epoch} steps/ep) -> "
          f"{rate:.0f} steps/s", flush=True)
