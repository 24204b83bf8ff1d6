"""Isolate trace/compile/execute cost of the north star's training and
member-evaluation phases at full shapes (1M rows), without regenerating
the library. Two calls each: first = trace(+compile), second = cached."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from synference_tpu.diagnostics import evaluate_members_fused
from synference_tpu.flows import build_flow
from synference_tpu.priors import BoxUniform
from synference_tpu.train import TrainConfig, train_ensemble

rng = np.random.default_rng(0)
N, P, F = 1_000_000, 6, 14
theta = rng.standard_normal((N, P)).astype(np.float32)
x = rng.standard_normal((N, F)).astype(np.float32)
prior = BoxUniform([-4.0] * P, [4.0] * P)
flow = build_flow("nsf", P, F, hidden_features=69, num_transforms=15,
                  support_low=[-4.0] * P, support_high=[4.0] * P)
cfg = TrainConfig(max_epochs=36, stop_after_epochs=10, batch_size=2048,
                  learning_rate=7e-4)

for tag in ("cold", "warm"):
    t0 = time.time()
    res = train_ensemble(flow, theta, x, jax.random.PRNGKey(1), cfg,
                         n_nets=8)
    print(f"train8 {tag}: {time.time()-t0:.1f}s "
          f"({len(res.val_losses)} epochs)", flush=True)

xs, truths = x[:512], theta[:512]
for tag in ("cold", "warm"):
    t0 = time.time()
    rep = evaluate_members_fused(flow, res.params, prior, xs, truths,
                                 key=jax.random.PRNGKey(2), n_samples=256)
    print(f"eval8 {tag}: {time.time()-t0:.1f}s "
          f"tarp_mean={rep['tarp_deviation']['mean']:.4f}", flush=True)
