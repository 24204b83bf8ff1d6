"""Mesh-sharded posterior sampling and catalogue fitting.

The reference samples per object in a Python loop on one GPU
(`/root/reference/src/synference/sbi_runner.py:6412-6424`); the single-chip
path here already fuses all objects into one program
(`posterior.sample_batch`). This module adds the multi-chip layer: objects
shard across the mesh's data axis, each device draws its shard's samples
with the same jitted program, and the result is one global sharded array —
catalogue-scale inference rides pure data parallelism (no collectives
needed in the forward pass, so ICI stays idle and scaling is linear).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["make_sharded_sampler", "sharded_sample_batch",
           "sharded_fit_catalogue"]


def make_sharded_sampler(posterior, mesh, axis_name: str = "data",
                         n_samples: int = 1000, batched_rounds: int = 4):
    """jit the posterior's support-aware batched sampler with the object
    axis sharded over the mesh.

    Uses `DirectPosterior.sample_batch_with_acceptance` semantics (reject
    out-of-support rounds, clip pathological leakage onto the box faces) so
    sharded results match the single-chip path exactly — sampling the raw
    flow here would silently return out-of-prior parameter values.

    Returns fn(key, xs (M, C)) -> (M, n_samples, D) with M sharded;
    M must be divisible by the axis size (pad with `pad_objects`).
    """
    in_sharding = NamedSharding(mesh, P(axis_name, None))
    out_sharding = NamedSharding(mesh, P(axis_name, None, None))

    def fn(key, xs):
        samples, _ = posterior.sample_batch_with_acceptance(
            key, xs, n_samples, batched_rounds)
        return samples

    return jax.jit(fn, in_shardings=(None, in_sharding),
                   out_shardings=out_sharding)


def pad_objects(xs, multiple: int):
    """Pad the object axis up to a multiple; returns (padded, n_valid)."""
    xs = np.atleast_2d(np.asarray(xs))
    n = xs.shape[0]
    n_pad = int(np.ceil(n / multiple) * multiple)
    if n_pad == n:
        return xs, n
    pad = np.repeat(xs[:1], n_pad - n, axis=0)
    return np.concatenate([xs, pad]), n


def sharded_sample_batch(posterior, xs, mesh, n_samples: int = 1000,
                         key=None, axis_name: str = "data"):
    """Posterior samples for a catalogue, sharded over the mesh.

    Works with `DirectPosterior` (uses its flow/params directly). Returns
    host numpy (n_objects, n_samples, D).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    n_dev = mesh.shape[axis_name]
    xs_pad, n = pad_objects(xs, n_dev)
    fn = make_sharded_sampler(posterior, mesh, axis_name=axis_name,
                              n_samples=n_samples)
    xs_dev = jax.device_put(
        jnp.asarray(xs_pad, jnp.float32),
        NamedSharding(mesh, P(axis_name, None)))
    out = fn(key, xs_dev)
    return np.asarray(out)[:n]


def sharded_fit_catalogue(posterior, features, mesh, n_samples: int = 1000,
                          quantiles=(0.16, 0.5, 0.84), key=None,
                          axis_name: str = "data"):
    """Catalogue fit (quantile table) with mesh-sharded sampling.

    Mirrors `catalogue.fit_catalogue`'s output for the quantile summary but
    computes the quantiles ON DEVICE per shard before gathering — only the
    (M, Q, D) summary crosses the host boundary, not the full sample cube.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    n_dev = mesh.shape[axis_name]
    xs_pad, n = pad_objects(features, n_dev)
    q = jnp.asarray(quantiles, jnp.float32)
    in_sharding = NamedSharding(mesh, P(axis_name, None))

    def fn(k, xs):
        # support-aware sampling (see make_sharded_sampler)
        s, _ = posterior.sample_batch_with_acceptance(k, xs, n_samples)
        return jnp.quantile(s, q, axis=1)  # (Q, M, D)

    fit = jax.jit(fn, in_shardings=(None, in_sharding))
    xs_dev = jax.device_put(jnp.asarray(xs_pad, jnp.float32), in_sharding)
    out = np.asarray(fit(key, xs_dev))  # (Q, M, D)
    return np.moveaxis(out, 0, 1)[:n]  # (M, Q, D)
