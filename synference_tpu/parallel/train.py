"""Sharded NPE training: data-parallel × ensemble-parallel.

Single-device training in this package already fuses whole epochs
(`train.py`); this module lifts the train step onto a 2-D
("ensemble", "data") mesh:

- flow parameters are stacked over members and sharded on "ensemble" —
  each device row owns a subset of ensemble members (the reference trains
  members serially on one GPU, sbi_runner.py:4805-4901);
- every minibatch is sharded over "data" — XLA inserts the gradient psum
  across the data axis automatically from the shardings (no hand-written
  collectives, per the scaling-book recipe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_sharded_train_step", "init_sharded_ensemble"]


def init_sharded_ensemble(flow, key, theta, x, n_members: int, mesh: Mesh,
                          ensemble_axis: str = "ensemble"):
    """Initialize stacked member params sharded over the ensemble axis."""
    keys = jax.random.split(key, n_members)
    params = jax.vmap(lambda k: flow.init(k, theta, x))(keys)
    sharding = NamedSharding(mesh, P(ensemble_axis))

    def place(leaf):
        spec = [ensemble_axis] + [None] * (leaf.ndim - 1)
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    del sharding
    return jax.tree_util.tree_map(place, params)


def make_sharded_train_step(flow, tx, mesh: Mesh,
                            data_axis: str = "data",
                            ensemble_axis: str = "ensemble"):
    """Build a jitted (params, opt_state, θ_batch, x_batch) -> ... step.

    θ/x batches should be placed sharded over `data_axis`; params over
    `ensemble_axis`. The returned step runs every ensemble member on its
    device row while the batch is split across the data axis; gradient
    reduction over data shards comes out of XLA's SPMD partitioner.
    """
    batch_sharding = NamedSharding(mesh, P(data_axis, None))

    def member_loss(p, tb, xb):
        return -flow.log_prob(p, tb, xb).mean()

    def step(params, opt_state, tb, xb):
        def one_member(p, s):
            loss, g = jax.value_and_grad(member_loss)(p, tb, xb)
            updates, s = tx.update(g, s, p)
            return optax.apply_updates(p, updates), s, loss

        params, opt_state, losses = jax.vmap(
            one_member, in_axes=(0, 0)
        )(params, opt_state)
        return params, opt_state, losses

    member_sharding = NamedSharding(mesh, P(ensemble_axis))
    return jax.jit(
        step,
        in_shardings=(
            member_sharding,  # pytree prefix: shard member axis of params
            member_sharding,
            batch_sharding,
            batch_sharding,
        ),
    ), batch_sharding


def place_batch(arr, mesh: Mesh, data_axis: str = "data"):
    return jax.device_put(
        jnp.asarray(arr), NamedSharding(mesh, P(data_axis, None))
    )
