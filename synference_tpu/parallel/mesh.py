"""Mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_along", "P", "NamedSharding"]


def make_mesh(shape: tuple | None = None, axis_names: tuple = ("data",),
              devices=None) -> Mesh:
    """Build a Mesh over available devices.

    Args:
        shape: per-axis sizes; default puts all devices on the first axis.
        axis_names: e.g. ("data",) or ("ensemble", "data").
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_along(arr, mesh: Mesh, axis_name: str = "data", dim: int = 0):
    """Place an array with dimension `dim` sharded over `axis_name`."""
    spec = [None] * jnp.asarray(arr).ndim
    spec[dim] = axis_name
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))
