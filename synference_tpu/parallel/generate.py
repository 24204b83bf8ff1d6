"""Sharded mock-SED generation over a device mesh.

The TPU-native replacement for the reference's MPI data-parallel generation +
rank-file merge (`/root/reference/src/synference/library.py:3127-3140`,
`utils.py:2214-2328`): θ is sharded along the sample axis, every device runs
the identical jitted simulator on its shard, and the result is one global
sharded array — no files, no merge step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["make_sharded_photometry_fn", "sharded_generate"]


def make_sharded_photometry_fn(sim, mesh, axis_name: str = "data",
                               want_spectra: bool = False):
    """jit the batch simulator with in/out shardings along the sample axis.

    Returns a function θ (B, P) -> outputs with B sharded over `axis_name`;
    B must be divisible by the axis size.
    """
    in_sharding = NamedSharding(mesh, P(axis_name, None))

    def fn(theta):
        return sim.simulate(theta, want_spectra=want_spectra)

    return jax.jit(fn, in_shardings=(in_sharding,))


def sharded_generate(generator, n: int, mesh, batch_size: int = 16384,
                     seed: int = 0, out_path: str | None = None,
                     axis_name: str = "data", want_spectra: bool = False):
    """LibraryGenerator.generate with mesh-sharded batches.

    Pads the batch size to a multiple of the mesh axis so shards stay equal.
    """
    axis_size = mesh.shape[axis_name]
    bs = int(np.ceil(batch_size / axis_size) * axis_size)
    fn = make_sharded_photometry_fn(
        generator.simulator, mesh, axis_name,
        want_spectra=want_spectra or bool(generator.supplementary),
    )

    in_sharding = NamedSharding(mesh, P(axis_name, None))

    def batch_fn(theta_np):
        theta = jax.device_put(jnp.asarray(theta_np), in_sharding)
        return fn(theta)

    return generator.generate(
        n, batch_size=bs, seed=seed, out_path=out_path,
        want_spectra=want_spectra, pmapped_fn=batch_fn,
    )
