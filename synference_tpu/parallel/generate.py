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
    """shard_map the batch simulator along the sample axis.

    Returns a function θ (B, P) -> outputs with B sharded over `axis_name`;
    B must be divisible by the axis size.

    shard_map (not jit-with-in_shardings): the per-shard program runs as-is
    on every device, so GSPMD-opaque ops — the Pallas megakernel
    (`ops/fused_sed.py`) and the exact bank/roll kernels — stay partitioned
    instead of being all-gathered onto every chip. For the pure-jnp paths
    the two are equivalent (the batch axis is embarrassingly parallel; no
    collectives in the body). The per-shard row offset keeps stochastic
    particle realizations independent across shards.
    """
    in_spec = P(axis_name, None)

    def local_fn(theta):
        # theta here is the LOCAL (B/axis_size, P) shard
        off = jax.lax.axis_index(axis_name) * theta.shape[0]
        return sim.simulate(theta, want_spectra=want_spectra,
                            row_offset=off)

    def fn(theta):
        shapes = jax.eval_shape(
            lambda t: sim.simulate(t, want_spectra=want_spectra), theta)
        out_specs = jax.tree_util.tree_map(
            lambda s: P(axis_name, *([None] * (s.ndim - 1))), shapes)
        return jax.shard_map(local_fn, mesh=mesh, in_specs=in_spec,
                             out_specs=out_specs, check_vma=False)(theta)

    return jax.jit(fn)


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
