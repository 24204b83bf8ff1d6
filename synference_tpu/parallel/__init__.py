"""Device-mesh parallelism: sharded generation, data-parallel + ensemble-
parallel training.

The reference's only multi-device machinery is MPI rank-sharding of mock
generation with per-rank HDF5 files merged on rank 0
(`/root/reference/src/synference/library.py:112-122`, `:3127-3140`,
`utils.py:2214-2328`) and single-device torch training. Here the equivalents
are jax.sharding primitives over one global mesh:

- generation: the θ batch is sharded along the sample axis; the jitted batch
  simulator runs SPMD with zero communication (XLA inserts nothing — it's
  embarrassingly parallel), output lands as one globally-sharded array.
- training: data-parallel over the "data" mesh axis (XLA inserts the psum
  for gradients) × ensemble-parallel over the "ensemble" axis (each device
  group trains its own flow member — the reference trains members serially).
"""

from .mesh import make_mesh, shard_along
from .generate import make_sharded_photometry_fn, sharded_generate
from .sample import (make_sharded_sampler, sharded_fit_catalogue,
                     sharded_sample_batch)
from .train import make_sharded_train_step

__all__ = [
    "make_mesh",
    "shard_along",
    "make_sharded_photometry_fn",
    "sharded_generate",
    "make_sharded_train_step",
    "make_sharded_sampler",
    "sharded_sample_batch",
    "sharded_fit_catalogue",
]
