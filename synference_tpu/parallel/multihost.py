"""Multi-host initialization for pod-scale runs.

The reference's multi-node story is MPI rank sharding + SLURM launchers
(`/root/reference/examples/library_generation/scripts/make_library.slurm`,
`library.py:3127-3140`). The TPU equivalent is `jax.distributed.initialize`
+ one global mesh: every host runs the same program, arrays are globally
sharded, and XLA routes collectives over ICI within a slice and DCN across
slices. Generation and training code in this package is written against the
global mesh and needs no changes for multi-host.
"""

from __future__ import annotations

__all__ = ["initialize_multihost", "global_mesh"]


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Initialize jax.distributed (no-op if already initialized or
    single-process). On Cloud TPU pods the arguments auto-detect from the
    environment; pass them explicitly elsewhere.

    Returns (process_index, process_count)."""
    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() == 1:
            # auto-detection path (TPU pods); safe to skip standalone
            try:
                jax.distributed.initialize()
            except Exception:
                pass
    except RuntimeError:
        pass  # already initialized
    return jax.process_index(), jax.process_count()


def global_mesh(axis_names=("data",), shape=None):
    """Mesh over ALL devices across hosts (jax.devices() is global after
    jax.distributed.initialize)."""
    from .mesh import make_mesh

    return make_mesh(shape=shape, axis_names=axis_names)
