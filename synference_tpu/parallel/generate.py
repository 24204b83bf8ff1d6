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

__all__ = ["make_sharded_photometry_fn", "make_sharded_zsorted_fn",
           "sharded_generate"]


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


def make_sharded_zsorted_fn(sim, mesh, axis_name: str = "data",
                            sub_chunk: int = 1024,
                            kc: int | None = None,
                            w_cols: int | None = None):
    """Mesh-sharded z-sorted window engine (`sed.photometry_zsorted`).

    Returns fn(θ (B, P) unsorted numpy) -> {"photometry_njy": (B, F)} in
    INPUT row order: the batch is sorted by redshift host-side, split into
    narrow-z sub-chunks, the sub-chunk axis is sharded over `axis_name`
    (each device sweeps a contiguous z range of the batch), and the output
    is unsorted back. Drop-in `pmapped_fn` for `LibraryGenerator.generate`.

    Callers batching many chunks can pass GLOBAL (kc, w_cols) window sizes
    (from `sim.zsorted_max_span` + `sim._zsorted_plan` over the whole
    θ set) so every batch reuses one compiled program, exactly like the
    single-host `photometry_zsorted` contract.
    """
    axis_size = mesh.shape[axis_name]
    if "redshift" in sim.param_names:
        iz = sim.param_names.index("redshift")
    else:
        iz = None
    jit_cache = {}
    plain_cache = []

    def plain_fallback(theta):
        # window is the whole table — run the plain shard map ONCE-built
        # (rebuilding per call would retrace/recompile every batch), with
        # the batch padded to the mesh axis as shard_map requires
        if not plain_cache:
            plain_cache.append(
                make_sharded_photometry_fn(sim, mesh, axis_name))
        b = theta.shape[0]
        bp = int(np.ceil(b / axis_size) * axis_size)
        if bp != b:
            theta = np.concatenate(
                [theta, np.repeat(theta[-1:], bp - b, 0)])
        out = plain_cache[0](jnp.asarray(theta))
        return {k: np.asarray(v)[:b] for k, v in out.items()}

    def fn(theta_np, row_offset: int = 0):
        theta = np.atleast_2d(np.asarray(theta_np, np.float32))
        b = theta.shape[0]
        z = (theta[:, iz] if iz is not None
             else np.full(b, float(sim.fixed_params.get("redshift", 0.0)),
                          np.float32))
        order = np.argsort(z, kind="stable")
        th = theta[order]
        zs = z[order]
        sub = int(min(sub_chunk, b))
        n_sub = int(np.ceil(b / sub))
        # pad sub-chunk count to the mesh axis (repeat the top-z sub-chunk)
        n_sub = int(np.ceil(n_sub / axis_size) * axis_size)
        pad = n_sub * sub - b
        if pad:
            th = np.concatenate([th, np.repeat(th[-1:], pad, 0)])
            zs = np.concatenate([zs, np.repeat(zs[-1:], pad)])
        plan = sim._zsorted_window_plan(zs, sub, kc=kc, w_cols=w_cols)
        if plan is None:
            return plain_fallback(theta)
        kc_b, w_b, k0, l0 = plan
        t_mix, m_igm, den_knots = sim._zsorted_tables()
        key = (sub, w_b, kc_b, n_sub)
        run_sharded = jit_cache.get(key)
        if run_sharded is None:
            run = sim._zsorted_run_raw(sub, w_b, kc_b)
            ax = P(axis_name)
            run_sharded = jax.jit(jax.shard_map(
                run, mesh=mesh,
                in_specs=(P(axis_name, None, None), P(axis_name, None),
                          ax, ax, P(), P(), P(), P(), P()),
                out_specs=P(axis_name, None), check_vma=False))
            jit_cache[key] = run_sharded
        shard = NamedSharding(mesh, P(axis_name))
        rep = NamedSharding(mesh, P())
        ids = (np.arange(n_sub * sub, dtype=np.int32)
               + np.int32(row_offset)).reshape(n_sub, sub)
        out = run_sharded(
            jax.device_put(jnp.asarray(th.reshape(n_sub, sub, -1)),
                           NamedSharding(mesh, P(axis_name, None, None))),
            jax.device_put(jnp.asarray(ids),
                           NamedSharding(mesh, P(axis_name, None))),
            jax.device_put(jnp.asarray(l0), shard),
            jax.device_put(jnp.asarray(k0), shard),
            jax.device_put(t_mix, rep), jax.device_put(m_igm, rep),
            jax.device_put(den_knots, rep),
            jax.device_put(sim._dust_curve_sup, rep),
            jax.device_put(sim._wlam_sup, rep),
        )
        inv = np.empty_like(order)
        inv[order] = np.arange(b)
        return {"photometry_njy": np.asarray(out)[:b][inv]}

    return fn


def sharded_generate(generator, n: int, mesh, batch_size: int | None = None,
                     seed: int = 0, out_path: str | None = None,
                     axis_name: str = "data", want_spectra: bool = False,
                     zsorted: bool | None = None):
    """LibraryGenerator.generate with mesh-sharded batches.

    Pads the batch size to a multiple of the mesh axis so shards stay equal.
    Default batch size matches `LibraryGenerator.generate`'s auto rule
    (min(65536, n rounded up to 256) — amortizes per-dispatch fixed cost).

    `zsorted` (default: auto) routes photometry-only generation through the
    mesh-sharded z-sorted window engine with globally z-presorted draws —
    each device sweeps a contiguous narrow-z slice of each batch, matching
    the single-host engine's FLOP savings.
    """
    axis_size = mesh.shape[axis_name]
    if batch_size is None:
        from ..library import auto_batch_size

        batch_size = auto_batch_size(n)
    bs = int(np.ceil(batch_size / axis_size) * axis_size)
    sim = generator.simulator
    phot_only = not want_spectra and not generator.supplementary
    if zsorted is None:
        zsorted = (phot_only and "redshift" in sim.param_names
                   and getattr(sim, "_window_supported", lambda: False)())
    if zsorted:
        if not phot_only:
            raise ValueError("zsorted sharded generation is photometry-only")
        # Plan ONE global window from the (deterministic) seeded draws so
        # every batch reuses a single compiled shard-mapped program —
        # per-batch planning gave each batch its own (kc, w_cols) jit key,
        # i.e. a fresh multi-minute shard_map compile over the tunnel.
        # generate() feeds globally z-presorted batches of size bs, so the
        # global per-sub-chunk span bounds every batch's span.
        sub = min(1024, bs)
        theta = generator.sample_parameters(
            n, rng=np.random.default_rng(seed))
        iz = sim.param_names.index("redshift")
        z_sorted = np.sort(theta[:, iz], kind="stable")
        kc, w_cols = sim._zsorted_plan(
            sim.zsorted_max_span(z_sorted, sub, bs))
        if kc >= sim._n_knots or w_cols >= sim._wlam_sup.shape[0]:
            zsorted = False  # window is the whole table — dense path below
        else:
            zfn = make_sharded_zsorted_fn(
                sim, mesh, axis_name, sub_chunk=sub, kc=kc, w_cols=w_cols)
            return generator.generate(
                n, batch_size=bs, seed=seed, out_path=out_path,
                pmapped_fn=zfn, presort=True,
            )
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
