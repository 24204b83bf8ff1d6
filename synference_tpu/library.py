"""Mock-library generation and the reference-compatible HDF5 schema.

Replaces the reference's `GalaxyBasis`/`CombinedBasis`/`LibraryCreator` stack
(`/root/reference/src/synference/library.py:1497-6298`): instead of building
per-galaxy Synthesizer objects and running an external C pipeline in MPI
batches with rank-file merging, generation here is a host loop over jitted
`BatchSEDSimulator` chunks (optionally shard_mapped over a device mesh —
`parallel/generate.py`), accumulating directly into the final arrays.

The HDF5 *schema* is kept byte-compatible with the reference
(`Grid/{Photometry,Spectra,Parameters,SupplementaryParameters}` datasets +
`ParameterNames`/`FilterCodes`/`PhotometryUnits`/... attrs; writer
`library.py:4074-4153`, reader `utils.py:37-112`) so libraries interoperate
across frameworks. A `Model` group persists the full simulator recipe
(reference `library.py:2017-2132`, loaded `:5218-5551`) — but parameter
transforms are a named registry, not stored `exec` source.
"""

from __future__ import annotations

import datetime
import json
import os

import h5py
import numpy as np
from scipy.stats import qmc

from .cosmology import Cosmology
from .filters import FilterSet
from .grids import SPSGrid
from .sed import BatchSEDSimulator, EmissionConfig

__all__ = [
    "draw_from_hypercube",
    "save_library_hdf5",
    "load_library_hdf5",
    "LibraryCreator",
    "LibraryGenerator",
    "simulator_from_library",
]


def auto_batch_size(n: int, spectra_width: int | None = None) -> int:
    """Generation chunk size when the caller doesn't pick one: large enough
    to amortize the ~5 ms per-call fixed cost of a remote/tunneled dispatch
    (scripts/realsize_batch_ab.py: 16384 -> 65536 is ~2x SEDs/s at
    production grid sizes) but never padding a small request up to a huge
    chunk (a fixed 16384 padded an n=1000 run 16x).

    `spectra_width`: set to the λ-grid width when the chunk materializes
    full (B, L) spectra outputs (want_spectra / supplementary paths) — the
    65536 cap was A/B-measured photometry-only; a 65536×10⁴ fp32 spectra
    slab alone is ~2.6 GB on a 16 GB chip, so scale the cap down with the
    output width (reference point: 65536 rows at 2048 λ ≈ 512 MB)."""
    cap = 65536
    if spectra_width:
        cap = int(65536 * 2048 / max(spectra_width, 2048))
        cap = max(4096, (cap // 256) * 256)
    return int(min(cap, max(256, -(-n // 256) * 256)))


# ---------------------------------------------------------------------------
# Prior sampling (reference `draw_from_hypercube`, library.py:1021-1115)
# ---------------------------------------------------------------------------


def draw_from_hypercube(
    param_ranges: dict,
    n: int,
    rng: np.random.Generator | None = None,
    unlog_keys: list | None = None,
    engine: str = "lhc",
) -> dict:
    """Draw n quasi-random samples over named (lo, hi) ranges.

    `unlog_keys` entries are sampled in log space then raised to 10**x, with
    any "log_"/"log10_" prefix stripped from the returned key (reference
    semantics, library.py:1103-1107).

    engine: "lhc" (scrambled Latin hypercube), "sobol", "halton", "random".
    """
    unlog_keys = unlog_keys or []
    d = len(param_ranges)
    # default_rng normalizes None/int/Generator alike (scipy's samplers
    # accepted raw ints; the fast stratified branch below needs a Generator)
    seed = np.random.default_rng(rng)
    if engine == "lhc":
        if n >= 100_000:
            # scipy's LatinHypercube takes minutes at n ~ 1e7 (it dominated
            # a 10^7-SED library's wall clock, dwarfing the ~2 s of device
            # time); classic LHS is just a stratified per-dim permutation —
            # identical statistical properties, O(n log n), ~1 s at 1e7
            u = np.empty((int(n), d))
            for j in range(d):
                u[:, j] = (seed.permutation(int(n)) + seed.random(int(n))) / n
        else:
            sampler = qmc.LatinHypercube(d=d, rng=seed)
            u = sampler.random(int(n))
    elif engine == "sobol":
        u = qmc.Sobol(d=d, rng=seed).random(int(n))
    elif engine == "halton":
        u = qmc.Halton(d=d, rng=seed).random(int(n))
    elif engine == "random":
        u = seed.random((int(n), d))
    else:
        raise ValueError(f"unknown engine {engine!r}")

    out = {}
    for i, (key, (lo, hi)) in enumerate(param_ranges.items()):
        if not lo < hi:
            raise ValueError(f"range for {key!r} must have lo < hi")
        vals = (lo + (hi - lo) * u[:, i]).astype(np.float32)
        if key in unlog_keys:
            vals = (10.0**vals).astype(np.float32)
            for prefix in ("log10_", "log_"):
                if key.startswith(prefix):
                    key = key[len(prefix):]
                    break
        if not np.isfinite(vals).all():
            raise ValueError(f"non-finite samples for parameter {key!r}")
        out[key] = vals
    return out


# ---------------------------------------------------------------------------
# HDF5 schema (reference writer library.py:4074-4153 / reader utils.py:37-112)
# ---------------------------------------------------------------------------


def save_library_hdf5(
    path: str,
    parameters: np.ndarray,
    parameter_names: list,
    filter_codes: list | None = None,
    photometry: np.ndarray | None = None,
    spectra: np.ndarray | None = None,
    parameter_units: list | None = None,
    supplementary_parameters: np.ndarray | None = None,
    supplementary_parameter_names: list | None = None,
    supplementary_parameter_units: list | None = None,
    photometry_units: str = "nJy",
    model_name: str = "synference_tpu",
    extra_datasets: dict | None = None,
    extra_attrs: dict | None = None,
    model_group_writer=None,
) -> None:
    """Write a library in the reference schema.

    Array convention matches the reference: 2-D datasets are stored
    (n_features, n_samples) — i.e. `photometry` here is (F, N) and
    `parameters` (P, N).
    """
    with h5py.File(path, "w") as f:
        g = f.create_group("Grid")
        if photometry is not None:
            g.create_dataset("Photometry", data=photometry, compression="gzip")
        if spectra is not None:
            g.create_dataset("Spectra", data=spectra, compression="gzip")
        g.create_dataset("Parameters", data=parameters, compression="gzip")
        if supplementary_parameters is not None:
            g.create_dataset(
                "SupplementaryParameters",
                data=supplementary_parameters,
                compression="gzip",
            )
            f.attrs["SupplementaryParameterNames"] = list(
                supplementary_parameter_names or []
            )
            f.attrs["SupplementaryParameterUnits"] = list(
                supplementary_parameter_units
                or [""] * len(supplementary_parameter_names or [])
            )
        f.attrs["ParameterNames"] = list(parameter_names)
        if filter_codes is not None:
            try:
                f.attrs["FilterCodes"] = list(filter_codes)
            except (OSError, RuntimeError):
                # >64KB attr: reference falls back to a dataset + pointer attr
                g.create_dataset(
                    "FilterCodes",
                    data=np.array(filter_codes, dtype="S"),
                    compression="gzip",
                )
                f.attrs["FilterCodes"] = "/Grid/FilterCodes/"
        f.attrs["PhotometryUnits"] = photometry_units
        if parameter_units is not None:
            f.attrs["ParameterUnits"] = list(parameter_units)
        f.attrs["model_name"] = model_name
        f.attrs["CreationDT"] = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        for k, v in (extra_datasets or {}).items():
            g.create_dataset(k, data=v, compression="gzip")
        for k, v in (extra_attrs or {}).items():
            f.attrs[k] = v
        if model_group_writer is not None:
            model_group_writer(f.create_group("Model"))


def load_library_hdf5(path: str) -> dict:
    """Read a reference-schema library (reference `load_library_from_hdf5`,
    utils.py:37-112). Returns the same dict keys the reference produces."""
    with h5py.File(path, "r") as f:
        out = {
            "parameters": f["Grid/Parameters"][:],
            "parameter_names": list(f.attrs["ParameterNames"]),
            "photometry_units": str(f.attrs.get("PhotometryUnits", "nJy")),
            "parameter_units": (
                list(f.attrs["ParameterUnits"])
                if "ParameterUnits" in f.attrs
                else None
            ),
        }
        fc = f.attrs.get("FilterCodes")
        if isinstance(fc, (bytes, str)):
            fc = [c.decode() if isinstance(c, bytes) else str(c)
                  for c in f[str(fc)][:]]
        elif fc is not None:
            fc = [c.decode() if isinstance(c, bytes) else str(c) for c in fc]
        out["filter_codes"] = fc
        if "Grid/Photometry" in f:
            out["photometry"] = f["Grid/Photometry"][:]
        if "Grid/Spectra" in f:
            out["spectra"] = f["Grid/Spectra"][:]
        if "Grid/Wavelengths" in f:
            out["wavelengths"] = f["Grid/Wavelengths"][:]
        if "Grid/SupplementaryParameters" in f:
            out["supplementary_parameters"] = f["Grid/SupplementaryParameters"][:]
            out["supplementary_parameter_names"] = list(
                f.attrs["SupplementaryParameterNames"]
            )
            out["supplementary_parameter_units"] = list(
                f.attrs["SupplementaryParameterUnits"]
            )
    return out


class LibraryCreator:
    """Bring-your-own-library: write conforming HDF5 from raw arrays without
    a simulator (reference `LibraryCreator`, library.py:6100-6298)."""

    def __init__(
        self,
        parameters: np.ndarray,  # (N, P) or (P, N)
        parameter_names: list,
        photometry: np.ndarray | None = None,  # (N, F) or (F, N)
        filter_codes: list | None = None,
        spectra: np.ndarray | None = None,
        **extra,
    ):
        parameters = np.asarray(parameters)
        if parameters.shape[0] != len(parameter_names):
            parameters = parameters.T
        if parameters.shape[0] != len(parameter_names):
            raise ValueError("parameters shape does not match parameter_names")
        self.parameters = parameters
        self.parameter_names = list(parameter_names)
        if photometry is not None:
            photometry = np.asarray(photometry)
            if filter_codes and photometry.shape[0] != len(filter_codes):
                photometry = photometry.T
        self.photometry = photometry
        self.filter_codes = filter_codes
        self.spectra = spectra
        self.extra = extra

    def save(self, path: str, **kw) -> None:
        save_library_hdf5(
            path,
            parameters=self.parameters,
            parameter_names=self.parameter_names,
            photometry=self.photometry,
            filter_codes=self.filter_codes,
            spectra=self.spectra,
            **{**self.extra, **kw},
        )


# ---------------------------------------------------------------------------
# Library generation through the batch simulator
# ---------------------------------------------------------------------------


class LibraryGenerator:
    """θ-prior + BatchSEDSimulator -> HDF5 library.

    The TPU-native replacement for `GalaxyBasis.create_mock_library`
    (reference library.py:3022-3183): the entire per-galaxy object pipeline
    collapses into chunked jitted batches; supplementary quantities come from
    `supplementary.py` on the same intermediates.
    """

    def __init__(
        self,
        simulator: BatchSEDSimulator,
        param_ranges: dict,
        unlog_keys: list | None = None,
        supplementary: tuple = (),
        engine: str = "lhc",
        spectral_pipeline=None,
        emission_lines: tuple = (),
        embed_grid: bool = False,
    ):
        self.simulator = simulator
        self.param_ranges = dict(param_ranges)
        self.unlog_keys = list(unlog_keys or [])
        # embed_grid=True writes the full grid spectra into the Model group
        # (self-contained file); default stores name + content hash + axes
        # only — at realistic grid sizes embedded spectra dominate the file
        # (~120 MB vs ~4 MB of actual library data at 1e5 rows; the
        # reference stores grid name/dir only, library.py:2017-2132)
        self.embed_grid = bool(embed_grid)
        self.supplementary = tuple(supplementary)
        # per-galaxy observed line fluxes/EWs from the grid's Cloudy line
        # tables, recorded as supplementary columns (the reference records
        # these via pipeline.get_lines/get_observed_lines,
        # reference library.py:2611-2612)
        self.emission_lines = tuple(emission_lines)
        self.engine = engine
        # optional SpectralFeaturePipeline: stored spectra then live on the
        # instrument grid instead of the per-galaxy shifted rest grid
        self.spectral_pipeline = spectral_pipeline
        # the post-unlog key order must match simulator.param_names
        drawn_keys = []
        for key in self.param_ranges:
            k = key
            if key in self.unlog_keys:
                for prefix in ("log10_", "log_"):
                    if k.startswith(prefix):
                        k = k[len(prefix):]
                        break
            drawn_keys.append(k)
        missing = [p for p in simulator.param_names if p not in drawn_keys]
        if missing:
            raise ValueError(
                f"simulator params {missing} not covered by param_ranges"
            )
        self._drawn_keys = drawn_keys

    def _empty_library(self, want_spectra: bool) -> dict:
        """n=0 result with the same schema as a non-empty `generate` call."""
        sim = self.simulator
        n_params = len(sim.param_names)
        result = {
            "parameters": np.zeros((n_params, 0), np.float32),
            "parameter_names": list(sim.param_names),
            "photometry": np.zeros((len(sim.filters.codes), 0), np.float32),
            "filter_codes": list(sim.filters.codes),
            "photometry_units": "nJy",
        }
        if want_spectra:
            lam = (np.asarray(self.spectral_pipeline.obs_lam)
                   if self.spectral_pipeline is not None
                   else np.asarray(sim.grid.lam))
            result["spectra"] = np.zeros((lam.shape[0], 0), np.float32)
            result["wavelengths"] = lam
        supp_names = list(self.supplementary) + (
            [f"line_flux_{i}" for i in self.emission_lines]
            + [f"line_ew_{i}" for i in self.emission_lines]
        )
        if supp_names:
            result["supplementary_parameters"] = np.zeros(
                (len(supp_names), 0), np.float32)
            result["supplementary_parameter_names"] = supp_names
        return result

    def sample_parameters(self, n: int, rng=None) -> np.ndarray:
        """(N, P) θ draws in simulator.param_names order."""
        draws = draw_from_hypercube(
            self.param_ranges, n, rng=rng, unlog_keys=self.unlog_keys,
            engine=self.engine,
        )
        return np.stack(
            [draws[p] for p in self.simulator.param_names], axis=1
        )

    def sample_parameters_device(self, n: int, key):
        """(N, P) θ draws ON DEVICE in simulator.param_names order.

        Classic stratified LHC via jax.random (per-dim permutation + jitter
        — the same statistics as the host fast path); engine "random" draws
        plain uniforms. sobol/halton stay host-side (scipy-only).

        This is the device-resident generation entry: through a tunneled
        TPU every host→device transfer costs ~60 ms of latency
        (scripts/zsorted_overhead_probe.py), so production generation draws
        θ, sorts by redshift, plans windows, and simulates without the
        arrays ever visiting the host.
        """
        import jax
        import jax.numpy as jnp

        if self.engine not in ("lhc", "random"):
            raise ValueError(
                f"device sampling supports engines 'lhc'/'random', "
                f"not {self.engine!r} (sobol/halton are scipy host-side)")
        d = len(self.param_ranges)
        keys = jax.random.split(key, 2 * d)
        cols = {}
        for j, (pkey, (lo, hi)) in enumerate(self.param_ranges.items()):
            if not lo < hi:
                raise ValueError(f"range for {pkey!r} must have lo < hi")
            if self.engine == "lhc":
                perm = jax.random.permutation(keys[2 * j], int(n))
                # perm/n + u/n (NOT (perm+u)/n): above 2^24 the f32 add
                # perm + u would drop the jitter entirely
                u = (perm.astype(jnp.float32) / n
                     + jax.random.uniform(keys[2 * j + 1], (int(n),)) / n)
            else:
                u = jax.random.uniform(keys[2 * j + 1], (int(n),))
            vals = (lo + (hi - lo) * u).astype(jnp.float32)
            name = pkey
            if pkey in self.unlog_keys:
                vals = (10.0 ** vals).astype(jnp.float32)
                for prefix in ("log10_", "log_"):
                    if name.startswith(prefix):
                        name = name[len(prefix):]
                        break
            cols[name] = vals
        return jnp.stack(
            [cols[p] for p in self.simulator.param_names], axis=1)

    def generate(
        self,
        n: int,
        batch_size: int | None = None,
        seed: int = 0,
        out_path: str | None = None,
        want_spectra: bool = False,
        pmapped_fn=None,
        resume_path: str | None = None,
        presort: bool = False,
        zsorted_fused: bool | str = "auto",
        device_sampling: bool | None = None,
    ) -> dict:
        """Generate n mock SEDs; returns the library dict, optionally writes
        HDF5. `pmapped_fn` lets `parallel/generate.py` supply a shard_mapped
        batch function for multi-device meshes.

        `presort`: globally sort the θ draws by redshift before batching
        even though `pmapped_fn` drives the compute — for order-agnostic
        batch fns like the mesh-sharded z-sorted engine, each batch then
        spans a narrow z range and windows tightly. Rows are exchangeable,
        so this only changes library row order (tagged in resume chunks).

        `resume_path`: checkpoint PREFIX; each completed chunk is written
        once to `{resume_path}.chunk{ci:06d}.npz` and skipped on restart
        (the reference's batch-file resume, library.py:2516-2560). O(1)
        I/O per chunk — the round-1 single-npz version rewrote every
        accumulated chunk after each new one, O(n²) total. Chunk files are
        deleted on success.

        `zsorted_fused`: window-engine body choice — True/False force the
        fused Pallas megakernel / staged XLA body; "auto" (default)
        micro-probes both once per configuration and keeps the winner
        (see `_choose_zsorted_fused`).

        `device_sampling`: draw θ, sort, window-plan and simulate entirely
        on device (`sample_parameters_device` +
        `photometry_zsorted_device`) — no per-chunk host→device staging,
        which through a tunneled TPU costs ~60 ms/transfer and dominated
        the z-sorted engine (scripts/zsorted_overhead_probe.py). Default
        (None) auto-enables for photometry-only lhc/random generation when
        the window engine supports the model. The device RNG differs from
        the host sampler: same seed, different (equally valid) draws.
        """
        import jax

        if batch_size is None:
            wide = (want_spectra or bool(self.supplementary))
            batch_size = auto_batch_size(
                n,
                spectra_width=(
                    int(np.asarray(self.simulator.grid.lam).shape[0])
                    if wide else None
                ),
            )
        if n == 0:
            lib = self._empty_library(want_spectra)
            if out_path:
                save_library_hdf5(
                    out_path,
                    parameters=lib["parameters"],
                    parameter_names=lib["parameter_names"],
                    photometry=lib["photometry"],
                    filter_codes=lib["filter_codes"],
                    spectra=lib.get("spectra"),
                    supplementary_parameters=lib.get(
                        "supplementary_parameters"),
                    supplementary_parameter_names=lib.get(
                        "supplementary_parameter_names"),
                    extra_datasets=(
                        {"Wavelengths": lib["wavelengths"]}
                        if "wavelengths" in lib else None),
                    model_group_writer=lambda grp: _write_model_group(
                        grp, self.simulator, self.param_ranges,
                        self.unlog_keys, embed_grid=self.embed_grid,
                    ),
                )
            return lib

        sim = self.simulator
        device_ok = (
            pmapped_fn is None and not want_spectra
            and not self.supplementary and not self.emission_lines
            and self.engine in ("lhc", "random")
            and "redshift" in sim.param_names
            and getattr(sim, "_window_supported", lambda: False)()
        )
        if device_sampling is None:
            device_sampling = device_ok
        elif device_sampling and not device_ok:
            import warnings

            warnings.warn(
                "device_sampling=True requested but this generation "
                "needs host-side work (spectra/supplementary/lines/"
                "pmapped_fn, a scipy-only QMC engine, or a model the "
                "window engine can't run); using the host sampler",
                RuntimeWarning, stacklevel=2)
            device_sampling = False
        if device_sampling:
            return self._generate_device(
                n, batch_size, seed, out_path, resume_path, zsorted_fused)

        theta = self.sample_parameters(n, rng=np.random.default_rng(seed))

        # z-ordered generation (the window engine): library rows are
        # exchangeable, so sort the draws by redshift — consecutive chunks
        # then span narrow z ranges and `photometry_zsorted` contracts only
        # the λ/knot windows each chunk can reach (~6-8× fewer MXU FLOPs
        # than the full-support fused path at production grid sizes)
        use_zsorted = (
            pmapped_fn is None and not want_spectra
            and not self.supplementary
            and "redshift" in sim.param_names
            and getattr(sim, "_window_supported", lambda: False)()
        )
        zs_plan = None
        if use_zsorted:
            iz = sim.param_names.index("redshift")
            z_sorted = np.sort(theta[:, iz], kind="stable")
            sub_chunk = min(1024, batch_size)
            span = sim.zsorted_max_span(z_sorted, sub_chunk, batch_size)
            kc, w_cols = sim._zsorted_plan(span)
            if kc >= sim._n_knots or w_cols >= sim._wlam_sup.shape[0]:
                use_zsorted = False  # window is the whole table anyway
            else:
                # sort only once the engine is confirmed ON, so row order
                # observably matches the chunk files' `order` tag
                theta = theta[np.argsort(theta[:, iz], kind="stable")]
                zs_plan = (sub_chunk, kc, w_cols)

        presorted = False
        if (not use_zsorted and presort and pmapped_fn is not None
                and "redshift" in sim.param_names):
            iz = sim.param_names.index("redshift")
            theta = theta[np.argsort(theta[:, iz], kind="stable")]
            presorted = True

        row_order = "zsorted" if (use_zsorted or presorted) else "input"
        n_pad = int(np.ceil(n / batch_size) * batch_size)
        theta_pad = np.zeros((n_pad, theta.shape[1]), np.float32)
        theta_pad[:n] = theta
        # pad with the LAST row when z-ascending (keeps chunks narrow)
        theta_pad[n:] = (theta[-1:] if (use_zsorted or presorted)
                         else theta[:1])  # any valid row otherwise

        if pmapped_fn is not None:
            import inspect

            try:
                pos = [
                    p for p in
                    inspect.signature(pmapped_fn).parameters.values()
                    if p.kind in (p.POSITIONAL_ONLY,
                                  p.POSITIONAL_OR_KEYWORD)
                ]
                # opt-in by NAME: a bare 2-positional callable may mean
                # anything by its second arg (e.g. want_spectra); only a
                # parameter literally called `row_offset` receives the
                # absolute chunk offset
                pm_two_args = (len(pos) >= 2
                               and pos[1].name == "row_offset")
            except (TypeError, ValueError):
                pm_two_args = False
            if pm_two_args:
                # pass the absolute row offset (stochastic-particle RNG
                # independence across chunks, like the internal path)
                def batch_fn(t, _i=0, _fn=pmapped_fn):
                    return _fn(t, _i)
                use_offset = True
            else:
                batch_fn = pmapped_fn
                use_offset = False
        elif use_zsorted:
            sub_chunk, kc, w_cols = zs_plan
            fuse = self._choose_zsorted_fused(
                sim, zsorted_fused, sub_chunk, kc, w_cols,
                theta_pad[:batch_size], n_pad // batch_size, device=False)

            def batch_fn(t, _i=None):
                return {"photometry_njy": sim.photometry_zsorted(
                    t, sub_chunk=sub_chunk, kc=kc, w_cols=w_cols,
                    row_offset=0 if _i is None else _i, fused=fuse)}
        else:
            batch_fn = jax.jit(
                lambda t: sim.simulate(
                    t, want_spectra=want_spectra or bool(self.supplementary)
                )
            )

        def _chunk_file(ci):
            return f"{resume_path}.chunk{ci:06d}.npz"

        phot_chunks, spec_chunks, supp_chunks, line_chunks = [], [], [], []
        start_chunk = 0
        chunk_files = []
        if resume_path is not None:
            # consume the consecutive run of completed chunk files whose
            # metadata matches this generation call
            while os.path.exists(_chunk_file(start_chunk)):
                ck = np.load(_chunk_file(start_chunk), allow_pickle=True)
                # `order` guards against merging chunks computed under a
                # different row ordering (z-sorted vs input-order): the
                # z-sorted engine permutes θ, so same-(n, seed) chunks from
                # a run without it hold photometry for DIFFERENT rows
                ck_order = (str(ck["order"]) if "order" in ck.files
                            else "<pre-order-tag>")
                ck_sampler = (str(ck["sampler"]) if "sampler" in ck.files
                              else "host")
                if not (
                    int(ck["n"]) == n
                    and int(ck["batch_size"]) == batch_size
                    and int(ck["seed"]) == seed
                    and ck_order == row_order
                    and ck_sampler == "host"
                ):
                    break
                phot_chunks.append(ck["phot"])
                if want_spectra and "spec" in ck:
                    spec_chunks.append(ck["spec"])
                if self.supplementary and "supp" in ck:
                    supp_chunks.append(ck["supp"])
                if self.emission_lines and "lines" in ck:
                    line_chunks.append(ck["lines"])
                chunk_files.append(_chunk_file(start_chunk))
                start_chunk += 1

        for ci, i in enumerate(range(0, n_pad, batch_size)):
            if ci < start_chunk:
                continue
            pass_offset = use_zsorted or (pmapped_fn is not None
                                          and use_offset)
            out = (batch_fn(theta_pad[i: i + batch_size], i) if pass_offset
                   else batch_fn(theta_pad[i: i + batch_size]))
            # photometry-only, no resume: keep the DEVICE array — converting
            # here forces a host sync per chunk, serializing dispatch with
            # the tunnel round-trip; deferring lets the device run ahead
            # (HBM cost is just (n, F) floats). Spectra/resume paths still
            # need host copies per chunk.
            defer = (resume_path is None and not want_spectra
                     and not self.supplementary)
            phot_chunks.append(
                out["photometry_njy"] if defer
                else np.asarray(out["photometry_njy"]))
            if want_spectra:
                if self.spectral_pipeline is not None:
                    z_col = list(sim.param_names).index("redshift")
                    z_batch = theta_pad[i : i + batch_size, z_col]
                    spec_chunks.append(
                        np.asarray(
                            self.spectral_pipeline(out["fnu_njy"], z_batch)
                        )
                    )
                else:
                    spec_chunks.append(np.asarray(out["fnu_njy"]))
            if self.supplementary:
                from .supplementary import compute_supplementary

                supp = compute_supplementary(
                    self.supplementary, sim, theta_pad[i : i + batch_size], out
                )
                supp_chunks.append(np.asarray(supp))
            if self.emission_lines:
                lq = sim.line_quantities(
                    theta_pad[i : i + batch_size], self.emission_lines
                )
                line_chunks.append(
                    np.concatenate([lq["flux"], lq["ew_obs"]], axis=1)
                )
            if resume_path is not None:
                payload = {
                    "n": n, "batch_size": batch_size, "seed": seed,
                    "order": row_order,
                    "phot": phot_chunks[-1],
                }
                if want_spectra:
                    payload["spec"] = spec_chunks[-1]
                if self.supplementary:
                    payload["supp"] = supp_chunks[-1]
                if self.emission_lines:
                    payload["lines"] = line_chunks[-1]
                tmp = _chunk_file(ci) + ".tmp.npz"
                np.savez(tmp, **payload)
                os.replace(tmp, _chunk_file(ci))
                chunk_files.append(_chunk_file(ci))
        if resume_path is not None:
            for f in chunk_files:
                if os.path.exists(f):
                    os.remove(f)
            if os.path.exists(resume_path):  # legacy single-file checkpoint
                os.remove(resume_path)

        photometry = np.concatenate(
            [np.asarray(c) for c in phot_chunks], axis=0)[:n]
        result = {
            "parameters": theta.T,  # (P, N) reference convention
            "parameter_names": list(sim.param_names),
            "photometry": photometry.T,  # (F, N)
            "filter_codes": list(sim.filters.codes),
            "photometry_units": "nJy",
        }
        if want_spectra:
            result["spectra"] = np.concatenate(spec_chunks, axis=0)[:n].T
            # wavelength grid of the stored spectra (reference stores a
            # Wavelengths dataset alongside, library.py:2653-2684)
            result["wavelengths"] = (
                np.asarray(self.spectral_pipeline.obs_lam)
                if self.spectral_pipeline is not None
                else np.asarray(sim.grid.lam)
            )
        if self.supplementary:
            result["supplementary_parameters"] = np.concatenate(
                supp_chunks, axis=0
            )[:n].T
            result["supplementary_parameter_names"] = list(self.supplementary)
        if self.emission_lines:
            line_cols = np.concatenate(line_chunks, axis=0)[:n].T
            line_names = (
                [f"line_flux_{i}" for i in self.emission_lines]
                + [f"line_ew_{i}" for i in self.emission_lines]
            )
            if "supplementary_parameters" in result:
                result["supplementary_parameters"] = np.concatenate(
                    [result["supplementary_parameters"], line_cols], axis=0
                )
                result["supplementary_parameter_names"] += line_names
            else:
                result["supplementary_parameters"] = line_cols
                result["supplementary_parameter_names"] = line_names

        if out_path is not None:
            save_library_hdf5(
                out_path,
                parameters=result["parameters"],
                parameter_names=result["parameter_names"],
                photometry=result["photometry"],
                filter_codes=result["filter_codes"],
                spectra=result.get("spectra"),
                supplementary_parameters=result.get("supplementary_parameters"),
                supplementary_parameter_names=result.get(
                    "supplementary_parameter_names"
                ),
                extra_datasets=(
                    {"Wavelengths": result["wavelengths"]}
                    if "wavelengths" in result
                    else None
                ),
                model_group_writer=lambda grp: _write_model_group(
                    grp, sim, self.param_ranges, self.unlog_keys,
                    embed_grid=self.embed_grid,
                ),
            )
        return result

    @staticmethod
    def _choose_zsorted_fused(sim, requested, sub, kc, w_cols, probe_theta,
                              n_chunks, device):
        """Resolve the z-sorted engine's fused-window flag.

        requested True/False is honored (with a support check + warning).
        "auto" (the default) runs a ONE-TIME micro-probe per
        (sub, kc, w_cols, batch) configuration: time one warm
        production-shaped chunk through the staged XLA window body and the
        fused Pallas window body, keep the winner, cache the decision on
        the simulator (the auto_batch_size pattern). Data-driven because no
        static default is right: the fused body wins the 7-band configs
        but loses paper-63 (BENCH_r04: 2.87M vs 3.67M — at 63 filters the
        windowed conv matmuls are large enough that XLA's own tiling beats
        the VMEM-resident megakernel, whose working set starts spilling).
        Probing is skipped (staged body used) when the run is too short to
        amortize the loser's compile (< 4 chunks) or the megakernel is
        unsupported.
        """
        import jax

        mega_ok = sim._window_mega_supported()
        if requested != "auto":
            fuse = bool(requested) and mega_ok
            if requested and not mega_ok:
                import warnings

                warnings.warn(
                    "zsorted_fused=True requested but the windowed "
                    "megakernel is unsupported for this simulator "
                    "(see BatchSEDSimulator._window_mega_supported); "
                    "falling back to the staged XLA window body",
                    RuntimeWarning, stacklevel=3)
            return fuse
        if not mega_ok:
            return False
        key = ("dev" if device else "host", int(sub), int(kc), int(w_cols),
               int(probe_theta.shape[0]))
        cache = getattr(sim, "_zsorted_fused_probe", None)
        if cache is None:
            cache = sim._zsorted_fused_probe = {}
        if key in cache:
            return cache[key]
        if n_chunks < 4:
            return False
        # persistent decision cache: the probe compiles BOTH window bodies,
        # which costs real wall time every fresh process — ride the same
        # directory as the persistent XLA compile cache
        grid = getattr(sim, "grid", None)
        filts = getattr(sim, "filters", None)
        disk_key = None if grid is None or filts is None else "|".join(
            map(str, (
                getattr(grid, "name", ""), grid.n_wav, len(filts.codes),
                hash(tuple(filts.codes)) & 0xffff, *key)))
        disk = None
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if cache_dir and disk_key is not None:
            disk = os.path.join(cache_dir, "zsorted_probe.json")
            try:
                with open(disk) as f:
                    stored = json.load(f)
                if disk_key in stored:
                    cache[key] = bool(stored[disk_key])
                    return cache[key]
            except (OSError, ValueError):
                stored = {}
        import time as _time

        call = (sim.photometry_zsorted_device if device
                else sim.photometry_zsorted)

        def _force(r):
            # block_until_ready returns immediately on axon-tunnel buffers
            # (measured); a 1-element host fetch is the only reliable sync
            return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])

        times = {}
        for f_try in (False, True):
            try:
                _force(call(probe_theta, sub_chunk=sub, kc=kc,
                            w_cols=w_cols, fused=f_try))
                t0 = _time.time()
                _force(call(probe_theta, sub_chunk=sub, kc=kc,
                            w_cols=w_cols, fused=f_try))
                times[f_try] = _time.time() - t0
            except Exception:  # Mosaic VMEM/lowering failure -> never pick
                times[f_try] = float("inf")
        choice = bool(times[True] < times[False])
        cache[key] = choice
        if disk is not None:
            try:
                with open(disk) as f:
                    stored = json.load(f)
            except (OSError, ValueError):
                stored = {}
            stored[disk_key] = choice
            try:
                with open(disk, "w") as f:
                    json.dump(stored, f)
            except OSError:
                pass
        return choice

    def _generate_device(self, n, batch_size, seed, out_path, resume_path,
                         zsorted_fused):
        """Device-resident photometry-only generation: θ drawn, z-sorted,
        window-planned and simulated without leaving the device. One scalar
        readback (the global window plan), one final host copy of θ and
        photometry. See `generate(device_sampling=...)`."""
        import jax
        import jax.numpy as jnp

        sim = self.simulator
        theta_dev = self.sample_parameters_device(n, jax.random.PRNGKey(seed))
        iz = sim.param_names.index("redshift")
        theta_dev = theta_dev[jnp.argsort(theta_dev[:, iz], stable=True)]
        sub = int(min(1024, batch_size))
        bs = int(np.ceil(batch_size / sub) * sub)
        n_pad = int(np.ceil(n / bs) * bs)
        if n_pad != n:  # pad with the last (highest-z) row: windows stay tight
            theta_dev = jnp.concatenate(
                [theta_dev, jnp.repeat(theta_dev[-1:], n_pad - n, axis=0)],
                axis=0)
        # global window plan across every sub-chunk — the one readback
        z = theta_dev[:, iz]
        k = sim._knot_interval_device(z)
        span = int(jnp.max(k[sub - 1::sub] - k[::sub]))
        kc, w_cols = sim._zsorted_plan(span)
        windowed = (kc < sim._n_knots
                    and w_cols < int(sim._wlam_sup.shape[0]))
        if windowed:
            fuse = self._choose_zsorted_fused(
                sim, zsorted_fused, sub, kc, w_cols, theta_dev[:bs],
                n_pad // bs, device=True)

            def chunk_fn(t, i):
                return sim.photometry_zsorted_device(
                    t, sub_chunk=sub, row_offset=i, kc=kc, w_cols=w_cols,
                    fused=fuse)
        else:  # window IS the full table: dense fused path, still on device
            dense = jax.jit(sim.photometry)

            def chunk_fn(t, i):
                return dense(t)

        # start the θ host copy now; it overlaps the chunk dispatches
        theta_dev.copy_to_host_async()

        def _chunk_file(ci):
            return f"{resume_path}.chunk{ci:06d}.npz"

        phot_chunks = []
        start_chunk = 0
        chunk_files = []
        if resume_path is not None:
            while os.path.exists(_chunk_file(start_chunk)):
                ck = np.load(_chunk_file(start_chunk), allow_pickle=True)
                ck_sampler = (str(ck["sampler"]) if "sampler" in ck.files
                              else "host")
                if not (
                    int(ck["n"]) == n
                    and int(ck["batch_size"]) == bs
                    and int(ck["seed"]) == seed
                    and ck_sampler == "device"
                ):
                    break
                phot_chunks.append(ck["phot"])
                chunk_files.append(_chunk_file(start_chunk))
                start_chunk += 1

        for ci, i in enumerate(range(0, n_pad, bs)):
            if ci < start_chunk:
                continue
            out = chunk_fn(theta_dev[i:i + bs], i)
            # no resume: keep the device array — a host sync per chunk
            # would serialize dispatch with the tunnel round-trip
            phot_chunks.append(out if resume_path is None
                               else np.asarray(out))
            if resume_path is not None:
                tmp = _chunk_file(ci) + ".tmp.npz"
                np.savez(tmp, n=n, batch_size=bs, seed=seed,
                         order="zsorted", sampler="device",
                         phot=phot_chunks[-1])
                os.replace(tmp, _chunk_file(ci))
                chunk_files.append(_chunk_file(ci))
        if resume_path is not None:
            for f in chunk_files:
                if os.path.exists(f):
                    os.remove(f)

        photometry = np.concatenate(
            [np.asarray(c) for c in phot_chunks], axis=0)[:n]
        theta = np.asarray(theta_dev[:n])
        result = {
            "parameters": theta.T,  # (P, N) reference convention
            "parameter_names": list(sim.param_names),
            "photometry": photometry.T,  # (F, N)
            "filter_codes": list(sim.filters.codes),
            "photometry_units": "nJy",
        }
        if out_path is not None:
            save_library_hdf5(
                out_path,
                parameters=result["parameters"],
                parameter_names=result["parameter_names"],
                photometry=result["photometry"],
                filter_codes=result["filter_codes"],
                model_group_writer=lambda grp: _write_model_group(
                    grp, sim, self.param_ranges, self.unlog_keys,
                    embed_grid=self.embed_grid,
                ),
            )
        return result


# ---------------------------------------------------------------------------
# Model group: persist + reconstruct the simulator
# (reference stores grid/emission/instrument/cosmology/SFH recipe,
#  library.py:2017-2132; reconstruction :5218-5551)
# ---------------------------------------------------------------------------


def grid_content_hash(grid: SPSGrid) -> str:
    """Deterministic sha256 over the grid's axes + spectra content.

    Stored in the Model group so `simulator_from_library` can verify that a
    user-supplied grid matches the one the library was generated from (the
    reference records grid name/dir and trusts the name, library.py:2017-2132;
    a content hash catches silently-regenerated grids too)."""
    import hashlib

    h = hashlib.sha256()
    h.update(np.ascontiguousarray(grid.log10_ages, np.float64).tobytes())
    h.update(np.ascontiguousarray(grid.metallicities, np.float64).tobytes())
    h.update(np.ascontiguousarray(grid.lam, np.float64).tobytes())
    for name, vals in grid.extra_axes.items():
        h.update(name.encode())
        h.update(np.ascontiguousarray(vals, np.float64).tobytes())
    for t in sorted(grid.spectra):
        h.update(t.encode())
        h.update(np.ascontiguousarray(grid.spectra[t], np.float32).tobytes())
    return h.hexdigest()


def _write_model_group(grp: h5py.Group, sim: BatchSEDSimulator,
                       param_ranges=None, unlog_keys=None,
                       embed_grid: bool = False) -> None:
    grp.attrs["grid_name"] = sim.grid.name
    grp.attrs["simulator_class"] = type(sim).__name__
    if hasattr(sim, "model_extra"):
        grp.attrs["simulator_extra"] = json.dumps(sim.model_extra())
    grp.attrs["sfh"] = sim.sfh_name
    grp.attrs["zdist"] = sim.zdist_name
    grp.attrs["param_names"] = list(sim.param_names)
    grp.attrs["emission_config"] = json.dumps(sim.emission.to_dict())
    grp.attrs["cosmology"] = json.dumps(sim.cosmology.to_dict())
    grp.attrs["fixed_params"] = json.dumps(
        {k: float(v) for k, v in sim.fixed_params.items()}
    )
    if param_ranges is not None:
        grp.attrs["param_ranges"] = json.dumps(
            {k: [float(v[0]), float(v[1])] for k, v in param_ranges.items()}
        )
    if unlog_keys is not None:
        grp.attrs["unlog_keys"] = json.dumps(list(unlog_keys))
    sim.filters.to_hdf5(grp.create_group("instrument"))
    # grid reference: name + content hash + axes metadata always; full
    # spectra only when embed_grid (opt-in self-contained files)
    gg = grp.create_group("grid")
    gg.attrs["name"] = sim.grid.name
    gg.attrs["content_hash"] = grid_content_hash(sim.grid)
    gg.attrs["spectra_types"] = sorted(sim.grid.spectra.keys())
    gg.attrs["embedded"] = bool(embed_grid)
    gg.create_dataset("log10_ages", data=sim.grid.log10_ages)
    gg.create_dataset("metallicities", data=sim.grid.metallicities)
    gg.create_dataset("lam", data=sim.grid.lam)
    if sim.grid.extra_axes:
        ea = gg.create_group("extra_axes")
        ea.attrs["order"] = list(sim.grid.extra_axis_names)
        for k, v in sim.grid.extra_axes.items():
            ea.create_dataset(k, data=np.asarray(v))
    if embed_grid:
        sp = gg.create_group("spectra")
        for t, s in sim.grid.spectra.items():
            sp.create_dataset(t, data=s, compression="gzip")


def simulator_from_library(path: str, grid: SPSGrid | None = None,
                           verify_grid: bool = True,
                           **overrides) -> BatchSEDSimulator:
    """Reconstruct the forward model from a library's Model group
    (the analogue of `GalaxySimulator.from_library`, reference
    library.py:5218-5551 — minus the stored-source `exec`).

    Args:
        grid: the SPS grid to use. Required when the library stored only a
            grid reference (the default since embed_grid=False); its
            content hash is checked against the stored one.
        verify_grid: set False to skip the hash check (e.g. deliberately
            swapping a re-resampled grid).
    """
    with h5py.File(path, "r") as f:
        if "Model" not in f:
            raise ValueError(f"{path} has no Model group")
        grp = f["Model"]
        sfh = str(grp.attrs["sfh"])
        zdist = str(grp.attrs["zdist"])
        param_names = tuple(str(p) for p in grp.attrs["param_names"])
        emission = EmissionConfig.from_dict(
            json.loads(grp.attrs["emission_config"])
        )
        cosmology = Cosmology.from_dict(json.loads(grp.attrs["cosmology"]))
        fixed = json.loads(grp.attrs["fixed_params"])
        filters = FilterSet.from_hdf5(grp["instrument"])
        # subclass dispatch (AGN simulators etc.): stored class name ->
        # registry; importing .agn registers its classes
        from . import agn  # noqa: F401  (populates SIMULATOR_REGISTRY)
        from .sed import SIMULATOR_REGISTRY
        cls_name = str(grp.attrs.get("simulator_class",
                                     "BatchSEDSimulator"))
        sim_cls = SIMULATOR_REGISTRY.get(cls_name, BatchSEDSimulator)
        extra = json.loads(str(grp.attrs.get("simulator_extra", "{}")))
        gg = grp["grid"]
        stored_hash = str(gg.attrs.get("content_hash", ""))
        if grid is None:
            if "spectra" not in gg:
                raise ValueError(
                    f"{path} stores only a grid reference "
                    f"(name={gg.attrs['name']!r}, "
                    f"hash={stored_hash[:12]}...); pass the matching "
                    "SPSGrid via grid=..., or regenerate the library with "
                    "embed_grid=True for a self-contained file")
            extra = {}
            if "extra_axes" in gg:
                order = [str(k) for k in gg["extra_axes"].attrs["order"]]
                extra = {k: gg["extra_axes"][k][:] for k in order}
            grid = SPSGrid(
                name=str(gg.attrs["name"]),
                log10_ages=gg["log10_ages"][:],
                metallicities=gg["metallicities"][:],
                lam=gg["lam"][:],
                spectra={t: gg["spectra"][t][:] for t in gg["spectra"]},
                extra_axes=extra,
            )
        elif verify_grid and stored_hash:
            supplied = grid_content_hash(grid)
            if supplied != stored_hash:
                raise ValueError(
                    f"supplied grid content hash {supplied[:12]}... does "
                    f"not match the library's {stored_hash[:12]}... "
                    f"(stored grid_name={gg.attrs['name']!r}); pass "
                    "verify_grid=False to override")
    kwargs = dict(
        grid=grid, filters=filters, param_names=param_names, sfh=sfh,
        zdist=zdist, emission=emission, cosmology=cosmology,
        fixed_params=fixed,
    )
    kwargs.update(extra)
    kwargs.update(overrides)
    return sim_cls(**kwargs)
