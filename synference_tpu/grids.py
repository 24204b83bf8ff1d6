"""SPS grid loading and representation.

The reference drives Synthesizer's `Grid` objects + C/OpenMP pipeline
(`/root/reference/src/synference/library.py:2562-2619`). Here the grid is a
plain pytree of device arrays: `spectra[stype]` has shape
(n_ages, n_mets, n_wav) in erg/s/Hz per Msun formed, so the whole SED hot
loop becomes one batched matmul on the MXU (see `sed.py`).

`SPSGrid.from_hdf5` understands the Synthesizer grid HDF5 layout
(groups `axes/` and `spectra/`, axis names in the `axes` file attribute) so
users can point it at the same grid files the reference uses.
`make_synthetic_grid` builds a small deterministic physically-shaped grid for
tests/benchmarks (the miniature-real-asset pattern of the reference test
suite, reference tests/conftest.py:57-70).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import h5py
import jax.numpy as jnp
import numpy as np

__all__ = ["SPSGrid", "make_synthetic_grid"]


@dataclass
class SPSGrid:
    """An (age, metallicity, wavelength) SPS model grid.

    Attributes:
        name: grid identifier (e.g. "bpass-2.2.1-bin_chabrier03-0.1,300.0").
        log10_ages: (A,) log10(age/yr), ascending.
        metallicities: (Z,) absolute metallicities, ascending.
        lam: (L,) rest-frame wavelengths [Angstrom], ascending.
        spectra: dict spectra-type -> (A, Z, L) float32, erg/s/Hz/Msun.
            Synthesizer-compatible type names: "incident", "transmitted",
            "nebular", "total".
    """

    name: str
    log10_ages: np.ndarray
    metallicities: np.ndarray
    lam: np.ndarray
    spectra: dict = field(default_factory=dict)
    # optional Cloudy line tables (Synthesizer grids carry a `lines/` group;
    # the reference records per-galaxy line quantities from them via
    # pipeline.get_lines/get_observed_lines, reference library.py:2611-2612):
    #   {"ids": [str], "wavelength": (Nl,) rest Å,
    #    "luminosity": (A, Z, Nl) erg/s/Msun, "continuum": (A, Z, Nl)
    #    erg/s/Hz/Msun}
    lines: dict | None = None

    # ------------------------------------------------------------------
    @property
    def n_ages(self) -> int:
        return len(self.log10_ages)

    @property
    def n_mets(self) -> int:
        return len(self.metallicities)

    @property
    def n_wav(self) -> int:
        return len(self.lam)

    @property
    def ages_yr(self) -> np.ndarray:
        return 10.0**self.log10_ages

    @property
    def age_bin_edges_yr(self) -> np.ndarray:
        """(A+1,) bin edges in linear yr: geometric midpoints in log space,
        closed at 0 below and at the top age above."""
        la = self.log10_ages
        mids = 0.5 * (la[1:] + la[:-1])
        lo = np.concatenate([[0.0], 10.0**mids])  # first bin starts at t=0
        hi = 10.0 ** np.concatenate([mids, [la[-1]]])
        return np.concatenate([lo, [hi[-1]]])

    @property
    def log10_metallicities(self) -> np.ndarray:
        return np.log10(self.metallicities)

    def spectra_device(self, stype: str = "incident", dtype=jnp.float32):
        """Grid spectra as a device array reshaped (A*Z, L) for contraction."""
        s = self.spectra[stype]
        return jnp.asarray(s.reshape(-1, s.shape[-1]), dtype=dtype)

    @property
    def is_log_uniform(self) -> bool:
        """True when lam is geometrically spaced (required for the
        shift-based photometry fast path in `sed.py`)."""
        ratios = np.diff(np.log10(self.lam))
        return bool(np.allclose(ratios, ratios[0], rtol=1e-4))

    def resampled_loglam(self, n_wav: int | None = None) -> "SPSGrid":
        """Return a copy with spectra interpolated onto a geometric λ grid.

        Real SPS grid files often mix linear/log λ spacing; the TPU simulator
        needs uniform log spacing so a redshift becomes a constant index
        shift. Point interpolation is adequate at comparable resolution.
        """
        n = n_wav or self.n_wav
        new_lam = np.geomspace(self.lam[0], self.lam[-1], n)
        new_spectra = {}
        for t, s in self.spectra.items():
            flat = s.reshape(-1, s.shape[-1])
            out = np.empty((flat.shape[0], n), dtype=np.float32)
            for i in range(flat.shape[0]):
                out[i] = np.interp(new_lam, self.lam, flat[i])
            new_spectra[t] = out.reshape(*s.shape[:-1], n)
        return SPSGrid(
            name=self.name,
            log10_ages=self.log10_ages,
            metallicities=self.metallicities,
            lam=new_lam,
            spectra=new_spectra,
            lines=self.lines,  # λ-grid independent
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_hdf5(cls, path: str, spectra_types: tuple = None) -> "SPSGrid":
        """Load a Synthesizer-format grid HDF5.

        Layout (as consumed by the reference via `synthesizer.grid.Grid`):
        `axes` file attr lists axis names; datasets under `axes/`
        ("ages" [yr] or "log10ages"/"log10age", "metallicities"/"metallicity");
        `spectra/wavelength` [Angstrom]; each other dataset under `spectra/`
        is a spectra type with shape (A, Z, L).
        """
        with h5py.File(path, "r") as f:
            axes_grp = f["axes"]

            def _axis(*names):
                for n in names:
                    if n in axes_grp:
                        return np.asarray(axes_grp[n][:], dtype=np.float64)
                raise KeyError(f"none of {names} in axes/ of {path}")

            try:
                ages = _axis("ages", "age")
                log10_ages = np.log10(ages)
            except KeyError:
                log10_ages = _axis("log10ages", "log10age")
            mets = _axis("metallicities", "metallicity")

            spec_grp = f["spectra"]
            lam = np.asarray(spec_grp["wavelength"][:], dtype=np.float64)
            types = spectra_types or [
                k for k in spec_grp.keys() if k != "wavelength"
            ]
            spectra = {
                t: np.asarray(spec_grp[t][:], dtype=np.float32) for t in types
            }
            name = str(f.attrs.get("grid_name", path.rsplit("/", 1)[-1]))
            lines = cls._read_lines(f)
        return cls(
            name=name,
            log10_ages=log10_ages,
            metallicities=mets,
            lam=lam,
            spectra=spectra,
            lines=lines,
        )

    @staticmethod
    def _read_lines(f) -> dict | None:
        """Read the optional `lines/` group: either the stacked layout
        (datasets id/wavelength/luminosity/continuum) or Synthesizer's
        per-line-subgroup layout (`lines/<id>/{luminosity,continuum}` with a
        `wavelength` attribute)."""
        if "lines" not in f:
            return None
        grp = f["lines"]
        if "luminosity" in grp and not hasattr(grp["luminosity"], "keys"):
            ids_raw = grp["id"][:] if "id" in grp else grp["ids"][:]
            ids = [i.decode() if isinstance(i, bytes) else str(i)
                   for i in ids_raw]
            lum = np.asarray(grp["luminosity"][:], np.float32)
            cont = np.asarray(grp["continuum"][:], np.float32)
            wav = np.asarray(grp["wavelength"][:], np.float64)
            if lum.shape[0] == len(ids) and lum.ndim == 3:
                # lines-first layout -> lines-last
                lum = np.moveaxis(lum, 0, -1)
                cont = np.moveaxis(cont, 0, -1)
            return {"ids": ids, "wavelength": wav,
                    "luminosity": lum, "continuum": cont}
        ids, wavs, lums, conts = [], [], [], []
        for lid in grp.keys():
            sub = grp[lid]
            if not hasattr(sub, "keys") or "luminosity" not in sub:
                continue
            ids.append(lid)
            wavs.append(float(sub.attrs.get(
                "wavelength", sub["wavelength"][()] if "wavelength" in sub
                else 0.0)))
            lums.append(np.asarray(sub["luminosity"][:], np.float32))
            conts.append(np.asarray(sub["continuum"][:], np.float32))
        if not ids:
            return None
        return {
            "ids": ids,
            "wavelength": np.asarray(wavs, np.float64),
            "luminosity": np.stack(lums, axis=-1),
            "continuum": np.stack(conts, axis=-1),
        }

    def to_hdf5(self, path: str) -> None:
        with h5py.File(path, "w") as f:
            f.attrs["axes"] = ["ages", "metallicities"]
            f.attrs["grid_name"] = self.name
            ax = f.create_group("axes")
            ax.create_dataset("ages", data=self.ages_yr)
            ax.create_dataset("metallicities", data=self.metallicities)
            sp = f.create_group("spectra")
            sp.create_dataset("wavelength", data=self.lam)
            for t, s in self.spectra.items():
                sp.create_dataset(t, data=s)
            if self.lines is not None:
                lg = f.create_group("lines")
                lg.create_dataset(
                    "id", data=np.asarray(self.lines["ids"], dtype="S"))
                lg.create_dataset("wavelength",
                                  data=self.lines["wavelength"])
                lg.create_dataset("luminosity",
                                  data=self.lines["luminosity"])
                lg.create_dataset("continuum", data=self.lines["continuum"])


def make_synthetic_grid(
    n_ages: int = 48,
    n_mets: int = 8,
    n_wav: int = 2048,
    lam_min: float = 300.0,
    lam_max: float = 1.0e7,  # reach the FIR so energy-balance dust emission lands on-grid
    seed: int = 0,
    name: str = "synthetic_test_grid",
    line_strength: float = 1.0,
) -> SPSGrid:
    """Deterministic physically-shaped fake SPS grid for tests/benchmarks.

    Spectra are blackbody-like continua whose effective temperature falls with
    age, with a Lyman-break suppression, a Balmer-break feature and a
    metallicity-dependent UV slope — enough structure that photometry responds
    sensibly to every parameter. Units mimic real grids
    (~1e20 erg/s/Hz/Msun scale).
    """
    rng = np.random.default_rng(seed)
    log10_ages = np.linspace(5.0, 10.2, n_ages)
    metallicities = np.logspace(-4, -1.4, n_mets)
    lam = np.geomspace(lam_min, lam_max, n_wav)

    # effective temperature declines with age: 4e4 K (young) -> 3e3 K (old)
    t_eff = 10.0 ** (4.6 - 0.25 * (log10_ages - 5.0))[:, None, None]
    lam_b = lam[None, None, :]
    # Planck-ish shape in L_nu: B_nu ∝ nu^3/(exp(hnu/kT)-1); use lam form
    hc_k = 1.43877688e8  # hc/k in Angstrom*K
    x = hc_k / (lam_b * t_eff)
    planck = (lam_b ** -3.0) / np.expm1(np.clip(x, 1e-6, 60.0))
    # normalize each (age, Z) spectrum to a fixed bolometric-ish scale that
    # declines with age (older populations are dimmer per unit mass)
    lum_scale = 10.0 ** (21.5 - 0.8 * (log10_ages - 5.0) / 5.2)[:, None, None]
    met_slope = (np.log10(metallicities) + 2.7)[None, :, None]
    uv_tilt = (lam_b / 5500.0) ** (0.08 * met_slope)

    spec = planck / planck.max(axis=-1, keepdims=True) * lum_scale * uv_tilt
    # Lyman break at 912 A
    spec = spec * np.where(lam_b < 912.0, 0.01, 1.0)
    # Balmer break grows with age
    balmer = 1.0 - 0.4 * ((log10_ages - 5.0) / 5.2)[:, None, None] * (
        lam_b < 3646.0
    )
    spec = spec * balmer
    # small deterministic wiggles standing in for absorption features
    wig = 1.0 + 0.05 * np.sin(lam_b / 200.0 + met_slope * 3.0)
    spec = (spec * wig).astype(np.float32)

    # "nebular"/"transmitted" variants: transmitted = incident minus ionizing,
    # nebular = reprocessed ionizing energy re-emitted with flat continuum +
    # a few emission-line spikes (young ages only).
    ionizing = np.where(lam_b < 912.0, spec, 0.0)
    transmitted = spec - ionizing
    young = (log10_ages < 7.0)[:, None, None]
    line_lams = np.array([1216.0, 3727.0, 4861.0, 5007.0, 6563.0])
    line_ids = ["H 1 1215.67A", "O 2 3726.03A", "H 1 4861.32A",
                "O 3 5006.84A", "H 1 6562.80A"]
    lines = np.zeros_like(spec)
    profs = []
    for ll in line_lams:
        prof = np.exp(-0.5 * ((lam - ll) / (ll * 0.002)) ** 2)
        profs.append(prof)
        lines += prof[None, None, :]
    neb_scale = ionizing.sum(axis=-1, keepdims=True) * 1.0e-4
    nebular = (young * neb_scale
               * (line_strength * lines + 0.01)).astype(np.float32)
    total = (transmitted + nebular).astype(np.float32)

    # line tables consistent with the nebular spikes: L_line = ∫ L_ν dν over
    # each profile; continuum = the underlying spectrum at λ_line without
    # the line's own spike (what a Cloudy grid's `lines/` group records)
    c_aa_s = 2.99792458e18
    dnu = np.abs(np.gradient(c_aa_s / lam))  # Hz per bin, ascending-λ grid
    lum_tab = np.zeros((n_ages, n_mets, len(line_lams)), np.float32)
    cont_tab = np.zeros_like(lum_tab)
    for li, (ll, prof) in enumerate(zip(line_lams, profs)):
        spike = young * neb_scale * line_strength * prof[None, None, :]
        lum_tab[..., li] = (spike * dnu).sum(-1)
        k = int(np.argmin(np.abs(lam - ll)))
        cont_tab[..., li] = total[..., k] - spike[..., k]

    del rng  # reserved for future stochastic features; grid is deterministic
    return SPSGrid(
        name=name,
        log10_ages=log10_ages,
        metallicities=metallicities,
        lam=lam,
        spectra={
            "incident": spec,
            "transmitted": transmitted.astype(np.float32),
            "nebular": nebular,
            "total": total,
        },
        lines={
            "ids": line_ids,
            "wavelength": line_lams.astype(np.float64),
            "luminosity": lum_tab,
            "continuum": cont_tab,
        },
    )
