"""Photometric filters and the filter-convolution op.

The reference delegates filter convolution to Synthesizer's instrument/
FilterCollection C extensions (`/root/reference/src/synference/library.py:73-100`
imports, pipeline `get_photometry_fluxes` `:2604-2612`). Here a `FilterSet`
precomputes padded per-filter transmission curves once; photometry for a batch
of redshifted SEDs is a fused interpolate+weighted-reduction implemented with
pure jnp (see `sed.py::photometry_from_fnu`) that XLA maps onto the VPU/MXU.

Convention: photon-counting mean flux density,
    f_filter = ∫ f_nu(λ) T(λ) dλ/λ / ∫ T(λ) dλ/λ,
the same convention Synthesizer uses for AB photometry.
"""

from __future__ import annotations

from dataclasses import dataclass

import h5py
import jax.numpy as jnp
import numpy as np

__all__ = ["Filter", "FilterSet", "tophat_filter"]


@dataclass
class Filter:
    """A single filter transmission curve on observed-frame wavelengths [Å]."""

    code: str
    lam: np.ndarray  # (K,) ascending, Angstrom
    transmission: np.ndarray  # (K,) >= 0

    @property
    def pivot(self) -> float:
        """Pivot wavelength [Å]: sqrt(∫T λ dλ / ∫T dλ/λ)."""
        t, l = self.transmission, self.lam
        num = np.trapezoid(t * l, l)
        den = np.trapezoid(t / l, l)
        return float(np.sqrt(num / den))


def tophat_filter(code: str, center: float, width: float) -> Filter:
    """Ideal tophat filter; edges sampled exactly so interpolation stays sharp."""
    lo, hi = center - width / 2.0, center + width / 2.0
    eps = 1.0e-3 * width
    lam = np.array([lo - eps, lo, hi, hi + eps])
    trans = np.array([0.0, 1.0, 1.0, 0.0])
    return Filter(code=code, lam=lam, transmission=trans)


class FilterSet:
    """A stack of filters padded to a common sample count for vectorized eval.

    The padded representation keeps static shapes: `lams` (F, K) and
    `trans` (F, K) where rows are each filter's curve, padded by repeating the
    last point (transmission 0), so `jnp.interp` per filter is exact.
    """

    def __init__(self, filters: list):
        self.filters = list(filters)
        self.codes = [f.code for f in self.filters]
        k = max(len(f.lam) for f in self.filters)
        # pad to multiple of 8 for clean VPU tiling
        k = int(np.ceil(k / 8) * 8)
        lams = np.zeros((len(self.filters), k))
        trans = np.zeros((len(self.filters), k))
        for i, f in enumerate(self.filters):
            n = len(f.lam)
            lams[i, :n] = f.lam
            trans[i, :n] = f.transmission
            lams[i, n:] = f.lam[-1] + np.arange(1, k - n + 1)  # keep ascending
            trans[i, n:] = 0.0
        self.lams = jnp.asarray(lams, dtype=jnp.float32)
        self.trans = jnp.asarray(trans, dtype=jnp.float32)

    def __len__(self) -> int:
        return len(self.filters)

    def __getitem__(self, i) -> Filter:
        return self.filters[i]

    @property
    def pivots(self) -> np.ndarray:
        return np.array([f.pivot for f in self.filters])

    @property
    def lam_min(self) -> float:
        return float(
            min(f.lam[f.transmission > 0].min() for f in self.filters)
        )

    @property
    def lam_max(self) -> float:
        return float(
            max(f.lam[f.transmission > 0].max() for f in self.filters)
        )

    def min_max_wav_grid(self, max_redshift: float,
                         min_redshift: float = 0.0) -> tuple:
        """Rest-frame λ range a grid must cover so every filter stays
        on-grid across [min_redshift, max_redshift] (reference
        `calculate_min_max_wav_grid`, utils.py:115-127)."""
        return (self.lam_min / (1.0 + max_redshift),
                self.lam_max / (1.0 + min_redshift))

    def subset(self, codes: list) -> "FilterSet":
        by_code = {f.code: f for f in self.filters}
        return FilterSet([by_code[c] for c in codes])

    def shifted_table(self, lam_rest: np.ndarray, z_max: float = 25.0):
        """Precompute transmissions on an extended log-λ grid for the
        shift-based photometry fast path.

        `lam_rest` must be geometrically spaced (dlog constant). Because
        λ_obs = λ_rest (1+z), in log-λ a redshift is a pure shift of
        s(z) = log10(1+z)/dlog table columns. Photometry then needs only two
        contiguous dynamic-slices of this table + a lerp — no per-galaxy
        interpolation (the vmapped `jnp.interp` path costs ~1000x more on
        TPU).

        Returns:
            table: (F, L + max_shift + 1) float32 transmissions at
                   lam_rest[0] * 10**(dlog * arange(...)).
            dlog: log10 column spacing.
            max_shift: number of extra columns (clamp for s(z)).
        """
        lam_rest = np.asarray(lam_rest)
        dlogs = np.diff(np.log10(lam_rest))
        dlog = float(dlogs.mean())
        if not np.allclose(dlogs, dlog, rtol=1e-4):
            raise ValueError("shifted_table requires log-uniform lam_rest")
        max_shift = int(np.ceil(np.log10(1.0 + z_max) / dlog)) + 1
        n_cols = len(lam_rest) + max_shift + 1
        lam_ext = lam_rest[0] * 10.0 ** (dlog * np.arange(n_cols))
        table = np.zeros((len(self.filters), n_cols), dtype=np.float32)
        for i, f in enumerate(self.filters):
            table[i] = np.interp(lam_ext, f.lam, f.transmission, left=0.0, right=0.0)
        return table, dlog, max_shift

    def transmission_at(self, lam_obs):
        """Evaluate all filter curves at observed wavelengths.

        Args:
            lam_obs: (L,) observed-frame wavelengths [Å].
        Returns:
            (F, L) transmissions.
        """
        lam_obs = jnp.asarray(lam_obs)
        return jax_vmap_interp(lam_obs, self.lams, self.trans)

    # -- persistence (reference stores filter curves in the HDF5 Model group,
    #    library.py:2017-2132) ------------------------------------------------
    def to_hdf5(self, group: h5py.Group) -> None:
        group.attrs["filter_codes"] = self.codes
        for i, f in enumerate(self.filters):
            g = group.create_group(f"filter_{i}")
            g.attrs["code"] = f.code
            g.create_dataset("lam", data=f.lam)
            g.create_dataset("transmission", data=f.transmission)

    @classmethod
    def from_hdf5(cls, group: h5py.Group) -> "FilterSet":
        codes = list(group.attrs["filter_codes"])
        filters = []
        for i, code in enumerate(codes):
            g = group[f"filter_{i}"]
            filters.append(
                Filter(
                    code=str(g.attrs["code"]),
                    lam=np.asarray(g["lam"][:]),
                    transmission=np.asarray(g["transmission"][:]),
                )
            )
        return cls(filters)


def jax_vmap_interp(x, xps, fps):
    """Interpolate one query vector against F curves: returns (F, len(x))."""
    import jax

    return jax.vmap(lambda xp, fp: jnp.interp(x, xp, fp))(xps, fps)
