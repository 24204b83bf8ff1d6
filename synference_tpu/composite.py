"""Composite forward models — multiple SED components per galaxy.

Reference analogue: `CombinedBasis` (`/root/reference/src/synference/
library.py:3186-4919`) combines ≥1 `GalaxyBasis` pipelines into one library,
either by outer-product combination over (z × mass × weight) with per-base
mass renormalization (`create_library` `:3644-3974`) or 1:1
(`create_full_library` `:4435-4885`). There the combination happens on
*stored pipeline outputs*; here a `CompositeSEDSimulator` simply sums the
component simulators' spectra/photometry inside one jitted program — each
component gets its own parameter block (prefixed names) plus shared
parameters (redshift), and per-component log-masses set the mixture.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CompositeSEDSimulator", "grid_combinations"]


class CompositeSEDSimulator:
    """Sum of component BatchSEDSimulators with shared + per-component θ.

    Args:
        components: dict name -> BatchSEDSimulator. Component simulators keep
            their own param_names; in the composite θ vector those appear
            prefixed "name.param" EXCEPT the names in `shared` which appear
            once, unprefixed, and are broadcast to every component.
        shared: parameter names shared across components (default:
            ("redshift",)).
    """

    def __init__(self, components: dict, shared: tuple = ("redshift",)):
        if not components:
            raise ValueError("need at least one component")
        self.components = dict(components)
        self.shared = tuple(shared)
        first = next(iter(self.components.values()))
        self.filters = first.filters
        for sim in self.components.values():
            if list(sim.filters.codes) != list(self.filters.codes):
                raise ValueError("components must share a FilterSet")
        names = list(self.shared)
        self._slices = {}
        for cname, sim in self.components.items():
            for p in sim.param_names:
                if p in self.shared:
                    continue
                names.append(f"{cname}.{p}")
        self.param_names = tuple(names)
        self._index = {n: i for i, n in enumerate(self.param_names)}

    def _component_theta(self, theta, cname):
        """(B, P_total) -> (B, P_c) in that component's order."""
        sim = self.components[cname]
        cols = []
        for p in sim.param_names:
            key = p if p in self.shared else f"{cname}.{p}"
            cols.append(theta[:, self._index[key]])
        return jnp.stack(cols, axis=1)

    def simulate(self, theta, want_spectra: bool = False):
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        outs = []
        for cname, sim in self.components.items():
            outs.append(
                sim.simulate(self._component_theta(theta, cname),
                             want_spectra=want_spectra)
            )
        total = {"photometry_njy": sum(o["photometry_njy"] for o in outs)}
        if want_spectra:
            total["fnu_njy"] = sum(o["fnu_njy"] for o in outs)
            total["lnu"] = sum(o["lnu"] for o in outs)
        return total

    def photometry(self, theta):
        return self.simulate(theta)["photometry_njy"]

    def agn_fraction(self, theta, min_wav_rest: float = 1.0e4,
                     max_wav_rest: float = 3.0e5,
                     agn_components: tuple | None = None):
        """Fraction of rest-frame [min, max] Å luminosity from AGN
        components (reference `calculate_agn_fraction`,
        `/root/reference/src/synference/library.py:581-640`; defaults to
        the same 1–30 µm window).

        Args:
            theta: (B, P_total).
            agn_components: component names counted as AGN; default = every
                component whose simulator is an `agn.AGNSimulator`.
        Returns:
            (B,) numpy fractions in [0, 1].
        """
        from .agn import AGNSimulator

        if agn_components is None:
            agn_components = tuple(
                n for n, s in self.components.items()
                if isinstance(s, AGNSimulator))
        if not agn_components:
            raise ValueError("no AGN components in this composite")
        theta = jnp.atleast_2d(jnp.asarray(theta, jnp.float32))
        lam = None
        total = None
        agn = None
        for cname, sim in self.components.items():
            out = sim.simulate(self._component_theta(theta, cname),
                               want_spectra=True)
            lnu = out["lnu"]
            if lam is None:
                lam = np.asarray(sim.grid.lam) if hasattr(sim, "grid") \
                    else np.asarray(sim.lam)
            total = lnu if total is None else total + lnu
            if cname in agn_components:
                agn = lnu if agn is None else agn + lnu
        # ∫ L_ν dν over the rest window, dν = c/λ² dλ; the common scale and
        # the c factor cancel in the ratio
        m = ((lam >= min_wav_rest) & (lam <= max_wav_rest)).astype(np.float32)
        w = jnp.asarray(m * np.gradient(lam) / lam**2, jnp.float32)
        num = jnp.sum(agn * w, axis=-1)
        den = jnp.sum(total * w, axis=-1)
        return np.asarray(num / jnp.maximum(den, 1.0e-30))

    def __call__(self, theta):
        return self.photometry(theta)

    @property
    def n_filters(self):
        return len(self.filters)

    @property
    def n_params(self):
        return len(self.param_names)


def grid_combinations(param_values: dict) -> tuple:
    """Cartesian-product parameter grid (the reference's
    `build_library=True` combinatorics: gridded SFH/z/metallicity combos,
    `library.py:742-1018`, `_create_galaxies` `:1694-1873`).

    Args:
        param_values: {name: 1-D array of values}.
    Returns:
        (theta (N, P), names): every combination, meshgrid order.
    """
    names = list(param_values)
    grids = np.meshgrid(*[np.asarray(param_values[n]) for n in names],
                        indexing="ij")
    theta = np.stack([g.reshape(-1) for g in grids], axis=1).astype(np.float32)
    return theta, names
