"""Flat-ΛCDM cosmology, fully jittable.

The reference uses `astropy.cosmology` host-side for luminosity distance and
age-of-universe (e.g. `/root/reference/src/synference/library.py:1204-1311`
max-age-at-z clipping, `:5735-5804` fnu conversion). Those are scalar
object-returning calls that cannot live inside a jitted simulator, so here
distances/ages are computed with fixed-order Gauss–Legendre quadrature as pure
jnp functions — vmappable over redshift batches, traced once under jit.

Radiation and neutrino densities are neglected (error <0.1% for z < 20, well
below SED-model systematics).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .units import C_CM_S, MPC_CM

# Hubble time for H0 = 1 km/s/Mpc, in Gyr: (Mpc/km) s -> Gyr
_HUBBLE_GYR = MPC_CM / 1.0e5 / 3.1557e16  # = 977.79 Gyr
# Hubble distance for H0 = 1 km/s/Mpc, in Mpc
_HUBBLE_MPC = C_CM_S / 1.0e5  # = 299792.458 Mpc

_GL_ORDER = 64
_GL_X, _GL_W = np.polynomial.legendre.leggauss(_GL_ORDER)


@dataclass(frozen=True)
class Cosmology:
    """Flat ΛCDM. Defaults are Planck 2018 (TT,TE,EE+lowE+lensing+BAO)."""

    h0: float = 67.66  # km/s/Mpc
    om0: float = 0.30966

    @property
    def ode0(self) -> float:
        return 1.0 - self.om0

    @property
    def hubble_time_gyr(self) -> float:
        return _HUBBLE_GYR / self.h0

    @property
    def hubble_distance_mpc(self) -> float:
        return _HUBBLE_MPC / self.h0

    # -- internals ---------------------------------------------------------

    def _efunc(self, z):
        zp1 = 1.0 + z
        return jnp.sqrt(self.om0 * zp1**3 + self.ode0)

    def comoving_distance_mpc(self, z):
        """d_C(z) = d_H ∫0^z dz'/E(z'), Gauss-Legendre on [0, z]. Vmappable."""
        z = jnp.asarray(z, dtype=jnp.float32)
        # map GL nodes from [-1,1] to [0,z]; broadcast over trailing batch dims
        x = jnp.asarray(_GL_X, dtype=z.dtype)
        w = jnp.asarray(_GL_W, dtype=z.dtype)
        half = 0.5 * z[..., None]
        zz = half * (x + 1.0)
        integrand = 1.0 / self._efunc(zz)
        integral = jnp.sum(w * integrand, axis=-1) * half[..., 0]
        return self.hubble_distance_mpc * integral

    def luminosity_distance_mpc(self, z):
        z = jnp.asarray(z, dtype=jnp.float32)
        return (1.0 + z) * self.comoving_distance_mpc(z)

    def luminosity_distance_cm(self, z):
        return self.luminosity_distance_mpc(z) * MPC_CM

    def age_gyr(self, z):
        """Age of the universe at redshift z in Gyr.

        t(z) = t_H ∫0^{a(z)} sqrt(a) da / sqrt(Om + Ode a^3)
        (substituting a' for z'; the integrand is smooth at a=0).
        """
        z = jnp.asarray(z, dtype=jnp.float32)
        a = 1.0 / (1.0 + z)
        x = jnp.asarray(_GL_X, dtype=z.dtype)
        w = jnp.asarray(_GL_W, dtype=z.dtype)
        half = 0.5 * a[..., None]
        aa = half * (x + 1.0)
        integrand = jnp.sqrt(aa) / jnp.sqrt(self.om0 + self.ode0 * aa**3)
        integral = jnp.sum(w * integrand, axis=-1) * half[..., 0]
        return self.hubble_time_gyr * integral

    def age_yr(self, z):
        return self.age_gyr(z) * 1.0e9

    def lookback_time_gyr(self, z):
        return self.age_gyr(jnp.zeros_like(jnp.asarray(z, jnp.float32))) - self.age_gyr(z)

    def distance_modulus(self, z):
        """m - M = 5 log10(d_L / 10 pc)."""
        d_l_pc = self.luminosity_distance_mpc(z) * 1.0e6
        return 5.0 * jnp.log10(d_l_pc / 10.0)

    # -- (de)serialization -------------------------------------------------

    def to_dict(self) -> dict:
        return {"h0": self.h0, "om0": self.om0}

    @classmethod
    def from_dict(cls, d: dict) -> "Cosmology":
        return cls(h0=float(d["h0"]), om0=float(d["om0"]))


PLANCK18 = Cosmology()
