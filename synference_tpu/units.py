"""Unit system and photometric conversions, TPU-native.

The reference carries per-value `unyt` objects through every call
(`/root/reference/src/synference/utils.py:647-807`); that object-per-value
design is host-side overhead and untraceable. Here units are explicit enums +
pure jnp conversion functions, so every transform jits/vmaps and fuses on the
VPU. Semantics are kept bit-compatible with the reference formulas:

- AB magnitude zero point 3631 Jy.
- asinh ("luptitude") magnitudes with softening parameter b (default 5 nJy,
  reference `utils.py:649` default) following the reference expressions
  `utils.py:647-676` (mag), `:677-706` (error), `:709-744` (SNR),
  `:747-770` (inverse), `:773-807` (error inverse).
"""

from __future__ import annotations

import enum
import math

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Physical constants (CGS + astronomy)
# ---------------------------------------------------------------------------

C_CM_S = 2.99792458e10  # speed of light [cm/s]
C_AA_S = 2.99792458e18  # speed of light [Angstrom/s]
JY_CGS = 1.0e-23  # 1 Jansky [erg/s/cm^2/Hz]
NJY_IN_JY = 1.0e-9
AB_ZP_JY = 3631.0  # AB zero-point flux [Jy]
MPC_CM = 3.0856775814913673e24  # 1 Mpc [cm]
PC_CM = 3.0856775814913673e18  # 1 pc [cm]
MSUN_G = 1.98892e33  # solar mass [g]
YR_S = 3.1557e7  # Julian year [s]
GYR_S = 3.1557e16
LN10 = math.log(10.0)
POGSON = 2.5 / LN10  # = 2.5 log10(e), the asinh-mag scale factor


class FluxUnit(str, enum.Enum):
    """Units a photometric feature vector can be expressed in."""

    NJY = "nJy"
    JY = "Jy"
    AB = "AB"
    ASINH = "asinh"
    LOG10_NJY = "log10_nJy"

    @classmethod
    def parse(cls, s: "FluxUnit | str") -> "FluxUnit":
        if isinstance(s, FluxUnit):
            return s
        key = str(s).strip()
        aliases = {
            "njy": cls.NJY,
            "jy": cls.JY,
            "ab": cls.AB,
            "abmag": cls.AB,
            "mag": cls.AB,
            "asinh": cls.ASINH,
            "asinh mag": cls.ASINH,
            "log10 njy": cls.LOG10_NJY,
            "log10_njy": cls.LOG10_NJY,
            "log10(njy)": cls.LOG10_NJY,
        }
        try:
            return aliases[key.lower()]
        except KeyError as e:
            raise ValueError(f"Unknown flux unit {s!r}") from e


# ---------------------------------------------------------------------------
# AB magnitudes
# ---------------------------------------------------------------------------


def njy_to_jy(f_njy):
    return jnp.asarray(f_njy) * NJY_IN_JY


def jy_to_njy(f_jy):
    return jnp.asarray(f_jy) / NJY_IN_JY


def jy_to_ab(f_jy):
    """Flux [Jy] -> AB magnitude. m = -2.5 log10(f/3631 Jy)."""
    return -2.5 * jnp.log10(jnp.asarray(f_jy) / AB_ZP_JY)


def ab_to_jy(mag):
    return AB_ZP_JY * jnp.power(10.0, -0.4 * jnp.asarray(mag))


def njy_to_ab(f_njy):
    return jy_to_ab(njy_to_jy(f_njy))


def ab_to_njy(mag):
    return jy_to_njy(ab_to_jy(mag))


def jy_err_to_ab_err(f_jy, f_jy_err):
    """Gaussian error propagation of AB mag: dm = 2.5 log10(e) * df/f."""
    return POGSON * jnp.asarray(f_jy_err) / jnp.asarray(f_jy)


def ab_err_to_jy_err(mag, mag_err):
    return jnp.asarray(mag_err) * ab_to_jy(mag) / POGSON


# ---------------------------------------------------------------------------
# asinh ("luptitude") magnitudes — reference utils.py:647-807
# ---------------------------------------------------------------------------


def f_jy_to_asinh(f_jy, f_b_jy=5.0e-9):
    """Flux [Jy] -> asinh magnitude with softening f_b [Jy].

    m = -2.5 log10(e) * [ asinh(f / 2b) + ln(b / 3631) ]
    (reference `utils.py:647-676`). Broadcasting replaces the reference's
    explicit per-shape tiling.
    """
    f_jy = jnp.asarray(f_jy)
    f_b = jnp.asarray(f_b_jy)
    return -POGSON * (jnp.arcsinh(f_jy / (2.0 * f_b)) + jnp.log(f_b / AB_ZP_JY))


def f_jy_err_to_asinh(f_jy, f_jy_err, f_b_jy=5.0e-9):
    """Flux error [Jy] -> asinh magnitude error (reference `utils.py:677-706`).

    dm = 2.5 log10(e) * df / sqrt(f^2 + (2b)^2)
    """
    f_jy = jnp.asarray(f_jy)
    f_b = jnp.asarray(f_b_jy)
    return POGSON * jnp.asarray(f_jy_err) / jnp.sqrt(f_jy**2 + (2.0 * f_b) ** 2)


def asinh_to_f_jy(m_asinh, f_b_jy=5.0e-9):
    """asinh magnitude -> flux [Jy] (reference `utils.py:747-770`)."""
    m = jnp.asarray(m_asinh)
    f_b = jnp.asarray(f_b_jy)
    arg = -m / POGSON - jnp.log(f_b / AB_ZP_JY)
    return 2.0 * f_b * jnp.sinh(arg)


def asinh_err_to_f_jy_err(m_asinh, m_asinh_err, f_b_jy=5.0e-9):
    """asinh magnitude error -> flux error [Jy] (reference `utils.py:773-807`)."""
    f_jy = asinh_to_f_jy(m_asinh, f_b_jy)
    f_b = jnp.asarray(f_b_jy)
    return jnp.asarray(m_asinh_err) * jnp.sqrt(f_jy**2 + (2.0 * f_b) ** 2) / POGSON


def asinh_to_snr(m_asinh, m_asinh_err, f_b_jy=5.0e-9):
    """asinh mag + err -> SNR (reference `utils.py:709-744`)."""
    f_jy = asinh_to_f_jy(m_asinh, f_b_jy)
    f_err = asinh_err_to_f_jy_err(m_asinh, m_asinh_err, f_b_jy)
    return f_jy / f_err


def ab_depth_to_sigma_njy(depth_ab, sigma_level=5.0):
    """AB-mag survey depth at `sigma_level` -> 1-sigma noise in nJy.

    Matches the reference depth noise model (`noise_models.py:113-165`):
    sigma = flux(depth) / depth_sigma_level.
    """
    return ab_to_njy(depth_ab) / sigma_level


# ---------------------------------------------------------------------------
# Unit-graph conversion for feature vectors
# ---------------------------------------------------------------------------


def convert_flux(value, from_unit, to_unit, f_b_njy=5.0):
    """Convert photometry between any two supported units.

    `f_b_njy` is the asinh softening in nJy (scalar or per-filter array).
    """
    fu, tu = FluxUnit.parse(from_unit), FluxUnit.parse(to_unit)
    if fu == tu:
        return jnp.asarray(value)
    f_b_jy = jnp.asarray(f_b_njy) * NJY_IN_JY
    # normalize to Jy
    if fu == FluxUnit.NJY:
        f_jy = njy_to_jy(value)
    elif fu == FluxUnit.JY:
        f_jy = jnp.asarray(value)
    elif fu == FluxUnit.AB:
        f_jy = ab_to_jy(value)
    elif fu == FluxUnit.ASINH:
        f_jy = asinh_to_f_jy(value, f_b_jy)
    elif fu == FluxUnit.LOG10_NJY:
        f_jy = njy_to_jy(jnp.power(10.0, jnp.asarray(value)))
    else:  # pragma: no cover
        raise ValueError(fu)
    # Jy -> target
    if tu == FluxUnit.NJY:
        return jy_to_njy(f_jy)
    if tu == FluxUnit.JY:
        return f_jy
    if tu == FluxUnit.AB:
        return jy_to_ab(f_jy)
    if tu == FluxUnit.ASINH:
        return f_jy_to_asinh(f_jy, f_b_jy)
    if tu == FluxUnit.LOG10_NJY:
        return jnp.log10(jy_to_njy(f_jy))
    raise ValueError(tu)  # pragma: no cover


def convert_flux_err(value, err, from_unit, to_unit, f_b_njy=5.0):
    """Convert photometric errors between units (propagating through flux)."""
    fu, tu = FluxUnit.parse(from_unit), FluxUnit.parse(to_unit)
    if fu == tu:
        return jnp.asarray(err)
    f_b_jy = jnp.asarray(f_b_njy) * NJY_IN_JY
    # to Jy flux + err
    if fu == FluxUnit.NJY:
        f_jy, e_jy = njy_to_jy(value), njy_to_jy(err)
    elif fu == FluxUnit.JY:
        f_jy, e_jy = jnp.asarray(value), jnp.asarray(err)
    elif fu == FluxUnit.AB:
        f_jy = ab_to_jy(value)
        e_jy = ab_err_to_jy_err(value, err)
    elif fu == FluxUnit.ASINH:
        f_jy = asinh_to_f_jy(value, f_b_jy)
        e_jy = asinh_err_to_f_jy_err(value, err, f_b_jy)
    elif fu == FluxUnit.LOG10_NJY:
        f_jy = njy_to_jy(jnp.power(10.0, jnp.asarray(value)))
        e_jy = jnp.asarray(err) * LN10 * f_jy
    else:  # pragma: no cover
        raise ValueError(fu)
    if tu == FluxUnit.NJY:
        return jy_to_njy(e_jy)
    if tu == FluxUnit.JY:
        return e_jy
    if tu == FluxUnit.AB:
        return jy_err_to_ab_err(f_jy, e_jy)
    if tu == FluxUnit.ASINH:
        return f_jy_err_to_asinh(f_jy, e_jy, f_b_jy)
    if tu == FluxUnit.LOG10_NJY:
        return e_jy / (LN10 * f_jy)
    raise ValueError(tu)  # pragma: no cover
