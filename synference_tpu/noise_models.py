"""Photometric/spectroscopic uncertainty models — batched, jittable.

Re-architecture of the reference's `UncertaintyModel` hierarchy
(`/root/reference/src/synference/noise_models.py`): the reference applies
noise per-object with host numpy + scipy truncnorm; here every model is a
pytree of device arrays with a pure `apply(key, flux_njy) -> (noisy, sigma)`
kernel, so noise scattering fuses into the feature pipeline under jit and
vmaps across scatter repetitions.

Conventions:
- All apply() interfaces work in **nJy** (flux and sigma). Models whose
  native space is different (asinh mags, AB) scatter internally in that space
  and convert back — the conversions are bijective, so downstream unit
  transforms reproduce the reference's feature-space values exactly.
- Fitting from observed catalogues (binned median/std of errors vs flux,
  reference `noise_models.py:285-320`) runs host-side in numpy at
  construction; only `apply` is traced.

HDF5 (de)serialization keeps the reference's `__class__`-keyed group layout
(`noise_models.py:1113-1156`) so model files interoperate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import units as U

__all__ = [
    "NoiseModel",
    "DepthNoiseModel",
    "SpectralNoiseModel",
    "EmpiricalNoiseModel",
    "AsinhEmpiricalNoiseModel",
    "GeneralEmpiricalNoiseModel",
    "save_noise_model_hdf5",
    "load_noise_model_hdf5",
    "fit_binned_error_model",
    "create_noise_models_from_catalogue",
]


# ---------------------------------------------------------------------------
# shared numerics
# ---------------------------------------------------------------------------


def _truncnorm_nonneg(key, mu, sigma):
    """Sample σ' ~ N(mu, sigma) truncated to σ' >= 0, via inverse CDF.

    Matches reference `sample_uncertainty` (`noise_models.py:383-390`):
    a = (0-mu)/sigma, b = +inf.
    """
    from jax.scipy.special import ndtri
    from jax.scipy.stats.norm import cdf

    sigma_safe = jnp.maximum(sigma, 1.0e-12)
    lo = cdf(-mu / sigma_safe)
    u = jax.random.uniform(key, mu.shape, minval=lo, maxval=1.0)
    u = jnp.clip(u, 1.0e-7, 1.0 - 1.0e-7)
    out = mu + sigma_safe * ndtri(u)
    return jnp.where(sigma > 1.0e-12, jnp.maximum(out, 0.0), mu)


def _interp(x, xp, fp):
    """Linear interpolation with edge clamping (reference fill_value =
    (first, last) when extrapolate=False, `noise_models.py:347-381`)."""
    return jnp.interp(x, xp, fp)


def fit_binned_error_model(
    fluxes: np.ndarray,
    errors: np.ndarray,
    num_bins: int = 20,
    log_bins: bool = True,
    min_samples_per_bin: int = 10,
    precomputed_bins: np.ndarray | None = None,
):
    """Binned median/std of errors vs flux (reference `_compute_bins_from_data`,
    `noise_models.py:285-320`). Host-side numpy; returns (centers, med, std)."""
    fluxes = np.asarray(fluxes, dtype=np.float64)
    errors = np.asarray(errors, dtype=np.float64)
    valid = np.isfinite(fluxes) & np.isfinite(errors)
    f, e = fluxes[valid], errors[valid]
    if precomputed_bins is not None:
        bins = np.asarray(precomputed_bins)
    elif log_bins:
        pos = f > 0
        if not pos.any():
            raise ValueError("Log-binning requires positive flux values.")
        bins = np.logspace(
            np.log10(f[pos].min()), np.log10(f.max()), num_bins + 1
        )
    else:
        bins = np.linspace(f.min(), f.max(), num_bins + 1)
    idx = np.clip(np.digitize(f, bins) - 1, 0, len(bins) - 2)
    centers, med, std = [], [], []
    for i in range(len(bins) - 1):
        sel = idx == i
        if sel.sum() >= min_samples_per_bin:
            centers.append(0.5 * (bins[i] + bins[i + 1]))
            med.append(np.median(e[sel]))
            std.append(np.std(e[sel]))
    if len(centers) < 2:
        raise ValueError("Could not create enough valid bins for interpolation.")
    return np.asarray(centers), np.asarray(med), np.asarray(std)


# ---------------------------------------------------------------------------
# model classes
# ---------------------------------------------------------------------------


class NoiseModel:
    """Interface: `apply(key, flux_njy) -> (noisy_flux_njy, sigma_njy)`."""

    def apply(self, key, flux_njy):
        raise NotImplementedError

    # HDF5 registry hooks -------------------------------------------------
    def serialize_to_hdf5(self, group) -> None:
        raise NotImplementedError

    @classmethod
    def _from_hdf5_group(cls, group) -> "NoiseModel":
        raise NotImplementedError


class DepthNoiseModel(NoiseModel):
    """Gaussian noise at fixed survey depth (reference `DepthUncertaintyModel`,
    `noise_models.py:76-208`): σ = flux(depth_ab) / depth_sigma_level.

    min/max flux errors are in nJy (the reference uses Jy; converted on IO).
    """

    def __init__(
        self,
        depth_ab: float,
        depth_sigma_level: float = 5.0,
        min_flux_error_njy: float = 0.0,
        max_flux_error_njy: float = np.inf,
    ):
        self.depth_ab = float(depth_ab)
        self.depth_sigma_level = float(depth_sigma_level)
        self.sigma_njy = float(U.ab_depth_to_sigma_njy(depth_ab, depth_sigma_level))
        self.min_flux_error_njy = float(min_flux_error_njy)
        self.max_flux_error_njy = float(max_flux_error_njy)

    def apply(self, key, flux_njy):
        flux_njy = jnp.asarray(flux_njy)
        noise = self.sigma_njy * jax.random.normal(key, flux_njy.shape)
        sigma = jnp.full_like(flux_njy, self.sigma_njy)
        sigma = jnp.clip(sigma, self.min_flux_error_njy, self.max_flux_error_njy)
        return flux_njy + noise, sigma

    def serialize_to_hdf5(self, group):
        group.attrs["__class__"] = "DepthNoiseModel"
        group.attrs["depth_ab"] = self.depth_ab
        group.attrs["depth_sigma_level"] = self.depth_sigma_level
        group.attrs["min_flux_error_njy"] = self.min_flux_error_njy
        group.attrs["max_flux_error_njy"] = self.max_flux_error_njy

    @classmethod
    def _from_hdf5_group(cls, group):
        return cls(
            depth_ab=float(group.attrs["depth_ab"]),
            depth_sigma_level=float(group.attrs["depth_sigma_level"]),
            min_flux_error_njy=float(group.attrs.get("min_flux_error_njy", 0.0)),
            max_flux_error_njy=float(group.attrs.get("max_flux_error_njy", np.inf)),
        )


class SpectralNoiseModel(NoiseModel):
    """Per-pixel Gaussian noise from a fixed error kernel (reference
    `SpectralUncertaintyModel`, `noise_models.py:211-259`)."""

    def __init__(self, error_kernel_njy: np.ndarray):
        self.error_kernel_njy = jnp.asarray(error_kernel_njy, jnp.float32)

    def apply(self, key, flux_njy):
        flux_njy = jnp.asarray(flux_njy)
        noise = self.error_kernel_njy * jax.random.normal(key, flux_njy.shape)
        sigma = jnp.broadcast_to(self.error_kernel_njy, flux_njy.shape)
        return flux_njy + noise, sigma

    def serialize_to_hdf5(self, group):
        group.attrs["__class__"] = "SpectralNoiseModel"
        group.create_dataset("error_kernel_njy", data=np.asarray(self.error_kernel_njy))

    @classmethod
    def _from_hdf5_group(cls, group):
        return cls(error_kernel_njy=group["error_kernel_njy"][:])


class EmpiricalNoiseModel(NoiseModel):
    """p(σ | flux) learned from a real catalogue in nJy space (reference
    `EmpiricalUncertaintyModel`, `noise_models.py:262-440`): per-flux median σ
    and std(σ) interpolators + truncated-normal σ sampling."""

    def __init__(self, bin_centers, median_error_in_bin, std_error_in_bin,
                 num_bins: int = 20, log_bins: bool = True,
                 min_samples_per_bin: int = 10):
        self.bin_centers = jnp.asarray(bin_centers, jnp.float32)
        self.median_error_in_bin = jnp.asarray(median_error_in_bin, jnp.float32)
        self.std_error_in_bin = jnp.asarray(std_error_in_bin, jnp.float32)
        self.num_bins = num_bins
        self.log_bins = log_bins
        self.min_samples_per_bin = min_samples_per_bin

    @classmethod
    def from_catalogue(cls, fluxes_njy, errors_njy, num_bins=20, log_bins=True,
                       min_samples_per_bin=10):
        c, m, s = fit_binned_error_model(
            fluxes_njy, errors_njy, num_bins, log_bins, min_samples_per_bin
        )
        return cls(c, m, s, num_bins, log_bins, min_samples_per_bin)

    def sample_uncertainty(self, key, flux):
        mu = _interp(flux, self.bin_centers, self.median_error_in_bin)
        sd = jnp.maximum(
            _interp(flux, self.bin_centers, self.std_error_in_bin), 0.0
        )
        return _truncnorm_nonneg(key, mu, sd)

    def apply(self, key, flux_njy):
        flux_njy = jnp.asarray(flux_njy)
        k1, k2 = jax.random.split(key)
        sigma = self.sample_uncertainty(k1, flux_njy)
        noisy = flux_njy + sigma * jax.random.normal(k2, flux_njy.shape)
        return noisy, sigma

    def serialize_to_hdf5(self, group):
        group.attrs["__class__"] = type(self).__name__
        group.attrs["num_bins"] = self.num_bins
        group.attrs["log_bins"] = self.log_bins
        group.attrs["min_samples_per_bin"] = self.min_samples_per_bin
        group.create_dataset("bin_centers", data=np.asarray(self.bin_centers))
        group.create_dataset(
            "median_error_in_bin", data=np.asarray(self.median_error_in_bin)
        )
        group.create_dataset(
            "std_error_in_bin", data=np.asarray(self.std_error_in_bin)
        )

    @classmethod
    def _from_hdf5_group(cls, group):
        return cls(
            bin_centers=group["bin_centers"][:],
            median_error_in_bin=group["median_error_in_bin"][:],
            std_error_in_bin=group["std_error_in_bin"][:],
            num_bins=int(group.attrs.get("num_bins", 20)),
            log_bins=bool(group.attrs.get("log_bins", True)),
            min_samples_per_bin=int(group.attrs.get("min_samples_per_bin", 10)),
        )


class AsinhEmpiricalNoiseModel(EmpiricalNoiseModel):
    """Empirical model in asinh ("luptitude") space (reference
    `AsinhEmpiricalUncertaintyModel`, `noise_models.py:443-637`): handles
    negative/low-SNR fluxes natively. Softening b = asinh_b_factor ×
    median(catalogue error); interpolators live in asinh mags.

    apply() converts nJy -> asinh, scatters there, converts back (bijective).
    """

    def __init__(self, bin_centers, median_error_in_bin, std_error_in_bin,
                 b_njy: float, error_type: str = "empirical", **kw):
        super().__init__(bin_centers, median_error_in_bin, std_error_in_bin, **kw)
        self.b_njy = float(b_njy)
        self.error_type = error_type

    @classmethod
    def from_catalogue(cls, fluxes_njy, errors_njy, asinh_b_factor=5.0,
                       error_type="empirical", num_bins=20,
                       min_samples_per_bin=10, **kw):
        fluxes_njy = np.asarray(fluxes_njy)
        errors_njy = np.asarray(errors_njy)
        valid = np.isfinite(fluxes_njy) & np.isfinite(errors_njy)
        b_njy = asinh_b_factor * np.median(errors_njy[valid])
        b_jy = b_njy * U.NJY_IN_JY
        mag = np.asarray(U.f_jy_to_asinh(fluxes_njy[valid] * U.NJY_IN_JY, b_jy))
        mag_err = np.asarray(
            U.f_jy_err_to_asinh(
                fluxes_njy[valid] * U.NJY_IN_JY,
                errors_njy[valid] * U.NJY_IN_JY,
                b_jy,
            )
        )
        c, m, s = fit_binned_error_model(
            mag, mag_err, num_bins, log_bins=False,
            min_samples_per_bin=min_samples_per_bin,
        )
        return cls(c, m, s, b_njy=b_njy, error_type=error_type,
                   num_bins=num_bins, log_bins=False,
                   min_samples_per_bin=min_samples_per_bin)

    def apply(self, key, flux_njy):
        flux_njy = jnp.asarray(flux_njy)
        b_jy = self.b_njy * U.NJY_IN_JY
        k1, k2, k3 = jax.random.split(key, 3)
        mag = U.f_jy_to_asinh(flux_njy * U.NJY_IN_JY, b_jy)
        sig_mag = self.sample_uncertainty(k1, mag)
        noisy_mag = mag + sig_mag * jax.random.normal(k2, mag.shape)
        if self.error_type == "empirical":
            final_sig = sig_mag
        else:  # re-evaluate at the noisy magnitude ("theoretical"/"observed")
            final_sig = self.sample_uncertainty(k3, noisy_mag)
        noisy_njy = U.asinh_to_f_jy(noisy_mag, b_jy) / U.NJY_IN_JY
        sigma_njy = (
            U.asinh_err_to_f_jy_err(noisy_mag, final_sig, b_jy) / U.NJY_IN_JY
        )
        return noisy_njy, sigma_njy

    def serialize_to_hdf5(self, group):
        super().serialize_to_hdf5(group)
        group.attrs["b_njy"] = self.b_njy
        group.attrs["error_type"] = self.error_type

    @classmethod
    def _from_hdf5_group(cls, group):
        base = EmpiricalNoiseModel._from_hdf5_group.__func__(EmpiricalNoiseModel, group)
        return cls(
            bin_centers=np.asarray(base.bin_centers),
            median_error_in_bin=np.asarray(base.median_error_in_bin),
            std_error_in_bin=np.asarray(base.std_error_in_bin),
            b_njy=float(group.attrs["b_njy"]),
            error_type=str(group.attrs.get("error_type", "empirical")),
            num_bins=base.num_bins,
            log_bins=base.log_bins,
            min_samples_per_bin=base.min_samples_per_bin,
        )


class GeneralEmpiricalNoiseModel(EmpiricalNoiseModel):
    """Most-featured empirical model with upper-limit handling (reference
    `GeneralEmpiricalUncertaintyModel`, `noise_models.py:638-1111`).

    Interpolation space is AB magnitudes or nJy (`interpolation_unit`).
    If `upper_limits`: sources whose SNR (before or after scattering) falls
    below `treat_as_upper_limits_below` get flux replaced per
    `upper_limit_flux_behaviour` ("scatter_limit" | "upper_limit" | number in
    interpolation units) and σ per `upper_limit_flux_err_behaviour`
    ("flux" | "upper_limit" | "sig_N"), mirroring reference `:882-957`.
    """

    def __init__(self, bin_centers, median_error_in_bin, std_error_in_bin,
                 interpolation_unit: str = "AB",
                 upper_limits: bool = False,
                 treat_as_upper_limits_below: float | None = None,
                 upper_limit_value: float | None = None,
                 upper_limit_flux_behaviour="scatter_limit",
                 upper_limit_flux_err_behaviour="flux",
                 sigma_clip: float | None = None,
                 **kw):
        super().__init__(bin_centers, median_error_in_bin, std_error_in_bin, **kw)
        self.interpolation_unit = U.FluxUnit.parse(interpolation_unit)
        self.upper_limits = bool(upper_limits)
        self.treat_as_upper_limits_below = treat_as_upper_limits_below
        self.upper_limit_value = upper_limit_value
        self.upper_limit_flux_behaviour = upper_limit_flux_behaviour
        self.upper_limit_flux_err_behaviour = upper_limit_flux_err_behaviour
        self.sigma_clip = sigma_clip

    # -- construction ----------------------------------------------------
    @classmethod
    def from_catalogue(cls, fluxes, errors, flux_unit="AB",
                       interpolation_unit=None, num_bins=20,
                       min_samples_per_bin=10, upper_limits=False,
                       treat_as_upper_limits_below=None,
                       upper_limit_flux_behaviour="scatter_limit",
                       upper_limit_flux_err_behaviour="flux",
                       sigma_clip=None, min_flux_for_binning=None, **kw):
        fu = U.FluxUnit.parse(flux_unit)
        iu = U.FluxUnit.parse(interpolation_unit or flux_unit)
        fluxes = np.asarray(fluxes, np.float64)
        errors = np.asarray(errors, np.float64)
        f_i = np.asarray(U.convert_flux(fluxes, fu, iu))
        e_i = np.asarray(U.convert_flux_err(fluxes, errors, fu, iu))
        valid = np.isfinite(f_i) & np.isfinite(e_i) & (e_i > 0)
        if min_flux_for_binning is not None:
            valid &= f_i > min_flux_for_binning
        log_bins = iu != U.FluxUnit.AB
        c, m, s = fit_binned_error_model(
            f_i[valid], e_i[valid], num_bins, log_bins=log_bins,
            min_samples_per_bin=min_samples_per_bin,
        )
        ul_value = None
        if upper_limits and treat_as_upper_limits_below is not None:
            # flux at threshold SNR via log-log interpolation of SNR(flux)
            # (reference `_setup_upper_limit_interpolator`, :785-830)
            f_njy = np.asarray(U.convert_flux(f_i[valid], iu, U.FluxUnit.NJY))
            e_njy = np.asarray(
                U.convert_flux_err(f_i[valid], e_i[valid], iu, U.FluxUnit.NJY)
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                snr = f_njy / e_njy
            ok = np.isfinite(snr) & (snr > 0) & (f_njy > 0)
            if ok.sum() >= 2:
                order = np.argsort(snr[ok])
                ul_flux_njy = 10 ** np.interp(
                    np.log10(treat_as_upper_limits_below),
                    np.log10(snr[ok][order]),
                    np.log10(f_njy[ok][order]),
                )
                ul_value = float(
                    U.convert_flux(ul_flux_njy, U.FluxUnit.NJY, iu)
                )
        return cls(c, m, s, interpolation_unit=iu, upper_limits=upper_limits,
                   treat_as_upper_limits_below=treat_as_upper_limits_below,
                   upper_limit_value=ul_value,
                   upper_limit_flux_behaviour=upper_limit_flux_behaviour,
                   upper_limit_flux_err_behaviour=upper_limit_flux_err_behaviour,
                   sigma_clip=sigma_clip, num_bins=num_bins,
                   log_bins=log_bins,
                   min_samples_per_bin=min_samples_per_bin)

    # -- internals -------------------------------------------------------
    def _to_internal(self, flux_njy):
        return U.convert_flux(flux_njy, U.FluxUnit.NJY, self.interpolation_unit)

    def _snr(self, flux_i, sigma_i):
        f_njy = U.convert_flux(flux_i, self.interpolation_unit, U.FluxUnit.NJY)
        e_njy = U.convert_flux_err(
            flux_i, sigma_i, self.interpolation_unit, U.FluxUnit.NJY
        )
        return f_njy / jnp.maximum(e_njy, 1.0e-30)

    def apply(self, key, flux_njy):
        flux_njy = jnp.asarray(flux_njy)
        k1, k2, k3 = jax.random.split(key, 3)
        f_i = self._to_internal(flux_njy)
        sigma_i = self.sample_uncertainty(k1, f_i)

        if self.upper_limits and self.treat_as_upper_limits_below is not None:
            pre_mask = self._snr(f_i, sigma_i) < self.treat_as_upper_limits_below
        else:
            pre_mask = jnp.zeros_like(f_i, dtype=bool)

        g = jax.random.normal(k2, f_i.shape)
        if self.sigma_clip is not None:
            g = jnp.clip(g, -self.sigma_clip, self.sigma_clip)
        # reference skips scattering for pre-identified upper limits (:838-856)
        noisy_i = jnp.where(pre_mask, f_i, f_i + sigma_i * g)
        final_sigma_i = sigma_i

        if (
            self.upper_limits
            and self.upper_limit_value is not None
            and self.treat_as_upper_limits_below is not None
        ):
            post_mask = (
                self._snr(noisy_i, final_sigma_i)
                < self.treat_as_upper_limits_below
            )
            mask = pre_mask | post_mask
            ulv = self.upper_limit_value
            # flux behaviour
            fb = self.upper_limit_flux_behaviour
            if fb == "scatter_limit":
                sd = _interp(
                    jnp.asarray(ulv), self.bin_centers, self.std_error_in_bin
                )
                samples = ulv + sd * jnp.clip(
                    jax.random.normal(k3, f_i.shape), -3.0, 3.0
                )
                repl_flux = samples
            elif fb == "upper_limit":
                repl_flux = jnp.full_like(f_i, ulv)
            else:
                repl_flux = jnp.full_like(f_i, float(fb))
            noisy_i = jnp.where(mask, repl_flux, noisy_i)
            # error behaviour
            eb = self.upper_limit_flux_err_behaviour
            if eb == "flux":
                repl_sig = _interp(
                    jnp.asarray(ulv), self.bin_centers, self.median_error_in_bin
                )
            elif eb == "upper_limit":
                repl_sig = jnp.asarray(ulv)
            elif isinstance(eb, str) and eb.startswith("sig_"):
                sig_val = float(eb.split("_")[1])
                if self.interpolation_unit == U.FluxUnit.AB:
                    repl_sig = jnp.asarray(U.POGSON / sig_val)
                else:
                    repl_sig = _interp(
                        jnp.asarray(ulv),
                        self.bin_centers,
                        self.median_error_in_bin,
                    )
            else:
                repl_sig = jnp.asarray(float(eb))
            final_sigma_i = jnp.where(mask, repl_sig, final_sigma_i)

        noisy_njy = U.convert_flux(noisy_i, self.interpolation_unit, U.FluxUnit.NJY)
        sigma_njy = U.convert_flux_err(
            noisy_i, final_sigma_i, self.interpolation_unit, U.FluxUnit.NJY
        )
        return noisy_njy, sigma_njy

    def serialize_to_hdf5(self, group):
        super().serialize_to_hdf5(group)
        a = group.attrs
        a["interpolation_unit"] = self.interpolation_unit.value
        a["upper_limits"] = self.upper_limits
        if self.treat_as_upper_limits_below is not None:
            a["treat_as_upper_limits_below"] = self.treat_as_upper_limits_below
        if self.upper_limit_value is not None:
            a["upper_limit_value"] = self.upper_limit_value
        a["upper_limit_flux_behaviour"] = str(self.upper_limit_flux_behaviour)
        a["upper_limit_flux_err_behaviour"] = str(self.upper_limit_flux_err_behaviour)
        if self.sigma_clip is not None:
            a["sigma_clip"] = self.sigma_clip

    @classmethod
    def _from_hdf5_group(cls, group):
        base = EmpiricalNoiseModel._from_hdf5_group.__func__(EmpiricalNoiseModel, group)
        a = group.attrs

        def _opt(name):
            return float(a[name]) if name in a else None

        fb = str(a.get("upper_limit_flux_behaviour", "scatter_limit"))
        try:
            fb = float(fb)
        except ValueError:
            pass
        return cls(
            bin_centers=np.asarray(base.bin_centers),
            median_error_in_bin=np.asarray(base.median_error_in_bin),
            std_error_in_bin=np.asarray(base.std_error_in_bin),
            interpolation_unit=str(a.get("interpolation_unit", "AB")),
            upper_limits=bool(a.get("upper_limits", False)),
            treat_as_upper_limits_below=_opt("treat_as_upper_limits_below"),
            upper_limit_value=_opt("upper_limit_value"),
            upper_limit_flux_behaviour=fb,
            upper_limit_flux_err_behaviour=str(
                a.get("upper_limit_flux_err_behaviour", "flux")
            ),
            sigma_clip=_opt("sigma_clip"),
            num_bins=base.num_bins,
            log_bins=base.log_bins,
            min_samples_per_bin=base.min_samples_per_bin,
        )


# ---------------------------------------------------------------------------
# registry (reference `MODEL_CLASS_REGISTRY`, noise_models.py:1113-1156)
# ---------------------------------------------------------------------------

MODEL_CLASS_REGISTRY = {
    "DepthNoiseModel": DepthNoiseModel,
    "SpectralNoiseModel": SpectralNoiseModel,
    "EmpiricalNoiseModel": EmpiricalNoiseModel,
    "AsinhEmpiricalNoiseModel": AsinhEmpiricalNoiseModel,
    "GeneralEmpiricalNoiseModel": GeneralEmpiricalNoiseModel,
    # reference class-name aliases for file interop
    "DepthUncertaintyModel": DepthNoiseModel,
    "SpectralUncertaintyModel": SpectralNoiseModel,
    "AsinhEmpiricalUncertaintyModel": AsinhEmpiricalNoiseModel,
    "GeneralEmpiricalUncertaintyModel": GeneralEmpiricalNoiseModel,
}


def create_noise_models_from_catalogue(
    flux_njy_by_band: dict,
    err_njy_by_band: dict,
    model_type: str = "general",
    **kwargs,
) -> dict:
    """Per-band noise models from observed catalogue arrays.

    Reference analogue: `create_uncertainty_models_from_EPOCHS_cat`
    (`noise_models.py:1159-1330`) builds per-band "general"/"depth"/"asinh"
    models from a JWST FITS catalogue; this takes plain arrays (no astropy in
    this environment) — pass {band: fluxes}, {band: errors} in nJy.
    """
    models = {}
    for band, flux in flux_njy_by_band.items():
        err = err_njy_by_band[band]
        if model_type == "general":
            models[band] = GeneralEmpiricalNoiseModel.from_catalogue(
                np.asarray(flux), np.asarray(err), flux_unit="nJy",
                interpolation_unit="nJy", **kwargs,
            )
        elif model_type == "asinh":
            models[band] = AsinhEmpiricalNoiseModel.from_catalogue(
                flux, err, **kwargs
            )
        elif model_type == "empirical":
            models[band] = EmpiricalNoiseModel.from_catalogue(
                flux, err, **kwargs
            )
        elif model_type == "depth":
            # effective 5σ depth from the median error
            from . import units as U

            sigma = float(np.nanmedian(err))
            depth_ab = float(U.njy_to_ab(5.0 * sigma))
            models[band] = DepthNoiseModel(depth_ab, 5.0, **kwargs)
        else:
            raise ValueError(f"unknown model_type {model_type!r}")
    return models


def save_noise_model_hdf5(model: NoiseModel, group) -> None:
    model.serialize_to_hdf5(group)


def load_noise_model_hdf5(group) -> NoiseModel:
    cls_name = str(group.attrs["__class__"])
    try:
        cls = MODEL_CLASS_REGISTRY[cls_name]
    except KeyError as e:
        raise ValueError(f"Unknown noise model class {cls_name!r}") from e
    return cls._from_hdf5_group(group)
