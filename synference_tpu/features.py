"""Feature engineering: raw photometry -> training feature arrays.

TPU-native re-architecture of the reference's
`create_feature_array_from_raw_photometry`
(`/root/reference/src/synference/sbi_runner.py:1429-2219`): a single pure
function over the photometry batch — noise scattering (scatter repetitions as
a leading batch axis), unit transforms with error propagation, normalization,
missing-band simulation, filter-arithmetic extra features — traced once under
jit. The serializable `flags` record reproduces the reference's
`feature_array_flags` provenance contract (`sbi_runner.py:2180-2209`) so the
identical transform replays on real observations
(`create_features_from_observations`, `:2473-2947`).

Feature column order follows the reference (`sbi_runner.py:1936-2030`):
    [photometry (F'), unc_* (F'), flag_* (F'), extra features, norm]
Missing bands: flux and error set to `missing_value` (99.0), flag columns
1.0 = missing.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import units as U
from .filter_arithmetic import FilterArithmeticParser
from .noise_models import DepthNoiseModel, NoiseModel

__all__ = ["FeatureConfig", "FeaturePipeline", "FeatureResult",
           "PARAMETER_TRANSFORMS"]

# Named registry of θ-column transforms (the reference passes raw callables
# to `update_parameter_array`, sbi_runner.py:476-578; a name registry keeps
# the replay contract serializable — same pattern as library.py's parameter
# transforms vs the reference's stored-`exec` source).
PARAMETER_TRANSFORMS = {
    "log10": jnp.log10,
    "log": jnp.log,
    "sqrt": jnp.sqrt,
    "exp": jnp.exp,
    "pow10": lambda v: 10.0 ** v,
    "arcsinh": jnp.arcsinh,
}


@dataclass(frozen=True)
class FeatureConfig:
    """Static feature-engineering configuration.

    Attributes:
        filter_codes: input photometry column order.
        remove_filters: codes dropped before anything else.
        unit: feature flux unit ("asinh" | "AB" | "nJy" | "log10_nJy").
        asinh_softening_njy: scalar, per-filter tuple, or "snr_5"-style
            string: softening = flux of the (depth/level)-sigma noise × N
            (reference SNR-based resolution, sbi_runner.py:1613-1676).
        n_scatters: noise realizations per library row (rows repeated).
        depths_ab: AB depths for depth-based scattering (used when no
            explicit noise models are supplied). Either a per-filter 1-D
            tuple, or a 2-D tuple-of-tuples (k sets × F filters): each
            scattered row then draws one depth set at random — the
            reference's multi-depth-set mode for surveys with
            field-to-field depth variation (`_apply_depths`,
            sbi_runner.py:580-691).
        depth_sigma_level: the sigma level the depths refer to.
        min_pct_error: error floor as a fraction of flux (reference
            min percentage error, sbi_runner.py:580-691).
        include_errors / include_flags: append unc_* / flag_* columns.
        normalize_method: None, a filter code, or a parameter/supplementary
            name; norm appended as the last feature.
        norm_unit: unit the appended norm factor is expressed in
            (e.g. "log10_nJy", "AB").
        missing_fraction: random missing-band probability per (row, band).
        missing_flux_options: tuple of preset 0/1 mask tuples — one chosen
            per row (overrides missing_fraction).
        missing_value: value injected for missing flux/err entries.
        extra_features: filter-arithmetic expressions and/or parameter or
            supplementary names appended as features.
        remove_parameters: θ columns dropped from the fitted parameter array
            (reference `update_parameter_array`, sbi_runner.py:476-578 —
            e.g. a redshift that is supplied as a feature instead).
        add_parameters: supplementary-parameter names appended as θ columns.
        parameter_transforms: ((param_name, transform_name), ...) pairs;
            transform_name keys `PARAMETER_TRANSFORMS` and the column is
            renamed f"{transform_name}_{param_name}" (e.g. train in
            log10-mass while the library stores linear mass).
    """

    filter_codes: tuple
    remove_filters: tuple = ()
    unit: str = "asinh"
    asinh_softening_njy: object = 5.0
    n_scatters: int = 1
    depths_ab: tuple | None = None
    depth_sigma_level: float = 5.0
    min_pct_error: float = 0.0
    include_errors: bool = True
    include_flags: bool = False
    normalize_method: str | None = None
    norm_unit: str = "log10_nJy"
    missing_fraction: float = 0.0
    missing_flux_options: tuple = ()
    missing_value: float = 99.0
    extra_features: tuple = ()
    remove_parameters: tuple = ()
    add_parameters: tuple = ()
    parameter_transforms: tuple = ()

    def to_flags(self) -> dict:
        """The serializable provenance record (feature_array_flags)."""
        d = {
            "filter_codes": list(self.filter_codes),
            "remove_filters": list(self.remove_filters),
            "unit": self.unit,
            "asinh_softening_njy": (
                list(self.asinh_softening_njy)
                if isinstance(self.asinh_softening_njy, (tuple, list))
                else self.asinh_softening_njy
            ),
            "n_scatters": self.n_scatters,
            "depths_ab": (
                [list(row) for row in self.depths_ab]
                if self.depths_ab and isinstance(
                    self.depths_ab[0], (tuple, list))
                else (list(self.depths_ab) if self.depths_ab else None)
            ),
            "depth_sigma_level": self.depth_sigma_level,
            "min_pct_error": self.min_pct_error,
            "include_errors": self.include_errors,
            "include_flags": self.include_flags,
            "normalize_method": self.normalize_method,
            "norm_unit": self.norm_unit,
            "missing_fraction": self.missing_fraction,
            "missing_flux_options": [list(m) for m in self.missing_flux_options],
            "missing_value": self.missing_value,
            "extra_features": list(self.extra_features),
            "remove_parameters": list(self.remove_parameters),
            "add_parameters": list(self.add_parameters),
            "parameter_transforms": [
                list(t) for t in self.parameter_transforms
            ],
        }
        return d

    @classmethod
    def from_flags(cls, d: dict) -> "FeatureConfig":
        d = dict(d)
        d["filter_codes"] = tuple(d["filter_codes"])
        d["remove_filters"] = tuple(d.get("remove_filters", ()))
        soft = d.get("asinh_softening_njy", 5.0)
        d["asinh_softening_njy"] = (
            tuple(soft) if isinstance(soft, list) else soft
        )
        dep = d.get("depths_ab")
        if dep and isinstance(dep[0], (tuple, list)):
            d["depths_ab"] = tuple(tuple(row) for row in dep)
        else:
            d["depths_ab"] = tuple(dep) if dep else None
        d["missing_flux_options"] = tuple(
            tuple(m) for m in d.get("missing_flux_options", ())
        )
        d["extra_features"] = tuple(d.get("extra_features", ()))
        d["remove_parameters"] = tuple(d.get("remove_parameters", ()))
        d["add_parameters"] = tuple(d.get("add_parameters", ()))
        d["parameter_transforms"] = tuple(
            tuple(t) for t in d.get("parameter_transforms", ())
        )
        return cls(**d)


@dataclass
class FeatureResult:
    features: np.ndarray  # (N', D)
    feature_names: list
    parameters: np.ndarray | None  # (N', P') scatter-repeated, NaN-pruned
    flags: dict = field(default_factory=dict)
    # source-galaxy index per row: scatter copies of the same library galaxy
    # share an index — train/test splits must group on it to avoid leakage
    source_index: np.ndarray | None = None
    # fitted θ column names after remove/add/transform (None = unchanged)
    parameter_names: list | None = None


class FeaturePipeline:
    """Build training features / replay on observations.

    Args:
        config: FeatureConfig.
        noise_models: optional dict {filter_code: NoiseModel}; when absent
            and `config.depths_ab` is set, DepthNoiseModels are built.
    """

    def __init__(self, config: FeatureConfig, noise_models: dict | None = None):
        self.config = config
        keep = [c for c in config.filter_codes if c not in config.remove_filters]
        self.kept_codes = keep
        self._keep_idx = np.array(
            [list(config.filter_codes).index(c) for c in keep]
        )
        self.noise_models = dict(noise_models or {})
        self._depth_sets_njy = None  # (k, F') sigma table for 2-D depths
        if not self.noise_models and config.depths_ab is not None:
            if isinstance(config.depths_ab[0], (tuple, list)):
                # multi-depth-set mode: per scattered row one set is drawn
                # at random (reference `_apply_depths` 2-D branch,
                # sbi_runner.py:625-650) — vectorized as a (k, F') sigma
                # table gathered per row, no per-object model objects
                sets = np.asarray(config.depths_ab, np.float64)
                if sets.shape[1] != len(config.filter_codes):
                    raise ValueError(
                        f"2-D depths_ab must be (k, {len(config.filter_codes)}); "
                        f"got {sets.shape}")
                self._depth_sets_njy = np.stack([
                    [float(U.ab_depth_to_sigma_njy(
                        d, config.depth_sigma_level)) for d in row]
                    for row in sets
                ])[:, self._keep_idx]
            else:
                depths = dict(zip(config.filter_codes, config.depths_ab))
                self.noise_models = {
                    c: DepthNoiseModel(depths[c], config.depth_sigma_level)
                    for c in keep
                }
        self._softening = self._resolve_softening()

    # ------------------------------------------------------------------
    def _resolve_softening(self):
        """Per-kept-filter asinh softening b in nJy."""
        cfg = self.config
        s = cfg.asinh_softening_njy
        n = len(self.kept_codes)
        if isinstance(s, str):
            # "snr_5": b = 5-sigma depth noise level per filter (requires
            # depths); reference resolution sbi_runner.py:1613-1676
            level = float(s.split("_")[1])
            if cfg.depths_ab is None:
                raise ValueError("snr-based softening requires depths_ab")
            if self._depth_sets_njy is not None:
                # multi-set depths: soften at the per-filter mean noise
                # level across sets (one softening must serve every set)
                return self._depth_sets_njy.mean(axis=0) * level
            depths = dict(zip(cfg.filter_codes, cfg.depths_ab))
            return np.array(
                [
                    float(
                        U.ab_depth_to_sigma_njy(
                            depths[c], cfg.depth_sigma_level
                        )
                    )
                    * level
                    for c in self.kept_codes
                ]
            )
        if isinstance(s, (tuple, list, np.ndarray)):
            arr = np.asarray(s, dtype=np.float64)
            if len(arr) == len(cfg.filter_codes):
                arr = arr[self._keep_idx]
            if len(arr) != n:
                raise ValueError("softening length mismatch")
            return arr
        return np.full(n, float(s))

    # ------------------------------------------------------------------
    def _scatter(self, key, phot_njy):
        """(N, F') -> noisy (S*N, F'), sigma (S*N, F'). Per-filter models
        applied column-wise; scatter repetitions tiled along axis 0."""
        cfg = self.config
        s = cfg.n_scatters
        tiled = jnp.tile(phot_njy, (s, 1))
        if self._depth_sets_njy is not None:
            k_set, k_noise = jax.random.split(key)
            sets = jnp.asarray(self._depth_sets_njy, jnp.float32)
            choice = jax.random.randint(
                k_set, (tiled.shape[0],), 0, sets.shape[0])
            sigma = sets[choice]  # (S*N, F')
            if cfg.min_pct_error > 0:
                sigma = jnp.maximum(sigma,
                                    cfg.min_pct_error * jnp.abs(tiled))
            noisy = tiled + sigma * jax.random.normal(k_noise, tiled.shape)
            return noisy, sigma
        if not self.noise_models:
            return tiled, None
        cols, sigs = [], []
        keys = jax.random.split(key, len(self.kept_codes))
        for j, code in enumerate(self.kept_codes):
            noisy, sig = self.noise_models[code].apply(keys[j], tiled[:, j])
            cols.append(noisy)
            sigs.append(sig)
        noisy = jnp.stack(cols, axis=1)
        sigma = jnp.stack(sigs, axis=1)
        if cfg.min_pct_error > 0:
            sigma = jnp.maximum(sigma, cfg.min_pct_error * jnp.abs(noisy))
        return noisy, sigma

    def _to_unit(self, flux_njy, sigma_njy):
        cfg = self.config
        fb = jnp.asarray(self._softening)
        x = U.convert_flux(flux_njy, "nJy", cfg.unit, f_b_njy=fb)
        xe = (
            U.convert_flux_err(flux_njy, sigma_njy, "nJy", cfg.unit, f_b_njy=fb)
            if sigma_njy is not None
            else None
        )
        return x, xe

    def _norm_is_mag(self):
        return U.FluxUnit.parse(self.config.unit) in (
            U.FluxUnit.AB,
            U.FluxUnit.ASINH,
            U.FluxUnit.LOG10_NJY,
        )

    # ------------------------------------------------------------------
    def build(
        self,
        key,
        phot_njy,
        parameters=None,
        parameter_names=(),
        supplementary=None,
        supplementary_names=(),
        remove_nan=True,
    ) -> FeatureResult:
        """Training-time feature building (scattering on).

        Args:
            key: PRNG key.
            phot_njy: (N, F) raw noiseless photometry [nJy] in
                config.filter_codes order.
            parameters: optional (N, P) θ array, repeated per scatter and
                NaN-pruned in sync.
        """
        cfg = self.config
        phot_njy = jnp.asarray(phot_njy, jnp.float32)[:, self._keep_idx]
        n = phot_njy.shape[0]
        s = cfg.n_scatters

        k_scatter, k_missing = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
        noisy, sigma = self._scatter(k_scatter, phot_njy)
        x, xe = self._to_unit(noisy, sigma)
        raw_tiled = jnp.tile(phot_njy, (s, 1))

        feature_names = list(self.kept_codes)
        norm_appended = None

        # --- normalization ------------------------------------------------
        if cfg.normalize_method is not None:
            method = cfg.normalize_method
            if method in cfg.filter_codes:
                j = self.kept_codes.index(method)
                norm_col = x[:, j]
                raw_norm = raw_tiled[:, j]
                sel = [i for i in range(x.shape[1]) if i != j]
                x = x[:, sel]
                if xe is not None:
                    xe = xe[:, sel]
                feature_names = [c for c in feature_names if c != method]
                if self._norm_is_mag():
                    x = x - norm_col[:, None]
                else:
                    x = x / jnp.where(norm_col == 0, 1.0, norm_col)[:, None]
                    if xe is not None:
                        xe = xe / jnp.abs(
                            jnp.where(norm_col == 0, 1.0, norm_col)
                        )[:, None]
                norm_appended = U.convert_flux(raw_norm, "nJy", cfg.norm_unit)
            elif method in tuple(parameter_names) + tuple(supplementary_names):
                if method in tuple(parameter_names):
                    col = jnp.asarray(parameters)[:, list(parameter_names).index(method)]
                else:
                    col = jnp.asarray(supplementary)[
                        :, list(supplementary_names).index(method)
                    ]
                col_t = jnp.tile(col, (s,))
                if self._norm_is_mag():
                    # the named column is interpreted as a FLUX IN nJy
                    # (e.g. a model reference-band flux stored as a
                    # supplementary quantity) — normalizing magnitudes by a
                    # non-flux parameter is meaningless, so guard on
                    # positivity rather than silently converting garbage
                    col_np = np.asarray(col)
                    if not (np.isfinite(col_np).all() and (col_np > 0).all()):
                        raise ValueError(
                            f"normalize_method={method!r}: magnitude-space "
                            "normalization treats the column as a flux in "
                            "nJy, but it contains non-positive or "
                            "non-finite values; use a flux-like quantity "
                            "or a linear feature unit"
                        )
                    factor = U.convert_flux(col_t, "nJy", cfg.unit,
                                            f_b_njy=float(np.mean(self._softening)))
                    x = x - factor[:, None]
                else:
                    x = x / jnp.where(col_t == 0, 1.0, col_t)[:, None]
                norm_appended = U.convert_flux(col_t, "nJy", cfg.norm_unit)
            else:
                raise ValueError(
                    f"normalize_method {method!r} is neither a filter nor a "
                    "parameter/supplementary name"
                )

        blocks = [x]
        if cfg.include_errors and xe is not None:
            blocks.append(xe)
            feature_names += [f"unc_{c}" for c in self.kept_codes
                              if c != cfg.normalize_method]

        # extra features are computed from the PRE-missing-injection fluxes
        # (matching the reference, whose parser evaluates normed_photometry
        # before injection, and matching transform_observations)
        x_pre_missing = x

        # --- missing-band simulation -------------------------------------
        n_phot = x.shape[1]
        if cfg.missing_flux_options:
            opts = jnp.asarray(cfg.missing_flux_options, jnp.float32)
            # preset masks are defined over kept filters; drop norm filter col
            if cfg.normalize_method in self.kept_codes:
                j = self.kept_codes.index(cfg.normalize_method)
                opts = jnp.delete(opts, j, axis=1)
            choice = jax.random.randint(
                k_missing, (x.shape[0],), 0, opts.shape[0]
            )
            mask = opts[choice]
        elif cfg.missing_fraction > 0:
            mask = (
                jax.random.uniform(k_missing, x.shape) < cfg.missing_fraction
            ).astype(x.dtype)
        else:
            mask = None
        if mask is not None:
            x = jnp.where(mask == 1.0, cfg.missing_value, x)
            blocks[0] = x
            if cfg.include_errors and xe is not None:
                blocks[1] = jnp.where(mask == 1.0, cfg.missing_value, xe)
            if cfg.include_flags:
                blocks.append(mask)
                feature_names += [
                    f"flag_{c}" for c in self.kept_codes
                    if c != cfg.normalize_method
                ]
        del n_phot

        # --- extra features ----------------------------------------------
        if cfg.extra_features:
            parser = FilterArithmeticParser()
            cols = dict(zip(
                [c for c in self.kept_codes if c != cfg.normalize_method],
                [x_pre_missing[:, i] for i in range(x_pre_missing.shape[1])],
            ))
            for expr in cfg.extra_features:
                if expr in tuple(parameter_names):
                    col = jnp.tile(
                        jnp.asarray(parameters)[:, list(parameter_names).index(expr)],
                        (s,),
                    )
                elif expr in tuple(supplementary_names):
                    col = jnp.tile(
                        jnp.asarray(supplementary)[
                            :, list(supplementary_names).index(expr)
                        ],
                        (s,),
                    )
                else:
                    col = parser.parse_and_evaluate(expr, cols)
                blocks.append(col[:, None])
                feature_names.append(expr)

        if norm_appended is not None:
            blocks.append(norm_appended[:, None])
            feature_names.append(
                f"norm_{cfg.normalize_method}_{cfg.norm_unit}"
            )

        features = jnp.concatenate(blocks, axis=1)

        # --- fitted parameter array: remove / add / transform --------------
        # (reference `update_parameter_array`, sbi_runner.py:476-578)
        param_names_out = None
        params_out = None
        if parameters is not None:
            P = jnp.asarray(parameters, jnp.float32)
            param_names_out = list(parameter_names)
            if cfg.remove_parameters:
                keep = [i for i, p in enumerate(param_names_out)
                        if p not in cfg.remove_parameters]
                P = P[:, keep]
                param_names_out = [param_names_out[i] for i in keep]
            for name in cfg.add_parameters:
                if name not in tuple(supplementary_names):
                    raise ValueError(
                        f"add_parameters entry {name!r} not in "
                        f"supplementary names {tuple(supplementary_names)}"
                    )
                j = list(supplementary_names).index(name)
                P = jnp.concatenate(
                    [P, jnp.asarray(supplementary, jnp.float32)[:, j:j + 1]],
                    axis=1,
                )
                param_names_out.append(name)
            for pname, tname in cfg.parameter_transforms:
                if tname not in PARAMETER_TRANSFORMS:
                    raise ValueError(
                        f"unknown parameter transform {tname!r}; "
                        f"known: {sorted(PARAMETER_TRANSFORMS)}"
                    )
                if pname not in param_names_out:
                    raise ValueError(
                        f"parameter {pname!r} not found for transform"
                    )
                j = param_names_out.index(pname)
                P = P.at[:, j].set(PARAMETER_TRANSFORMS[tname](P[:, j]))
                param_names_out[j] = f"{tname}_{pname}"
            params_out = jnp.tile(P, (s, 1))

        features = np.asarray(features)
        params_np = None if params_out is None else np.asarray(params_out)
        source_index = np.tile(np.arange(n), s)
        if remove_nan:
            good = np.isfinite(features).all(axis=1)
            if params_np is not None and cfg.parameter_transforms:
                # transforms can create non-finite θ (e.g. log10 of <= 0)
                good &= np.isfinite(params_np).all(axis=1)
            features = features[good]
            source_index = source_index[good]
            if params_np is not None:
                params_np = params_np[good]

        flags = self.config.to_flags()
        flags["feature_names"] = feature_names
        flags["n_input_rows"] = int(n)
        return FeatureResult(
            features=features,
            feature_names=feature_names,
            parameters=params_np,
            flags=flags,
            source_index=source_index,
            parameter_names=param_names_out,
        )

    # ------------------------------------------------------------------
    def transform_observations(
        self,
        flux,
        flux_err=None,
        flux_unit="nJy",
        missing_mask=None,
        extra_values: dict | None = None,
        norm_values=None,
    ) -> np.ndarray:
        """Replay the training transform on real observations (no
        scattering; reference `create_features_from_observations`,
        sbi_runner.py:2473-2947).

        Args:
            flux: (M, F) observed fluxes in config.filter_codes order.
            flux_err: (M, F) matching 1σ errors (required when the training
                features include errors).
            flux_unit: unit of the provided values.
            missing_mask: optional (M, F) bool/0-1 array, 1 = missing.
            extra_values: (M,) catalogue columns for any `extra_features`
                entries that named a parameter/supplementary quantity at
                training time (e.g. a spectroscopic redshift) — those cannot
                be derived from photometry and must be supplied here (the
                reference's `provided_feature_parameters` contract,
                sbi_runner.py:2034-2081).
            norm_values: (M,) per-object values when `normalize_method`
                named a parameter/supplementary quantity at training time
                (interpreted as at training: a flux in nJy for
                magnitude-space units). Ignored for filter normalization.
        """
        cfg = self.config
        flux = jnp.asarray(flux, jnp.float32)
        f_njy = U.convert_flux(flux, flux_unit, "nJy")
        e_njy = (
            U.convert_flux_err(flux, jnp.asarray(flux_err, jnp.float32),
                               flux_unit, "nJy")
            if flux_err is not None
            else None
        )
        f_njy = f_njy[:, self._keep_idx]
        if e_njy is not None:
            e_njy = e_njy[:, self._keep_idx]
            if cfg.min_pct_error > 0:
                e_njy = jnp.maximum(e_njy, cfg.min_pct_error * jnp.abs(f_njy))
        x, xe = self._to_unit(f_njy, e_njy)

        feature_cols = None
        norm_appended = None
        if cfg.normalize_method is not None and (
            cfg.normalize_method not in cfg.filter_codes
        ):
            # parameter/supplementary-quantity normalization: the value is
            # not derivable from the catalogue photometry — the caller must
            # supply it per object (same contract as extra_values; the
            # training-side semantics at build() treat it as a flux in nJy
            # for magnitude units)
            if norm_values is None:
                raise ValueError(
                    f"normalize_method={cfg.normalize_method!r} named a "
                    "parameter/supplementary quantity at training time; "
                    "pass norm_values=(M,) with that quantity per object "
                    "(interpreted as at training: a flux in nJy for "
                    "magnitude-space units)"
                )
            col = jnp.asarray(norm_values, jnp.float32)
            if self._norm_is_mag():
                col_np = np.asarray(col)
                if not (np.isfinite(col_np).all() and (col_np > 0).all()):
                    raise ValueError(
                        "norm_values must be positive finite fluxes [nJy] "
                        "for magnitude-space feature units"
                    )
                factor = U.convert_flux(
                    col, "nJy", cfg.unit,
                    f_b_njy=float(np.mean(self._softening)))
                x = x - factor[:, None]
            else:
                x = x / jnp.where(col == 0, 1.0, col)[:, None]
            norm_appended = U.convert_flux(col, "nJy", cfg.norm_unit)
        elif cfg.normalize_method is not None:
            j = self.kept_codes.index(cfg.normalize_method)
            norm_col = x[:, j]
            raw_norm = f_njy[:, j]
            sel = [i for i in range(x.shape[1]) if i != j]
            x = x[:, sel]
            if xe is not None:
                xe = xe[:, sel]
            if self._norm_is_mag():
                x = x - norm_col[:, None]
            else:
                x = x / jnp.where(norm_col == 0, 1.0, norm_col)[:, None]
                # error columns scale with the same per-object norm flux at
                # build() (training) time — replay must match or the flow is
                # conditioned on error features off by the norm magnitude
                if xe is not None:
                    xe = xe / jnp.abs(
                        jnp.where(norm_col == 0, 1.0, norm_col)
                    )[:, None]
            norm_appended = U.convert_flux(raw_norm, "nJy", cfg.norm_unit)
        del feature_cols

        blocks = [x]
        if cfg.include_errors and xe is not None:
            blocks.append(xe)

        if missing_mask is not None:
            m = jnp.asarray(missing_mask, jnp.float32)[:, self._keep_idx]
            if cfg.normalize_method in self.kept_codes:
                j = self.kept_codes.index(cfg.normalize_method)
                m = jnp.delete(m, j, axis=1)
            blocks[0] = jnp.where(m == 1.0, cfg.missing_value, blocks[0])
            if cfg.include_errors and xe is not None:
                blocks[1] = jnp.where(m == 1.0, cfg.missing_value, blocks[1])
            if cfg.include_flags:
                blocks.append(m)
        elif cfg.include_flags and (
            cfg.missing_fraction > 0 or cfg.missing_flux_options
        ):
            blocks.append(jnp.zeros_like(x))

        if cfg.extra_features:
            parser = FilterArithmeticParser()
            cols = dict(zip(
                [c for c in self.kept_codes if c != cfg.normalize_method],
                [x[:, i] for i in range(x.shape[1])],
            ))
            for expr in cfg.extra_features:
                if extra_values is not None and expr in extra_values:
                    col = jnp.asarray(extra_values[expr], jnp.float32)
                else:
                    try:
                        col = parser.parse_and_evaluate(expr, cols)
                    except KeyError as e:
                        raise ValueError(
                            f"extra feature {expr!r} was a parameter/"
                            "supplementary column at training time; supply "
                            "it via extra_values={...} when transforming "
                            "observations"
                        ) from e
                blocks.append(col[:, None])

        if norm_appended is not None:
            blocks.append(norm_appended[:, None])
        return np.asarray(jnp.concatenate(blocks, axis=1))

    # ------------------------------------------------------------------
    def save_flags(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.config.to_flags(), f, indent=2)

    @classmethod
    def from_flags(cls, flags: dict, noise_models=None) -> "FeaturePipeline":
        flags = {
            k: v
            for k, v in flags.items()
            if k not in ("feature_names", "n_input_rows")
        }
        return cls(FeatureConfig.from_flags(flags), noise_models)
