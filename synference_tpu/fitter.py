"""`SBIFitter` — the top-level amortized-inference workflow.

TPU-native counterpart of the reference's `SBI_Fitter`
(`/root/reference/src/synference/sbi_runner.py:167-7640`): holds the library,
builds features, trains flow ensembles, produces posteriors, evaluates
coverage, and persists everything. The torch/ili/optuna machinery is replaced
by the pure-JAX modules in this package; training an ensemble is one vmapped
program and posterior sampling is fully batched.
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from .diagnostics import evaluate_posterior
from .features import FeatureConfig, FeaturePipeline
from .flows.base import ConditionalFlow, build_flow
from .library import load_library_hdf5
from .posterior import DirectPosterior, EnsemblePosterior
from .priors import BoxUniform, priors_from_library
from .train import TrainConfig, train_ensemble

__all__ = ["SBIFitter"]


class SBIFitter:
    """Train and apply amortized posteriors over an SED library.

    Typical flow (mirrors the reference API shape):

        fitter = SBIFitter.init_from_hdf5("library.h5")
        fitter.create_feature_array(FeatureConfig(...))
        result = fitter.run_single_sbi(model_type="nsf", n_nets=3)
        samples = fitter.sample_posterior(x_obs, n_samples=1000)
        report = fitter.evaluate_model()
    """

    def __init__(
        self,
        photometry: np.ndarray,  # (N, F) nJy
        parameters: np.ndarray,  # (N, P)
        parameter_names,
        filter_codes,
        supplementary: np.ndarray | None = None,
        supplementary_names=(),
        spectra: np.ndarray | None = None,
        wavelengths: np.ndarray | None = None,
        name: str = "sbi_model",
    ):
        self.spectra = None if spectra is None else np.asarray(spectra, np.float32)
        # wavelength grid of the stored spectra (HDF5 `Wavelengths`):
        # needed by wavelength-addressed spectral feature options
        self.wavelengths = (
            None if wavelengths is None else np.asarray(wavelengths))
        self.photometry = np.asarray(photometry, np.float32)
        self.parameters = np.asarray(parameters, np.float32)
        self.parameter_names = list(parameter_names)
        # library-native names; parameter_names may be rewritten by feature
        # configs with remove/add/transform parameter steps
        self._raw_parameter_names = list(parameter_names)
        self.filter_codes = list(filter_codes)
        self.supplementary = (
            None if supplementary is None else np.asarray(supplementary)
        )
        self.supplementary_names = list(supplementary_names)
        self.name = name

        self.feature_pipeline: FeaturePipeline | None = None
        self.features: np.ndarray | None = None
        self.feature_params: np.ndarray | None = None
        self.feature_source: np.ndarray | None = None
        self.prior: BoxUniform | None = None
        self.flow: ConditionalFlow | None = None
        self.train_result = None
        self.posterior = None
        self._split = None

    # ------------------------------------------------------------------
    @classmethod
    def init_from_hdf5(cls, path: str, name: str | None = None) -> "SBIFitter":
        """Load a reference-schema library (reference `init_from_hdf5`,
        sbi_runner.py:316-408)."""
        lib = load_library_hdf5(path)
        return cls(
            photometry=lib["photometry"].T,
            parameters=lib["parameters"].T,
            parameter_names=lib["parameter_names"],
            filter_codes=lib["filter_codes"],
            supplementary=(
                lib["supplementary_parameters"].T
                if "supplementary_parameters" in lib
                else None
            ),
            supplementary_names=lib.get("supplementary_parameter_names", ()),
            spectra=lib["spectra"].T if "spectra" in lib else None,
            wavelengths=lib.get("wavelengths"),
            name=name or os.path.basename(path).rsplit(".", 1)[0],
        )

    # ------------------------------------------------------------------
    def create_feature_array(
        self,
        config: FeatureConfig | None = None,
        noise_models: dict | None = None,
        key=None,
        **config_kwargs,
    ):
        """Build the training features (reference
        `create_feature_array_from_raw_photometry`, sbi_runner.py:1429)."""
        if config is None:
            config = FeatureConfig(
                filter_codes=tuple(self.filter_codes), **config_kwargs
            )
        self.feature_pipeline = FeaturePipeline(config, noise_models)
        res = self.feature_pipeline.build(
            key if key is not None else jax.random.PRNGKey(0),
            self.photometry,
            self.parameters,
            getattr(self, "_raw_parameter_names", self.parameter_names),
            supplementary=self.supplementary,
            supplementary_names=self.supplementary_names,
        )
        self.features = res.features
        self.feature_params = res.parameters
        self.feature_flags = res.flags
        self.feature_source = res.source_index
        if res.parameter_names is not None:
            # fitted θ columns after remove/add/transform steps (reference
            # fitted_parameter_names, sbi_runner.py:476-578)
            self.parameter_names = list(res.parameter_names)
        return res

    # ------------------------------------------------------------------
    def create_feature_array_from_raw_spectra(
        self,
        noise_model=None,
        n_scatters: int = 1,
        crop: tuple | None = None,
        crop_lam: tuple | None = None,
        normalize_pixel: int | None = None,
        normalize=None,
        key=None,
    ):
        """Spectral features (reference
        `create_feature_array_from_raw_spectra`, sbi_runner.py:1180-1428).

        Library spectra must already be on a common instrument grid (use
        `LibraryGenerator(spectral_pipeline=...)`). Steps: optional crop (by
        pixel index `crop` or wavelength `crop_lam` [Å]), optional per-pixel
        noise scattering via a SpectralNoiseModel, flux normalization.

        normalize (reference `_apply_flux_normalization`,
        sbi_runner.py:1096-1178): one of
          - int: divide by that pixel's flux (same as `normalize_pixel`),
          - ("tophat", center_Å, width_Å): mean flux in the tophat window,
          - ("bandpass", lo_Å, hi_Å): mean flux between two wavelengths,
          - callable (spec (B, L), lam (L,)) -> (B,) norm values.
        The normalization value is appended as a log10 feature so the
        amplitude information survives (reference appends it too).
        Wavelength-based options need the library's stored grid
        (`self.wavelengths`, the HDF5 `Wavelengths` dataset).
        """
        import jax as _jax

        if self.spectra is None:
            raise RuntimeError("library has no spectra")
        spec = jnp.asarray(self.spectra, jnp.float32)
        lam = (None if self.wavelengths is None
               else np.asarray(self.wavelengths, np.float64))
        if crop_lam is not None:
            if lam is None:
                raise ValueError("crop_lam needs library wavelengths")
            i0, i1 = np.searchsorted(lam, crop_lam)
            crop = (int(i0), int(i1))
        if crop is not None:
            spec = spec[:, crop[0]: crop[1]]
            if lam is not None:
                lam = lam[crop[0]: crop[1]]
        params = jnp.asarray(self.parameters, jnp.float32)
        if n_scatters > 1 or noise_model is not None:
            spec = jnp.tile(spec, (max(n_scatters, 1), 1))
            params = jnp.tile(params, (max(n_scatters, 1), 1))
        if noise_model is not None:
            key = key if key is not None else _jax.random.PRNGKey(0)
            spec, _ = noise_model.apply(key, spec)
        if normalize is None and normalize_pixel is not None:
            normalize = int(normalize_pixel)
        norm_flag = normalize
        if normalize is not None:
            if callable(normalize):
                norm = jnp.asarray(normalize(spec, lam), jnp.float32)
                norm_flag = getattr(normalize, "__name__", "callable")
            elif isinstance(normalize, int):
                norm = spec[:, normalize]
            else:
                kind = normalize[0]
                if lam is None:
                    raise ValueError(
                        f"normalize={kind!r} needs library wavelengths")
                if kind == "tophat":
                    lo = normalize[1] - 0.5 * normalize[2]
                    hi = normalize[1] + 0.5 * normalize[2]
                elif kind == "bandpass":
                    lo, hi = normalize[1], normalize[2]
                else:
                    raise ValueError(f"unknown normalize kind {kind!r}")
                m = jnp.asarray((lam >= lo) & (lam <= hi), spec.dtype)
                if float(m.sum()) == 0.0:
                    raise ValueError(
                        f"normalize window [{lo}, {hi}] Å misses the grid")
                norm = (spec * m).sum(-1) / m.sum()
            norm = jnp.where(norm == 0, 1.0, norm)
            spec = jnp.concatenate(
                [spec / norm[:, None],
                 jnp.log10(jnp.abs(norm))[:, None]], axis=1
            )
        feats = np.asarray(spec)
        good = np.isfinite(feats).all(axis=1)
        n_raw = self.spectra.shape[0]
        s_rep = max(n_scatters, 1) if (n_scatters > 1 or noise_model is not None) else 1
        source = np.tile(np.arange(n_raw), s_rep)
        self.features = feats[good]
        self.feature_params = np.asarray(params)[good]
        self.feature_source = source[good]
        self.feature_flags = {
            "spectral": True, "crop": crop,
            "normalize": norm_flag, "n_scatters": n_scatters,
        }
        return self.features

    # ------------------------------------------------------------------
    def create_priors(self, overrides=None, extend_pct: float = 0.0):
        self.prior = priors_from_library(
            self.feature_params
            if self.feature_params is not None
            else self.parameters,
            self.parameter_names,
            overrides=overrides,
            extend_pct=extend_pct,
        )
        return self.prior

    # ------------------------------------------------------------------
    def split_dataset(self, test_fraction: float = 0.1, seed: int = 0):
        """Held-out split grouped by source galaxy: with n_scatters > 1 the
        feature rows contain noise-realization copies of each galaxy, and a
        row-level split would leak θ into the test set."""
        n = self.features.shape[0]
        rng = np.random.default_rng(seed)
        source = getattr(self, "feature_source", None)
        if source is None:
            perm = rng.permutation(n)
            n_test = max(int(n * test_fraction), 1)
            self._split = {"test": perm[:n_test], "train": perm[n_test:]}
            return self._split
        uniq = np.unique(source)
        perm_g = rng.permutation(len(uniq))
        n_test_g = max(int(len(uniq) * test_fraction), 1)
        test_groups = uniq[perm_g[:n_test_g]]
        is_test = np.isin(source, test_groups)
        # np.where returns ROW-ORDERED indices — and library rows are
        # z-sorted (the z-sorted generation engine stores draws in redshift
        # order), so any `test[:max_objects]` truncation downstream would
        # evaluate on the lowest-z corner only (observed: a 63-band e2e
        # "R²(z) = -130" that was var(truth)≈0 on a z∈[0.10,0.31] slice,
        # not a broken posterior). Shuffle both index arrays.
        self._split = {
            "test": rng.permutation(np.where(is_test)[0]),
            "train": rng.permutation(np.where(~is_test)[0]),
        }
        return self._split

    # ------------------------------------------------------------------
    def run_single_sbi(
        self,
        model_type: str = "nsf",
        engine: str = "npe",
        n_nets: int = 1,
        hidden_features: int = 50,
        num_transforms: int = 5,
        train_config: TrainConfig | None = None,
        test_fraction: float = 0.1,
        key=None,
        epoch_callback=None,
        support_aware: bool = True,
        **model_kwargs,
    ):
        """Train the estimator (reference `run_single_sbi`,
        sbi_runner.py:4392-5067, defaults `:4404-4409`).

        Engines (reference trains NPE/NLE/NRE via sbi,
        sbi_runner.py:4447, :4713-4715, :5019):
          - "npe": q(θ|x) flow, direct posterior sampling.
          - "nle": q(x|θ) flow likelihood; posterior via batched MCMC.
          - "nre": classifier log-ratio; posterior via batched MCMC
            (`model_type` is ignored; pass hidden_features/num_layers).

        support_aware (npe only): reparametrize the flow onto the prior box
        via a logit transform so every sample is in-support by construction
        — no leakage, no rejection/clipping (the reference relies on sbi's
        rejection-corrected DirectPosterior, custom_runner.py:278-283).
        """
        engine = engine.lower()
        if engine not in ("npe", "nle", "nre"):
            raise ValueError(f"unknown engine {engine!r}")
        if self.features is None:
            self.create_feature_array()
        if self.prior is None:
            self.create_priors()
        if self._split is None:
            self.split_dataset(test_fraction)

        theta_dim = len(self.parameter_names)
        x_dim = self.features.shape[1]
        cfg = dict(model_kwargs)
        loss_fn = None
        if engine == "nre":
            from .ratio import build_ratio_estimator, nre_loss

            cfg.setdefault("hidden_features", max(hidden_features, 64))
            self.flow = build_ratio_estimator(theta_dim, x_dim, **cfg)
            loss_fn = nre_loss(self.flow)
        else:
            if model_type in ("maf", "nsf", "ncsf", "realnvp", "nice",
                              "naf", "unaf", "sospf", "gf"):
                cfg.update(hidden_features=hidden_features,
                           num_transforms=num_transforms)
            elif model_type in ("mdn", "cnf", "made"):
                cfg.setdefault("hidden_features", hidden_features)
            if engine == "nle":
                # roles swap: the flow models q(x|θ)
                self.flow = build_flow(model_type, theta_dim=x_dim,
                                       context_dim=theta_dim, **cfg)
            else:
                if support_aware and hasattr(self.prior, "low"):
                    cfg.setdefault(
                        "support_low",
                        tuple(np.asarray(self.prior.low, np.float64)))
                    cfg.setdefault(
                        "support_high",
                        tuple(np.asarray(self.prior.high, np.float64)))
                self.flow = build_flow(model_type, theta_dim=theta_dim,
                                       context_dim=x_dim, **cfg)

        tr_idx = self._split["train"]
        key = key if key is not None else jax.random.PRNGKey(42)
        source = getattr(self, "feature_source", None)
        theta_tr = self.feature_params[tr_idx]
        x_tr = self.features[tr_idx]
        if engine == "nle":
            # the trainer's "theta" slot carries the modeled quantity (x)
            theta_tr, x_tr = x_tr, theta_tr
        self.train_result = train_ensemble(
            self.flow,
            theta_tr,
            x_tr,
            key=key,
            config=train_config or TrainConfig(),
            n_nets=n_nets,
            groups=None if source is None else source[tr_idx],
            loss_fn=loss_fn,
            epoch_callback=epoch_callback,
        )
        self.engine = engine
        params = self.train_result.params
        if n_nets == 1:
            params = jax.tree_util.tree_map(lambda a: a[0], params)
        if engine == "npe":
            if n_nets == 1:
                self.posterior = DirectPosterior(self.flow, params, self.prior)
            else:
                self.posterior = EnsemblePosterior(
                    self.flow, params, self.prior, n_nets
                )
        elif engine == "nle":
            from .posterior import LikelihoodPosterior

            self.posterior = LikelihoodPosterior(
                self.flow, params, self.prior, n_members=n_nets
            )
        else:
            from .posterior import RatioPosterior

            self.posterior = RatioPosterior(
                self.flow, params, self.prior, n_members=n_nets
            )
        return self.train_result

    # ------------------------------------------------------------------
    def run_single_simformer(
        self,
        d_model: int = 128,
        n_heads: int = 4,
        n_layers: int = 4,
        attn_mask: str = "full",
        batch_size: int = 256,
        learning_rate: float = 1.0e-4,
        max_epochs: int = 100,
        n_diffusion_steps: int = 500,
        key=None,
    ):
        """Train a score-based transformer joint posterior on the feature
        array (reference `Simformer_Fitter.run_single_sbi`,
        sbi_runner.py:8075-8339; config defaults `:8143-8186`)."""
        import jax as _jax

        from .simformer import (
            Simformer,
            SimformerConfig,
            SimformerPosterior,
            block_attn_mask,
            train_simformer,
        )

        if self.features is None:
            self.create_feature_array()
        if self.prior is None:
            self.create_priors()
        theta = self.feature_params
        x = self.features
        n_theta, n_x = theta.shape[1], x.shape[1]
        cfg = SimformerConfig(
            n_tokens=n_theta + n_x, d_model=d_model, n_heads=n_heads,
            n_layers=n_layers,
        )
        model = Simformer(cfg)
        mask = (
            None if attn_mask == "full"
            else block_attn_mask(n_theta, n_x, attn_mask)
        )
        params, std, hist = train_simformer(
            model, theta, x,
            key if key is not None else _jax.random.PRNGKey(0),
            batch_size=batch_size, learning_rate=learning_rate,
            max_epochs=max_epochs, attn_mask=mask,
        )
        self.posterior = SimformerPosterior(
            model, params, std, attn_mask=mask, n_steps=n_diffusion_steps
        )
        self.engine = "simformer"
        self.flow = None
        self.train_result = None
        return hist

    # ------------------------------------------------------------------
    def run_online_snpe(self, simulate_fn, x_obs, model_type: str = "nsf",
                        n_rounds: int = 3, sims_per_round: int = 2000,
                        train_config=None, key=None, **model_kwargs):
        """Sequential NPE focused on one observation (reference online
        learning mode, sbi_runner.py:4710-4803); see `online.run_online_snpe`."""
        from .online import run_online_snpe as _run

        if self.prior is None:
            self.create_priors()
        flow = build_flow(
            model_type,
            theta_dim=len(self.parameter_names),
            context_dim=np.atleast_1d(np.asarray(x_obs)).shape[-1],
            **model_kwargs,
        )
        self.flow = flow
        posterior, data, hist = _run(
            simulate_fn, self.prior, flow, x_obs,
            n_rounds=n_rounds, sims_per_round=sims_per_round,
            train_config=train_config, key=key,
        )
        self.posterior = posterior
        return posterior, data, hist

    # ------------------------------------------------------------------
    def run_online_sbi(self, simulate_fn, x_obs, engine: str = "snpe",
                       model_type: str = "nsf", n_rounds: int = 3,
                       sims_per_round: int = 2000, train_config=None,
                       key=None, **model_kwargs):
        """Sequential SBI focused on one observation — SNPE, SNLE, or SNRE
        (reference online engines, sbi_runner.py:4710-4715).

        SNPE trains q(θ|x) with truncated proposals; SNLE trains q(x|θ) and
        samples via batched MCMC; SNRE trains a classifier log-ratio
        (`model_type` selects the NRE net: "mlp"/"resnet"/"linear").
        """
        engine = engine.lower()
        if engine in ("snpe", "npe"):
            return self.run_online_snpe(
                simulate_fn, x_obs, model_type=model_type, n_rounds=n_rounds,
                sims_per_round=sims_per_round, train_config=train_config,
                key=key, **model_kwargs)
        if engine not in ("snle", "nle", "snre", "nre"):
            raise ValueError(f"unknown online engine {engine!r}")
        if self.prior is None:
            self.create_priors()
        theta_dim = len(self.parameter_names)
        x_dim = np.atleast_1d(np.asarray(x_obs)).shape[-1]
        if engine in ("snle", "nle"):
            from .online import run_online_snle as _run

            flow = build_flow(model_type, theta_dim=x_dim,
                              context_dim=theta_dim, **model_kwargs)
            self.flow = flow
            posterior, data, hist = _run(
                simulate_fn, self.prior, flow, x_obs, n_rounds=n_rounds,
                sims_per_round=sims_per_round, train_config=train_config,
                key=key)
            self.engine = "nle"  # canonical name for save/load dispatch
        else:
            from .online import run_online_snre as _run
            from .ratio import build_ratio_estimator

            net = model_type if model_type in ("mlp", "resnet", "linear") \
                else "mlp"
            estimator = build_ratio_estimator(theta_dim, x_dim, net=net,
                                              **model_kwargs)
            self.flow = estimator
            posterior, data, hist = _run(
                simulate_fn, self.prior, estimator, x_obs, n_rounds=n_rounds,
                sims_per_round=sims_per_round, train_config=train_config,
                key=key)
            self.engine = "nre"
        self.posterior = posterior
        return posterior, data, hist

    # ------------------------------------------------------------------
    def sample_posterior(self, xs, n_samples: int = 1000, key=None):
        """(M, D_features) -> (M, n_samples, P); fully batched (the
        reference loops per object, sbi_runner.py:6412-6424)."""
        key = key if key is not None else jax.random.PRNGKey(1)
        return np.asarray(
            self.posterior.sample_batch(key, jnp.asarray(xs), n_samples)
        )

    # ------------------------------------------------------------------
    def evaluate_model(self, n_samples: int = 256, key=None, max_objects: int = 512):
        """Held-out metrics + coverage (reference `evaluate_model`,
        sbi_runner.py:6484-6735)."""
        idx = self._split["test"][:max_objects]
        return evaluate_posterior(
            self.posterior,
            self.features[idx],
            self.feature_params[idx],
            key=key,
            n_samples=n_samples,
            parameter_names=self.parameter_names,
        )

    def evaluate_members(self, n_samples: int = 256, key=None,
                         max_objects: int = 512):
        """Per-member calibration with seed-to-seed error bars: every
        vmapped ensemble member is an independent training seed, so the
        member spread of TARP/PIT/R² is the run-to-run CI a single-seed
        report hides. One jitted vmap over members
        (`diagnostics.evaluate_members_fused`); requires n_nets > 1."""
        from .diagnostics import evaluate_members_fused

        if getattr(self, "train_result", None) is None \
                or self.train_result.n_members < 2:
            raise ValueError("evaluate_members needs an n_nets>1 ensemble")
        idx = self._split["test"][:max_objects]
        return evaluate_members_fused(
            self.flow, self.train_result.params, self.prior,
            self.features[idx], self.feature_params[idx], key=key,
            n_samples=n_samples, parameter_names=self.parameter_names)

    # ------------------------------------------------------------------
    def save_state(self, path: str):
        """Persist flow spec + params + prior + feature flags (reference
        `save_state`, sbi_runner.py:693-811; simformer persistence mirrors
        `save_model_to_pkl`, sbi_runner.py:8341-8504)."""
        engine = getattr(self, "engine", "npe")
        state = {
            "name": self.name,
            "engine": engine,
            "prior": self.prior.to_dict(),
            "parameter_names": self.parameter_names,
            "filter_codes": self.filter_codes,
            "feature_flags": getattr(self, "feature_flags", None),
        }
        if engine == "simformer":
            state["simformer"] = self.posterior.state_dict()
        elif getattr(self, "train_result", None) is not None:
            state.update({
                "flow_spec": self.flow.spec(),
                "params": jax.tree_util.tree_map(
                    np.asarray, self.train_result.params
                ),
                "n_members": self.train_result.n_members,
                "train_history": {
                    "train_losses": np.asarray(self.train_result.train_losses),
                    "val_losses": np.asarray(self.train_result.val_losses),
                },
            })
        else:
            # online paths (run_online_sbi) leave no train_result; the
            # posterior carries the final params. load_saved_model expects
            # a leading member axis, so re-add one for single members.
            params = self.posterior.params
            n_members = getattr(self.posterior, "n_members", 1)
            if n_members == 1:
                params = jax.tree_util.tree_map(
                    lambda a: np.asarray(a)[None], params)
            state.update({
                "flow_spec": self.flow.spec(),
                "params": jax.tree_util.tree_map(np.asarray, params),
                "n_members": n_members,
            })
        with open(path, "wb") as f:
            pickle.dump(state, f)

    @classmethod
    def load_saved_model(cls, path: str):
        """Rebuild a fitter (posterior only; library not required) —
        reference `load_saved_model`, sbi_runner.py:410-474."""
        with open(path, "rb") as f:
            state = pickle.load(f)
        fitter = cls.__new__(cls)
        fitter.name = state["name"]
        fitter.parameter_names = list(state["parameter_names"])
        fitter.filter_codes = list(state["filter_codes"])
        fitter.engine = state.get("engine", "npe")
        if fitter.engine == "simformer":
            from .simformer import SimformerPosterior

            fitter.flow = None
            fitter.prior = BoxUniform.from_dict(state["prior"])
            fitter.posterior = SimformerPosterior.from_state_dict(
                state["simformer"]
            )
            flags = state.get("feature_flags")
            fitter.feature_pipeline = (
                FeaturePipeline.from_flags(flags) if flags else None
            )
            for attr in ("features", "feature_params", "feature_source",
                         "supplementary", "train_result", "_split",
                         "photometry", "parameters", "spectra"):
                setattr(fitter, attr, None)
            fitter.supplementary_names = []
            return fitter
        spec = state["flow_spec"]
        if spec.get("model") == "nre":
            from .ratio import RatioEstimator

            fitter.flow = RatioEstimator.from_spec(spec)
        else:
            fitter.flow = ConditionalFlow.from_spec(spec)
        fitter.prior = BoxUniform.from_dict(state["prior"])
        params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        n_members = state.get("n_members", 1)
        single = (
            jax.tree_util.tree_map(lambda a: a[0], params)
            if n_members == 1 else None
        )
        if fitter.engine == "nle":
            from .posterior import LikelihoodPosterior

            fitter.posterior = LikelihoodPosterior(
                fitter.flow, single if n_members == 1 else params,
                fitter.prior, n_members=n_members,
            )
        elif fitter.engine == "nre":
            from .posterior import RatioPosterior

            fitter.posterior = RatioPosterior(
                fitter.flow, single if n_members == 1 else params,
                fitter.prior, n_members=n_members,
            )
        elif n_members == 1:
            fitter.posterior = DirectPosterior(fitter.flow, single, fitter.prior)
        else:
            fitter.posterior = EnsemblePosterior(
                fitter.flow, params, fitter.prior, n_members
            )
        flags = state.get("feature_flags")
        fitter.feature_pipeline = (
            FeaturePipeline.from_flags(flags) if flags else None
        )
        fitter.features = None
        fitter.feature_params = None
        fitter.feature_source = None
        fitter.supplementary = None
        fitter.supplementary_names = []
        fitter.train_result = None
        fitter._split = None
        fitter.photometry = None
        fitter.parameters = None
        fitter.spectra = None
        return fitter

    # ------------------------------------------------------------------
    def detect_misspecification(self, x_obs, quantile: float = 0.01,
                                key=None, max_train: int = 20000):
        """Flag observations whose feature-marginal density falls below the
        training set's `quantile` (reference `detect_misspecification`,
        sbi_runner.py:905-984). Returns (flags, logp_obs, threshold)."""
        from .diagnostics import fit_marginal_flow, misspecification_check

        if self.features is None:
            self.create_feature_array()
        x_train = self.features[: max_train]
        flow, params = fit_marginal_flow(x_train, key=key)
        return misspecification_check(flow, params, x_train,
                                      np.atleast_2d(np.asarray(x_obs)),
                                      quantile=quantile)

    def lc2st(self, x_obs, n_cal: int = 1000, key=None, **kwargs):
        """Local C2ST at one observation using held-out calibration pairs
        (reference `lc2st`, sbi_runner.py:986-1063); see
        `diagnostics.lc2st` for the returned statistics."""
        from .diagnostics import lc2st as _lc2st

        if self._split is None or self.feature_params is None:
            raise ValueError(
                "lc2st needs library calibration pairs: run "
                "create_feature_array + split_dataset first (fitters "
                "restored via load_saved_model carry no library)")
        idx = self._split["test"][:n_cal]
        return _lc2st(self.posterior, self.feature_params[idx],
                      self.features[idx], np.asarray(x_obs), key=key,
                      **kwargs)

    def create_dataframe(self, data: str = "all"):
        """Pandas view of the library (reference `create_dataframe`,
        sbi_runner.py:3377-3405). `data`: "parameters" | "photometry" |
        "supplementary" | "features" | "all"."""
        import pandas as pd

        frames = []
        if data in ("parameters", "all"):
            frames.append(pd.DataFrame(self.parameters,
                                       columns=self._raw_parameter_names))
        if data in ("photometry", "all") and self.photometry is not None:
            frames.append(pd.DataFrame(self.photometry,
                                       columns=self.filter_codes))
        if data in ("supplementary", "all") and self.supplementary is not None:
            frames.append(pd.DataFrame(self.supplementary,
                                       columns=self.supplementary_names))
        if data == "features":
            if self.features is None:
                self.create_feature_array()
            # features carry the scatter axis; take the raw length
            frames.append(pd.DataFrame(np.asarray(self.features)))
        if not frames:
            raise ValueError(f"no data for {data!r}")
        return pd.concat(frames, axis=1)

    @property
    def training_log_probs(self):
        """-train-loss history, (epochs, members) (reference
        `training_log_probs`, sbi_runner.py:7389)."""
        return -np.asarray(self.train_result.train_losses)

    @property
    def validation_log_probs(self):
        """-val-loss history (reference `validation_log_probs`,
        sbi_runner.py:7376)."""
        return -np.asarray(self.train_result.val_losses)

    def calculate_map(self, x, key=None, n_starts: int = 512):
        """MAP estimate per observation (reference `calculate_MAP`,
        sbi_runner.py:7204)."""
        return self.posterior.map_estimate(np.asarray(x), key=key,
                                           n_starts=n_starts)

    # ------------------------------------------------------------------
    def features_from_observations(self, flux, flux_err=None,
                                   flux_unit="nJy", missing_mask=None):
        """Replay training feature transform on a catalogue (reference
        `create_features_from_observations`, sbi_runner.py:2473-2947)."""
        if self.feature_pipeline is None:
            raise RuntimeError("no feature pipeline; build or load one first")
        return self.feature_pipeline.transform_observations(
            flux, flux_err, flux_unit, missing_mask
        )

    def save_metrics(self, report: dict, path: str):
        def _safe(v):
            if isinstance(v, dict):
                return {k: _safe(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [_safe(x) for x in v]
            if isinstance(v, np.ndarray):
                return v.tolist()
            if isinstance(v, (np.floating, np.integer)):
                return v.item()
            return v

        with open(path, "w") as f:
            json.dump(_safe(report), f, indent=2)

    # ------------------------------------------------------------------
    def run_validation_from_file(self, validation_file: str,
                                 plots_dir: str = ".",
                                 n_samples: int = 256,
                                 max_objects: int = 512, key=None):
        """Validate a previously SAVED model against this fitter's held-out
        split: load the posterior from `validation_file`, compute the full
        evaluation report, write the diagnostic figures + a metrics JSON
        (reference `run_validation_from_file`, sbi_runner.py:7347-7373 —
        ValidationRunner re-plots a saved posterior on the fitter's
        loader). Returns (report, figure_paths)."""
        import os as _os

        from .plotting import plot_coverage, plot_posterior_predictions

        loaded = type(self).load_saved_model(validation_file)
        if self._split is None:
            self.split_dataset()
        idx = self._split["test"][:max_objects]
        xs, truths = self.features[idx], self.feature_params[idx]
        report = evaluate_posterior(
            loaded.posterior, xs, truths, key=key, n_samples=n_samples,
            parameter_names=self.parameter_names)
        _os.makedirs(plots_dir, exist_ok=True)
        k = key if key is not None else jax.random.PRNGKey(1)
        samples = np.asarray(
            loaded.posterior.sample_batch(k, jnp.asarray(xs), n_samples))
        stem = f"{loaded.name}_validation"
        paths = {
            "coverage": _os.path.join(plots_dir, f"{stem}_coverage.png"),
            "predictions": _os.path.join(
                plots_dir, f"{stem}_predictions.png"),
            "metrics": _os.path.join(plots_dir, f"{stem}_metrics.json"),
        }
        plot_coverage(samples, truths, self.parameter_names,
                      save=paths["coverage"])
        plot_posterior_predictions(samples, truths, self.parameter_names,
                                   save=paths["predictions"])
        self.save_metrics(report, paths["metrics"])
        return report, paths

    # ------------------------------------------------------------------
    def plot_diagnostics(self, out_dir: str = ".", n_samples: int = 200,
                         max_objects: int = 200, key=None):
        """Coverage + loss + prediction figures for the held-out split
        (reference `plot_diagnostics`/`plot_coverage`,
        sbi_runner.py:5018-5044, :7209-7345). Returns saved paths."""
        import os as _os

        from .plotting import (
            plot_coverage,
            plot_loss,
            plot_posterior_predictions,
        )

        if self._split is None:
            self.split_dataset()
        idx = self._split["test"][:max_objects]
        samples = self.sample_posterior(
            self.features[idx], n_samples=n_samples, key=key
        )
        truths = self.feature_params[idx]
        paths = {}
        paths["coverage"] = _os.path.join(out_dir, f"{self.name}_coverage.png")
        plot_coverage(samples, truths, self.parameter_names,
                      save=paths["coverage"])
        if self.train_result is not None:
            paths["loss"] = _os.path.join(out_dir, f"{self.name}_loss.png")
            plot_loss(self.train_result.train_losses,
                      self.train_result.val_losses, save=paths["loss"])
        paths["predictions"] = _os.path.join(
            out_dir, f"{self.name}_predictions.png"
        )
        plot_posterior_predictions(samples, truths, self.parameter_names,
                                   save=paths["predictions"])
        return paths
