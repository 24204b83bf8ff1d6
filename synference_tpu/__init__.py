"""synference_tpu — TPU-native simulation-based-inference SED fitting.

A ground-up JAX/XLA/Pallas re-architecture of the capabilities of
synthesizer-project/synference (reference mounted at /root/reference): mock
SED library generation, noise modelling, feature engineering, normalizing-flow
NPE training, posterior sampling, and coverage diagnostics — all as pure
batched tensor programs over TPU device meshes.

Public API mirrors the reference's flat namespace
(`/root/reference/src/synference/__init__.py:49-115`).
"""

from .agn import AGNGridSimulator, AGNSimulator, agn_fraction
from .catalogue import (
    MissingPhotometryHandler,
    fit_catalogue,
    mahalanobis_ood,
    ood_feature_contributions,
    compare_methods_feature_importance,
    ood_vote,
)
from .combine import combine_libraries, combine_libraries_matched
from .composite import CompositeSEDSimulator, grid_combinations
from .cosmology import PLANCK18, Cosmology
from .diagnostics import (
    c2st,
    evaluate_posterior,
    expected_coverage,
    feature_importance,
    fisher_forecast,
    shapley_feature_importance,
    fit_marginal_flow,
    misspecification_check,
    pit_ks_statistic,
    posterior_crosscheck,
    score_compression,
    pit_values,
    point_metrics,
    sbc_ranks,
    tarp_coverage,
    tarp_deviation,
)
from .dust import ATTENUATION_LAWS, attenuation_curve, greybody_emission
from .features import FeatureConfig, FeaturePipeline, FeatureResult
from .filter_arithmetic import FilterArithmeticParser
from .filters import Filter, FilterSet, tophat_filter
from .config import load_config, run_from_config
from .fitter import SBIFitter
from .flows import ConditionalFlow, build_flow
from .grids import (SPSGrid, make_synthetic_agn_grid, make_synthetic_grid,
                    make_synthetic_multiaxis_grid)
from .igm import igm_transmission
from .library import (
    LibraryCreator,
    LibraryGenerator,
    draw_from_hypercube,
    load_library_hdf5,
    save_library_hdf5,
    simulator_from_library,
)
from .hpo import (MedianPruner, SearchSpace, Study, optimize_sbi,
                  sweep_learning_rates)
from .mcmc import (
    dirichlet_cumsum_transform,
    censored_gaussian_loglike_rows,
    fit_catalogue_hmc,
    fit_catalogue_map,
    fit_catalogue_vi,
    fit_observation_hmc,
    fit_observation_mcmc,
    gaussian_loglike,
    model_comparison,
    run_batched_mcmc,
    run_ensemble_mcmc,
    run_smc,
)
from .noise_models import (
    AsinhEmpiricalNoiseModel,
    DepthNoiseModel,
    EmpiricalNoiseModel,
    GeneralEmpiricalNoiseModel,
    NoiseModel,
    SpectralNoiseModel,
    create_noise_models_from_catalogue,
    load_noise_model_hdf5,
    save_noise_model_hdf5,
)
from .online import run_online_snpe
from .posterior import (
    DirectPosterior,
    EnsemblePosterior,
    LikelihoodPosterior,
    RatioPosterior,
)
from .ratio import RatioEstimator, build_ratio_estimator
from .priors import (
    BoxUniform,
    RestrictedPrior,
    priors_from_library,
    restricted_prior_from_simulations,
)
from .recovery import recover_sed
from .simformer import (
    Simformer,
    SimformerConfig,
    SimformerPosterior,
    VPSDE,
    train_simformer,
)
from .spectra import (
    SpectralFeaturePipeline,
    generate_constant_r_grid,
    match_resolution_constant_r,
)
from .sed import BatchSEDSimulator, EmissionConfig
from .sfh import SFH_FAMILIES, ZDIST_FAMILIES, sfh_weights, zdist_weights
from .supplementary import SUPP_FUNCTIONS, compute_supplementary
from .train import TrainConfig, train_ensemble, train_npe
from .units import FluxUnit, convert_flux, convert_flux_err

__version__ = "0.1.0"

__all__ = [
    # cosmology
    "PLANCK18", "Cosmology",
    # dust / igm
    "ATTENUATION_LAWS", "attenuation_curve", "greybody_emission",
    "igm_transmission",
    # filters / grids
    "Filter", "FilterSet", "tophat_filter", "SPSGrid", "make_synthetic_grid",
    "make_synthetic_multiaxis_grid", "make_synthetic_agn_grid",
    # SED simulator
    "BatchSEDSimulator", "EmissionConfig",
    "SFH_FAMILIES", "ZDIST_FAMILIES", "sfh_weights", "zdist_weights",
    "SUPP_FUNCTIONS", "compute_supplementary",
    # library
    "LibraryCreator", "LibraryGenerator", "draw_from_hypercube",
    "load_library_hdf5", "save_library_hdf5", "simulator_from_library",
    # noise
    "NoiseModel", "DepthNoiseModel", "SpectralNoiseModel",
    "EmpiricalNoiseModel", "AsinhEmpiricalNoiseModel",
    "GeneralEmpiricalNoiseModel", "save_noise_model_hdf5",
    "load_noise_model_hdf5",
    # features
    "FeatureConfig", "FeaturePipeline", "FeatureResult",
    "FilterArithmeticParser",
    # inference
    "SBIFitter", "ConditionalFlow", "build_flow",
    "TrainConfig", "train_npe", "train_ensemble",
    "DirectPosterior", "EnsemblePosterior", "LikelihoodPosterior",
    "RatioPosterior", "RatioEstimator", "build_ratio_estimator",
    "BoxUniform", "priors_from_library",
    # diagnostics
    "evaluate_posterior", "pit_values", "sbc_ranks", "tarp_coverage",
    "tarp_deviation", "expected_coverage", "pit_ks_statistic",
    "point_metrics",
    # units
    "FluxUnit", "convert_flux", "convert_flux_err",
    # catalogue fitting
    "fit_catalogue", "MissingPhotometryHandler", "mahalanobis_ood",
    "ood_vote", "ood_feature_contributions", "compare_methods_feature_importance", "shapley_feature_importance",
    # composite
    "CompositeSEDSimulator", "grid_combinations",
    "combine_libraries", "combine_libraries_matched",
    # simformer
    "Simformer", "SimformerConfig", "SimformerPosterior", "VPSDE",
    "train_simformer",
    # hpo
    "Study", "SearchSpace", "MedianPruner", "optimize_sbi",
    "sweep_learning_rates",
    # mcmc / online / recovery
    "run_ensemble_mcmc", "fit_observation_mcmc", "fit_observation_hmc",
    "fit_catalogue_map", "fit_catalogue_hmc", "fit_catalogue_vi",
    "censored_gaussian_loglike_rows",
    "gaussian_loglike",
    "run_batched_mcmc", "run_smc", "model_comparison",
    "dirichlet_cumsum_transform", "run_online_snpe", "recover_sed",
    # spectra
    "SpectralFeaturePipeline", "generate_constant_r_grid",
    "match_resolution_constant_r",
    # misc diagnostics
    "c2st", "fit_marginal_flow", "misspecification_check",
    "create_noise_models_from_catalogue", "feature_importance", "fisher_forecast", "score_compression",
    "posterior_crosscheck",
    # agn
    "AGNSimulator", "AGNGridSimulator", "agn_fraction",
    # restricted priors
    "RestrictedPrior", "restricted_prior_from_simulations",
]
