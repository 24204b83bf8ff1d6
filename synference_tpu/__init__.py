"""synference_tpu — TPU-native simulation-based-inference SED fitting.

A ground-up JAX/XLA/Pallas re-architecture of the capabilities of
synthesizer-project/synference (reference mounted at /root/reference): mock
SED library generation, noise modelling, feature engineering, normalizing-flow
NPE training, posterior sampling, and coverage diagnostics — all as pure
batched tensor programs over TPU device meshes.

Public API mirrors the reference's flat namespace
(`/root/reference/src/synference/__init__.py:49-115`).
"""

from .cosmology import PLANCK18, Cosmology
from .dust import ATTENUATION_LAWS, attenuation_curve, greybody_emission
from .filters import Filter, FilterSet, tophat_filter
from .grids import SPSGrid, make_synthetic_grid
from .igm import igm_transmission
from .sed import BatchSEDSimulator, EmissionConfig
from .sfh import SFH_FAMILIES, ZDIST_FAMILIES, sfh_weights, zdist_weights
from .units import FluxUnit, convert_flux, convert_flux_err

__version__ = "0.1.0"

__all__ = [
    "PLANCK18",
    "Cosmology",
    "ATTENUATION_LAWS",
    "attenuation_curve",
    "greybody_emission",
    "Filter",
    "FilterSet",
    "tophat_filter",
    "SPSGrid",
    "make_synthetic_grid",
    "igm_transmission",
    "BatchSEDSimulator",
    "EmissionConfig",
    "SFH_FAMILIES",
    "ZDIST_FAMILIES",
    "sfh_weights",
    "zdist_weights",
    "FluxUnit",
    "convert_flux",
    "convert_flux_err",
]
