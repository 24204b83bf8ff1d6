"""JAX normalizing-flow density estimators for neural posterior estimation.

Replaces the reference's PyTorch flows loaded through LtU-ILI
(`ili.utils.load_nde_sbi/lampe`, reference
`/root/reference/src/synference/sbi_runner.py:5095-5146`; model zoo
`:4816-4861`): here each estimator is a pure-functional (init, log_prob,
sample) triple over parameter pytrees, so ensembles vmap across members and
training steps fuse into single XLA programs on TPU.

Model zoo (reference names): "maf" (masked autoregressive flow), "nsf"
(rational-quadratic coupling flow), "ncsf" (circular splines), "mdn"
(mixture density network), "gaussian" (diagnostic baseline), "made"
(single-block MAF), "realnvp"/"nice" (affine/additive coupling), "naf"
(deep sigmoidal flow), "unaf" (unconstrained monotone NN), "sospf"
(sum-of-squares polynomial flow), "gf" (Gaussianization flow), "cnf"
(continuous/FFJORD flow) — the full reference zoo.
"""

from .base import ConditionalFlow, build_flow
from .cnf import make_cnf
from .made import MADE_init, MADE_apply
from .maf import make_maf
from .mdn import make_mdn
from .monotone import make_gf, make_naf, make_sospf, make_unaf
from .nsf import make_ncsf, make_nsf

__all__ = [
    "ConditionalFlow",
    "build_flow",
    "make_maf",
    "make_nsf",
    "make_ncsf",
    "make_mdn",
    "make_naf",
    "make_unaf",
    "make_sospf",
    "make_gf",
    "make_cnf",
    "MADE_init",
    "MADE_apply",
]
