"""JAX normalizing-flow density estimators for neural posterior estimation.

Replaces the reference's PyTorch flows loaded through LtU-ILI
(`ili.utils.load_nde_sbi/lampe`, reference
`/root/reference/src/synference/sbi_runner.py:5095-5146`; model zoo
`:4816-4861`): here each estimator is a pure-functional (init, log_prob,
sample) triple over parameter pytrees, so ensembles vmap across members and
training steps fuse into single XLA programs on TPU.

Model zoo (reference names): "maf" (masked autoregressive flow), "nsf"
(rational-quadratic coupling flow), "mdn" (mixture density network),
"gaussian" (diagnostic baseline).
"""

from .base import ConditionalFlow, build_flow
from .made import MADE_init, MADE_apply
from .maf import make_maf
from .mdn import make_mdn
from .nsf import make_nsf

__all__ = [
    "ConditionalFlow",
    "build_flow",
    "make_maf",
    "make_nsf",
    "make_mdn",
    "MADE_init",
    "MADE_apply",
]
