"""Pin the recorded NPE-vs-exact-likelihood posterior-width crosscheck.

`posterior_width_crosscheck.json` (generated on the TPU by
`scripts/posterior_width_crosscheck.py`) is the measurement behind the
BASELINE.md claim that the paper-63 NPE's wide peak_age/tau posteriors
reflect the physics: HMC through the differentiable simulator samples the
EXACT likelihood (the reference's nested-sampling cross-check role,
`/root/reference/src/synference/sbi_runner.py:5148-5578`), with an
independently-moving stretch-move ensemble as a second sampler on the
same posterior.

These tests validate the committed artifact so a regenerated one that no
longer supports the claims fails CI. What is asserted:

1. sampler health — acceptances in range, chains genuinely mixing
   (per-chain sigma a finite fraction of pooled sigma; the failure mode
   this caught during development was chains frozen at ~1e-3 of pooled
   by a collapsed step size, which silently echoes the init
   distribution).
2. the two exact samplers agree with each other (they share nothing but
   the posterior).
3. the NPE is never meaningfully NARROWER than the exact posterior
   (under-coverage is the dangerous direction for science), and for the
   weakly-identified parameters it is within ~2x (honestly wide, not
   arbitrarily wide).
4. the exact-likelihood widths for peak_age/tau are a large fraction of
   the PRIOR width — the low R^2 is the physics, not a model deficiency.

NPE-wider-than-exact by 1.3-3x on the best-constrained parameters of
BRIGHT objects is recorded, not asserted: it measures the amortization/
capacity gap (and real multimodality the mode-following samplers cannot
weigh), not a calibration failure — TARP/PIT over the full prior stay in
band."""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..",
                   "posterior_width_crosscheck.json")

WIDE_PARAMS = ("log10_peak_age", "tau", "log10_metallicity")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ART):
        pytest.skip("posterior_width_crosscheck.json not generated")
    with open(ART) as f:
        return json.load(f)


def test_samplers_healthy(artifact):
    assert 0.4 < artifact["hmc_acceptance"] < 0.98
    assert artifact["mcmc_acceptance"] > 0.1
    # chains must genuinely mix, not echo their initialization
    assert artifact["hmc_perchain_sigma_frac_min"] > 0.05
    assert artifact["hmc_perchain_sigma_frac_median"] > 0.4
    assert artifact["hmc_rhat_median"] < 2.0


def test_two_exact_samplers_agree(artifact):
    """HMC and the gradient-free stretch-move sampler measure the same
    posterior; their only shared ingredient is the likelihood."""
    hm = artifact["hmc_vs_mcmc_median_per_param"]
    for p, v in hm.items():
        assert 0.7 < v < 1.4, (p, v)


def test_npe_not_overconfident(artifact):
    """The dangerous direction: the NPE must not be meaningfully narrower
    than the exact posterior anywhere."""
    r = artifact["ratio_median_per_param"]
    for p, v in r.items():
        assert v > 0.6, (p, v)


def test_wide_posteriors_honestly_wide(artifact):
    """For the weakly-identified parameters the NPE width is within ~2x
    of the exact-likelihood width."""
    r = artifact["ratio_median_per_param"]
    for p in WIDE_PARAMS:
        assert 0.6 < r[p] < 2.0, (p, r[p])


def test_wide_params_are_physically_wide(artifact):
    """And the exact widths are a large fraction of the PRIOR width —
    i.e. the data genuinely cannot constrain them (R^2 ~ 0.2-0.35 is the
    physics)."""
    names = artifact["config"]["parameter_names"]
    prior_sig = dict(zip(names, artifact["prior_sigma_draw_space"]))
    s_hmc = np.asarray(artifact["sigma_hmc"])
    for p in ("log10_peak_age", "tau"):
        i = names.index(p)
        frac = np.median(s_hmc[:, i]) / prior_sig[p]
        assert frac > 0.35, (p, frac)
