"""SED recovery: push posterior draws back through the forward model.

Reference analogue: `SBI_Fitter.recover_SED`
(`/root/reference/src/synference/sbi_runner.py:5700-6349`) +
`recreate_simulator_from_library` (`:5579-5698`): sample the posterior for an
object, simulate each draw, and summarize the recovered f_ν / photometry /
SFH with quantile bands. Here the posterior-sample batch goes through the
jitted batch simulator in one program (the reference loops draws through the
Python Synthesizer stack).
"""

from __future__ import annotations

import numpy as np

__all__ = ["recover_sed"]


def recover_sed(
    simulator,
    samples: np.ndarray,
    quantiles=(0.16, 0.5, 0.84),
    want_sfh: bool = True,
    max_draws: int = 256,
):
    """Forward-model posterior draws into SED/photometry/SFH bands.

    Args:
        simulator: BatchSEDSimulator whose param_names match the sample
            columns (use `library.simulator_from_library` to rebuild it from
            a library file — reference `recreate_simulator_from_library`).
        samples: (S, P) posterior draws for one object.
        quantiles: summary quantiles for the bands.
        max_draws: cap on forwarded draws (cost control).
    Returns:
        dict with:
            lam: (L,) OBSERVED-frame wavelengths [Å] — rest grid × the
                posterior-mean (1+z), matching the reference's
                nanmean-over-draws wav axis (sbi_runner.py:5850+). Each
                draw's f_ν row lives at λ_rest·(1+z_draw); quantiles are
                taken at fixed rest index, so the axis is exact only in
                the z-width → 0 limit (same caveat as the reference).
            lam_rest: (L,) the rest grid
            fnu_quantiles: (Q, L) observed-frame f_ν [nJy]
            photometry_quantiles: (Q, F) band fluxes [nJy]
            sfh_quantiles: (Q, A) per-age-bin masses [Msun] (if want_sfh)
            ages_yr: (A,)
    """
    samples = np.asarray(samples, np.float32)
    if samples.ndim != 2:
        raise ValueError("samples must be (S, P)")
    draws = samples[:max_draws]
    out = simulator.simulate(draws, want_spectra=True)
    fnu = np.asarray(out["fnu_njy"])
    phot = np.asarray(out["photometry_njy"])
    lam_rest = np.asarray(simulator.grid.lam)
    zp1 = 1.0
    if "redshift" in simulator.param_names:
        zc = draws[:, list(simulator.param_names).index("redshift")]
        zp1 = float(np.mean(1.0 + np.maximum(zc, 0.0)))
    result = {
        "lam": lam_rest * zp1,
        "lam_rest": lam_rest,
        "fnu_quantiles": np.quantile(fnu, quantiles, axis=0),
        "photometry_quantiles": np.quantile(phot, quantiles, axis=0),
        "quantiles": list(quantiles),
        "filter_codes": list(simulator.filters.codes),
    }
    if want_sfh:
        sfh = np.asarray(out["sfh_mass"])
        result["sfh_quantiles"] = np.quantile(sfh, quantiles, axis=0)
        result["ages_yr"] = np.asarray(simulator.grid.ages_yr)
    return result
