"""Gradient-based fitting through the differentiable simulator.

The θ → photometry pipeline is pure jnp, so ∂flux/∂θ costs one backward
pass. This demo runs the three gradient-powered tools on a mock object —
none of which exist in the reference (its forward model is Synthesizer's
autodiff-opaque C/OpenMP pipeline):

1. `fisher_forecast` — what can this filter set + depth constrain, before
   generating any training library (Cramér-Rao bounds).
2. `fit_catalogue_map` — batched MAP + Laplace error bars for a whole
   catalogue as one jitted gradient-descent program.
3. `fit_observation_hmc` — exact-likelihood HMC posterior for one object.

Runs on CPU in ~a minute (tiny grid); on TPU the same code fits 10⁴-object
catalogues in seconds.

Run from anywhere: python examples/gradient_fitting.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

if "--cpu" in sys.argv:  # force the host platform (e.g. no TPU attached)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import synference_tpu as st


def main():
    grid = st.make_synthetic_grid(n_ages=16, n_mets=4, n_wav=1024,
                                  lam_min=300.0)
    filters = st.FilterSet([
        st.tophat_filter("F115W", 11500.0, 2600.0),
        st.tophat_filter("F200W", 20000.0, 4600.0),
        st.tophat_filter("F277W", 27700.0, 7000.0),
        st.tophat_filter("F444W", 44400.0, 10200.0),
    ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "tau_v"),
        fixed_params={"redshift": 1.5, "peak_age": 3e8, "tau": 0.5,
                      "log10_metallicity": -2.5},
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    prior = st.BoxUniform(low=[8.0, 0.0], high=[11.0, 2.0],
                          names=("log10_mass", "tau_v"))

    # mock catalogue: 8 objects, 5% photometry
    rng = np.random.default_rng(1)
    truths = np.stack([rng.uniform(8.5, 10.5, 8),
                       rng.uniform(0.1, 1.5, 8)], 1).astype(np.float32)
    flux = np.asarray(sim.photometry(jnp.asarray(truths)))
    sigma = 0.05 * flux
    obs = flux + sigma * rng.standard_normal(flux.shape).astype(np.float32)

    # 1. forecast BEFORE any fitting: what is measurable at this depth?
    fr = st.fisher_forecast(sim, truths, sigma)
    print("Fisher / Cramér-Rao 1σ bounds (median over catalogue):")
    for i, name in enumerate(fr["param_names"]):
        print(f"  {name}: {np.median(fr['cramer_rao_sigma'][:, i]):.4f}")

    # 2. whole-catalogue MAP + Laplace in one program
    out = st.fit_catalogue_map(sim, obs, sigma, prior,
                               key=jax.random.PRNGKey(0))
    err = out["theta_map"] - truths
    print("\nMAP residuals (mass dex):",
          np.round(err[:, 0], 3))
    print("Laplace σ (mass, median):",
          round(float(np.nanmedian(out['laplace_sigma'][:, 0])), 4))

    # 3. full HMC posterior for the first object
    samples, _, acc = st.fit_observation_hmc(
        sim, obs[0], sigma[0], prior, key=jax.random.PRNGKey(1),
        n_chains=8, n_warmup=100, n_samples=200, n_leapfrog=8)
    med = np.median(samples, axis=0)
    std = samples.std(axis=0)
    print(f"\nHMC object 0: truth {truths[0]}, "
          f"posterior {np.round(med, 3)} ± {np.round(std, 3)}, "
          f"acceptance {acc:.2f}")
    print("HMC width vs Cramér-Rao:",
          np.round(std / fr["cramer_rao_sigma"][0], 2))


if __name__ == "__main__":
    main()
