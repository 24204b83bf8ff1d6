"""MCMC cross-check, SED recovery, plotting smoke, C2ST/misspecification."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.diagnostics import (
    c2st,
    fit_marginal_flow,
    misspecification_check,
)
from synference_tpu.mcmc import (
    dirichlet_cumsum_transform,
    gaussian_loglike,
    run_ensemble_mcmc,
)
from synference_tpu.priors import BoxUniform
from synference_tpu.recovery import recover_sed
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

KEY = jax.random.PRNGKey(0)


class TestMCMC:
    def test_samples_gaussian_target(self):
        """Target: N(mu, sigma) inside a wide box — chain must recover it."""
        mu = jnp.asarray([1.0, -0.5])
        sd = jnp.asarray([0.3, 0.6])

        def logp(theta):
            return -0.5 * jnp.sum(((theta - mu) / sd) ** 2, axis=-1)

        prior = BoxUniform([-5.0, -5.0], [5.0, 5.0])
        samples, lps, acc = run_ensemble_mcmc(
            logp, prior, KEY, n_walkers=64, n_steps=800, burn_in=300
        )
        assert 0.1 < acc < 0.9
        np.testing.assert_allclose(samples.mean(0), np.asarray(mu), atol=0.08)
        np.testing.assert_allclose(samples.std(0), np.asarray(sd), atol=0.1)

    def test_init_theta_seeds_walkers(self):
        """NPE-seeded walker init ("NPE proposes, exact likelihood
        refines", posterior_width_crosscheck protocol): a narrow Gaussian
        far from the box center is found ONLY when walkers start near it
        within a short budget — and a wrong-shaped init raises."""
        from synference_tpu.mcmc import run_batched_mcmc

        mu, sd = 4.5, 0.02  # 0.2% of the box width: prior-init can't find it

        def loglike(theta, x):
            return -0.5 * jnp.sum(((theta - mu) / sd) ** 2, axis=-1)

        prior = BoxUniform([-5.0] * 3, [5.0] * 3)
        xs = np.zeros((2, 1), np.float32)
        init = np.full((2, 32, 3), mu, np.float32) + 0.02 * np.asarray(
            jax.random.normal(KEY, (2, 32, 3)))
        samples, acc, diag = run_batched_mcmc(
            loglike, prior, xs, key=KEY, n_walkers=32, n_steps=600,
            burn_in=300, init_theta=init, return_diagnostics=True)
        assert abs(float(samples.mean()) - mu) < 0.05
        assert float(np.asarray(diag["rhat"]).max()) < 1.25
        with pytest.raises(ValueError, match="init_theta"):
            run_batched_mcmc(loglike, prior, xs, key=KEY, n_walkers=32,
                             n_steps=10, burn_in=0,
                             init_theta=np.zeros((2, 8, 3), np.float32))

    def test_respects_prior_bounds(self):
        def logp(theta):
            return jnp.zeros(theta.shape[0])

        prior = BoxUniform([0.0], [1.0])
        samples, _, _ = run_ensemble_mcmc(
            logp, prior, KEY, n_walkers=32, n_steps=300, burn_in=100
        )
        assert (samples >= 0).all() and (samples <= 1).all()
        # flat target -> ~uniform
        assert abs(samples.mean() - 0.5) < 0.06

    def test_gaussian_loglike(self):
        sim = lambda th: th * 2.0
        ll = gaussian_loglike(sim, np.array([2.0]), np.array([0.1]))
        v = np.asarray(ll(jnp.asarray([[1.0], [0.0]])))
        assert v[0] == pytest.approx(0.0)
        assert v[1] == pytest.approx(-200.0)

    def test_dirichlet_transform(self, rng):
        u = jnp.asarray(rng.random((100, 3)), jnp.float32)
        fr = np.asarray(dirichlet_cumsum_transform(u))
        assert fr.shape == (100, 4)
        np.testing.assert_allclose(fr.sum(1), 1.0, atol=1e-5)
        assert (fr >= 0).all()


class TestConvergenceDiagnostics:
    """Split-R̂/ESS on batched chains (the reference inherits convergence
    handling from dynesty/emcee, sbi_runner.py:5148-5578)."""

    @staticmethod
    def _target(theta, x):
        # per-object Gaussian likelihood centred at x
        return -0.5 * jnp.sum(((theta - x) / 0.3) ** 2, axis=-1)

    def test_long_chain_converges(self):
        from synference_tpu.mcmc import run_batched_mcmc

        prior = BoxUniform([-5.0, -5.0], [5.0, 5.0])
        xs = jnp.asarray([[1.0, -0.5], [-1.0, 2.0]], jnp.float32)
        kept, acc, diag = run_batched_mcmc(
            self._target, prior, xs, KEY, n_walkers=32, n_steps=2200,
            burn_in=600, thin=2, return_diagnostics=True)
        rhat, ess = np.asarray(diag["rhat"]), np.asarray(diag["ess"])
        assert rhat.shape == (2, 2) and ess.shape == (2, 2)
        assert (rhat < 1.1).all()
        assert (ess > 100).all()

    def test_short_chain_flags_nonconvergence(self):
        """A deliberately short chain on a needle-in-a-box target must
        report high R̂ — the silent-wrong-quantiles failure mode."""
        from synference_tpu.mcmc import run_batched_mcmc

        def needle(theta, x):
            return -0.5 * jnp.sum(((theta - x) / 0.01) ** 2, axis=-1)

        prior = BoxUniform([-5.0, -5.0], [5.0, 5.0])
        xs = jnp.asarray([[1.0, -0.5]], jnp.float32)
        kept, acc, diag = run_batched_mcmc(
            needle, prior, xs, KEY, n_walkers=32, n_steps=20,
            burn_in=4, thin=1, return_diagnostics=True)
        assert float(np.nanmax(np.asarray(diag["rhat"]))) > 1.1

    def test_tiny_chain_returns_nan(self):
        from synference_tpu.mcmc import split_rhat_ess

        rhat, ess = split_rhat_ess(np.zeros((2, 3, 8, 2), np.float32))
        assert np.isnan(np.asarray(rhat)).all()

    def test_posterior_records_diagnostics_and_catalogue_flags(self, rng):
        """NLE/NRE posterior sampling records last_diagnostics; a
        short-chain posterior makes fit_catalogue's unconverged flag
        fire."""
        from synference_tpu.posterior import _MCMCPosterior

        class ToyPosterior(_MCMCPosterior):
            def _loglike(self, theta, x):
                return -0.5 * jnp.sum(((theta - x) / 0.01) ** 2, axis=-1)

        prior = BoxUniform([-5.0], [5.0])
        # deliberately short: burn_in 2, a handful of kept steps
        post = ToyPosterior(prior, n_walkers=16, burn_in=2, thin=1)
        xs = jnp.asarray([[1.0], [-2.0]], jnp.float32)
        s = post.sample_batch(KEY, xs, 64)
        assert s.shape[0] == 2
        assert post.last_diagnostics is not None
        assert post.last_diagnostics["rhat"].shape == (2, 1)
        assert np.nanmax(post.last_diagnostics["rhat"]) > post.rhat_warn

        # fit_catalogue surfaces the flag
        from synference_tpu.catalogue import fit_catalogue

        class ToyFitter:
            parameter_names = ["a"]
            features = None
            posterior = post

            def features_from_observations(self, flux, err, unit,
                                           missing_mask=None):
                return np.asarray(flux, np.float32)

        out = fit_catalogue(ToyFitter(), np.array([[1.0], [-2.0]]),
                            np.array([[0.1], [0.1]]), check_ood=False,
                            n_samples=64)
        assert out["flag_mcmc_unconverged"].all()
        assert (out["mcmc_rhat_max"] > 1.1).all()
        assert "mcmc_ess_min" in out


class TestMCMCThroughSimulator:
    def test_recovers_injected_parameters(self, test_grid, nircam_filters):
        sim = BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift"),
            sfh="constant", zdist="delta",
            emission=EmissionConfig(),
            fixed_params={"tau_v": 0.2, "log10_metallicity": -2.5},
        )
        true = np.array([[9.5, 2.0]], np.float32)
        x_obs = np.asarray(sim.photometry(true))[0]
        sigma = 0.05 * x_obs
        prior = BoxUniform([8.0, 0.5], [11.0, 5.0],
                           ("log10_mass", "redshift"))
        loglike = gaussian_loglike(
            lambda th: sim.photometry(th), x_obs, sigma
        )
        samples, _, acc = run_ensemble_mcmc(
            loglike, prior, KEY, n_walkers=32, n_steps=600, burn_in=250
        )
        med = np.median(samples, axis=0)
        assert abs(med[0] - 9.5) < 0.3
        assert abs(med[1] - 2.0) < 0.5


class TestRecovery:
    def test_recover_sed_bands(self, test_grid, nircam_filters, rng):
        sim = BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau",
                         "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
        )
        samples = np.stack([
            rng.uniform(9.0, 9.5, 64), rng.uniform(1.0, 1.2, 64),
            rng.uniform(2e8, 4e8, 64), rng.uniform(0.4, 0.6, 64),
            rng.uniform(-2.8, -2.4, 64), rng.uniform(0.2, 0.5, 64),
        ], axis=1).astype(np.float32)
        rec = recover_sed(sim, samples)
        assert rec["fnu_quantiles"].shape == (3, test_grid.n_wav)
        assert rec["photometry_quantiles"].shape == (3, 7)
        assert rec["sfh_quantiles"].shape[1] == test_grid.n_ages
        # quantiles ordered
        assert (rec["fnu_quantiles"][0] <= rec["fnu_quantiles"][2] + 1e-6).all()
        # lam axis is OBSERVED frame: rest grid x posterior-mean (1+z)
        # (z draws are ~U[1.0, 1.2] -> mean 1+z ~ 2.1); the flux rows are
        # at lam_obs, so returning the rest grid would misplace the SED
        zp1 = float(np.mean(1.0 + samples[:, 1]))
        np.testing.assert_allclose(rec["lam"], rec["lam_rest"] * zp1,
                                   rtol=1e-6)
        assert rec["lam"][0] > rec["lam_rest"][0] * 1.9


class TestPlotting:
    def test_plot_smoke(self, tmp_path, rng):
        from synference_tpu.plotting import (
            plot_corner,
            plot_coverage,
            plot_loss,
            plot_posterior_predictions,
            plot_sed_recovery,
        )

        samples = rng.standard_normal((40, 100, 3))
        truths = rng.standard_normal((40, 3))
        plot_coverage(samples, truths, ["a", "b", "c"],
                      save=str(tmp_path / "cov.png"))
        plot_loss(rng.random(20), rng.random(20),
                  save=str(tmp_path / "loss.png"))
        plot_corner(samples[0], truths[0], ["a", "b", "c"],
                    save=str(tmp_path / "corner.png"))
        plot_posterior_predictions(samples, truths,
                                   save=str(tmp_path / "pred.png"))
        rec = {
            "lam": np.geomspace(1e3, 1e5, 200),
            "fnu_quantiles": np.abs(rng.random((3, 200))) + 0.1,
            "sfh_quantiles": np.abs(rng.random((3, 30))) + 0.1,
            "ages_yr": np.geomspace(1e6, 1e10, 30),
        }
        plot_sed_recovery(rec, save=str(tmp_path / "sed.png"))
        for f in ("cov.png", "loss.png", "corner.png", "pred.png", "sed.png"):
            assert (tmp_path / f).stat().st_size > 1000


class TestC2ST:
    def test_same_distribution_near_half(self, rng):
        x = rng.standard_normal((800, 4))
        y = rng.standard_normal((800, 4))
        assert abs(c2st(x, y) - 0.5) < 0.07

    def test_different_distribution_high(self, rng):
        x = rng.standard_normal((800, 4))
        y = 2.0 + rng.standard_normal((800, 4))
        assert c2st(x, y) > 0.8


class TestMisspecification:
    @pytest.mark.slow
    def test_flags_shifted_observations(self, rng):
        x_train = rng.standard_normal((3000, 4)).astype(np.float32)
        flow, params = fit_marginal_flow(x_train, max_epochs=15)
        x_ok = rng.standard_normal((20, 4)).astype(np.float32)
        x_bad = 8.0 + rng.standard_normal((20, 4)).astype(np.float32)
        flags_ok, _, _ = misspecification_check(flow, params, x_train, x_ok)
        flags_bad, _, _ = misspecification_check(flow, params, x_train, x_bad)
        assert flags_ok.mean() < 0.3
        assert flags_bad.all()


class TestRestrictedPrior:
    def test_restricts_invalid_region(self, rng):
        from synference_tpu.priors import (
            BoxUniform,
            restricted_prior_from_simulations,
        )

        base = BoxUniform([-1.0, -1.0], [1.0, 1.0], ("a", "b"))
        theta = rng.uniform(-1, 1, (3000, 2)).astype(np.float32)
        # simulations blow up when a > 0.5
        x = np.ones((3000, 3), np.float32)
        x[theta[:, 0] > 0.5] = np.nan
        rp = restricted_prior_from_simulations(base, theta, x)
        s = np.asarray(rp.sample(jax.random.PRNGKey(0), 500))
        assert (s[:, 0] < 0.6).mean() > 0.95
        lp = np.asarray(rp.log_prob(np.array([[0.9, 0.0], [0.0, 0.0]])))
        assert lp[0] == -np.inf and np.isfinite(lp[1])

    def test_degenerate_all_valid(self, rng):
        from synference_tpu.priors import (
            BoxUniform,
            restricted_prior_from_simulations,
        )

        base = BoxUniform([0.0], [1.0])
        theta = rng.random((100, 1)).astype(np.float32)
        x = np.ones((100, 2), np.float32)
        rp = restricted_prior_from_simulations(base, theta, x)
        s = np.asarray(rp.sample(jax.random.PRNGKey(0), 50))
        assert s.shape == (50, 1)


def test_snr_binned_plot(tmp_path, rng):
    from synference_tpu.plotting import plot_snr_binned_deviation

    samples = rng.standard_normal((200, 50, 2))
    truths = rng.standard_normal((200, 2))
    snr = 10.0 ** rng.uniform(0, 2, 200)
    plot_snr_binned_deviation(samples, truths, snr, ["a", "b"],
                              save=str(tmp_path / "snr.png"))
    assert (tmp_path / "snr.png").stat().st_size > 1000


class TestSMC:
    """Tempered SMC: posterior + log-evidence (the reference's nested
    samplers return logZ; SMC is the all-particles-in-lockstep analogue)."""

    def _setup(self, dim=2, a=2.0, sigma=0.2, x0=None):
        import jax.numpy as jnp

        from synference_tpu.priors import BoxUniform

        x0 = np.full(dim, 0.3) if x0 is None else np.asarray(x0)
        prior = BoxUniform([-a] * dim, [a] * dim,
                           tuple(f"t{i}" for i in range(dim)))

        def loglike(theta):
            return -0.5 * jnp.sum(
                ((theta - jnp.asarray(x0, jnp.float32)) / sigma) ** 2, axis=-1
            ) - dim * 0.5 * np.log(2 * np.pi * sigma**2)

        # analytic evidence: Π (1/2a) ∫_{-a}^{a} N(x0; θ, σ) dθ
        from scipy.stats import norm as snorm

        log_z_true = 0.0
        for i in range(dim):
            integral = snorm.cdf((a - x0[i]) / sigma) - snorm.cdf(
                (-a - x0[i]) / sigma
            )
            log_z_true += np.log(integral / (2 * a))
        return prior, loglike, x0, sigma, log_z_true

    def test_evidence_matches_analytic(self):
        from synference_tpu.mcmc import run_smc

        prior, loglike, x0, sigma, log_z_true = self._setup()
        samples, log_z, info = run_smc(
            loglike, prior, key=jax.random.PRNGKey(0),
            n_particles=2048, n_moves=4,
        )
        assert abs(log_z - log_z_true) < 0.15, (log_z, log_z_true)
        assert info["betas"][-1] == pytest.approx(1.0)
        # posterior moments
        assert np.abs(samples.mean(0) - x0).max() < 0.05
        assert np.abs(samples.std(0) - sigma).max() < 0.05

    def test_evidence_ranks_models(self):
        """A model whose predicted x is far from the data must get a much
        lower evidence — the Bayes-factor ordering the reference's
        ModelComparison is meant to produce."""
        from synference_tpu.mcmc import run_smc

        prior, loglike_good, *_ = self._setup(x0=[0.3, 0.3])
        _, loglike_bad, *_ = self._setup(x0=[1.9, -1.9])
        _, z_good, _ = run_smc(loglike_good, prior,
                               key=jax.random.PRNGKey(1), n_particles=1024)
        _, z_bad, _ = run_smc(loglike_bad, prior,
                              key=jax.random.PRNGKey(1), n_particles=1024)
        # the bad model's truth is near the box corner: partially truncated
        # likelihood mass -> lower evidence
        assert z_good > z_bad

    @pytest.mark.slow
    def test_model_comparison_end_to_end(self, test_grid, nircam_filters):
        """SMC model comparison through the real simulator: the SFH family
        that generated the data should win (or at least not lose badly)."""
        from synference_tpu.mcmc import model_comparison
        from synference_tpu.priors import BoxUniform
        from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

        names = ("log10_mass", "redshift", "tau", "tau_v")
        sim_exp = BatchSEDSimulator(
            test_grid, nircam_filters, names, sfh="exponential",
            zdist="delta", emission=EmissionConfig(),
            fixed_params={"log10_metallicity": -2.5},
        )
        sim_const = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "tau_v"), sfh="constant",
            zdist="delta", emission=EmissionConfig(),
            fixed_params={"log10_metallicity": -2.5},
        )
        theta_true = np.array([[9.5, 1.0, 3e8, 0.4]], np.float32)
        x_obs = np.asarray(sim_exp.photometry(theta_true))[0]
        sigma = 0.05 * x_obs
        priors = {
            "exp": BoxUniform([8.0, 0.5, 5e7, 0.0], [11.0, 2.0, 8e8, 1.5],
                              names),
            "const": BoxUniform([8.0, 0.5, 0.0], [11.0, 2.0, 1.5],
                                ("log10_mass", "redshift", "tau_v")),
        }
        out = model_comparison(
            {"exp": sim_exp, "const": sim_const}, x_obs, sigma, priors,
            key=jax.random.PRNGKey(0), n_particles=512, n_moves=2,
        )
        assert set(out["log_bayes_factors"]) <= {"exp", "const", "best_model"}
        assert np.isfinite(out["exp"]["log_z"])
        assert np.isfinite(out["const"]["log_z"])
        # the generating model should not be decisively disfavored
        assert out["exp"]["log_z"] - out["const"]["log_z"] > -5.0


class TestHMC:
    @pytest.mark.slow
    def test_hmc_recovers_truth_through_simulator(self):
        """Gradient-based HMC through the differentiable simulator: the
        posterior over (log10_mass, tau_v) given clean mock photometry
        must concentrate on the generating parameters. Exercises the
        scale-safe VJPs (distance inv·inv split, normalized FB slope) —
        regression for the fp32 backward-pass under/overflows."""
        import synference_tpu as st

        grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                      lam_min=300.0)
        filters = st.FilterSet([
            st.tophat_filter("F115W", 11500.0, 2600.0),
            st.tophat_filter("F200W", 20000.0, 4600.0),
            st.tophat_filter("F356W", 35600.0, 7800.0),
        ])
        sim = st.BatchSEDSimulator(
            grid=grid, filters=filters,
            param_names=("log10_mass", "tau_v"),
            fixed_params={"redshift": 1.0, "peak_age": 3e8, "tau": 0.5,
                          "log10_metallicity": -2.5},
            sfh="lognormal", zdist="delta",
            emission=st.EmissionConfig(igm="inoue14"))
        theta_true = np.array([[9.3, 0.6]], np.float32)
        x_obs = np.asarray(sim.photometry(jnp.asarray(theta_true)))[0]
        sigma = 0.05 * x_obs
        prior = st.BoxUniform(low=[8.0, 0.0], high=[11.0, 2.0],
                              names=("log10_mass", "tau_v"))
        samples, lps, acc = st.fit_observation_hmc(
            sim, x_obs, sigma, prior, key=jax.random.PRNGKey(3),
            n_chains=8, n_warmup=80, n_samples=150, n_leapfrog=8)
        assert samples.shape == (8 * 150, 2)
        assert np.isfinite(samples).all() and np.isfinite(lps).all()
        assert 0.3 < acc <= 1.0, f"acceptance {acc}"
        med = np.median(samples, axis=0)
        std = samples.std(axis=0)
        # posterior concentrates on truth within ~4 posterior widths
        assert abs(med[0] - 9.3) < max(4 * std[0], 0.05), (med, std)
        assert abs(med[1] - 0.6) < max(4 * std[1], 0.08), (med, std)
        # every chain converged (best-of-prior init + u-wall divergence
        # rejection): widths at the Cramér-Rao scale, far inside the
        # prior's 0.87 / 0.58
        assert std[0] < 0.1 and std[1] < 0.3, std


def test_fisher_forecast_matches_posterior_scale():
    """Cramér-Rao marginal bounds from the differentiable-simulator
    Fisher matrix must be finite, positive, and consistent in scale with
    an actual likelihood fit's posterior width (same order of magnitude;
    CR is a lower bound up to MCMC error and non-Gaussianity)."""
    import synference_tpu as st

    grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                  lam_min=300.0)
    filters = st.FilterSet([
        st.tophat_filter("F115W", 11500.0, 2600.0),
        st.tophat_filter("F200W", 20000.0, 4600.0),
        st.tophat_filter("F356W", 35600.0, 7800.0),
    ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "tau_v"),
        fixed_params={"redshift": 1.0, "peak_age": 3e8, "tau": 0.5,
                      "log10_metallicity": -2.5},
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    theta = np.array([[9.3, 0.6], [8.5, 0.1]], np.float32)
    x = np.asarray(sim.photometry(jnp.asarray(theta)))
    sigma = 0.05 * x  # (B, F) 5% errors
    out = st.fisher_forecast(sim, theta, sigma)
    assert out["fisher"].shape == (2, 2, 2)
    cr = out["cramer_rao_sigma"]
    assert np.isfinite(cr).all() and (cr > 0).all()
    assert out["param_names"] == ("log10_mass", "tau_v")
    # scale agreement with the HMC posterior at the first fiducial
    prior = st.BoxUniform(low=[8.0, 0.0], high=[11.0, 2.0])
    samples, _, _ = st.fit_observation_hmc(
        sim, x[0], sigma[0], prior, key=jax.random.PRNGKey(1),
        n_chains=8, n_warmup=80, n_samples=150, n_leapfrog=8)
    post_std = samples.std(axis=0)
    # the likelihood is near-Gaussian at 5% errors: the HMC width should
    # LAND ON the Cramér-Rao bound (measured ratio ~1.0 for mass)
    for i in range(2):
        assert 0.4 * cr[0, i] < post_std[i] < 5.0 * cr[0, i], (
            cr[0], post_std)


def test_catalogue_map_recovers_truths():
    """Batched MAP+Laplace through the differentiable simulator: every
    object's point fit lands on its generating parameters, with Laplace
    error bars at the Fisher (Cramér-Rao) scale."""
    import synference_tpu as st

    grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                  lam_min=300.0)
    filters = st.FilterSet([
        st.tophat_filter("F115W", 11500.0, 2600.0),
        st.tophat_filter("F200W", 20000.0, 4600.0),
        st.tophat_filter("F356W", 35600.0, 7800.0),
    ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "tau_v"),
        fixed_params={"redshift": 1.0, "peak_age": 3e8, "tau": 0.5,
                      "log10_metallicity": -2.5},
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    rng = np.random.default_rng(0)
    truths = np.stack([rng.uniform(8.5, 10.5, 12),
                       rng.uniform(0.1, 1.5, 12)], axis=1).astype(np.float32)
    x = np.asarray(sim.photometry(jnp.asarray(truths)))
    sigma = 0.05 * x
    prior = st.BoxUniform(low=[8.0, 0.0], high=[11.0, 2.0])
    out = st.fit_catalogue_map(sim, x, sigma, prior,
                               key=jax.random.PRNGKey(2))
    tm = out["theta_map"]
    assert tm.shape == (12, 2)
    assert np.isfinite(tm).all()
    # noiseless data -> MAP ~ truth for every object
    assert np.abs(tm[:, 0] - truths[:, 0]).max() < 0.1, tm[:, 0] - truths[:, 0]
    assert np.abs(tm[:, 1] - truths[:, 1]).max() < 0.2
    # Laplace widths near the Fisher forecast at the same points
    fr = st.fisher_forecast(sim, truths, sigma)
    ratio = out["laplace_sigma"] / fr["cramer_rao_sigma"]
    assert np.nanmedian(ratio) < 2.0 and np.nanmedian(ratio) > 0.5
    assert (out["log_like"] > -10.0).all()  # chi2 ~ 0 at the optimum


def test_score_compression_recovers_parameter_shifts():
    """MOPED summaries: t(x(θ_fid)) = θ_fid exactly, and t of a slightly
    perturbed model recovers the perturbation to first order."""
    import synference_tpu as st

    grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                  lam_min=300.0)
    filters = st.FilterSet([
        st.tophat_filter("F115W", 11500.0, 2600.0),
        st.tophat_filter("F200W", 20000.0, 4600.0),
        st.tophat_filter("F277W", 27700.0, 7000.0),
        st.tophat_filter("F356W", 35600.0, 7800.0),
    ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "tau_v"),
        fixed_params={"redshift": 1.0, "peak_age": 3e8, "tau": 0.5,
                      "log10_metallicity": -2.5},
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    theta_fid = np.array([9.3, 0.6], np.float32)
    x_fid = np.asarray(sim.photometry(jnp.asarray(theta_fid[None])))[0]
    sc = st.score_compression(sim, theta_fid, 0.05 * x_fid)
    # exact at the fiducial
    t0 = np.asarray(sc["compress"](x_fid[None]))[0]
    np.testing.assert_allclose(t0, theta_fid, rtol=1e-4, atol=1e-4)
    # first-order recovery of parameter shifts (4 bands -> 2 summaries)
    for delta in ([0.05, 0.0], [0.0, 0.05], [0.03, -0.04]):
        th = theta_fid + np.asarray(delta, np.float32)
        x = np.asarray(sim.photometry(jnp.asarray(th[None])))[0]
        t = np.asarray(sc["compress"](x[None]))[0]
        np.testing.assert_allclose(t, th, atol=0.01)
    assert sc["weights"].shape == (2, 4)


@pytest.mark.slow
def test_catalogue_hmc_all_objects_converge():
    """Whole-catalogue HMC: every object's chains concentrate on its own
    generating parameters at the Cramér-Rao scale, in ONE program."""
    import synference_tpu as st

    grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                  lam_min=300.0)
    filters = st.FilterSet([
        st.tophat_filter("F115W", 11500.0, 2600.0),
        st.tophat_filter("F200W", 20000.0, 4600.0),
        st.tophat_filter("F356W", 35600.0, 7800.0),
    ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "tau_v"),
        fixed_params={"redshift": 1.0, "peak_age": 3e8, "tau": 0.5,
                      "log10_metallicity": -2.5},
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    rng = np.random.default_rng(4)
    truths = np.stack([rng.uniform(8.5, 10.5, 6),
                       rng.uniform(0.1, 1.5, 6)], 1).astype(np.float32)
    x = np.asarray(sim.photometry(jnp.asarray(truths)))
    samples, lps, acc = st.fit_catalogue_hmc(
        sim, x, 0.05 * x, st.BoxUniform(low=[8.0, 0.0], high=[11.0, 2.0]),
        key=jax.random.PRNGKey(1), n_chains=6, n_warmup=80,
        n_samples=120, n_leapfrog=8)
    assert samples.shape == (6, 720, 2)
    assert 0.5 < acc <= 1.0
    med = np.median(samples, axis=1)
    std = samples.std(axis=1)
    assert np.abs(med[:, 0] - truths[:, 0]).max() < 0.05
    assert np.abs(med[:, 1] - truths[:, 1]).max() < 0.15
    assert (std[:, 0] < 0.1).all()  # Cramér-Rao scale, not prior scale


@pytest.mark.slow
def test_posterior_crosscheck_flow_vs_hmc():
    """The reference's cross-check workflow, closed-loop: an NPE flow
    trained on simulator draws must be much closer (C2ST) to the exact
    HMC posterior than prior samples are."""
    import synference_tpu as st
    from synference_tpu.flows import build_flow
    from synference_tpu.posterior import DirectPosterior
    from synference_tpu.train import TrainConfig, train_npe

    grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                  lam_min=300.0)
    filters = st.FilterSet([
        st.tophat_filter("F115W", 11500.0, 2600.0),
        st.tophat_filter("F200W", 20000.0, 4600.0),
        st.tophat_filter("F356W", 35600.0, 7800.0),
    ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "tau_v"),
        fixed_params={"redshift": 1.0, "peak_age": 3e8, "tau": 0.5,
                      "log10_metallicity": -2.5},
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    prior = st.BoxUniform(low=[8.0, 0.0], high=[11.0, 2.0])
    rng = np.random.default_rng(0)
    n_train = 8000
    theta = prior.sample(jax.random.PRNGKey(0), n_train)
    flux = np.asarray(sim.photometry(theta))
    sigma_tr = 0.05 * flux
    x_train = np.log10(np.maximum(
        flux + sigma_tr * rng.standard_normal(flux.shape).astype(np.float32),
        1e-3))
    flow = build_flow("nsf", 2, 3, hidden_features=48, num_transforms=6)
    res = train_npe(flow, np.asarray(theta), x_train, jax.random.PRNGKey(1),
                    TrainConfig(max_epochs=25, stop_after_epochs=6,
                                batch_size=512, learning_rate=1e-3))
    post = DirectPosterior(flow, res.params, prior)

    truths = np.array([[9.4, 0.5], [10.0, 1.1]], np.float32)
    x_obs = np.asarray(sim.photometry(jnp.asarray(truths)))
    sig_obs = 0.05 * x_obs
    obs = x_obs + sig_obs * rng.standard_normal(x_obs.shape).astype(
        np.float32)
    out = st.posterior_crosscheck(
        post, sim, np.log10(np.maximum(obs, 1e-3)), obs, sig_obs, prior,
        key=jax.random.PRNGKey(2), n_samples=256, n_chains=8, n_warmup=80)
    assert out["c2st"].shape == (2,)
    assert 0.3 < out["hmc_acceptance"] <= 1.0
    # prior samples vs HMC: near-perfectly separable
    from synference_tpu.diagnostics import c2st as _c2st
    prior_draws = np.asarray(prior.sample(jax.random.PRNGKey(5), 256))
    c_prior = _c2st(prior_draws, out["hmc_samples"][0][:256])
    assert c_prior > 0.8
    # the trained flow must be far closer to the exact posterior
    assert (out["c2st"] < c_prior - 0.1).all(), (out["c2st"], c_prior)


def test_catalogue_vi_matches_fisher_scale():
    """Full-rank Gaussian VI through the simulator: per-object means on
    the truths, widths at the Fisher scale (loose factor for the ELBO's
    MC noise)."""
    import synference_tpu as st

    grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                  lam_min=300.0)
    filters = st.FilterSet([
        st.tophat_filter("F115W", 11500.0, 2600.0),
        st.tophat_filter("F200W", 20000.0, 4600.0),
        st.tophat_filter("F356W", 35600.0, 7800.0),
    ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "tau_v"),
        fixed_params={"redshift": 1.0, "peak_age": 3e8, "tau": 0.5,
                      "log10_metallicity": -2.5},
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    rng = np.random.default_rng(0)
    truths = np.stack([rng.uniform(8.5, 10.5, 4),
                       rng.uniform(0.1, 1.5, 4)], 1).astype(np.float32)
    x = np.asarray(sim.photometry(jnp.asarray(truths)))
    out = st.fit_catalogue_vi(
        sim, x, 0.05 * x, st.BoxUniform(low=[8.0, 0.0], high=[11.0, 2.0]),
        key=jax.random.PRNGKey(1))
    assert out["samples"].shape == (4, 256, 2)
    assert np.isfinite(out["elbo"]).all()
    assert np.abs(out["mean"][:, 0] - truths[:, 0]).max() < 0.08
    fr = st.fisher_forecast(sim, truths, 0.05 * x)
    ratio = out["sigma"] / fr["cramer_rao_sigma"]
    assert (ratio > 0.6).all() and (ratio < 4.0).all(), ratio


def test_gradient_fitters_respect_upper_limits():
    """Censored-likelihood bands: with the reddest band replaced by an
    upper LIMIT well below the true flux, the fitters must push the mass
    down relative to the detected-only fit, and gradients stay finite
    (log_ndtr keeps the censored term differentiable arbitrarily deep
    into the rejection region)."""
    import synference_tpu as st

    grid = st.make_synthetic_grid(n_ages=12, n_mets=4, n_wav=512,
                                  lam_min=300.0)
    filters = st.FilterSet([
        st.tophat_filter("F115W", 11500.0, 2600.0),
        st.tophat_filter("F200W", 20000.0, 4600.0),
        st.tophat_filter("F356W", 35600.0, 7800.0),
    ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "tau_v"),
        fixed_params={"redshift": 1.0, "peak_age": 3e8, "tau": 0.5,
                      "log10_metallicity": -2.5},
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"))
    prior = st.BoxUniform(low=[8.0, 0.0], high=[11.0, 2.0])
    truth = np.array([[9.5, 0.3]], np.float32)
    flux = np.asarray(sim.photometry(jnp.asarray(truth)))
    sigma = 0.05 * flux
    # the typical survey case: a NON-detection whose limiting flux sits
    # ABOVE the true flux (limit consistent with the truth). Censored:
    # zero tension, recovers the truth. Gaussian (treating the limit as a
    # detection 2x the true flux, 20σ high): dragged away from it.
    x = flux.copy()
    x[0, -1] = 2.0 * flux[0, -1]
    lim = np.zeros_like(x, bool)
    lim[0, -1] = True
    out_cen = st.fit_catalogue_map(sim, x, sigma, prior,
                                   key=jax.random.PRNGKey(0),
                                   upper_limits=lim)
    out_gau = st.fit_catalogue_map(sim, x, sigma, prior,
                                   key=jax.random.PRNGKey(0))
    assert np.isfinite(out_cen["theta_map"]).all()
    # censored MAP recovers the generating parameters
    assert abs(out_cen["theta_map"][0, 0] - 9.5) < 0.05
    # Gaussian is pulled toward the fake bright detection
    err_cen = abs(out_cen["theta_map"][0, 0] - 9.5)
    err_gau = abs(out_gau["theta_map"][0, 0] - 9.5)
    assert err_gau > 3.0 * max(err_cen, 1e-3)
    # HMC with the same censoring recovers the truth too
    samples, _, acc = st.fit_observation_hmc(
        sim, x[0], sigma[0], prior, key=jax.random.PRNGKey(1),
        n_chains=8, n_warmup=80, n_samples=120, n_leapfrog=8,
        upper_limits=lim[0])
    assert np.isfinite(samples).all() and 0.3 < acc <= 1.0
    med = np.median(samples, axis=0)
    assert abs(med[0] - 9.5) < 0.1
