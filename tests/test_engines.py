"""NLE/NRE engine tests (reference trains likelihood and ratio estimators
alongside NPE, sbi_runner.py:4447, :4713-4715, :5019).

Toy problem: x = Aθ + ε with known Gaussian noise, θ ~ U(box). All engines
must produce posteriors that center on the truth and pass a TARP-coverage
bound comparable to the NPE test's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.diagnostics import tarp_deviation
from synference_tpu.fitter import SBIFitter
from synference_tpu.flows import build_flow
from synference_tpu.mcmc import run_batched_mcmc
from synference_tpu.posterior import LikelihoodPosterior, RatioPosterior
from synference_tpu.priors import BoxUniform
from synference_tpu.ratio import build_ratio_estimator, nre_loss
from synference_tpu.train import TrainConfig, train_ensemble

KEY = jax.random.PRNGKey(0)
A = np.array([[1.0, 0.4], [-0.3, 1.0], [0.5, 0.5]], np.float32)
SIGMA = 0.1


def _toy(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    x = theta @ A.T + SIGMA * rng.standard_normal((n, 3)).astype(np.float32)
    return theta, x


def _prior():
    return BoxUniform([-2.0, -2.0], [2.0, 2.0], ("a", "b"))


class TestBatchedMCMC:
    def test_recovers_gaussian(self):
        """Batched MCMC on an analytic Gaussian likelihood: posterior mean
        must match the known conditional for every object at once."""
        theta_true, x_obs = _toy(8, seed=3)

        def loglike(theta, x):
            model = theta @ jnp.asarray(A.T)
            return -0.5 * jnp.sum(((model - x) / SIGMA) ** 2, axis=-1)

        kept, acc = run_batched_mcmc(
            loglike, _prior(), x_obs, key=KEY,
            n_walkers=32, n_steps=500, burn_in=250,
        )
        kept = np.asarray(kept)
        assert kept.shape[0] == 8 and kept.shape[2] == 2
        assert 0.1 < acc < 0.9
        err = kept.mean(axis=1) - theta_true
        assert np.abs(err).max() < 0.2  # σ≈0.07 per dim for this A


class TestNLE:
    def test_nle_posterior_calibrated(self):
        theta, x = _toy()
        flow = build_flow("mdn", theta_dim=3, context_dim=2,
                          hidden_features=32, num_components=4)
        res = train_ensemble(flow, x, theta, KEY,
                             TrainConfig(max_epochs=40, batch_size=512,
                                         learning_rate=1e-3))
        params = jax.tree_util.tree_map(lambda a: a[0], res.params)
        post = LikelihoodPosterior(flow, params, _prior())
        t_test, x_test = _toy(64, seed=1)
        samples = np.asarray(post.sample_batch(KEY, x_test, 256))
        assert samples.shape == (64, 256, 2)
        assert post.last_acceptance > 0.05
        err = np.median(samples, axis=1) - t_test
        assert np.abs(err.mean(0)).max() < 0.1
        assert tarp_deviation(samples, t_test, key=KEY) < 0.15

    def test_nle_log_prob_outside_support(self):
        theta, x = _toy(500)
        flow = build_flow("mdn", theta_dim=3, context_dim=2,
                          hidden_features=16, num_components=2)
        res = train_ensemble(flow, x, theta, KEY,
                             TrainConfig(max_epochs=5, batch_size=256))
        params = jax.tree_util.tree_map(lambda a: a[0], res.params)
        post = LikelihoodPosterior(flow, params, _prior())
        lp = np.asarray(post.log_prob(np.array([[5.0, 0.0]]), x[:1]))
        assert lp[0] == -np.inf


class TestNRE:
    def test_nre_posterior_calibrated(self):
        theta, x = _toy()
        est = build_ratio_estimator(2, 3, hidden_features=96, num_layers=3)
        res = train_ensemble(est, theta, x, KEY,
                             TrainConfig(max_epochs=60, batch_size=512,
                                         learning_rate=1e-3),
                             loss_fn=nre_loss(est))
        params = jax.tree_util.tree_map(lambda a: a[0], res.params)
        post = RatioPosterior(est, params, _prior())
        t_test, x_test = _toy(64, seed=2)
        samples = np.asarray(post.sample_batch(KEY, x_test, 256))
        assert samples.shape == (64, 256, 2)
        err = np.median(samples, axis=1) - t_test
        assert np.abs(err.mean(0)).max() < 0.15
        assert tarp_deviation(samples, t_test, key=KEY) < 0.2

    def test_nre_loss_decreases(self):
        theta, x = _toy(2000)
        est = build_ratio_estimator(2, 3, hidden_features=32)
        res = train_ensemble(est, theta, x, KEY,
                             TrainConfig(max_epochs=15, batch_size=256,
                                         learning_rate=1e-3),
                             loss_fn=nre_loss(est))
        assert res.val_losses[-1, 0] < res.val_losses[0, 0]
        # logistic loss at chance is log 2
        assert res.val_losses[-1, 0] < np.log(2.0)


class TestFitterEngines:
    @pytest.mark.parametrize("engine,model", [("nle", "mdn"), ("nre", "mdn")])
    def test_fitter_engine_roundtrip(self, engine, model, tmp_path):
        theta, x = _toy(3000)
        fitter = SBIFitter(photometry=np.abs(x) + 1.0, parameters=theta,
                           parameter_names=("a", "b"),
                           filter_codes=("F1", "F2", "F3"))
        # bypass photometry feature engineering: fit raw x directly
        fitter.features = x
        fitter.feature_params = theta
        fitter.feature_source = np.arange(len(x))
        fitter.feature_flags = None  # raw features, no replayable pipeline
        fitter.create_priors()
        fitter.run_single_sbi(
            model_type=model, engine=engine, hidden_features=32,
            train_config=TrainConfig(max_epochs=15, batch_size=256,
                                     learning_rate=1e-3),
        )
        assert fitter.engine == engine
        s = fitter.sample_posterior(x[:4], n_samples=64)
        assert s.shape == (4, 64, 2)
        assert np.isfinite(s).all()
        # persistence round-trip preserves engine + posterior type
        p = tmp_path / f"{engine}.pkl"
        fitter.save_state(str(p))
        loaded = SBIFitter.load_saved_model(str(p))
        assert loaded.engine == engine
        s2 = loaded.sample_posterior(x[:4], n_samples=64)
        assert s2.shape == (4, 64, 2)
        np.testing.assert_allclose(
            np.median(s, axis=1), np.median(s2, axis=1), atol=0.35
        )


class TestSequentialEngines:
    """SNLE/SNRE round loops (reference online engines,
    sbi_runner.py:4713-4715): posteriors tighten onto the truth."""

    def _simulate(self, theta):
        return theta @ jnp.asarray(A.T)  # noise-free forward for speed

    def _noisy_simulate(self, theta):
        key = jax.random.PRNGKey(int(np.asarray(theta).sum() * 1e3) % 2**31)
        eps = SIGMA * jax.random.normal(key, (theta.shape[0], 3))
        return theta @ jnp.asarray(A.T) + eps

    @pytest.mark.slow
    def test_snle_converges(self):
        from synference_tpu.online import run_online_snle

        theta_true = np.array([0.7, -0.9], np.float32)
        x_obs = theta_true @ A.T
        flow = build_flow("maf", theta_dim=3, context_dim=2,
                          hidden_features=32, num_transforms=3)
        post, data, hist = run_online_snle(
            self._noisy_simulate, _prior(), flow, x_obs,
            n_rounds=2, sims_per_round=1500,
            train_config=TrainConfig(max_epochs=60, batch_size=256),
            key=jax.random.PRNGKey(2), verbose=False)
        s = np.asarray(post.sample(jax.random.PRNGKey(3), x_obs, 500))
        assert np.abs(s.mean(0) - theta_true).max() < 0.3
        assert len(hist) == 2
        # round 2 proposals concentrate vs the prior draws of round 1
        assert data["theta"][1].std(0).max() < data["theta"][0].std(0).max()

    def test_snre_converges(self):
        from synference_tpu.online import run_online_snre
        from synference_tpu.ratio import build_ratio_estimator

        theta_true = np.array([-0.5, 1.1], np.float32)
        x_obs = theta_true @ A.T
        est = build_ratio_estimator(2, 3, hidden_features=48, num_layers=3)
        post, data, hist = run_online_snre(
            self._noisy_simulate, _prior(), est, x_obs,
            n_rounds=2, sims_per_round=1500,
            train_config=TrainConfig(max_epochs=60, batch_size=256),
            key=jax.random.PRNGKey(4), verbose=False)
        s = np.asarray(post.sample(jax.random.PRNGKey(5), x_obs, 500))
        assert np.abs(s.mean(0) - theta_true).max() < 0.35
        assert data["theta"][1].std(0).max() < data["theta"][0].std(0).max()


def test_online_engine_save_load_roundtrip(tmp_path):
    """run_online_sbi posteriors persist through save_state/load_saved_model
    (online paths have no train_result; params come from the posterior)."""
    from synference_tpu.fitter import SBIFitter

    theta, x = _toy(3000, seed=9)
    fitter = SBIFitter(photometry=np.abs(x) + 1.0, parameters=theta,
                       parameter_names=("a", "b"),
                       filter_codes=("F1", "F2", "F3"))
    theta_true = np.array([0.4, -0.6], np.float32)
    x_obs = theta_true @ A.T

    def simulate(th):
        k = jax.random.PRNGKey(int(abs(float(np.asarray(th).sum()) * 1e3)) % 2**31)
        return th @ jnp.asarray(A.T) + SIGMA * jax.random.normal(
            k, (th.shape[0], 3))

    post, _, _ = fitter.run_online_sbi(
        simulate, x_obs, engine="snle", model_type="maf", n_rounds=1,
        sims_per_round=800,
        train_config=TrainConfig(max_epochs=30, batch_size=256),
        key=jax.random.PRNGKey(0), hidden_features=24, num_transforms=2)
    assert fitter.engine == "nle"
    p = str(tmp_path / "online.pkl")
    fitter.save_state(p)
    loaded = SBIFitter.load_saved_model(p)
    assert loaded.engine == "nle"
    s1 = np.asarray(post.sample(jax.random.PRNGKey(7), x_obs, 200))
    s2 = np.asarray(loaded.posterior.sample(jax.random.PRNGKey(7), x_obs, 200))
    np.testing.assert_allclose(s1, s2, atol=1e-5)
