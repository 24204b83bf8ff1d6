"""Simformer tests: VPSDE math, score net shapes, end-to-end conditional
recovery on a toy joint distribution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.simformer import (
    Simformer,
    SimformerConfig,
    SimformerPosterior,
    VPSDE,
    block_attn_mask,
    train_simformer,
)

KEY = jax.random.PRNGKey(0)


class TestVPSDE:
    def test_boundary_values(self):
        sde = VPSDE()
        assert float(sde.alpha(jnp.asarray(0.0))) == pytest.approx(1.0)
        assert float(sde.sigma(jnp.asarray(1.0))) == pytest.approx(1.0, abs=1e-3)
        assert float(sde.sigma(jnp.asarray(1e-4))) < 0.01

    def test_variance_preserved(self):
        sde = VPSDE()
        for t in [0.1, 0.5, 0.9]:
            a = float(sde.alpha(jnp.asarray(t)))
            s = float(sde.sigma(jnp.asarray(t)))
            assert a**2 + s**2 == pytest.approx(1.0, abs=1e-4)


class TestScoreNet:
    def test_shapes(self):
        cfg = SimformerConfig(n_tokens=10, d_model=32, n_heads=2, n_layers=2)
        model = Simformer(cfg)
        params = model.init(KEY)
        v = jnp.zeros((4, 10))
        t = jnp.full((4,), 0.5)
        cond = jnp.zeros((4, 10))
        s = model.score(params, v, t, cond)
        assert s.shape == (4, 10)
        assert np.isfinite(np.asarray(s)).all()

    def test_attn_mask_blocks(self):
        m = block_attn_mask(3, 4, "causal")
        assert m.shape == (7, 7)
        assert m[0, :3].all() and not m[0, 3:].any()  # theta sees theta only
        assert m[3, :4].all() and not m[3, 4:].any()  # x0 sees theta + itself

    def test_full_mask(self):
        assert block_attn_mask(2, 2, "full").all()


@pytest.mark.slow
def test_simformer_recovers_conditional():
    """Joint: x = θ + 0.1 ε with θ ~ N(0,1): posterior θ|x ~ N(x·(1/1.01),
    ~0.1). Train briefly; check conditional mean tracks x."""
    rng = np.random.default_rng(0)
    n = 3000
    theta = rng.standard_normal((n, 2)).astype(np.float32)
    x = (theta + 0.1 * rng.standard_normal((n, 2))).astype(np.float32)

    cfg = SimformerConfig(n_tokens=4, d_model=48, n_heads=4, n_layers=2,
                          d_ff=96)
    model = Simformer(cfg)
    params, std, hist = train_simformer(
        model, theta, x, KEY, batch_size=256, learning_rate=3e-4,
        max_epochs=40, stop_after_epochs=40,
    )
    assert hist["val"][-1] < hist["val"][0]

    post = SimformerPosterior(model, params, std, n_steps=200)
    x_obs = np.array([1.0, -1.0], np.float32)
    s = np.asarray(post.sample(jax.random.PRNGKey(3), x_obs, 800))
    assert s.shape == (800, 2)
    # conditional mean near x_obs, spread well below prior (1.0)
    assert abs(s[:, 0].mean() - 1.0) < 0.35
    assert abs(s[:, 1].mean() + 1.0) < 0.35
    assert s.std(0).max() < 0.6

    # arbitrary conditioning: observe only x0 -> theta1 stays ~prior
    cond = jnp.asarray([0.0, 0.0, 1.0, 0.0])
    s2 = np.asarray(
        post.sample(jax.random.PRNGKey(4), x_obs, 800, condition_mask=cond)
    )
    assert s2[:, 1].std() > 0.6  # close to prior width
    assert abs(s2[:, 0].mean() - 1.0) < 0.35


@pytest.mark.slow
def test_log_prob_probability_flow():
    """PF-ODE log_prob (reference condition-masked log_prob,
    sbi_runner.py:8783-8856): on a linear-Gaussian task θ ~ N(0,1),
    x = θ + σ ε, the analytic posterior is N(x/(1+σ²), σ²/(1+σ²)).
    Checks (a) the density normalizes to ~1 over a θ grid — exercising the
    divergence/ODE machinery independent of training quality — and (b) it
    tracks the analytic posterior."""
    rng = np.random.default_rng(1)
    n, sig = 4000, 0.3
    theta = rng.standard_normal((n, 1)).astype(np.float32)
    x = (theta + sig * rng.standard_normal((n, 1))).astype(np.float32)
    cfg = SimformerConfig(n_tokens=2, d_model=48, n_heads=4, n_layers=2,
                          d_ff=96)
    model = Simformer(cfg)
    params, std, hist = train_simformer(
        model, theta, x, KEY, batch_size=256, learning_rate=3e-4,
        max_epochs=60, stop_after_epochs=60,
    )
    post = SimformerPosterior(model, params, std, n_steps=200)

    x_obs = 0.8
    mu_an = x_obs / (1.0 + sig**2)
    var_an = sig**2 / (1.0 + sig**2)
    grid = np.linspace(-2.0, 3.0, 81, dtype=np.float32)
    lp = np.asarray(post.log_prob(
        grid[:, None], np.full((81, 1), x_obs, np.float32), n_steps=128))
    assert np.isfinite(lp).all()
    # (a) normalization: the PF-ODE change-of-variables must integrate to 1
    zint = np.trapezoid(np.exp(lp), grid)
    assert abs(zint - 1.0) < 0.25, zint
    # (b) the density peaks near the analytic mean and has finite width
    assert abs(grid[np.argmax(lp)] - mu_an) < 0.3
    lp_an = (-0.5 * (grid - mu_an) ** 2 / var_an
             - 0.5 * np.log(2 * np.pi * var_an))
    # agreement where the analytic posterior carries mass
    sel = lp_an > lp_an.max() - 4.0
    assert np.abs(lp[sel] - lp_an[sel]).mean() < 0.8

    # evaluate_posterior wires it in: finite mean_log_prob for simformer
    from synference_tpu.diagnostics import evaluate_posterior

    xs_val = x[:16]
    rep = evaluate_posterior(post, xs_val, theta[:16],
                             key=jax.random.PRNGKey(5), n_samples=64)
    assert rep["mean_log_prob"] is not None
    assert np.isfinite(rep["mean_log_prob"])


@pytest.mark.slow
def test_noise_model_task():
    """p(log sigma | mag): errors correlate with magnitude; the learned task
    should reproduce the trend."""
    from synference_tpu.simformer import train_noise_model_simformer

    rng = np.random.default_rng(0)
    n = 3000
    mags = rng.uniform(22.0, 30.0, (n, 2)).astype(np.float32)
    # log error grows with magnitude
    log_errs = (0.3 * (mags - 26.0) + 0.1 * rng.standard_normal((n, 2))
                ).astype(np.float32)
    model, post = train_noise_model_simformer(
        mags, log_errs, jax.random.PRNGKey(0),
        batch_size=256, learning_rate=1e-3, max_epochs=40,
        stop_after_epochs=40,
    )
    bright = np.asarray(post.sample(jax.random.PRNGKey(1),
                                    np.array([23.0, 23.0], np.float32), 400))
    faint = np.asarray(post.sample(jax.random.PRNGKey(2),
                                   np.array([29.0, 29.0], np.float32), 400))
    assert bright.mean() < faint.mean() - 0.5


class TestPersistence:
    def _tiny_posterior(self):
        rng = np.random.default_rng(0)
        theta = rng.standard_normal((400, 2)).astype(np.float32)
        x = theta + 0.1 * rng.standard_normal((400, 2)).astype(np.float32)
        cfg = SimformerConfig(n_tokens=4, d_model=32, n_heads=2, n_layers=2)
        model = Simformer(cfg)
        params, std, _ = train_simformer(model, theta, x, KEY,
                                         batch_size=128, max_epochs=3)
        return SimformerPosterior(model, params, std, n_steps=50)

    def test_roundtrip_identical_samples(self, tmp_path):
        """save -> load must reproduce bit-identical samples from a fixed
        key (round-1 gap: trained simformers could not be persisted at
        all; reference save_model_to_pkl, sbi_runner.py:8341-8504)."""
        post = self._tiny_posterior()
        p = str(tmp_path / "simformer.pkl")
        post.save(p)
        loaded = SimformerPosterior.load(p)
        x_obs = jnp.asarray([0.5, -0.2])
        s1 = np.asarray(post.sample(KEY, x_obs, 16))
        s2 = np.asarray(loaded.sample(KEY, x_obs, 16))
        np.testing.assert_array_equal(s1, s2)
        assert loaded.n_steps == post.n_steps
        assert loaded.attn_mask is None

    def test_fitter_roundtrip(self, tmp_path):
        """SBIFitter.save_state/load_saved_model must persist a trained
        simformer (engine dispatch)."""
        from synference_tpu.fitter import SBIFitter

        rng = np.random.default_rng(1)
        theta = rng.standard_normal((400, 2)).astype(np.float32)
        x = theta + 0.1 * rng.standard_normal((400, 2)).astype(np.float32)
        fitter = SBIFitter(photometry=np.abs(x) + 1.0, parameters=theta,
                           parameter_names=("a", "b"),
                           filter_codes=("F1", "F2"))
        fitter.features = x
        fitter.feature_params = theta
        fitter.feature_source = np.arange(len(x))
        fitter.feature_flags = None
        fitter.create_priors()
        fitter.run_single_simformer(d_model=32, n_heads=2, n_layers=2,
                                    batch_size=128, max_epochs=2,
                                    n_diffusion_steps=50)
        path = str(tmp_path / "fitter_simformer.pkl")
        fitter.save_state(path)
        loaded = SBIFitter.load_saved_model(path)
        assert loaded.engine == "simformer"
        s1 = fitter.sample_posterior(x[:3], n_samples=8)
        s2 = loaded.sample_posterior(x[:3], n_samples=8)
        np.testing.assert_array_equal(s1, s2)
