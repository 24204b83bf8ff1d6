"""Flow tests: invertibility, normalization, and learning a known posterior."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from synference_tpu.flows import build_flow
from synference_tpu.flows.nsf import rqs_forward, rqs_inverse

KEY = jax.random.PRNGKey(0)


class TestRQS:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-5, 5, (100, 3)), jnp.float32)
        raw = jnp.asarray(rng.normal(0, 1, (100, 3, 25)), jnp.float32)
        y, ld = rqs_forward(x, raw, 8, 3.5)
        x2, ld_inv = rqs_inverse(y, raw, 8, 3.5)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(ld), -np.asarray(ld_inv), atol=2e-3
        )

    def test_identity_at_zero_params(self):
        x = jnp.linspace(-3, 3, 50)[:, None]
        raw = jnp.zeros((50, 1, 25))
        y, ld = rqs_forward(x, raw, 8, 3.5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-4)

    def test_tails_identity(self):
        x = jnp.asarray([[-10.0], [10.0]])
        raw = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 25)),
                          jnp.float32)
        y, ld = rqs_forward(x, raw, 8, 3.5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))
        np.testing.assert_allclose(np.asarray(ld), 0.0)


@pytest.mark.parametrize("model", ["maf", "nsf", "mdn", "gaussian"])
class TestFlowBasics:
    def _flow_params(self, model):
        flow = build_flow(model, theta_dim=3, context_dim=4,
                          hidden_features=16, **(
                              {"num_transforms": 3} if model in ("maf", "nsf")
                              else {}))
        rng = np.random.default_rng(1)
        theta = rng.normal(0, 2, (64, 3)).astype(np.float32)
        x = rng.normal(1, 3, (64, 4)).astype(np.float32)
        params = flow.init(KEY, theta, x)
        return flow, params, theta, x

    def test_log_prob_shapes_finite(self, model):
        flow, params, theta, x = self._flow_params(model)
        lp = flow.log_prob(params, theta, x)
        assert lp.shape == (64,)
        assert np.isfinite(np.asarray(lp)).all()

    def test_sample_shapes(self, model):
        flow, params, theta, x = self._flow_params(model)
        s = flow.sample(params, KEY, x[0], 100)
        assert s.shape == (100, 3)
        assert np.isfinite(np.asarray(s)).all()

    def test_sample_batch(self, model):
        flow, params, theta, x = self._flow_params(model)
        s = flow.sample_batch(params, KEY, x[:5], 50)
        assert s.shape == (5, 50, 3)

    def test_init_near_standardized_base(self, model):
        """Zero-init output layers -> initial density ~ standardized normal,
        so initial log_prob should be moderate (not astronomically bad)."""
        flow, params, theta, x = self._flow_params(model)
        lp = np.asarray(flow.log_prob(params, theta, x))
        assert lp.mean() > -20.0

    def test_jit_and_grad(self, model):
        flow, params, theta, x = self._flow_params(model)

        @jax.jit
        def loss(p):
            return -flow.log_prob(p, theta, x).mean()

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)


class TestSupportTransform:
    """Logit-box reparametrization: samples in the prior box by
    construction, log_prob stays a normalized density in θ units (the
    leakage fix at the source — reference relies on rejection correction,
    custom_runner.py:278-283)."""

    LO = (0.0, -1.0, 5.0)
    HI = (2.0, 5.0, 5.5)

    def _flow(self, model="nsf", **kw):
        cfg = dict(hidden_features=16, support_low=self.LO,
                   support_high=self.HI)
        if model in ("maf", "nsf"):
            cfg["num_transforms"] = 3
        cfg.update(kw)
        return build_flow(model, theta_dim=3, context_dim=4, **cfg)

    @pytest.mark.parametrize("model", ["nsf", "maf", "mdn"])
    def test_samples_strictly_inside_box(self, model):
        flow = self._flow(model)
        params = flow.init(KEY)  # untrained: u-space is broad
        s = np.asarray(flow.sample(params, KEY,
                                   np.zeros(4, np.float32), 3000))
        lo, hi = np.asarray(self.LO), np.asarray(self.HI)
        assert (s >= lo).all() and (s <= hi).all()
        # and actually uses the box interior, not one face
        assert (s.max(0) - s.min(0) > 0.3 * (hi - lo)).all()

    def test_log_prob_normalizes_over_box(self):
        flow = build_flow("mdn", theta_dim=1, context_dim=2,
                          hidden_features=8, num_components=2,
                          support_low=(0.0,), support_high=(3.0,))
        params = flow.init(jax.random.PRNGKey(1))
        g = np.linspace(1e-4, 3.0 - 1e-4, 3001, dtype=np.float32)
        lp = np.asarray(flow.log_prob(
            params, g[:, None], np.zeros((3001, 2), np.float32)))
        z = np.trapezoid(np.exp(lp), g)
        assert abs(z - 1.0) < 0.03, z

    def test_init_stats_in_transformed_space(self):
        """Training-data z-scoring must happen on logit-space values."""
        rng = np.random.default_rng(0)
        theta = rng.uniform(self.LO, self.HI, (512, 3)).astype(np.float32)
        x = rng.normal(0, 1, (512, 4)).astype(np.float32)
        flow = self._flow("mdn")
        params = flow.init(KEY, theta, x)
        # logit of uniform draws is ~logistic(0, 1): mean ~0, std ~1.8
        assert np.abs(np.asarray(params["theta_mean"])).max() < 0.5
        assert 1.0 < np.asarray(params["theta_std"]).min()
        assert np.asarray(params["theta_std"]).max() < 3.0

    @pytest.mark.slow
    def test_trained_no_leakage_and_recovers(self):
        """Train on data filling a tight box; a raw flow would leak mass
        outside, the support flow cannot (acceptance == 1)."""
        from synference_tpu.posterior import DirectPosterior
        from synference_tpu.priors import BoxUniform
        from synference_tpu.train import TrainConfig, train_ensemble

        rng = np.random.default_rng(3)
        n = 2000
        x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        lo = np.array([0.0, 0.0], np.float32)
        hi = np.array([1.0, 1.0], np.float32)
        # truth concentrated near box faces — the leaky regime
        theta = np.clip(np.stack([
            0.5 + 0.5 * x[:, 0] + 0.05 * rng.standard_normal(n),
            0.05 + 0.03 * np.abs(rng.standard_normal(n)),
        ], 1), 1e-4, 1 - 1e-4).astype(np.float32)
        flow = build_flow("nsf", 2, 2, hidden_features=24, num_transforms=4,
                          support_low=tuple(lo), support_high=tuple(hi))
        res = train_ensemble(flow, theta, x, KEY,
                             TrainConfig(max_epochs=25, batch_size=256,
                                         learning_rate=1e-3))
        params = jax.tree_util.tree_map(lambda a: a[0], res.params)
        post = DirectPosterior(flow, params, BoxUniform(lo, hi))
        s, acc = post.sample_batch_with_acceptance(KEY, x[:16], 256)
        assert float(np.asarray(acc).min()) == 1.0
        s = np.asarray(s)
        assert (s >= lo).all() and (s <= hi).all()
        med = np.median(s, axis=1)
        assert np.abs(med[:, 0] - (0.5 + 0.5 * x[:16, 0])).mean() < 0.1

    def test_spec_roundtrip_preserves_support(self):
        from synference_tpu.flows.base import ConditionalFlow

        flow = self._flow("mdn")
        clone = ConditionalFlow.from_spec(flow.spec())
        params = flow.init(KEY)
        s = np.asarray(clone.sample(params, KEY, np.zeros(4, np.float32),
                                    500))
        lo, hi = np.asarray(self.LO), np.asarray(self.HI)
        assert (s >= lo).all() and (s <= hi).all()
        lp1 = np.asarray(flow.log_prob(params, s[:50], np.zeros((50, 4))))
        lp2 = np.asarray(clone.log_prob(params, s[:50], np.zeros((50, 4))))
        np.testing.assert_allclose(lp1, lp2, rtol=1e-6)

    def test_mismatched_bounds_raise(self):
        with pytest.raises(ValueError, match="together"):
            build_flow("mdn", 2, 2, support_low=(0.0, 0.0))
        with pytest.raises(ValueError, match="<"):
            build_flow("mdn", 2, 2, support_low=(0.0, 1.0),
                       support_high=(1.0, 1.0))


@pytest.mark.parametrize("model", ["maf", "nsf", "mdn"])
def test_learns_conditional_gaussian(model):
    """θ | x ~ N(2x, 0.3²) in 2-D: a few hundred steps should recover the
    conditional mean and std."""
    rng = np.random.default_rng(0)
    n = 4000
    x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    theta = (2.0 * x + 0.3 * rng.standard_normal((n, 2))).astype(np.float32)

    flow = build_flow(model, theta_dim=2, context_dim=2, hidden_features=32,
                      **({"num_transforms": 3} if model != "mdn" else
                         {"num_components": 4}))
    params = flow.init(KEY, theta, x)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, tb, xb):
        def loss(p):
            return -flow.log_prob(p, tb, xb).mean()

        l, g = jax.value_and_grad(loss)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, l

    for i in range(400):
        idx = rng.integers(0, n, 256)
        params, state, l = step(params, state, theta[idx], x[idx])

    x_test = np.array([0.5, -0.5], np.float32)
    s = np.asarray(flow.sample(params, jax.random.PRNGKey(5), x_test, 4000))
    np.testing.assert_allclose(s.mean(0), [1.0, -1.0], atol=0.12)
    np.testing.assert_allclose(s.std(0), 0.3, atol=0.12)


@pytest.mark.parametrize("model", ["made", "realnvp"])
def test_zoo_aliases(model):
    flow = build_flow(model, theta_dim=3, context_dim=4, hidden_features=16)
    rng = np.random.default_rng(2)
    theta = rng.normal(0, 1, (32, 3)).astype(np.float32)
    x = rng.normal(0, 1, (32, 4)).astype(np.float32)
    params = flow.init(KEY, theta, x)
    lp = flow.log_prob(params, theta, x)
    assert np.isfinite(np.asarray(lp)).all()
    s = flow.sample(params, KEY, x[0], 50)
    assert s.shape == (50, 3)


def test_embedding_network():
    """High-dim context through an embedding MLP: still learns."""
    rng = np.random.default_rng(0)
    n, d_x = 3000, 64
    # context: only the mean of the first 32 dims is informative
    x = rng.standard_normal((n, d_x)).astype(np.float32)
    signal = x[:, :32].mean(1, keepdims=True)
    theta = (3.0 * signal + 0.1 * rng.standard_normal((n, 1))).astype(
        np.float32
    )
    flow = build_flow("mdn", 1, d_x, hidden_features=32, num_components=2,
                      embedding_dim=8, embedding_hidden=32)
    params = flow.init(KEY, theta, x)
    assert "embed" in params
    import optax

    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, tb, xb):
        l, g = jax.value_and_grad(lambda p: -flow.log_prob(p, tb, xb).mean())(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for i in range(300):
        idx = rng.integers(0, n, 256)
        params, state, l = step(params, state, theta[idx], x[idx])
    samp = np.asarray(flow.sample(params, jax.random.PRNGKey(3), x[0], 1000))
    true_mean = 3.0 * float(signal[0])
    assert abs(samp.mean() - true_mean) < 0.4
