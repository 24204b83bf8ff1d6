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
