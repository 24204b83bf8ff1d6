"""Extended model-zoo tests: naf, unaf, sospf, gf, cnf, ncsf, nice.

Covers the remaining reference zoo names
(`/root/reference/src/synference/sbi_runner.py:4816-4861`): shape/finiteness,
jit+grad, sampler↔density consistency (validates the bisection/ODE
inversions against numerically integrated moments), and learning tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from synference_tpu.flows import build_flow

KEY = jax.random.PRNGKey(0)

ZOO = ["naf", "unaf", "sospf", "gf", "cnf", "ncsf", "nice"]


def _small_flow(model):
    cfg = {"hidden_features": 16}
    if model in ("naf", "unaf", "sospf", "gf", "ncsf", "nice"):
        cfg["num_transforms"] = 2
    if model == "cnf":
        cfg["num_steps"] = 8
    return build_flow(model, theta_dim=3, context_dim=4, **cfg)


@pytest.mark.parametrize("model", ZOO)
class TestZooBasics:
    def _flow_params(self, model):
        flow = _small_flow(model)
        rng = np.random.default_rng(1)
        theta = rng.normal(0, 2, (64, 3)).astype(np.float32)
        x = rng.normal(1, 3, (64, 4)).astype(np.float32)
        params = flow.init(KEY, theta, x)
        return flow, params, theta, x

    def test_log_prob_finite(self, model):
        flow, params, theta, x = self._flow_params(model)
        lp = flow.log_prob(params, theta, x)
        assert lp.shape == (64,)
        assert np.isfinite(np.asarray(lp)).all()

    def test_sample_finite(self, model):
        flow, params, theta, x = self._flow_params(model)
        s = flow.sample(params, KEY, x[0], 64)
        assert s.shape == (64, 3)
        assert np.isfinite(np.asarray(s)).all()

    def test_init_not_pathological(self, model):
        flow, params, theta, x = self._flow_params(model)
        lp = np.asarray(flow.log_prob(params, theta, x))
        assert lp.mean() > -25.0

    def test_jit_and_grad(self, model):
        flow, params, theta, x = self._flow_params(model)

        @jax.jit
        def loss(p):
            return -flow.log_prob(p, theta, x).mean()

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)


@pytest.mark.parametrize("model", ["naf", "sospf", "gf", "cnf"])
def test_sampler_density_consistency(model):
    """The sampler must invert the density's transform: compare sample
    moments against moments numerically integrated from exp(log_prob) on a
    1-D grid (validates bisection / reverse-ODE inversion end to end)."""
    flow = build_flow(model, theta_dim=1, context_dim=1,
                      hidden_features=8,
                      **({"num_steps": 16} if model == "cnf"
                         else {"num_transforms": 2}))
    rng = np.random.default_rng(3)
    theta = rng.normal(0.5, 1.2, (256, 1)).astype(np.float32)
    xd = rng.normal(0, 1, (256, 1)).astype(np.float32)
    params = flow.init(KEY, theta, xd)
    # perturb away from the identity so the test is non-trivial
    params = jax.tree_util.tree_map(
        lambda a: a + 0.12 * jax.random.normal(
            jax.random.fold_in(KEY, a.size), a.shape), params)
    # keep standardizers sane after perturbation
    for k in ("theta_std", "x_std"):
        params[k] = jnp.abs(params[k]) + 0.5

    x0 = jnp.asarray([0.3], jnp.float32)
    grid = jnp.linspace(-12.0, 12.0, 4001)[:, None]
    lp = np.asarray(flow.log_prob(
        params, grid, jnp.tile(x0[None], (grid.shape[0], 1))))
    w = np.exp(lp - lp.max())
    w /= w.sum()
    mean_num = float((w * np.asarray(grid[:, 0])).sum())
    var_num = float((w * (np.asarray(grid[:, 0]) - mean_num) ** 2).sum())

    s = np.asarray(flow.sample(params, jax.random.PRNGKey(7), x0, 8000))[:, 0]
    assert abs(s.mean() - mean_num) < 0.1 + 0.1 * np.sqrt(var_num)
    assert abs(s.std() - np.sqrt(var_num)) < 0.15 * np.sqrt(var_num) + 0.05


@pytest.mark.parametrize("model", ["naf", "sospf", "gf"])
def test_zoo_learns_conditional_gaussian(model):
    """θ | x ~ N(2x, 0.3²): moderate training recovers mean and spread."""
    rng = np.random.default_rng(0)
    n = 4000
    x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    theta = (2.0 * x + 0.3 * rng.standard_normal((n, 2))).astype(np.float32)

    flow = build_flow(model, theta_dim=2, context_dim=2,
                      hidden_features=32, num_transforms=2)
    params = flow.init(KEY, theta, x)
    opt = optax.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, tb, xb):
        l, g = jax.value_and_grad(
            lambda p: -flow.log_prob(p, tb, xb).mean())(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, l

    for i in range(1000):
        idx = rng.integers(0, n, 256)
        params, state, l = step(params, state, theta[idx], x[idx])

    x_test = np.array([0.5, -0.5], np.float32)
    s = np.asarray(flow.sample(params, jax.random.PRNGKey(5), x_test, 4000))
    np.testing.assert_allclose(s.mean(0), [1.0, -1.0], atol=0.15)
    np.testing.assert_allclose(s.std(0), 0.3, atol=0.15)


def test_ncsf_periodic_density():
    """NCSF is a torus flow: log_prob is periodic in θ with the box period
    (after standardization) and integrates to 1 over one period."""
    flow = build_flow("ncsf", theta_dim=1, context_dim=1,
                      hidden_features=8, num_transforms=2, tail_bound=5.0)
    rng = np.random.default_rng(4)
    theta = rng.normal(0, 1, (128, 1)).astype(np.float32)
    x = rng.normal(0, 1, (128, 1)).astype(np.float32)
    params = flow.init(KEY, theta, x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.2 * jax.random.normal(
            jax.random.fold_in(KEY, a.size), a.shape), params)
    params["theta_mean"] = jnp.zeros(1)
    params["theta_std"] = jnp.ones(1)

    x0 = jnp.asarray([[0.1]], jnp.float32)
    g = jnp.linspace(-5.0, 5.0, 1001)[:-1][:, None]  # one period
    lp = np.asarray(flow.log_prob(params, g, jnp.tile(x0, (g.shape[0], 1))))
    # normalization over one period
    integral = np.exp(lp).mean() * 10.0
    assert abs(integral - 1.0) < 5e-2
    # periodicity
    lp_shift = np.asarray(flow.log_prob(
        params, g + 10.0, jnp.tile(x0, (g.shape[0], 1))))
    np.testing.assert_allclose(lp_shift, lp, atol=1e-3)


def test_nice_is_volume_preserving():
    """NICE's coupling adds but never scales: the total logdet is 0, so
    log q(θ|x) = log N(z) exactly and densities integrate to 1 with no
    scale parameters to learn."""
    flow = build_flow("nice", theta_dim=2, context_dim=2, hidden_features=16)
    rng = np.random.default_rng(5)
    theta = rng.normal(0, 1, (64, 2)).astype(np.float32)
    x = rng.normal(0, 1, (64, 2)).astype(np.float32)
    params = flow.init(KEY, theta, x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jax.random.normal(
            jax.random.fold_in(KEY, a.size), a.shape), params)
    params["theta_std"] = jnp.ones(2)
    params["x_std"] = jnp.abs(params["x_std"]) + 0.5

    # max log-density of a volume-preserving 2-D flow is bounded by the
    # standard-normal mode: log(1/2π)
    lp = np.asarray(flow.log_prob(params, theta, x))
    assert lp.max() <= -np.log(2 * np.pi) + 1e-4


def test_nre_net_variants():
    """linear / mlp / resnet classifier variants all train under nre_loss."""
    from synference_tpu.ratio import build_ratio_estimator, nre_loss

    rng = np.random.default_rng(6)
    theta = rng.normal(0, 1, (512, 2)).astype(np.float32)
    x = (theta + 0.1 * rng.standard_normal((512, 2))).astype(np.float32)
    for net in ("linear", "mlp", "resnet"):
        est = build_ratio_estimator(2, 2, net=net, hidden_features=32)
        params = est.init(KEY, theta, x)
        loss = nre_loss(est)
        l0 = float(loss(params, jnp.asarray(theta), jnp.asarray(x)))
        opt = optax.adam(1e-2)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss)(p, jnp.asarray(theta),
                                            jnp.asarray(x))
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        for _ in range(100):
            params, state, l = step(params, state)
        assert float(l) < l0  # learned something
        assert est.spec()["config"]["net"] == net
