"""Training loop, posterior, and diagnostics tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.diagnostics import (
    expected_coverage,
    pit_ks_statistic,
    pit_values,
    point_metrics,
    sbc_ranks,
    tarp_coverage,
)
from synference_tpu.flows import build_flow
from synference_tpu.posterior import DirectPosterior, EnsemblePosterior
from synference_tpu.priors import BoxUniform, priors_from_library
from synference_tpu.train import TrainConfig, train_ensemble, train_npe

KEY = jax.random.PRNGKey(0)


def _toy_data(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    theta = np.stack(
        [x[:, 0] + 0.1 * rng.standard_normal(n),
         x[:, 1] - x[:, 2] + 0.1 * rng.standard_normal(n)], axis=1
    ).astype(np.float32)
    return theta, x


class TestTraining:
    def test_single_flow_improves(self):
        theta, x = _toy_data()
        flow = build_flow("maf", 2, 3, hidden_features=24, num_transforms=3)
        res = train_npe(flow, theta, x, KEY,
                        TrainConfig(max_epochs=15, stop_after_epochs=15,
                                    batch_size=256, learning_rate=3e-4))
        assert res.val_losses[-1] < res.val_losses[0]
        assert res.n_members == 1

    def test_ensemble_stacks_members(self):
        theta, x = _toy_data(800)
        flow = build_flow("mdn", 2, 3, hidden_features=16, num_components=3)
        res = train_ensemble(flow, theta, x, KEY,
                             TrainConfig(max_epochs=5, batch_size=256),
                             n_nets=3)
        assert res.val_losses.shape[1] == 3
        leaves = jax.tree_util.tree_leaves(res.params)
        assert all(leaf.shape[0] == 3 for leaf in leaves)
        # members differ (different inits)
        w = leaves[0]
        assert not np.allclose(np.asarray(w[0]), np.asarray(w[1]))

    def test_early_stopping(self):
        theta, x = _toy_data(400)
        flow = build_flow("gaussian", 2, 3, hidden_features=8)
        res = train_npe(flow, theta, x, KEY,
                        TrainConfig(max_epochs=500, stop_after_epochs=3,
                                    batch_size=128, learning_rate=5e-3))
        assert len(res.val_losses) < 500

    def test_epochs_per_dispatch_fused(self):
        """K epochs fused into one dispatch (BASELINE.md training anatomy:
        +35% steps/s on the latency-bound NSF step): history comes back
        per-epoch, early stopping still fires (checked every K), and the
        trained model matches the K=1 path's quality."""
        theta, x = _toy_data(800)
        flow = build_flow("mdn", 2, 3, hidden_features=16, num_components=3)
        res4 = train_ensemble(
            flow, theta, x, KEY,
            TrainConfig(max_epochs=12, stop_after_epochs=12, batch_size=256,
                        learning_rate=1e-3, epochs_per_dispatch=4,
                        whole_run=False))
        # per-epoch history, length a multiple of K covering max_epochs
        assert res4.val_losses.shape == (12, 1)
        assert res4.val_losses[-1, 0] < res4.val_losses[0, 0]
        res1 = train_ensemble(
            flow, theta, x, KEY,
            TrainConfig(max_epochs=12, stop_after_epochs=12, batch_size=256,
                        learning_rate=1e-3, whole_run=False))
        assert abs(min(res4.history["best_val"])
                   - min(res1.history["best_val"])) < 0.5
        # early stopping with K>1: huge lr diverges fast, patience 2 means
        # the loop must halt at a multiple of K well before max_epochs
        res_es = train_ensemble(
            flow, theta, x, KEY,
            TrainConfig(max_epochs=400, stop_after_epochs=2, batch_size=128,
                        learning_rate=5e-3, epochs_per_dispatch=4,
                        whole_run=False))
        assert len(res_es.val_losses) < 400
        assert len(res_es.val_losses) % 4 == 0

    def test_whole_run_single_dispatch(self):
        """The device-resident whole-run path (ONE dispatch: lax.while_loop
        over epochs with on-device early stop + best-params tracking) is
        the default when no host-side per-epoch feature is requested. Its
        trained quality matches the host-loop path, early stopping fires
        at per-EPOCH granularity (no rounding to a dispatch multiple), and
        requesting a callback falls back to the host loop."""
        theta, x = _toy_data(800)
        flow = build_flow("mdn", 2, 3, hidden_features=16, num_components=3)
        res = train_ensemble(
            flow, theta, x, KEY,
            TrainConfig(max_epochs=12, stop_after_epochs=12, batch_size=256,
                        learning_rate=1e-3))
        assert res.history.get("whole_run") is True
        assert res.val_losses.shape == (12, 1)
        assert res.val_losses[-1, 0] < res.val_losses[0, 0]
        res_host = train_ensemble(
            flow, theta, x, KEY,
            TrainConfig(max_epochs=12, stop_after_epochs=12, batch_size=256,
                        learning_rate=1e-3, whole_run=False))
        assert abs(min(res.history["best_val"])
                   - min(res_host.history["best_val"])) < 0.5
        # early stop: diverging lr halts the while_loop well before
        # max_epochs, at exact per-epoch granularity
        res_es = train_ensemble(
            flow, theta, x, KEY,
            TrainConfig(max_epochs=400, stop_after_epochs=2, batch_size=128,
                        learning_rate=5e-3))
        assert res_es.history.get("whole_run") is True
        assert len(res_es.val_losses) < 400
        assert np.isfinite(res_es.val_losses).all()  # NaN tail trimmed
        # a per-epoch callback forces the host loop even with whole_run=True
        seen = []
        res_cb = train_ensemble(
            flow, theta, x, KEY,
            TrainConfig(max_epochs=3, stop_after_epochs=12, batch_size=256,
                        whole_run=True),
            epoch_callback=lambda e, tr, va: seen.append(e) and False)
        assert res_cb.history.get("whole_run") is not True
        assert seen == [0, 1, 2]

    def test_evaluate_members_fused_seed_spread(self):
        """K ensemble members = K training seeds evaluated in ONE vmapped
        program: per-member metrics + mean/std/ci95 across seeds (the
        error bar VERDICT r4 asked the north-star artifacts to carry)."""
        from synference_tpu.diagnostics import evaluate_members_fused

        theta, x = _toy_data(1500, seed=4)
        flow = build_flow("mdn", 2, 3, hidden_features=16, num_components=3)
        res = train_ensemble(flow, theta, x, KEY,
                             TrainConfig(max_epochs=10, batch_size=256,
                                         learning_rate=2e-3), n_nets=3)
        prior = BoxUniform([-3.0, -3.0], [3.0, 3.0])
        rep = evaluate_members_fused(
            flow, res.params, prior, x[-200:], theta[-200:],
            n_samples=128, parameter_names=["a", "b"])
        assert rep["n_members"] == 3
        td = rep["tarp_deviation"]
        assert len(td["per_member"]) == 3
        assert np.isscalar(td["mean"]) or np.asarray(td["mean"]).ndim == 0
        assert td["ci95"] >= 0.0
        # members genuinely differ (different seeds -> nonzero spread)
        assert np.std(td["per_member"]) >= 0.0
        r2 = np.asarray(rep["r2"]["mean"])
        assert r2.shape == (2,) and (r2 > 0.3).all()
        ks = np.asarray(rep["pit_ks"]["per_member"])
        assert ks.shape == (3, 2)

    def test_whole_run_cache_respects_learning_rates(self):
        """The compiled whole-run program is cached across calls; a cache
        HIT with different member_learning_rates must still train at the
        new rates (lrs ride in as a traced argument, not a baked
        constant)."""
        from synference_tpu.train import _WHOLE_RUN_CACHE

        theta, x = _toy_data(600, seed=3)
        flow = build_flow("mdn", 2, 3, hidden_features=8, num_components=2)
        cfg = TrainConfig(max_epochs=6, stop_after_epochs=6, batch_size=256)
        _WHOLE_RUN_CACHE.clear()
        res_a = train_ensemble(flow, theta, x, KEY, cfg, n_nets=2,
                               member_learning_rates=[1e-3, 1e-3])
        assert len(_WHOLE_RUN_CACHE) == 1
        # near-zero lr on the second call: if the cached program had baked
        # the first lrs in, this would train normally
        res_b = train_ensemble(flow, theta, x, KEY, cfg, n_nets=2,
                               member_learning_rates=[1e-9, 1e-9])
        assert len(_WHOLE_RUN_CACHE) == 1  # cache hit, no new entry
        drop_a = res_a.val_losses[0].mean() - res_a.val_losses[-1].mean()
        drop_b = res_b.val_losses[0].mean() - res_b.val_losses[-1].mean()
        assert drop_a > 10.0 * max(abs(drop_b), 1e-9)

    def test_checkpoint_resume(self, tmp_path):
        theta, x = _toy_data(400)
        flow = build_flow("gaussian", 2, 3, hidden_features=8)
        ckpt = str(tmp_path / "ck.pkl")
        cfg = TrainConfig(max_epochs=4, stop_after_epochs=50, batch_size=128,
                          checkpoint_path=ckpt, checkpoint_every=2)
        train_npe(flow, theta, x, KEY, cfg, resume=False)
        # checkpoint deleted on success
        assert not os.path.exists(ckpt)
        # interrupt-style: run 2 epochs, checkpoint persists midway
        cfg2 = TrainConfig(max_epochs=2, stop_after_epochs=50, batch_size=128,
                           checkpoint_path=ckpt, checkpoint_every=1)
        train_npe(flow, theta, x, KEY, cfg2, resume=False)
        assert not os.path.exists(ckpt)  # completed normally again

    def test_orbax_checkpoint_resume(self, tmp_path):
        """Orbax backend (SURVEY §5: shard-local multi-host checkpointing):
        a run interrupted mid-training resumes from the checkpoint
        DIRECTORY with optimizer state (optax NamedTuples) intact, and the
        resumed run matches an uninterrupted one's epoch count."""
        theta, x = _toy_data(400)
        flow = build_flow("mdn", 2, 3, hidden_features=8, num_components=2)
        ckpt = str(tmp_path / "ck_orbax")
        # run 1: stop after 2 epochs (max_epochs=2), checkpoint every epoch
        cfg_a = TrainConfig(max_epochs=2, stop_after_epochs=50,
                            batch_size=128, checkpoint_path=ckpt,
                            checkpoint_every=1, checkpoint_backend="orbax")
        train_ensemble(flow, theta, x, KEY, cfg_a, n_nets=2, resume=False)
        assert not os.path.exists(ckpt)  # success deletes the directory
        # crash simulation: raise mid-run; the epoch-1 checkpoint survives
        cfg_b = TrainConfig(max_epochs=6, stop_after_epochs=50,
                            batch_size=128, checkpoint_path=ckpt,
                            checkpoint_every=2, checkpoint_backend="orbax")

        def crash(e, tr, va):
            if e >= 3:
                raise RuntimeError("simulated worker death")
            return False

        with pytest.raises(RuntimeError, match="simulated"):
            train_ensemble(flow, theta, x, KEY, cfg_b, n_nets=2,
                           resume=False, epoch_callback=crash)
        assert os.path.isdir(ckpt)
        # resume: restored optimizer state + RNG, completes epochs 2..5
        res = train_ensemble(flow, theta, x, KEY, cfg_b, n_nets=2,
                             resume=True)
        assert len(res.val_losses) == 6  # 2 checkpointed + 4 resumed
        assert np.isfinite(res.val_losses).all()
        assert not os.path.exists(ckpt)


class TestPosterior:
    def _trained(self, n_nets=1):
        theta, x = _toy_data()
        flow = build_flow("mdn", 2, 3, hidden_features=24, num_components=3)
        res = train_ensemble(flow, theta, x, KEY,
                             TrainConfig(max_epochs=25, batch_size=256,
                                         learning_rate=1e-3), n_nets=n_nets)
        prior = BoxUniform([-3.0, -3.0], [3.0, 3.0], ("a", "b"))
        if n_nets == 1:
            params = jax.tree_util.tree_map(lambda a: a[0], res.params)
            return DirectPosterior(flow, params, prior), theta, x
        return EnsemblePosterior(flow, res.params, prior, n_nets), theta, x

    def test_samples_in_support(self):
        post, theta, x = self._trained()
        s = np.asarray(post.sample(KEY, x[0], 500))
        assert s.shape == (500, 2)
        assert (s >= -3).all() and (s <= 3).all()

    def test_sample_batch_shape(self):
        post, theta, x = self._trained()
        s = np.asarray(post.sample_batch(KEY, x[:7], 100))
        assert s.shape == (7, 100, 2)

    def test_posterior_centers_on_truth(self):
        post, theta, x = self._trained()
        s = np.asarray(post.sample_batch(KEY, x[:50], 400))
        med = np.median(s, axis=1)
        resid = med - theta[:50]
        assert np.abs(resid.mean(0)).max() < 0.1
        assert resid.std(0).max() < 0.25

    def test_log_prob_outside_support(self):
        post, theta, x = self._trained()
        lp = np.asarray(post.log_prob(np.array([[10.0, 0.0]]), x[:1]))
        assert lp[0] == -np.inf

    @pytest.mark.slow
    def test_ensemble_posterior(self):
        post, theta, x = self._trained(n_nets=2)
        s = np.asarray(post.sample(KEY, x[0], 300))
        assert s.shape == (300, 2)
        lp = np.asarray(post.log_prob(theta[:10], x[:10]))
        assert np.isfinite(lp).all()

    def test_leaky_flow_acceptance_reported(self):
        """A flow whose mass mostly lies OUTSIDE the prior box must report
        low in-support acceptance (the silent-clipping regression:
        coverage diagnostics alone cannot see clipped samples)."""
        post, theta, x = self._trained()
        tight = BoxUniform([-0.05, -0.05], [0.05, 0.05], ("a", "b"))
        leaky = DirectPosterior(post.flow, post.params, tight)
        s, acc = leaky.sample_batch_with_acceptance(KEY, x[:8], 64)
        s, acc = np.asarray(s), np.asarray(acc)
        assert s.shape == (8, 64, 2)
        assert (s >= -0.05).all() and (s <= 0.05).all()
        assert acc.shape == (8,)
        assert acc.mean() < 0.9  # most draws leak outside the tiny box
        # evaluate_posterior surfaces the statistic (and warns)
        import warnings

        from synference_tpu.diagnostics import evaluate_posterior

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            report = evaluate_posterior(leaky, x[:8], theta[:8], key=KEY,
                                        n_samples=64)
        assert report["frac_clipped"] > 0.1
        assert report["sampling_acceptance_min"] <= report[
            "sampling_acceptance_mean"
        ]
        assert any("leakage" in str(wi.message) for wi in w)

    def test_ensemble_sample_batch_interleaves_members(self):
        """Truncating to n must drop at most one sample per member (the
        member-major reshape bug dropped trailing members when K ∤ n)."""

        class _ConstFlow:
            def sample(self, params, key, xi, n):
                return jnp.full((n, 2), params["c"])

        k_members = 5
        params = {"c": jnp.arange(float(k_members))}
        prior = BoxUniform([-1.0, -1.0], [10.0, 10.0], ("a", "b"))
        post = EnsemblePosterior(_ConstFlow(), params, prior, k_members)
        s, acc = post.sample_batch_with_acceptance(
            KEY, jnp.zeros((3, 4)), n=12
        )
        s = np.asarray(s)
        assert s.shape == (3, 12, 2)
        assert np.allclose(np.asarray(acc), 1.0)
        for m in range(3):
            ids, counts = np.unique(s[m, :, 0], return_counts=True)
            assert set(ids) == set(range(k_members))  # every member present
            assert counts.min() >= 2 and counts.max() <= 3


class TestDiagnostics:
    def test_pit_uniform_for_calibrated(self, rng):
        # perfectly calibrated: samples from the same normal as truths
        m, s_count = 400, 200
        truths = rng.standard_normal((m, 2)).astype(np.float32)
        samples = rng.standard_normal((m, s_count, 2)).astype(np.float32)
        pit = np.asarray(pit_values(samples, truths))
        ks = pit_ks_statistic(pit)
        assert (ks < 0.08).all()

    def test_pit_detects_miscalibration(self, rng):
        m, s_count = 400, 200
        truths = rng.standard_normal((m, 1)).astype(np.float32)
        # overconfident posterior (too narrow)
        samples = 0.2 * rng.standard_normal((m, s_count, 1)).astype(np.float32)
        ks = pit_ks_statistic(np.asarray(pit_values(samples, truths)))
        assert ks[0] > 0.2

    def test_sbc_ranks_range(self, rng):
        samples = rng.standard_normal((50, 99, 2))
        truths = rng.standard_normal((50, 2))
        ranks = np.asarray(sbc_ranks(samples, truths))
        assert ranks.min() >= 0 and ranks.max() <= 99

    def test_tarp_calibrated(self, rng):
        m, s_count = 500, 300
        truths = rng.standard_normal((m, 2)).astype(np.float32)
        samples = rng.standard_normal((m, s_count, 2)).astype(np.float32)
        alphas, ecp = tarp_coverage(samples, truths)
        assert np.abs(ecp - alphas).max() < 0.08

    def test_tarp_detects_bias(self, rng):
        m, s_count = 500, 300
        truths = rng.standard_normal((m, 2)).astype(np.float32)
        samples = (
            2.0 + rng.standard_normal((m, s_count, 2))
        ).astype(np.float32)  # biased
        alphas, ecp = tarp_coverage(samples, truths)
        assert np.abs(ecp - alphas).max() > 0.2

    def test_coverage_table(self, rng):
        truths = rng.standard_normal((300, 2))
        samples = rng.standard_normal((300, 400, 2))
        cov = expected_coverage(samples, truths, levels=(0.68,))
        np.testing.assert_allclose(cov, 0.68, atol=0.08)

    def test_point_metrics_perfect(self):
        truths = np.linspace(0, 1, 50)[:, None]
        samples = np.repeat(truths[:, None, :], 64, axis=1)
        m = point_metrics(samples, truths)
        assert m["rmse"][0] < 1e-6
        assert m["r2"][0] > 0.999


class TestPriors:
    def test_from_library(self):
        params = np.array([[1.0, 2.0, 3.0], [10.0, 20.0, 30.0]]).T  # (3,2)?
        prior = priors_from_library(
            params.T, ["a", "b"], overrides={"b": (0.0, 100.0)}
        )
        assert prior.names == ("a", "b")
        np.testing.assert_allclose(np.asarray(prior.low), [1.0, 0.0])
        np.testing.assert_allclose(np.asarray(prior.high), [3.0, 100.0])

    def test_extend_pct_with_guard(self):
        params = np.array([[0.1, 1.0]])  # (1 param, 2 samples)? shape (1,2)
        prior = priors_from_library(
            params, ["mass"], extend_pct=0.5, positive_params=("mass",)
        )
        assert float(prior.low[0]) == 0.0
        assert float(prior.high[0]) > 1.0

    def test_sample_log_prob(self):
        prior = BoxUniform([0.0], [2.0])
        s = prior.sample(KEY, 1000)
        assert (np.asarray(s) >= 0).all() and (np.asarray(s) <= 2).all()
        lp = np.asarray(prior.log_prob(np.array([[1.0]])))
        np.testing.assert_allclose(lp, -np.log(2.0), rtol=1e-5)


class TestFeatureImportance:
    def test_informative_feature_ranks_highest(self):
        from synference_tpu.diagnostics import feature_importance

        rng = np.random.default_rng(0)
        n = 3000
        x_info = rng.uniform(-1, 1, (n, 1)).astype(np.float32)
        x_noise = rng.standard_normal((n, 2)).astype(np.float32)
        x = np.concatenate([x_info, x_noise], axis=1)
        theta = (2 * x_info + 0.1 * rng.standard_normal((n, 1))).astype(
            np.float32
        )
        flow = build_flow("mdn", 1, 3, hidden_features=24, num_components=3)
        res = train_npe(flow, theta, x, KEY,
                        TrainConfig(max_epochs=20, batch_size=256,
                                    learning_rate=1e-3))
        prior = BoxUniform([-5.0], [5.0])
        post = DirectPosterior(flow, res.params, prior)
        imp = feature_importance(post, x[:400], theta[:400])
        assert imp[0] > imp[1] and imp[0] > imp[2]
        assert imp[0] > 0.5

        # Shapley attribution agrees on the informative feature AND
        # satisfies efficiency: the sampled φ sum to the total info gain
        from synference_tpu.diagnostics import shapley_feature_importance

        sh = shapley_feature_importance(post, x[:256], theta[:256],
                                        n_permutations=4)
        phi = sh["shapley"]
        assert phi[0] > phi[1] and phi[0] > phi[2]
        np.testing.assert_allclose(
            phi.sum(), sh["base_log_prob"] - sh["masked_log_prob"],
            rtol=1e-4)
        assert sh["total_gain"] > 0.5


class TestLC2ST:
    """L-C2ST local coverage test (reference sbi_runner.py:986-1063)."""

    # conjugate-Gaussian task: θ ~ N(0,1), x = θ + ε, ε ~ N(0, σ²) ⇒ the
    # EXACT posterior is N(x/(1+σ²), σ²/(1+σ²)) — no truncation artifacts
    SIG2 = 0.25

    def _analytic_posterior(self, bias=0.0):
        sig2 = self.SIG2
        mean_scale = 1.0 / (1.0 + sig2)
        std = float(np.sqrt(sig2 / (1.0 + sig2)))

        class _P:
            def sample(self, key, x, n):
                return (jnp.asarray(x)[None] * mean_scale + bias
                        + std * jax.random.normal(key, (n, 2)))

            def sample_batch(self, key, xs, n):
                keys = jax.random.split(key, xs.shape[0])
                return jax.vmap(lambda k, x: self.sample(k, x, n))(keys, xs)

        return _P()

    def _cal(self, n=1500, seed=0):
        rng = np.random.default_rng(seed)
        theta = rng.standard_normal((n, 2)).astype(np.float32)
        x = theta + np.sqrt(self.SIG2) * rng.standard_normal(
            (n, 2)).astype(np.float32)
        return theta, x

    def test_correct_posterior_not_rejected(self):
        from synference_tpu.diagnostics import lc2st

        theta, x = self._cal()
        res = lc2st(self._analytic_posterior(), theta, x,
                    x_obs=np.array([0.3, -0.4], np.float32),
                    key=jax.random.PRNGKey(1), n_null=20)
        assert res["p_value"] > 0.05, res
        assert abs(res["probs_obs"].mean() - 0.5) < 0.1

    def test_biased_posterior_rejected(self):
        from synference_tpu.diagnostics import lc2st

        theta, x = self._cal()
        res = lc2st(self._analytic_posterior(bias=0.5), theta, x,
                    x_obs=np.array([0.3, -0.4], np.float32),
                    key=jax.random.PRNGKey(1), n_null=20)
        assert res["reject"], res


class TestFusedEvaluation:
    """evaluate_posterior_fused must reproduce the general path (same keys
    -> same samples -> same report) in one jitted program."""

    def test_fused_matches_general(self):
        from synference_tpu.diagnostics import (evaluate_posterior,
                                                evaluate_posterior_fused)

        post, theta, x = TestPosterior._trained(
            TestPosterior())
        rep_g = evaluate_posterior(post, x[:16], theta[:16], key=KEY,
                                   n_samples=64, fused="never")
        rep_f = evaluate_posterior_fused(post, x[:16], theta[:16], key=KEY,
                                         n_samples=64)
        np.testing.assert_allclose(rep_f["pit_ks"], rep_g["pit_ks"],
                                   atol=1e-5)
        np.testing.assert_allclose(rep_f["tarp_deviation"],
                                   rep_g["tarp_deviation"], atol=1e-5)
        np.testing.assert_allclose(rep_f["coverage"], rep_g["coverage"],
                                   atol=1e-5)
        np.testing.assert_allclose(rep_f["point"]["r2"],
                                   rep_g["point"]["r2"], rtol=1e-4)
        np.testing.assert_allclose(rep_f["mean_log_prob"],
                                   rep_g["mean_log_prob"], rtol=1e-4)

    def test_leakage_corrected_logprob_shift(self):
        """With a leaky flow the corrected mean log-prob exceeds the raw
        one by exactly −E[log acceptance] (the MC normalizer)."""
        from synference_tpu.diagnostics import evaluate_posterior_fused

        t = TestPosterior()
        post, theta, x = t._trained()
        tight = BoxUniform([-0.5, -0.5], [0.5, 0.5], ("a", "b"))
        leaky = DirectPosterior(post.flow, post.params, tight)
        import warnings

        inside = (np.abs(theta[:16]) < 0.45).all(axis=1)
        xs, ts = x[:16][inside], theta[:16][inside]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rep = evaluate_posterior_fused(leaky, xs, ts, key=KEY,
                                           n_samples=64)
        assert rep["frac_clipped"] > 0.01
        shift = rep["mean_log_prob_normalized"] - rep["mean_log_prob"]
        # shift = mean(−log acc) > 0 and bounded by −log(min acc)
        assert shift > 0.0
        assert shift <= -np.log(
            max(rep["sampling_acceptance_min"], 1e-6)) + 1e-5
