"""Experiment harness + tuning subsystem tests."""

import json
import os

import numpy as np
import pytest

from meta_learning_pacoh_tpu.utils.experiment import (
    AsyncExecutor,
    LoopExecutor,
    collect_exp_results,
    generate_launch_commands,
    hash_dict,
    save_results,
    setup_exp_doc,
)
from meta_learning_pacoh_tpu.utils.tuning import (
    Choice,
    LogUniform,
    RandomSuggest,
    TPESuggest,
    Uniform,
    select_best_configs,
    tune_run,
)


class TestExperimentUtils:
    def test_hash_dict_stable_and_order_invariant(self):
        a = hash_dict({"x": 1, "y": "foo"})
        b = hash_dict({"y": "foo", "x": 1})
        assert a == b and len(a) == 32

    def test_setup_save_collect_roundtrip(self, tmp_path):
        run_dir = setup_exp_doc("exp1", {"lr": 0.001, "seed": 1}, str(tmp_path))
        save_results({"test_ll": -0.5, "rmse": np.float32(0.3)}, run_dir, log=False)
        run_dir2 = setup_exp_doc("exp1", {"lr": 0.01, "seed": 2}, str(tmp_path))
        save_results({"test_ll": -0.7, "rmse": 0.4}, run_dir2, log=False)
        df = collect_exp_results("exp1", str(tmp_path), verbose=False)
        assert len(df) == 2
        assert set(df["test_ll"]) == {-0.5, -0.7}

    def test_generate_launch_commands(self):
        cmds = generate_launch_commands("exp.py", {"lr": [0.1, 0.01], "seed": [1, 2, 3]})
        assert len(cmds) == 6
        assert all("--lr" in c and "--seed" in c for c in cmds)

    def test_loop_executor(self):
        acc = []
        LoopExecutor().run(lambda a, b: acc.append(a + b), [1, 2], [10, 20])
        assert acc == [11, 22]


class TestSearchSpace:
    def test_uniform_unit_roundtrip(self):
        d = Uniform(2.0, 10.0)
        assert abs(d.from_unit(d.to_unit(7.3)) - 7.3) < 1e-9

    def test_loguniform_samples_in_range(self):
        d = LogUniform(1e-4, 1e-1)
        rs = np.random.RandomState(0)
        samples = [d.sample(rs) for _ in range(200)]
        assert min(samples) >= 1e-4 and max(samples) <= 1e-1
        # log-uniform: geometric mean near sqrt(lo*hi)
        assert 5e-4 < np.exp(np.mean(np.log(samples))) < 2e-2


class TestTPE:
    def test_tpe_beats_random_on_quadratic(self):
        """Minimize (x-3)^2 via maximizing its negation."""
        space = {"x": Uniform(-10.0, 10.0)}

        def run(suggester, n=60):
            best = -np.inf
            for _ in range(n):
                c = suggester.suggest()
                val = -((c["x"] - 3.0) ** 2)
                suggester.tell(c, val)
                best = max(best, val)
            return best

        tpe_best = run(TPESuggest(space, metric="v", n_startup=15, seed=0))
        rnd_best = run(RandomSuggest(space, seed=0))
        assert tpe_best >= rnd_best - 1e-6
        assert tpe_best > -0.5  # got close to the optimum

    def test_choice_dimension(self):
        space = {"opt": Choice(["a", "b", "c"])}
        sugg = TPESuggest(space, metric="v", n_startup=5, seed=1)
        for _ in range(30):
            c = sugg.suggest()
            sugg.tell(c, 1.0 if c["opt"] == "b" else 0.0)
        picks = [sugg.suggest()["opt"] for _ in range(50)]
        assert picks.count("b") > 25  # concentrates on the good option


class TestTuneRun:
    def test_runs_and_selects_best(self, tmp_path):
        space = {"x": Uniform(0.0, 1.0)}
        analysis = tune_run(
            lambda cfg: {"score": -abs(cfg["x"] - 0.7)}, space, num_samples=15,
            metric="score", mode="max", local_dir=str(tmp_path), name="t1",
            verbose=False,
        )
        best = select_best_configs(analysis, metric="score", N=3)
        assert len(best) == 3
        assert abs(best[0]["x"] - 0.7) < 0.25

    def test_checkpoint_resume(self, tmp_path):
        space = {"x": Uniform(0.0, 1.0)}
        tune_run(lambda cfg: {"score": cfg["x"]}, space, num_samples=5,
                 metric="score", local_dir=str(tmp_path), name="t2", verbose=False)
        state = json.load(open(os.path.join(tmp_path, "experiment_state-t2.json")))
        assert len([t for t in state["trials"] if t["status"] == "DONE"]) == 5

        analysis = tune_run(lambda cfg: {"score": cfg["x"]}, space, num_samples=8,
                            metric="score", local_dir=str(tmp_path), name="t2",
                            resume=True, verbose=False)
        done = [t for t in analysis.trials if t["status"] == "DONE"]
        assert len(done) == 8

    def test_resume_modes_local_remote_prompt(self, tmp_path, monkeypatch):
        """resume in {LOCAL, REMOTE, PROMPT} (reference
        custom_tune/trial_runner.py:103,288): LOCAL continues the newest
        local state file, REMOTE syncs it from a shared dir first, PROMPT
        asks; interrupted RUNNING trials are marked ERROR on resume."""
        space = {"x": Uniform(0.0, 1.0)}
        local = tmp_path / "local"
        remote = tmp_path / "remote"
        remote.mkdir()
        tune_run(lambda cfg: {"score": cfg["x"]}, space, num_samples=4,
                 metric="score", local_dir=str(local), name="t5",
                 verbose=False)
        state_file = os.path.join(local, "experiment_state-t5.json")
        # simulate a crash mid-trial: leave a RUNNING entry behind
        state = json.load(open(state_file))
        state["trials"].append({"config": {"x": 0.5}, "status": "RUNNING",
                                "last_result": None, "history": []})
        json.dump(state, open(state_file, "w"))

        analysis = tune_run(lambda cfg: {"score": cfg["x"]}, space,
                            num_samples=6, metric="score",
                            local_dir=str(local), name="t5",
                            resume="LOCAL", verbose=False)
        statuses = [t["status"] for t in analysis.trials]
        assert statuses.count("DONE") == 6 and "RUNNING" not in statuses
        interrupted = [t for t in analysis.trials
                       if t.get("error") == "interrupted"]
        assert len(interrupted) == 1

        # REMOTE: fresh local dir, state pulled from the shared path
        import shutil
        shutil.copy2(state_file, remote / "experiment_state-t5.json")
        local2 = tmp_path / "local2"
        analysis2 = tune_run(lambda cfg: {"score": cfg["x"]}, space,
                             num_samples=7, metric="score",
                             local_dir=str(local2), name="t5",
                             resume="REMOTE", remote_dir=str(remote),
                             verbose=False)
        assert len([t for t in analysis2.trials
                    if t["status"] == "DONE"]) == 7
        with pytest.raises(ValueError):
            tune_run(lambda cfg: {"score": 0.0}, space, num_samples=1,
                     metric="score", local_dir=str(local2), name="t5",
                     resume="REMOTE", verbose=False)  # no remote_dir

        # PROMPT: declined -> starts fresh (0 resumed trials -> needs 1 new)
        monkeypatch.setattr("builtins.input", lambda _: "n")
        analysis3 = tune_run(lambda cfg: {"score": cfg["x"]}, space,
                             num_samples=1, metric="score",
                             local_dir=str(local), name="t5",
                             resume="PROMPT", verbose=False)
        assert len(analysis3.trials) == 1
        monkeypatch.setattr("builtins.input", lambda _: "y")
        analysis4 = tune_run(lambda cfg: {"score": cfg["x"]}, space,
                             num_samples=6, metric="score",
                             local_dir=str(local), name="t5",
                             resume="PROMPT", verbose=False)
        assert len([t for t in analysis4.trials
                    if t["status"] == "DONE"]) == 6  # all resumed, 0 new

    def test_failure_handling(self, tmp_path):
        calls = {"n": 0}

        def flaky(cfg):
            calls["n"] += 1
            if calls["n"] <= 2:
                raise RuntimeError("boom")
            return {"score": 1.0}

        analysis = tune_run(flaky, {"x": Uniform(0, 1)}, num_samples=2,
                            metric="score", local_dir=str(tmp_path), name="t3",
                            max_failures=3, verbose=False)
        statuses = [t["status"] for t in analysis.trials]
        assert statuses.count("ERROR") == 2 and statuses.count("DONE") == 2

    def test_generator_trials_record_history(self, tmp_path):
        def trial(cfg):
            for i in range(3):
                yield {"score": float(i)}

        analysis = tune_run(trial, {"x": Uniform(0, 1)}, num_samples=2,
                            metric="score", local_dir=str(tmp_path), name="t4",
                            verbose=False)
        t = analysis.trials[0]
        assert len(t["history"]) == 3 and t["last_result"]["score"] == 2.0


class TestProfiling:
    def test_step_timer(self):
        import time as _t

        from meta_learning_pacoh_tpu.utils.profiling import StepTimer

        timer = StepTimer()
        for _ in range(3):
            with timer.measure(100):
                _t.sleep(0.01)
        assert timer.steps_per_sec > 0
        assert timer.summary()["n_measurements"] == 3


class TestJitCache:
    def test_shared_memoizes_and_lru_evicts(self):
        from meta_learning_pacoh_tpu.utils import jit_cache

        saved = dict(jit_cache._CACHE)
        saved_max = jit_cache.MAX_ENTRIES
        try:
            jit_cache.clear()
            jit_cache.MAX_ENTRIES = 3
            builds = []

            def builder(tag):
                def b():
                    builds.append(tag)
                    return object()
                return b

            a = jit_cache.shared("a", builder("a"))
            assert jit_cache.shared("a", builder("a")) is a  # memoized
            jit_cache.shared("b", builder("b"))
            jit_cache.shared("a", builder("a"))  # refresh "a" in LRU order
            jit_cache.shared("c", builder("c"))
            jit_cache.shared("d", builder("d"))  # evicts "b" (oldest)
            n, keys = jit_cache.cache_info()
            assert n == 3 and set(keys) == {"a", "c", "d"}
            assert builds == ["a", "b", "c", "d"]
            # evicted key rebuilds; the refreshed one did not
            assert jit_cache.shared("a", builder("a")) is a
            jit_cache.shared("b", builder("b"))
            assert builds == ["a", "b", "c", "d", "b"]
        finally:
            jit_cache.MAX_ENTRIES = saved_max
            jit_cache.clear()
            jit_cache._CACHE.update(saved)
