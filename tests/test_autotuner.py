"""Autotuner: tactic cache semantics + persistence."""

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.autotuner import AutoTuner, autotune


def test_tuner_caches_best_tactic(tmp_path):
    tuner = AutoTuner.get()
    tuner.cache.clear()
    calls = []

    def run(tactic):
        calls.append(tactic["v"])
        # tactic 2 does less work => faster
        n = 2000 if tactic["v"] == 1 else 10
        x = jnp.ones((n, n), jnp.float32)
        return jnp.sum(x @ x)

    # outside autotune(): no tuning, no cache
    assert tuner.maybe_tune("op", ("k",), [{"v": 1}, {"v": 2}], run) is None
    with autotune():
        best = tuner.maybe_tune("op", ("k",), [{"v": 1}, {"v": 2}], run)
    assert best == {"v": 2}
    assert tuner.lookup("op", ("k",)) == {"v": 2}
    # second call hits the cache without re-timing
    n_calls = len(calls)
    with autotune():
        assert tuner.maybe_tune("op", ("k",), [{"v": 1}], run) == {"v": 2}
    assert len(calls) == n_calls

    # persistence round-trip
    p = tmp_path / "tactics.json"
    tuner.save(str(p))
    tuner.cache.clear()
    tuner.load(str(p))
    assert tuner.lookup("op", ("k",)) == {"v": 2}
    tuner.cache.clear()


def test_failing_candidates_skipped():
    tuner = AutoTuner.get()
    tuner.cache.clear()

    def run(tactic):
        if tactic["v"] == "bad":
            raise ValueError("invalid tactic")
        return jnp.ones(()) * 1.0

    with autotune():
        best = tuner.maybe_tune("op2", ("x",), [{"v": "bad"}, {"v": "ok"}],
                                run)
    assert best == {"v": "ok"}
    tuner.cache.clear()
