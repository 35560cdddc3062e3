"""Runtime kernel autotuner with a profiling cache.

Counterpart of the reference's `AutoTuner` (`_torch/autotuner.py`:
`TunableRunner.get_valid_tactics/forward` :185-244, the `autotune()` warmup
context :257, `DynamicTensorSpec` bucketing :47): inside an `autotune()`
region (engine warmup), tunable ops time their candidate tactics on the real
device and cache the winner per shape bucket; outside the region they run
the cached tactic (or the heuristic default when untuned).

Tactic timing uses dependency-chained repeats inside one jit with a median
over repetitions — single dispatches are swamped by host/tunnel latency.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

from tensorrt_llm_tpu.utils import logger


class AutoTuner:
    _instance: Optional["AutoTuner"] = None
    _lock = threading.Lock()

    def __init__(self):
        self.cache: Dict[Tuple, dict] = {}
        self.tuning = False
        self.chain_len = 30
        self.reps = 3

    @classmethod
    def get(cls) -> "AutoTuner":
        with cls._lock:
            if cls._instance is None:
                cls._instance = AutoTuner()
            return cls._instance

    # ---- persistence (reference: profiling cache) -----------------------------
    def save(self, path: str):
        with open(path, "w") as f:
            json.dump([{"key": list(k), "tactic": v}
                       for k, v in self.cache.items()], f)

    def load(self, path: str):
        with open(path) as f:
            for row in json.load(f):
                self.cache[tuple(row["key"])] = row["tactic"]

    # ---- tuning ------------------------------------------------------------------
    def lookup(self, op: str, key: Tuple) -> Optional[dict]:
        return self.cache.get((op, *key))

    @staticmethod
    def _measure_rtt() -> float:
        """Dispatch+fetch round-trip of a no-op jit (the TPU on this class of
        machine sits behind a high-latency tunnel; see bench.py)."""
        import jax
        import jax.numpy as jnp

        t = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda x: x + 1)
        float(jnp.sum(f(t)))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(f(t)))
            samples.append(time.perf_counter() - t0)
        return min(samples)

    def maybe_tune(self, op: str, key: Tuple,
                   candidates: Iterable[dict],
                   run: Callable[[dict], Any]) -> Optional[dict]:
        """Return the cached tactic; when inside autotune(), time every
        candidate via `run(tactic) -> jax scalar/array` and cache the winner.
        Candidates that fail to compile are skipped.

        Timing is tunnel-robust: `run` closures read ``self.chain_len`` at
        trace time, so after warming the first candidate we calibrate the
        chain so on-device work is >= ~10x the dispatch RTT (otherwise tactic
        ranking at decode shapes is pure RTT jitter — a 30-iteration chain is
        ~0.6 ms of device work under a ~30 ms tunnel RTT), re-trace, and score
        each tactic by min-of-reps (RTT noise is strictly one-sided)."""
        hit = self.cache.get((op, *key))
        if hit is not None or not self.tuning:
            return hit
        import jax

        rtt = self._measure_rtt()
        calibrated = False
        best, best_t = None, float("inf")
        for tactic in candidates:
            try:
                fn = jax.jit(lambda: run(tactic))
                jax.block_until_ready(fn())  # compile + warm
                if not calibrated:
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn())
                    wall = time.perf_counter() - t0
                    t_iter = max((wall - rtt) / self.chain_len, 1e-8)
                    want = max(10.0 * rtt, 0.05)
                    target = int(min(max(self.chain_len, want / t_iter),
                                     50_000))
                    if target > self.chain_len * 2:
                        self.chain_len = target
                        fn = jax.jit(lambda: run(tactic))  # re-trace
                        jax.block_until_ready(fn())
                    calibrated = True
                ts = []
                for _ in range(self.reps):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn())
                    ts.append(time.perf_counter() - t0)
                t = min(ts)
            except Exception as e:  # noqa: BLE001 — invalid tactic
                # WARNING, not debug: a tactic that lowers in interpret
                # mode but fails Mosaic on the chip must be visible (r4:
                # the stream variant silently dropped out of every
                # on-chip autotune)
                logger.warning("autotune %s %s tactic %s failed: %s",
                               op, key, tactic, str(e)[:500])
                continue
            logger.info("autotune %s %s tactic %s: %.2fus/iter", op, key,
                        tactic, max(t - rtt, 0.0) * 1e6 / self.chain_len)
            if t < best_t:
                best, best_t = tactic, t
        if best is not None:
            self.cache[(op, *key)] = best
            logger.info("autotune %s %s -> %s (%.1fus)", op, key, best,
                        max(best_t - rtt, 0.0) * 1e6 / self.chain_len)
        return best


@contextlib.contextmanager
def autotune(enable: bool = True):
    """Enable tactic tuning for the enclosed region (engine warmup)."""
    t = AutoTuner.get()
    prev = t.tuning
    t.tuning = enable
    try:
        yield t
    finally:
        t.tuning = prev
