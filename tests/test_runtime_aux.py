"""Auxiliary runtime subsystems: YAML overrides, static-batch policy,
watchdog, tracing, runtime weight update."""

import time

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.llmapi.llm_args import LlmArgs
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=64, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position=128)


def mk_llm(**kw):
    return LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
               max_seq_len=64, max_batch_size=8, kv_num_blocks=64,
               kv_block_size=8, **kw)


# ---------------------------------------------------------------- yaml ------
def test_yaml_extra_options(tmp_path):
    p = tmp_path / "opts.yaml"
    p.write_text("max_batch_size: 3\nscheduler_policy: static_batch\n"
                 "kv_block_size: 4\n")
    args = LlmArgs(model=None, extra_llm_api_options=str(p))
    assert args.max_batch_size == 3
    assert args.scheduler_policy == "static_batch"
    assert args.kv_block_size == 4


def test_yaml_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("no_such_field: 1\n")
    with pytest.raises(ValueError, match="no_such_field"):
        LlmArgs(model=None, extra_llm_api_options=str(p))


# ---------------------------------------------------------------- static ----
def test_static_batch_runs_batch_to_completion():
    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig, KVCacheManager)
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.runtime.scheduler import (
        CapacitySchedulerPolicy, Scheduler, SchedulerConfig)

    kv = KVCacheManager(KVCacheConfig(block_size=8), 1, 1, 8, num_blocks=64)
    sched = Scheduler(SchedulerConfig(
        policy=CapacitySchedulerPolicy.STATIC_BATCH), kv)
    r1 = LlmRequest([1, 2, 3], SamplingParams(max_tokens=4))
    r1.start_context()
    r1.context_position = 3
    r1.finish_context()
    r2 = LlmRequest([4, 5], SamplingParams(max_tokens=4))
    # active batch present => the waiting request is NOT admitted
    batch = sched.schedule([r1], [r2])
    assert batch.decode == [r1] and not batch.prefill
    # batch drained => new request admitted
    batch = sched.schedule([], [r2])
    assert batch.prefill and batch.prefill[0][0] is r2


# ---------------------------------------------------------------- watchdog --
def test_watchdog_fires_and_dumps_stacks():
    from tensorrt_llm_tpu.runtime.watchdog import HangDetector
    dumps = []
    wd = HangDetector(timeout=0.2, on_hang=dumps.append)
    wd.start()
    wd.heartbeat(busy=True)
    time.sleep(0.8)
    wd.stop()
    assert wd.fired
    assert dumps and "thread" in dumps[0]


def test_watchdog_idle_does_not_fire():
    from tensorrt_llm_tpu.runtime.watchdog import HangDetector
    wd = HangDetector(timeout=0.2)
    wd.start()
    wd.heartbeat(busy=False)
    time.sleep(0.6)
    wd.stop()
    assert not wd.fired


def test_executor_heartbeats_keep_watchdog_quiet():
    # timeout must tolerate first-call XLA compiles (seconds on CPU,
    # tens of seconds on TPU) — one loop iteration blocks through a compile
    llm = mk_llm(watchdog_timeout=60.0)
    try:
        llm.generate([[1, 2, 3]], SamplingParams(max_tokens=8,
                                                 ignore_eos=True))
        assert not llm.executor.watchdog.fired
    finally:
        llm.shutdown()


# ---------------------------------------------------------------- tracing ---
def test_tracer_records_request_timings():
    llm = mk_llm()
    try:
        llm.generate([[1, 2, 3]], SamplingParams(max_tokens=5,
                                                 ignore_eos=True))
        for _ in range(100):
            if llm.executor.tracer.records:
                break
            time.sleep(0.05)
        rec = llm.executor.tracer.records[-1]
        assert rec["gen_ai.usage.prompt_tokens"] == 3
        assert rec["gen_ai.usage.completion_tokens"] == 5
        assert rec["gen_ai.latency.e2e"] > 0
        assert rec["gen_ai.latency.time_to_first_token"] > 0
    finally:
        llm.shutdown()


# ---------------------------------------------------------------- weights ---
def test_update_weights_changes_outputs():
    llm = mk_llm(seed=0)
    try:
        sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
        before = llm.generate([[1, 2, 3]], sp)[0].outputs[0].token_ids
        # new random weights via a get_tensor source built from a second model
        other = llm.model.init(jax.random.PRNGKey(99))

        # easiest faithful source: round-trip through an HF-style state dict
        # is overkill here; drive engine.update_params directly through the
        # public path with a callable that raises (checks error handling)...
        llm.engine.update_params(other)
        after = llm.generate([[1, 2, 3]], sp)[0].outputs[0].token_ids
        assert before != after
        # restore determinism check: same weights => same outputs
        llm.engine.update_params(other)
        again = llm.generate([[1, 2, 3]], sp)[0].outputs[0].token_ids
        assert after == again
    finally:
        llm.shutdown()


def test_update_weights_bad_source_raises():
    llm = mk_llm()
    try:
        with pytest.raises(TypeError):
            llm.update_weights(12345)
    finally:
        llm.shutdown()


def test_return_perf_metrics_on_output():
    """LlmArgs.return_perf_metrics attaches per-request timing/KV metrics
    to RequestOutput.metrics (reference RequestPerfMetrics)."""
    import jax
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position=256)
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
              max_batch_size=4, kv_num_blocks=64, kv_block_size=4,
              return_perf_metrics=True)
    try:
        out = llm.generate([[1, 2, 3]], SamplingParams(max_tokens=4,
                                                       ignore_eos=True))[0]
        m = out.metrics
        assert m is not None
        assert m["num_output_tokens"] == 4
        assert m["ttft_s"] > 0 and m["e2e_s"] >= m["ttft_s"]
        assert m["queue_time_s"] >= 0
        assert m["kv_cache_hit_tokens"] == 0
        # off by default
        llm.args.return_perf_metrics = False
        out2 = llm.generate([[9, 8, 7]], SamplingParams(max_tokens=2,
                                                        ignore_eos=True))[0]
        assert out2.metrics is None
    finally:
        llm.shutdown()
