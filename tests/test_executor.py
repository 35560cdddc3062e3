"""Continuous-batching executor tests (scheduler, reuse, streaming, stops)."""

import time

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.runtime.executor import PyExecutor
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheConfig, KVCacheManager
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import FinishReason, LlmRequest
from tensorrt_llm_tpu.runtime.scheduler import SchedulerConfig

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256)


@pytest.fixture(scope="module")
def executor():
    cfg = ModelConfig(**TINY)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.init(jax.random.PRNGKey(0))
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=128)
    engine = ModelEngine(model, params, kv, max_seq_len=128,
                         decode_buckets=(4, 8), prefill_buckets=(16, 32))
    ex = PyExecutor(engine, SchedulerConfig(max_batch_size=8,
                                            max_num_tokens=64),
                    eos_token_id=0, max_seq_len=128)
    ex.start()
    yield ex
    ex.shutdown()


def collect(req, timeout=60):
    toks = []
    t0 = time.time()
    while time.time() - t0 < timeout:
        piece = req.out_queue.get(timeout=timeout)
        assert piece.error is None, piece.error
        toks.extend(piece.new_token_ids)
        if piece.finished:
            return toks, piece.finish_reason
    raise TimeoutError


def test_single_request_completes(executor):
    req = LlmRequest([5, 6, 7, 8], SamplingParams(max_tokens=8, temperature=0.0,
                                                  ignore_eos=True))
    executor.submit(req)
    toks, reason = collect(req)
    assert len(toks) == 8
    assert reason == FinishReason.LENGTH


def test_greedy_is_deterministic(executor):
    outs = []
    for _ in range(2):
        req = LlmRequest([9, 10, 11], SamplingParams(max_tokens=6,
                                                     temperature=0.0,
                                                     ignore_eos=True))
        executor.submit(req)
        toks, _ = collect(req)
        outs.append(toks)
    assert outs[0] == outs[1]


def test_many_concurrent_requests(executor):
    rng = np.random.RandomState(0)
    reqs = []
    for i in range(12):
        prompt = list(rng.randint(1, 255, rng.randint(3, 20)))
        req = LlmRequest(prompt, SamplingParams(max_tokens=5, ignore_eos=True))
        reqs.append(req)
        executor.submit(req)
    for req in reqs:
        toks, reason = collect(req)
        assert len(toks) == 5


def test_prefix_reuse_kicks_in(executor):
    base = list(np.random.RandomState(7).randint(1, 255, 32))
    r1 = LlmRequest(base + [1], SamplingParams(max_tokens=3, ignore_eos=True))
    executor.submit(r1)
    collect(r1)
    before = executor.kv.stats()["reused_blocks"]
    r2 = LlmRequest(base + [2], SamplingParams(max_tokens=3, ignore_eos=True))
    executor.submit(r2)
    collect(r2)
    assert executor.kv.stats()["reused_blocks"] > before


def test_greedy_same_with_and_without_reuse():
    """Prefix-reused generation must equal from-scratch generation."""
    cfg = ModelConfig(**TINY)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.init(jax.random.PRNGKey(1))

    def fresh_executor(reuse=True):
        kv = KVCacheManager(KVCacheConfig(block_size=8, enable_block_reuse=reuse),
                            cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                            num_blocks=128)
        engine = ModelEngine(model, params, kv, max_seq_len=128,
                             decode_buckets=(4,), prefill_buckets=(16, 32))
        ex = PyExecutor(engine, SchedulerConfig(), eos_token_id=0,
                        max_seq_len=128)
        ex.start()
        return ex

    prompt = list(np.random.RandomState(3).randint(1, 255, 20))
    sp = lambda: SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    ex = fresh_executor(reuse=True)
    try:
        r1 = LlmRequest(list(prompt), sp())
        ex.submit(r1); t1, _ = collect(r1)
        r2 = LlmRequest(list(prompt), sp())   # full prefix hit
        ex.submit(r2); t2, _ = collect(r2)
    finally:
        ex.shutdown()
    assert t1 == t2


def test_multi_step_matches_single_step():
    """Fused k-step decode must produce identical greedy outputs."""
    cfg = ModelConfig(**TINY)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.init(jax.random.PRNGKey(5))

    def run(max_steps):
        kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                            cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
        engine = ModelEngine(model, params, kv, max_seq_len=128,
                             decode_buckets=(4,), prefill_buckets=(16,))
        ex = PyExecutor(engine, SchedulerConfig(), eos_token_id=0,
                        max_seq_len=128, max_decode_steps=max_steps)
        ex.start()
        try:
            req = LlmRequest([3, 5, 7], SamplingParams(
                max_tokens=11, temperature=0.0, ignore_eos=True))
            ex.submit(req)
            toks, _ = collect(req)
        finally:
            ex.shutdown()
        return toks

    assert run(1) == run(4)


def test_multi_step_unroll_matches_scan(monkeypatch):
    """TLLM_MULTI_STEP_UNROLL=1 (the lax.scan escape hatch for the r4
    on-chip hang) must be bit-identical to the scan path."""
    cfg = ModelConfig(**TINY)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.init(jax.random.PRNGKey(5))

    def run():
        kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                            cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
        engine = ModelEngine(model, params, kv, max_seq_len=128,
                             decode_buckets=(4,), prefill_buckets=(16,))
        ex = PyExecutor(engine, SchedulerConfig(), eos_token_id=0,
                        max_seq_len=128, max_decode_steps=4)
        ex.start()
        try:
            req = LlmRequest([3, 5, 7], SamplingParams(
                max_tokens=11, temperature=0.0, ignore_eos=True))
            ex.submit(req)
            toks, _ = collect(req)
        finally:
            ex.shutdown()
        return toks

    scan = run()
    monkeypatch.setenv("TLLM_MULTI_STEP_UNROLL", "1")
    assert run() == scan
    # chain mode (TPU default): k single-step dispatches with on-device
    # sampling, device tokens fed forward — must match the scan too
    monkeypatch.delenv("TLLM_MULTI_STEP_UNROLL")
    monkeypatch.setenv("TLLM_MULTI_STEP_MODE", "chain")
    assert run() == scan


def test_stop_token(executor):
    req = LlmRequest([1, 2, 3], SamplingParams(max_tokens=20, temperature=0.0,
                                               stop_token_ids=None))
    # force eos quickly via greedy? cannot control tokens; instead use
    # stop_token_ids covering the whole vocab range modulo: pick the token the
    # model actually produces first.
    probe = LlmRequest([1, 2, 3], SamplingParams(max_tokens=1, temperature=0.0,
                                                 ignore_eos=True))
    executor.submit(probe)
    first, _ = collect(probe)
    req = LlmRequest([1, 2, 3], SamplingParams(max_tokens=20, temperature=0.0,
                                               stop_token_ids=[first[0]]))
    executor.submit(req)
    toks, reason = collect(req)
    assert toks[-1] == first[0]
    assert reason == FinishReason.EOS
    assert len(toks) == 1


def test_scheduling_priority_orders_waiting_queue():
    """Higher-priority requests admit first when capacity frees up
    (reference executor.h Request::priority)."""
    import numpy as np
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=1, num_heads=2, num_kv_heads=2, head_dim=32,
                      max_position=128)
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
              max_batch_size=1, kv_num_blocks=32, kv_block_size=8, seed=0)
    try:
        sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)
        rng = np.random.RandomState(0)
        # saturate the single slot, then queue low before high
        first = llm.generate_async(list(rng.randint(1, 127, 4)), sp)
        low = llm.generate_async(list(rng.randint(1, 127, 4)), sp,
                                 priority=0.1)
        high = llm.generate_async(list(rng.randint(1, 127, 4)), sp,
                                  priority=0.9)
        order = []
        import threading
        done = []
        for name, fut in (("low", low), ("high", high)):
            def wait(n=name, f=fut):
                f.result()
                order.append(n)
            t = threading.Thread(target=wait)
            t.start()
            done.append(t)
        first.result()
        for t in done:
            t.join(timeout=60)
        assert order and order[0] == "high", order
    finally:
        llm.shutdown()


def test_batch_waiting_holds_then_releases():
    """batch_wait_timeout_iters / batch_wait_max_tokens_ratio (reference
    py_executor.py:2090-2110): new prefills are held while decode work
    exists and the batch is sparse, released after the timeout — and
    every request still completes with identical outputs."""
    from tensorrt_llm_tpu.runtime.scheduler import Scheduler
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams

    cfg = ModelConfig(**TINY)
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=128)
    sched = Scheduler(SchedulerConfig(
        max_batch_size=8, max_num_tokens=64,
        batch_wait_timeout_iters=2,
        batch_wait_max_tokens_ratio=0.9), kv)

    gen = LlmRequest([1, 2, 3], SamplingParams(max_tokens=8))
    kv.add_sequence(gen.request_id, gen.prompt_token_ids, None)
    gen.start_context()
    gen.context_position = gen.prompt_len
    gen.finish_context()
    new = LlmRequest([4, 5], SamplingParams(max_tokens=4))

    # iter 1 + 2: decode-only (prefill held, counter 1, 2)
    for _ in range(2):
        b = sched.schedule([gen], [new])
        assert [r.request_id for r in b.decode] == [gen.request_id]
        assert b.prefill == []
    # iter 3: timeout reached -> prefill released
    b = sched.schedule([gen], [new])
    assert [r.request_id for r, _ in b.prefill] == [new.request_id]
    # counter reset: holding resumes for the next newcomer
    new2 = LlmRequest([6, 7], SamplingParams(max_tokens=4))
    b = sched.schedule([gen], [new2])
    assert b.prefill == []

    # a dense-enough batch schedules immediately (ratio satisfied)
    sched2 = Scheduler(SchedulerConfig(
        max_batch_size=8, max_num_tokens=64,
        batch_wait_timeout_iters=5,
        batch_wait_max_tokens_ratio=0.05), kv)   # 0.05*64 = 3.2 tokens
    big = LlmRequest(list(range(2, 34)), SamplingParams(max_tokens=4))
    b = sched2.schedule([gen], [big])
    assert [r.request_id for r, _ in b.prefill] == [big.request_id]

    # e2e: outputs identical with and without batch waiting
    import tensorrt_llm_tpu as tllm
    outs = {}
    for wait_iters in (0, 3):
        llm = tllm.LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
                       max_seq_len=128, max_batch_size=8, kv_num_blocks=128,
                       kv_block_size=8, seed=0,
                       batch_wait_timeout_iters=wait_iters,
                       batch_wait_max_tokens_ratio=0.9)
        try:
            sp = tllm.SamplingParams(max_tokens=6, temperature=0.0,
                                     ignore_eos=True)
            futs = [llm.generate_async(p, sp)
                    for p in ([1, 2, 3], [9, 8, 7], [5, 5, 5])]
            outs[wait_iters] = [f.result().outputs[0].token_ids
                                for f in futs]
        finally:
            llm.shutdown()
    assert outs[0] == outs[3], outs
