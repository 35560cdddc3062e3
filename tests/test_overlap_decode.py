"""Overlap decode pipeline: device-fed chunks, trailing host bookkeeping.

The executor dispatches fused decode chunk N+1 with chunk N's sampled
tokens still resident on the device (reference _executor_loop_overlap +
_process_previous_batch, py_executor.py:1660,1936).  TLLM_OVERLAP_LAG=1
forces the pipeline to run at full depth even on CPU so the deferred
apply / drain / cleanup paths are actually exercised.
"""

import os

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=199, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=512)


def make_llm(**kw):
    return LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
               max_seq_len=256, max_batch_size=8, kv_num_blocks=256,
               kv_block_size=8, seed=0, **kw)


def run_prompts(llm, prompts, **sp_kw):
    sp = SamplingParams(max_tokens=24, temperature=0.0, ignore_eos=True,
                        **sp_kw)
    return [r.outputs[0].token_ids for r in llm.generate(prompts, sp)]


def wait_idle(llm, timeout=5.0):
    """The pipeline's trailing overshoot chunks drain an iteration after
    the last emission; poll instead of asserting instantly."""
    import time as _t
    t0 = _t.time()
    ex = llm.executor
    while _t.time() - t0 < timeout:
        if (not ex._inflight and not ex._virtual
                and llm.get_kv_cache_stats()["active_sequences"] == 0):
            return
        _t.sleep(0.02)
    raise AssertionError(
        f"executor not idle: virtual={ex._virtual} "
        f"inflight={len(ex._inflight)} "
        f"stats={llm.get_kv_cache_stats()}")


@pytest.fixture
def lagged(monkeypatch):
    monkeypatch.setenv("TLLM_OVERLAP_LAG", "1")
    monkeypatch.setenv("TLLM_OVERLAP_DEPTH", "3")


def test_overlap_matches_sync(lagged):
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 198, n)) for n in (7, 12, 3, 21, 9)]
    llm = make_llm()
    assert llm.executor._overlap_enabled and llm.executor._force_lag
    got = run_prompts(llm, prompts)
    wait_idle(llm)
    llm.shutdown()

    os.environ["TLLM_OVERLAP_DECODE"] = "0"
    try:
        llm = make_llm()
        assert not llm.executor._overlap_enabled
        ref = run_prompts(llm, prompts)
        llm.shutdown()
    finally:
        del os.environ["TLLM_OVERLAP_DECODE"]
    assert got == ref


def test_overlap_with_eos_budget_stops(lagged):
    """Requests stopping at different lengths mid-pipeline: correct token
    counts, blocks freed, no phantom writes."""
    rng = np.random.RandomState(1)
    prompts = [list(rng.randint(1, 198, 5)) for _ in range(4)]
    llm = make_llm()
    sps = [SamplingParams(max_tokens=m, temperature=0.0, ignore_eos=True)
           for m in (3, 9, 17, 24)]
    outs = [llm.generate_async(p, sp) for p, sp in zip(prompts, sps)]
    got = [o.result().outputs[0].token_ids for o in outs]
    for toks, m in zip(got, (3, 9, 17, 24)):
        assert len(toks) == m, (len(toks), m)
    wait_idle(llm)
    llm.shutdown()


def test_overlap_composition_churn(lagged):
    """New prefills joining mid-decode force pipeline drains; outputs must
    still match the non-overlap run."""
    import threading
    import time as _t
    rng = np.random.RandomState(2)
    first = [list(rng.randint(1, 198, 6)) for _ in range(3)]
    late = [list(rng.randint(1, 198, 11)) for _ in range(3)]
    sp = SamplingParams(max_tokens=20, temperature=0.0, ignore_eos=True)

    def run(llm):
        handles = [llm.generate_async(p, sp) for p in first]
        _t.sleep(0.15)  # let decode start before the second wave
        handles += [llm.generate_async(p, sp) for p in late]
        return [h.result().outputs[0].token_ids for h in handles]

    llm = make_llm()
    got = run(llm)
    llm.shutdown()
    os.environ["TLLM_OVERLAP_DECODE"] = "0"
    try:
        llm = make_llm()
        ref = run(llm)
        llm.shutdown()
    finally:
        del os.environ["TLLM_OVERLAP_DECODE"]
    assert got == ref


def test_overlap_cancel_mid_pipeline(lagged):
    rng = np.random.RandomState(3)
    llm = make_llm()
    sp = SamplingParams(max_tokens=120, temperature=0.0, ignore_eos=True)
    keep = llm.generate_async(list(rng.randint(1, 198, 6)), sp)
    h = llm.generate_async(list(rng.randint(1, 198, 6)), sp)
    import time as _t
    _t.sleep(0.1)
    h.cancel()
    out = keep.result()
    assert len(out.outputs[0].token_ids) == 120
    wait_idle(llm)
    llm.shutdown()


def test_overlap_kv_exhaustion_recovers(lagged):
    """A nearly-full KV pool under deep pipelining must not kill the
    executor loop: the guard accounts for virtual positions and the grow
    path drains + retries instead of propagating."""
    rng = np.random.RandomState(5)
    llm = LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
              max_seq_len=256, max_batch_size=4, kv_num_blocks=18,
              kv_block_size=8, seed=0)
    try:
        sp = SamplingParams(max_tokens=60, temperature=0.0, ignore_eos=True)
        futs = [llm.generate_async(list(rng.randint(1, 198, 10)), sp)
                for _ in range(3)]
        outs = [f.result(timeout=120).outputs[0].token_ids for f in futs]
        assert all(len(o) == 60 for o in outs)
        assert llm.executor._error is None
    finally:
        llm.shutdown()


def test_release_memory_refuses_submissions(lagged):
    llm = make_llm()
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    llm.generate([[1, 2, 3]], sp)
    llm.release_memory()
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        llm.generate([[4, 5]], sp)
    llm.resume_memory()
    out = llm.generate([[4, 5]], sp)
    assert len(out[0].outputs[0].token_ids) == 4
    llm.shutdown()
