"""Kitchen-sink executor stress: random feature mixes under saturation.

One LLM instance, many concurrent requests drawing random combinations of
features that each have their own scheduling/path implications (beams,
logprobs, logits returns, penalties, stop strings, priorities, retention,
n>1, streaming, cancellation) — all must complete, the KV pool must fully
drain, and the executor thread must stay alive throughout.
"""

import random

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=96, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position=256)


def test_random_feature_mix_under_saturation():
    rng = random.Random(42)
    llm = LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
              max_seq_len=128, max_batch_size=4, kv_num_blocks=48,
              kv_block_size=4, kv_host_cache_blocks=16,
              return_perf_metrics=True, seed=1)
    futures = []
    cancelled = []
    try:
        for i in range(28):
            prompt = [rng.randrange(1, 90)
                      for _ in range(rng.randrange(1, 24))]
            kw = dict(max_tokens=rng.randrange(1, 10), ignore_eos=True,
                      temperature=rng.choice([0.0, 0.0, 0.8]),
                      seed=i)
            style = rng.randrange(6)
            if style == 0:
                kw.update(use_beam_search=True, n=2, best_of=3,
                          temperature=0.0)
            elif style == 1:
                kw.update(logprobs=rng.choice([1, 3]))
            elif style == 2:
                kw.update(return_generation_logits=True, temperature=0.0)
            elif style == 3:
                kw.update(prompt_logprobs=2, temperature=0.0)
            elif style == 4:
                kw.update(repetition_penalty=1.3,
                          stop_token_ids=[rng.randrange(1, 90)])
            sp = SamplingParams(**kw)
            fut = llm.generate_async(
                prompt, sp,
                kv_retention_priority=rng.choice([None, 10, 50, 90]),
                priority=rng.random(),
                cache_salt=rng.choice([None, "tenant-a", "tenant-b"]))
            futures.append((fut, kw, len(prompt)))
            if rng.random() < 0.15:
                fut.cancel()
                cancelled.append(id(fut))

        done = 0
        for fut, kw, plen in futures:
            try:
                out = fut.result(timeout=300)
            except RuntimeError as e:
                assert "cancel" in str(e).lower(), e
                continue
            done += 1
            o = out.outputs[0]
            if id(fut) not in cancelled:
                if kw.get("use_beam_search"):
                    assert len(out.outputs) == 2
                else:
                    assert 1 <= len(o.token_ids) <= kw["max_tokens"]
                if kw.get("logprobs"):
                    assert len(o.logprobs) == len(o.token_ids)
                if kw.get("return_generation_logits"):
                    assert o.generation_logits.shape[0] == len(o.token_ids)
                if kw.get("prompt_logprobs"):
                    assert out.prompt_logprobs is not None
                    assert len(out.prompt_logprobs) == plen
                assert out.metrics is not None
        assert done >= 20, done
        # the executor survived and the pool fully drains
        assert llm.executor._thread.is_alive()
        import time
        for _ in range(100):
            st = llm.get_kv_cache_stats()
            if st["active_sequences"] == 0:
                break
            time.sleep(0.1)
        assert st["active_sequences"] == 0, st
        # determinism spot-check after the storm (greedy, warm caches)
        sp = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
        a = llm.generate([[5, 6, 7]], sp)[0].outputs[0].token_ids
        b = llm.generate([[5, 6, 7]], sp)[0].outputs[0].token_ids
        assert a == b
    finally:
        llm.shutdown()


def test_spec_and_chunked_prefill_mix():
    """Speculation on, prefill forced to chunk (small token budget), mixed
    guided/plain/logprobs requests: completion + drain + liveness."""
    from tensorrt_llm_tpu.speculative import (SpeculativeConfig,
                                              SpeculativeMode)
    rng = random.Random(9)
    spec = SpeculativeConfig(mode=SpeculativeMode.NGRAM, max_draft_len=3)
    llm = LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
              max_seq_len=128, max_batch_size=4, kv_num_blocks=64,
              kv_block_size=4, max_num_tokens=16,   # forces chunked prefill
              speculative_config=spec, seed=2)
    futures = []
    try:
        for i in range(16):
            # repetitive prompts feed the ngram matcher; long ones chunk
            base = [rng.randrange(1, 90)] * 2
            prompt = (base * rng.randrange(2, 14))[: rng.randrange(3, 28)]
            kw = dict(max_tokens=rng.randrange(2, 10), ignore_eos=True,
                      temperature=rng.choice([0.0, 0.0, 0.7]), seed=i)
            if i % 5 == 0:
                kw.update(logprobs=1, temperature=0.0)
            futures.append((llm.generate_async(prompt, kw_sp := SamplingParams(**kw)), kw))
        for fut, kw in futures:
            o = fut.result(timeout=300).outputs[0]
            assert 1 <= len(o.token_ids) <= kw["max_tokens"]
            if kw.get("logprobs"):
                assert len(o.logprobs) == len(o.token_ids)
        assert llm.executor.spec_stats["rounds"] > 0
        import time
        for _ in range(100):
            if llm.get_kv_cache_stats()["active_sequences"] == 0:
                break
            time.sleep(0.1)
        assert llm.get_kv_cache_stats()["active_sequences"] == 0
    finally:
        llm.shutdown()
