"""Beam search: KV fork correctness + beam-vs-exhaustive-search parity."""

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.runtime.kv_cache_manager import (
    KVCacheConfig,
    KVCacheManager,
)

TINY = dict(vocab_size=64, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position=128)


def _mk_llm(seed=0, **kw):
    return LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
               max_seq_len=64, max_batch_size=8, kv_num_blocks=256,
               kv_block_size=4, seed=seed, **kw)


# ---------------------------------------------------------------- fork ------
def test_fork_shares_immutable_blocks():
    kv = KVCacheManager(KVCacheConfig(block_size=4), num_layers=1,
                        num_kv_heads=1, head_dim=8, num_blocks=32)
    kv.add_sequence(1, list(range(10)))
    kv.grow_sequence(1, 10)  # 3 blocks; block 2 holds positions 8..9
    pairs = kv.fork_sequence(1, 2)
    t1, t2 = kv.block_table(1, 3), kv.block_table(2, 3)
    # positions 0..8 written => blocks 0,1 immutable and shared; block
    # holding position 9 (pending write) is private
    assert t1[:2] == t2[:2]
    assert t1[2] != t2[2]
    assert pairs == [(t1[2], t2[2])]
    # freeing one sequence must not free shared blocks under the other
    free_before = kv.num_free_blocks
    kv.free_sequence(1)
    assert kv.num_free_blocks == free_before + 1  # only the private tail
    kv.free_sequence(2)


def test_fork_python_native_parity():
    import os
    for backend in ("python", "auto"):
        os.environ["TLLM_KV_BOOKKEEPING"] = backend
        try:
            kv = KVCacheManager(KVCacheConfig(block_size=4), 1, 1, 8,
                                num_blocks=16)
            kv.add_sequence(1, list(range(9)))
            kv.grow_sequence(1, 9)
            pairs = kv.fork_sequence(1, 2)
            assert kv.block_table(1, 3)[:2] == kv.block_table(2, 3)[:2]
            assert len(pairs) == 1
            # exactly-full sequence: tail block pending write is block 1
            kv.add_sequence(3, list(range(8)))
            kv.grow_sequence(3, 8)
            pairs = kv.fork_sequence(3, 4)
            assert len(pairs) == 1
            assert kv.block_table(3, 2)[0] == kv.block_table(4, 2)[0]
        finally:
            del os.environ["TLLM_KV_BOOKKEEPING"]


# ---------------------------------------------------------------- search ----
def exhaustive_best_2step(llm, prompt):
    """EXACT best 2-token path by full-vocab enumeration: for every first
    token t1 one teacher-forced prefill yields both lp(t1|prompt) and the
    full lp(t2|prompt,t1) row."""
    engine = llm.executor.engine
    kv = llm.executor.kv
    from tensorrt_llm_tpu.runtime.request import LlmRequest

    def last_rows(tokens):
        req = LlmRequest(list(tokens), SamplingParams(max_tokens=1))
        kv.add_sequence(req.request_id, req.prompt_token_ids)
        req.start_context()
        kv.grow_sequence(req.request_id, req.prompt_len)
        inputs = engine.prepare_prefill_inputs(req, req.prompt_len)
        inputs.logit_indices = np.arange(inputs.input_ids.shape[0],
                                         dtype=np.int32)
        logits = np.asarray(engine.run_prefill(inputs), np.float32)
        kv.free_sequence(req.request_id)
        lp = logits - logits.max(-1, keepdims=True)
        return lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    lp1 = last_rows(prompt)[len(prompt) - 1]  # [V]
    V = lp1.shape[0]
    best, best_s = None, -np.inf
    greedy_s = None
    for t1 in range(V):
        lp2 = last_rows(list(prompt) + [t1])[len(prompt)]
        s = float(lp1[t1] + lp2.max())
        if s > best_s:
            best_s, best = s, [t1, int(lp2.argmax())]
        if t1 == int(lp1.argmax()):
            greedy_s = s  # greedy continues from the greedy first token
    return best, best_s, greedy_s


def test_beam_search_finds_higher_logprob_than_greedy():
    llm = _mk_llm(seed=11)
    try:
        prompt = [3, 9, 27]
        sp_beam = SamplingParams(max_tokens=4, n=4, use_beam_search=True,
                                 ignore_eos=True)
        out = llm.generate([prompt], sp_beam)[0]
        assert len(out.outputs) == 4
        scores = [o.cumulative_logprob for o in out.outputs]
        assert scores == sorted(scores, reverse=True)
        assert all(len(o.token_ids) == 4 for o in out.outputs)
        # beam-0 score is bounded by [greedy path, exact optimum]
        best, best_s, greedy_s = exhaustive_best_2step(llm, prompt)
        out2 = llm.generate([prompt], SamplingParams(
            max_tokens=2, n=4, use_beam_search=True, ignore_eos=True))[0]
        beam_s = out2.outputs[0].cumulative_logprob
        eps = 0.05  # bf16 decode-vs-prefill numerics
        assert beam_s >= greedy_s - eps, (beam_s, greedy_s)
        assert beam_s <= best_s + eps, (beam_s, best_s, best,
                                        out2.outputs[0].token_ids)
    finally:
        llm.shutdown()


def test_beam_search_mixed_with_sampling_requests():
    """Beam and normal requests coexist in the same continuous batch."""
    llm = _mk_llm(seed=7)
    try:
        futs = []
        futs.append(llm.generate_async(
            [1, 2, 3], SamplingParams(max_tokens=5, n=2, use_beam_search=True,
                                      ignore_eos=True)))
        futs.append(llm.generate_async(
            [4, 5], SamplingParams(max_tokens=5, temperature=0.0,
                                   ignore_eos=True)))
        beam_out = futs[0].result(timeout=120)
        norm_out = futs[1].result(timeout=120)
        assert len(beam_out.outputs) == 2
        assert len(norm_out.outputs[0].token_ids) == 5
        # pool drains fully afterwards
        import time
        for _ in range(50):
            if llm.get_kv_cache_stats()["active_sequences"] == 0:
                break
            time.sleep(0.1)
        assert llm.get_kv_cache_stats()["active_sequences"] == 0
    finally:
        llm.shutdown()


def test_beam_width_blocks_accounting():
    """After a beam request completes, no blocks leak."""
    llm = _mk_llm(seed=3)
    try:
        before = llm.get_kv_cache_stats()
        llm.generate([[2, 4, 6, 8]], SamplingParams(
            max_tokens=6, n=3, use_beam_search=True, ignore_eos=True))
        import time
        time.sleep(0.3)
        after = llm.get_kv_cache_stats()
        assert after["active_sequences"] == 0
        assert after["free_blocks"] + after["evictable_blocks"] == \
            before["free_blocks"] + before["evictable_blocks"]
    finally:
        llm.shutdown()


def test_beam_search_under_attention_dp_matches_single_device():
    """Beam search with attention-DP: forks stay on the owner replica
    (dp-banded block copies), beam rows ride the rank-grouped decode."""
    import numpy as np

    prompts = [[3, 5, 3, 5, 7], [2, 9, 2, 9, 2, 9, 11]]
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True,
                        use_beam_search=True, best_of=3, n=2)
    base = _mk_llm()
    try:
        want = [[o.token_ids for o in base.generate(list(p), sp)[0].outputs]
                for p in prompts]
    finally:
        base.shutdown()

    llm = _mk_llm(data_parallel_size=2)
    try:
        got = [[o.token_ids for o in llm.generate(list(p), sp)[0].outputs]
               for p in prompts]
    finally:
        llm.shutdown()
    assert got == want, (got, want)


@pytest.mark.parametrize("cp_type", ["helix", "star"])
def test_beam_search_under_cp_matches_single_device(cp_type):
    """Beam search under helix/star CP: forks copy per-rank block shards
    (cp-banded id rows), beams decode through the partial-attention
    combine."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")

    prompt = [int(x) for x in np.random.RandomState(3).randint(1, 60, 18)]
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True,
                        use_beam_search=True, best_of=3, n=2)
    base = _mk_llm()
    try:
        want = [o.token_ids for o in base.generate(list(prompt),
                                                   sp)[0].outputs]
    finally:
        base.shutdown()

    llm = _mk_llm(context_parallel_size=2, context_parallel_type=cp_type)
    try:
        got = [o.token_ids for o in llm.generate(list(prompt),
                                                 sp)[0].outputs]
    finally:
        llm.shutdown()
    assert got == want, (got, want)


def test_beam_search_max_tokens_one():
    """Regression: beam 0 finishing at seeding (max_tokens==1) used to free
    the parent KV sequence before the other beams forked from it, killing
    the executor thread.  All beams must seed, and the executor must stay
    alive for later requests."""
    llm = _mk_llm()
    sp = SamplingParams(max_tokens=1, use_beam_search=True, best_of=3, n=3,
                        ignore_eos=True)
    try:
        out = llm.generate([[5, 9, 2]], sp)[0]
        assert len(out.outputs) == 3
        assert all(len(o.token_ids) == 1 for o in out.outputs)
        # executor survived: a normal request still completes
        out2 = llm.generate([[4, 8]], SamplingParams(max_tokens=4,
                                                     ignore_eos=True))[0]
        assert len(out2.outputs[0].token_ids) == 4
    finally:
        llm.shutdown()


def test_variable_beam_width_array():
    """reference beam_width_array: per-step beam widths (narrowing frees
    the dropped beams; output still matches fixed-width-at-final search
    quality invariants)."""
    llm = _mk_llm()
    try:
        sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True,
                            use_beam_search=True, n=2, best_of=4,
                            beam_width_array=[4, 4, 2, 2])
        out = llm.generate([[7, 3, 7, 3]], sp)[0]
        assert len(out.outputs) == 2
        for o in out.outputs:
            assert len(o.token_ids) == 8
        # scores are sorted best-first
        assert (out.outputs[0].cumulative_logprob
                >= out.outputs[1].cumulative_logprob)
        # KV fully released afterwards
        st = llm.get_kv_cache_stats()
        assert st["active_sequences"] == 0, st
    finally:
        llm.shutdown()


def test_variable_beam_width_widening():
    """A width schedule that GROWS forks extra beams mid-search."""
    llm = _mk_llm()
    try:
        sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True,
                            use_beam_search=True, n=1, best_of=2,
                            beam_width_array=[2, 2, 4])
        out = llm.generate([[5, 9, 5, 9]], sp)[0]
        assert len(out.outputs[0].token_ids) == 6
        st = llm.get_kv_cache_stats()
        assert st["active_sequences"] == 0, st
    finally:
        llm.shutdown()


def test_beam_per_token_logprobs():
    """SamplingParams.logprobs with beams: each returned beam carries a
    per-output-token logprob list whose sum matches the raw cumulative
    score (length_penalty 0)."""
    import math
    llm = _mk_llm()
    try:
        sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True,
                            use_beam_search=True, n=2, best_of=3,
                            logprobs=1)
        out = llm.generate([[7, 3, 7, 3]], sp)[0]
        for o in out.outputs:
            assert o.logprobs is not None
            assert len(o.logprobs) == len(o.token_ids)
            total = sum(next(iter(d.values())) for d in o.logprobs)
            assert math.isclose(total, o.cumulative_logprob,
                                rel_tol=1e-4, abs_tol=1e-4), \
                (total, o.cumulative_logprob)
            for d, t in zip(o.logprobs, o.token_ids):
                assert t in d
    finally:
        llm.shutdown()
