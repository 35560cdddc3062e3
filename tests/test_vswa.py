"""VSWA: separate cyclic-ring pools for sliding-window layers.

Reference: per-window `WindowBlockManager` (kvCacheManager.h:600) with cyclic
KV for sliding layers.  The defining property: enabling separate window pools
must not change any output — the window mask semantics are identical, only
the storage changes (and sliding layers stop paying full-length KV).
"""

import dataclasses

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams as SP
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.runtime.kv_cache_manager import (KVCacheConfig,
                                                       KVCacheManager)
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import LlmRequest

# window smaller than the prompt so cyclic wrap actually happens
SWA = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
           num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
           max_position=256, sliding_window=16, sliding_window_pattern=3)


def build(separate_pools: bool, seed=0, max_seq_len=96):
    cfg = ModelConfig(**SWA)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    kv = KVCacheManager(
        KVCacheConfig(block_size=8, separate_window_pools=separate_pools),
        cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
    engine = ModelEngine(model, params, kv, mapping=Mapping(),
                         max_seq_len=max_seq_len, decode_buckets=(4,),
                         prefill_buckets=(16,), max_batch_size=4)
    return engine, kv, params


def run_sequence(engine, kv, prompt, n_decode=6):
    """Chunked prefill (2 chunks) + n greedy decode steps; returns logits."""
    req = LlmRequest(prompt, SP(max_tokens=n_decode))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    req.start_context()
    outs = []
    pos = 0
    chunks = []
    left = len(prompt)
    while left > 0:
        chunks.append(min(16, left))
        left -= chunks[-1]
    for chunk in chunks:
        kv.grow_sequence(req.request_id, pos + chunk)
        logits = engine.run_prefill(engine.prepare_prefill_inputs(req, chunk))
        req.context_position = pos = pos + chunk
        outs.append(np.asarray(logits, np.float32)[0])
    req.finish_context()
    for _ in range(n_decode):
        req.append_token(int(np.argmax(outs[-1])))
        kv.grow_sequence(req.request_id, req.num_tokens)
        logits = engine.run_decode(engine.prepare_decode_inputs([req]))
        outs.append(np.asarray(logits, np.float32)[0])
    return np.stack(outs)


def test_vswa_configured_and_pools_shrink():
    engine, kv, _ = build(True)
    assert engine._vswa and kv.vswa
    assert 1 in kv.sliding_layers and 2 not in kv.sliding_layers
    full_nb = engine.kv_caches[2][0].shape[0]
    ring_nb = engine.kv_caches[1][0].shape[0]
    assert ring_nb == kv.local_num_blocks() and ring_nb != full_nb
    # ring = window + one block of slack
    assert kv.ring_capacity >= SWA["sliding_window"] + 1
    assert kv.ring_blocks < engine.max_blocks_per_seq


def test_vswa_outputs_match_full_pools():
    prompt = list(np.random.RandomState(0).randint(1, 127, size=40))
    e1, kv1, params = build(False, seed=3)
    ref = run_sequence(e1, kv1, prompt)
    e2, kv2, _ = build(True, seed=3)
    assert e2._vswa
    got = run_sequence(e2, kv2, prompt)
    np.testing.assert_allclose(ref, got, rtol=2e-2, atol=2e-2)


def test_vswa_ring_slot_mapping_cyclic():
    _, kv, _ = build(True)
    kv.add_sequence(101, [1, 2, 3])
    P = kv.ring_capacity
    # slabs start at block 1 (ring block 0 is the reserved PAD target)
    base = kv.block_size + kv.ring_slot_of(101) * P
    # positions wrap cyclically
    m = kv.local_slot_mapping(101, P - 2, 4, pad_slot=-1, dedup=False)
    assert m == [base + P - 2, base + P - 1, base + 0, base + 1]
    # same-chunk overwrites: earlier duplicate gets the pad slot
    m2 = kv.local_slot_mapping(101, 0, P + 2, pad_slot=-1)
    assert m2[0] == -1 and m2[1] == -1
    assert m2[2] == base + 2 and m2[-1] == base + 1
    kv.free_sequence(101)
    assert kv.can_admit_new()


def test_vswa_e2e_llm_multistep_and_beams():
    cfg = ModelConfig(**SWA)
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=96,
              max_batch_size=4, kv_num_blocks=96, kv_block_size=8, seed=11)
    try:
        assert llm.engine._vswa
        sp = SamplingParams(max_tokens=24, temperature=0.0, ignore_eos=True)
        prompts = [list(range(1, 30)), [5, 6, 7]]
        a = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
        b = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
        assert a == b and all(len(t) == 24 for t in a)
        # beam search forks copy rings
        bs = SamplingParams(max_tokens=6, use_beam_search=True, best_of=2,
                            ignore_eos=True)
        outs = llm.generate([[2, 4, 6, 8]], bs)
        assert len(outs[0].outputs[0].token_ids) == 6
        stats = llm.get_kv_cache_stats()
        assert stats["active_sequences"] >= 0
    finally:
        llm.shutdown()


def test_vswa_disagg_roundtrip():
    """context_only -> generation_only handoff with ring extraction."""
    cfg = ModelConfig(**SWA)
    mk = lambda seed: LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=96,
                          max_batch_size=4, kv_num_blocks=96, kv_block_size=8,
                          seed=seed)
    prefill, decode = mk(21), None
    try:
        sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
        prompt = list(range(1, 28))
        want = prefill.generate([prompt], sp)[0].outputs[0].token_ids

        _, dparams = prefill.generate_context_only(
            list(prompt), SamplingParams(temperature=0.0, ignore_eos=True))
        assert dparams.first_gen_tokens[0] == want[0]

        decode = mk(21)
        gen_sp = SamplingParams(max_tokens=10, temperature=0.0,
                                ignore_eos=True)
        out = decode.generate_async(list(prompt), gen_sp,
                                    disaggregated_params=dparams).result()
        got = out.outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        prefill.shutdown()
        if decode is not None:
            decode.shutdown()
