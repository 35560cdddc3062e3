"""Wide-EP MoE load balancer: stats, planner, placement-preserving outputs."""

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.runtime.moe_load_balancer import (
    balance_stat,
    plan_placement,
)

MOE = dict(vocab_size=96, hidden_size=64, intermediate_size=128,
           num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
           max_position=128, num_experts=8, num_experts_per_tok=2,
           moe_intermediate_size=64)


def test_planner_balances_skewed_loads():
    loads = np.array([100, 90, 5, 4, 3, 2, 1, 1])
    before = balance_stat(loads, ep_size=2)           # identity placement
    perm = plan_placement(loads, ep_size=2)
    after = balance_stat(loads, ep_size=2, placement=perm)
    assert after < before
    assert after < 1.1                               # near-perfect here
    assert sorted(perm.tolist()) == list(range(8))   # a true permutation


def test_planner_replicates_hot_experts():
    # one dominating expert: without replication the best possible
    # max/mean is ~1.6; with 2 redundant slots the replicas split its load
    loads = np.array([100, 10, 10, 10, 10, 10, 10, 10])
    base = balance_stat(loads, ep_size=2,
                        placement=plan_placement(loads, ep_size=2))
    placement = plan_placement(loads, ep_size=2, num_slots=10)
    assert len(placement) == 10
    assert np.sum(placement == 0) >= 2               # hot expert replicated
    assert set(placement.tolist()) == set(range(8))  # every expert hosted
    rep = balance_stat(loads, ep_size=2, placement=placement, num_slots=10)
    assert rep < base


def test_planner_respects_slot_capacity():
    loads = np.array([10, 10, 10, 10])
    perm = plan_placement(loads, ep_size=4)
    assert sorted(perm.tolist()) == [0, 1, 2, 3]


def mk_llm(**kw):
    return LLM(model=ModelConfig(**MOE), skip_tokenizer_init=True,
               max_seq_len=64, max_batch_size=8, kv_num_blocks=64,
               kv_block_size=8, seed=5, **kw)


def test_load_stats_accumulate_and_rebalance_preserves_outputs():
    llm = mk_llm()
    try:
        sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
        prompts = [[1, 2, 3], [9, 8, 7, 6]]
        want = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]

        loads = llm.moe_balancer.snapshot_loads()
        assert loads and all(l.sum() > 0 for l in loads.values())

        report = llm.rebalance_experts()
        assert report  # produced per-layer before/after stats

        got = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
        assert got == want, (got, want)  # placement is output-preserving

        # loads keep accumulating post-rebalance (remapped to logical ids)
        loads2 = llm.moe_balancer.snapshot_loads()
        assert all(loads2[k].sum() >= loads[k].sum() for k in loads)

        # a second rebalance (composition of permutations) stays correct
        llm.rebalance_experts()
        got2 = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
        assert got2 == want
    finally:
        llm.shutdown()


def test_periodic_rebalance_hook():
    llm = mk_llm(moe_rebalance_interval=3)
    try:
        llm.generate([[2, 4, 6]], SamplingParams(max_tokens=8,
                                                 ignore_eos=True))
        assert llm.moe_balancer.history  # hook fired at least once
    finally:
        llm.shutdown()


def test_redundant_slots_rebalance_preserves_outputs():
    llm = mk_llm(moe_redundant_experts=2)
    try:
        sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
        prompts = [[1, 2, 3], [9, 8, 7, 6]]
        want = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]

        report = llm.rebalance_experts()
        got = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
        assert got == want, (got, want)

        # second rebalance from a replicated placement still correct
        llm.rebalance_experts()
        got2 = [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]
        assert got2 == want
    finally:
        llm.shutdown()
