"""Scaffolding (inference-time compute): majority vote + best-of-N."""

import numpy as np

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.scaffolding import (
    BestOfNController,
    Controller,
    GenerationTask,
    MajorityVoteController,
    ScaffoldingLlm,
)

TINY = dict(vocab_size=64, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position=128)


def mk_llm():
    return LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
               max_seq_len=64, max_batch_size=8, kv_num_blocks=128,
               kv_block_size=8)


def test_majority_vote():
    llm = mk_llm()
    try:
        ctl = MajorityVoteController(
            n_samples=5,
            sampling_params=SamplingParams(temperature=0.7, max_tokens=4,
                                           ignore_eos=True))
        out = ScaffoldingLlm(llm, ctl).generate([1, 2, 3])
        assert out["votes"] >= 1
        assert len(out["all_tasks"]) == 5
        assert all(len(t.output_token_ids) == 4 for t in out["all_tasks"])
        assert tuple(out["task"].output_token_ids) == out["answer"]
    finally:
        llm.shutdown()


def test_best_of_n_picks_highest_score():
    llm = mk_llm()
    try:
        ctl = BestOfNController(
            n_samples=4,
            sampling_params=SamplingParams(temperature=0.9, max_tokens=4,
                                           ignore_eos=True, logprobs=1))
        out = ScaffoldingLlm(llm, ctl).generate([4, 5, 6])
        scores = [ctl.score(t) for t in out["all_tasks"]]
        assert out["score"] == max(scores)
    finally:
        llm.shutdown()


def test_custom_controller_multi_round():
    """Controllers can run several dependent batches (search-style)."""

    class TwoRound(Controller):
        def process(self, prompt, **kw):
            sp = SamplingParams(temperature=0.0, max_tokens=2,
                                ignore_eos=True)
            first = [GenerationTask(prompt, sp)]
            yield first
            cont = [GenerationTask(
                list(prompt) + first[0].output_token_ids, sp)]
            yield cont
            return first[0].output_token_ids + cont[0].output_token_ids

    llm = mk_llm()
    try:
        toks = ScaffoldingLlm(llm, TwoRound()).generate([7, 8, 9])
        assert len(toks) == 4
        # equals one 4-token greedy run (same KV-reuse-safe semantics)
        want = llm.generate([[7, 8, 9]], SamplingParams(
            temperature=0.0, max_tokens=4, ignore_eos=True)
        )[0].outputs[0].token_ids
        assert toks == want
    finally:
        llm.shutdown()
