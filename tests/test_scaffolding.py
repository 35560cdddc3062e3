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


# ---- tree-search / adaptive controllers (reference contrib controllers) ----
class CharTokenizer:
    eos_token_id = 0
    chat_template = None

    def encode(self, text):
        return [1 + (ord(c) % 60) for c in str(text)[:48]] or [1]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)


def mk_text_llm():
    return LLM(model=ModelConfig(**TINY), tokenizer=CharTokenizer(),
               max_seq_len=64, max_batch_size=8, kv_num_blocks=128,
               kv_block_size=8)


def test_parse_judge_score():
    from tensorrt_llm_tpu.scaffolding.tree_search import parse_judge_score
    assert parse_judge_score("7") == 0.7
    assert parse_judge_score(" 8.5 / 10") == 0.85
    assert parse_judge_score("fifty") == 0.0
    assert parse_judge_score("999") == 1.0  # clamped
    assert parse_judge_score(None) == 0.0


def test_mcts_controller_searches_and_answers():
    from tensorrt_llm_tpu.scaffolding import MCTSController, ScaffoldingLlm
    llm = mk_text_llm()
    try:
        ctl = MCTSController(
            max_iterations=2, max_depth=2, num_thoughts_per_step=2,
            thought_tokens=3, answer_tokens=3,
            sampling_params=SamplingParams(temperature=0.8, logprobs=1,
                                           ignore_eos=True))
        out = ScaffoldingLlm(llm, ctl).generate("what is 2+2?")
        assert isinstance(out["answer"], str) and out["answer"]
        assert out["iterations"] >= 1
        root = out["root"]
        assert root.children, "no expansion happened"
        assert all(c.visits >= 1 for c in root.children)
    finally:
        llm.shutdown()


def test_tot_controller_beam_prunes():
    from tensorrt_llm_tpu.scaffolding import (ScaffoldingLlm,
                                              TreeOfThoughtsController)
    llm = mk_text_llm()
    try:
        ctl = TreeOfThoughtsController(
            max_depth=2, branching=3, beam_width=2,
            thought_tokens=3, answer_tokens=3,
            sampling_params=SamplingParams(temperature=0.8, logprobs=1,
                                           ignore_eos=True))
        out = ScaffoldingLlm(llm, ctl).generate("prove it")
        assert out["answer"]
        # reasoning path depth == max_depth thoughts
        assert len(out["reasoning"].split("\n")) == 2
    finally:
        llm.shutdown()


def test_certainty_stop_early_exit():
    from tensorrt_llm_tpu.scaffolding import (CertaintyStopController,
                                              ScaffoldingLlm)
    llm = mk_text_llm()
    try:
        ctl = CertaintyStopController(
            chunk_tokens=3, max_chunks=6, agreement=2, probe_tokens=2,
            extract=lambda s: "42")   # probes always agree -> early stop
        out = ScaffoldingLlm(llm, ctl).generate("hard problem")
        assert out["early_stop"] is True
        assert out["chunks"] == 2     # stopped at the agreement threshold
        assert out["answer"] == "42"
    finally:
        llm.shutdown()


def test_certainty_stop_runs_to_budget_when_uncertain():
    from tensorrt_llm_tpu.scaffolding import (CertaintyStopController,
                                              ScaffoldingLlm)
    llm = mk_text_llm()
    try:
        seen = iter(range(1000))

        ctl = CertaintyStopController(
            chunk_tokens=3, max_chunks=3, agreement=2, probe_tokens=2,
            extract=lambda s: str(next(seen)))  # never agrees
        out = ScaffoldingLlm(llm, ctl).generate("harder problem")
        assert out["early_stop"] is False
        assert out["chunks"] == 3
    finally:
        llm.shutdown()


def test_judge_reward_controller():
    from tensorrt_llm_tpu.scaffolding import (JudgeRewardController,
                                              ScaffoldingLlm)
    llm = mk_text_llm()
    try:
        ctl = JudgeRewardController(
            n_samples=3, answer_tokens=3,
            sampling_params=SamplingParams(temperature=0.9,
                                           ignore_eos=True))
        out = ScaffoldingLlm(llm, ctl).generate("rate me")
        assert len(out["all_scores"]) == 3
        assert out["score"] == max(out["all_scores"])
    finally:
        llm.shutdown()
