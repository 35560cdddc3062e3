"""Inference-time-compute scaffolding.

Counterpart of the reference's `tensorrt_llm/scaffolding/` (~4.7k LoC:
Controller/Worker/ScaffoldingLlm with majority-vote and best-of-N
controllers): a small framework that composes multiple generation calls into
one logical task — sample N candidates concurrently, score/vote, return the
winner.  Controllers are generators yielding GenerationTask batches, so
custom search strategies (MCTS-style and friends) plug in without touching
the executor.
"""

from tensorrt_llm_tpu.scaffolding.controller import (
    BestOfNController,
    Controller,
    GenerationTask,
    MajorityVoteController,
)
from tensorrt_llm_tpu.scaffolding.scaffolding_llm import ScaffoldingLlm
from tensorrt_llm_tpu.scaffolding.tree_search import (
    CertaintyStopController,
    JudgeRewardController,
    MCTSController,
    ThoughtNode,
    TreeOfThoughtsController,
)

__all__ = [
    "Controller", "GenerationTask", "MajorityVoteController",
    "BestOfNController", "ScaffoldingLlm", "MCTSController",
    "TreeOfThoughtsController", "CertaintyStopController",
    "JudgeRewardController", "ThoughtNode",
]
