"""Scaffolding controllers.

Mirrors the reference's `scaffolding/controller.py`: a Controller is a
generator — it yields lists of GenerationTask to run concurrently, receives
them back completed, and finally exposes its result.  This keeps search
strategies (vote, best-of-N, tree search) independent of the executor.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams


@dataclass
class GenerationTask:
    prompt: Any                           # str | token ids
    sampling_params: Optional[SamplingParams] = None
    # filled by the worker
    output_text: Optional[str] = None
    output_token_ids: Optional[List[int]] = None
    cumulative_logprob: Optional[float] = None
    result: Any = None


class Controller:
    """Base: yield task batches from process(); read .result at the end."""

    def process(self, prompt, **kwargs):
        raise NotImplementedError

    def run(self, prompt, submit: Callable[[List[GenerationTask]], None],
            **kwargs):
        gen = self.process(prompt, **kwargs)
        batch = next(gen)
        while True:
            submit(batch)  # blocks until every task is completed
            try:
                batch = gen.send(batch)
            except StopIteration as e:
                return e.value


class MajorityVoteController(Controller):
    """Sample N candidates, return the most common answer
    (reference scaffolding majority-vote; self-consistency, arXiv:2203.11171).
    extract_answer: map output text/tokens to a vote key (default: full
    token sequence)."""

    def __init__(self, n_samples: int = 5,
                 extract_answer: Optional[Callable] = None,
                 sampling_params: Optional[SamplingParams] = None):
        self.n_samples = n_samples
        self.extract_answer = extract_answer or (
            lambda t: tuple(t.output_token_ids or ()))
        self.sampling_params = sampling_params

    def process(self, prompt, **kwargs):
        import dataclasses
        sp = self.sampling_params or SamplingParams(temperature=0.8,
                                                    max_tokens=32)
        tasks = [GenerationTask(prompt, dataclasses.replace(sp, seed=i))
                 for i in range(self.n_samples)]
        yield tasks
        votes = collections.Counter(self.extract_answer(t) for t in tasks)
        winner, count = votes.most_common(1)[0]
        best = next(t for t in tasks if self.extract_answer(t) == winner)
        return {"answer": winner, "votes": count, "task": best,
                "all_tasks": tasks}


class BestOfNController(Controller):
    """Sample N candidates, return the one with the best score
    (default: mean token logprob; custom reward functions plug in)."""

    def __init__(self, n_samples: int = 4,
                 score: Optional[Callable[[GenerationTask], float]] = None,
                 sampling_params: Optional[SamplingParams] = None):
        self.n_samples = n_samples
        self.score = score or (lambda t: (t.cumulative_logprob or 0.0)
                               / max(len(t.output_token_ids or ()), 1))
        self.sampling_params = sampling_params

    def process(self, prompt, **kwargs):
        import dataclasses
        sp = self.sampling_params or SamplingParams(temperature=0.8,
                                                    max_tokens=32,
                                                    logprobs=1)
        tasks = [GenerationTask(prompt, dataclasses.replace(sp, seed=i))
                 for i in range(self.n_samples)]
        yield tasks
        best = max(tasks, key=self.score)
        return {"task": best, "score": self.score(best), "all_tasks": tasks}
