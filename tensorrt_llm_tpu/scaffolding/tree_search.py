"""Tree-search and adaptive inference-time-compute controllers.

Counterpart of the reference's scaffolding contrib controllers
(`scaffolding/contrib/TreeInference/tree_controllers.py` MCTSController /
TOTController, `contrib/Dynasor/dynasor_controller.py` certainty-based
stopping, `scaffolding/controller.py:91` PRMController): search strategies
expressed in this framework's generator idiom — a controller yields
GenerationTask batches and receives them back completed — so every strategy
rides the continuous-batching executor concurrently.

All controllers here are text-level (they compose prompts); scoring is
pluggable: a host callable, mean token logprob, or an LLM judge prompt.
"""

from __future__ import annotations

import dataclasses
import math
import re
from dataclasses import dataclass, field
from typing import Callable, List, Optional

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
from tensorrt_llm_tpu.scaffolding.controller import (Controller,
                                                     GenerationTask)


@dataclass
class ThoughtNode:
    """One node of a reasoning tree (a partial chain of thoughts)."""
    thought: str = ""
    parent: Optional["ThoughtNode"] = None
    children: List["ThoughtNode"] = field(default_factory=list)
    visits: int = 0
    value: float = 0.0
    score: float = 0.0
    depth: int = 0

    def add_child(self, thought: str) -> "ThoughtNode":
        child = ThoughtNode(thought=thought, parent=self,
                            depth=self.depth + 1)
        self.children.append(child)
        return child

    def path_text(self) -> str:
        """Thoughts from the root to here, newline-joined."""
        parts, cur = [], self
        while cur is not None:
            if cur.thought:
                parts.append(cur.thought)
            cur = cur.parent
        return "\n".join(reversed(parts))

    def ucb1(self, c: float) -> float:
        if self.visits == 0 or self.parent is None \
                or self.parent.visits == 0:
            return float("inf")
        return (self.value / self.visits
                + c * math.sqrt(math.log(self.parent.visits) / self.visits))


def _mean_logprob_score(task: GenerationTask) -> float:
    return ((task.cumulative_logprob or 0.0)
            / max(len(task.output_token_ids or ()), 1))


def parse_judge_score(text: str) -> float:
    """First number in a judge reply, clamped to [0, 10] and normalized."""
    m = re.search(r"-?\d+(?:\.\d+)?", text or "")
    if not m:
        return 0.0
    return max(0.0, min(float(m.group()), 10.0)) / 10.0


class MCTSController(Controller):
    """Monte-Carlo tree search over reasoning steps (reference
    MCTSController, tree_controllers.py:90).

    Each iteration: select a leaf by UCB1, expand it with
    `num_thoughts_per_step` sampled continuation thoughts, score the new
    children (judge prompt when `judge=True`, else mean logprob), and
    backpropagate.  The result is the best root-to-leaf reasoning path
    plus a final answer generated from it."""

    def __init__(self, max_iterations: int = 8, max_depth: int = 3,
                 num_thoughts_per_step: int = 3,
                 exploration_constant: float = 1.414,
                 judge: bool = False,
                 score: Optional[Callable[[GenerationTask], float]] = None,
                 sampling_params: Optional[SamplingParams] = None,
                 thought_tokens: int = 64, answer_tokens: int = 128):
        self.max_iterations = max_iterations
        self.max_depth = max_depth
        self.n_thoughts = num_thoughts_per_step
        self.c = exploration_constant
        self.judge = judge
        self.score = score
        self.sp = sampling_params or SamplingParams(temperature=0.8,
                                                    logprobs=1)
        self.thought_tokens = thought_tokens
        self.answer_tokens = answer_tokens

    # ---- prompts (overridable) ---------------------------------------------
    def thought_prompt(self, problem: str, path: str) -> str:
        p = f"Problem: {problem}\n"
        if path:
            p += f"Reasoning so far:\n{path}\n"
        return p + "Next reasoning step:"

    def judge_prompt(self, problem: str, path: str) -> str:
        return (f"Problem: {problem}\nProposed reasoning:\n{path}\n"
                "Rate how promising this reasoning is from 0 to 10. "
                "Reply with just the number.\nRating:")

    def answer_prompt(self, problem: str, path: str) -> str:
        return (f"Problem: {problem}\nReasoning:\n{path}\n"
                "Final answer:")

    # ---- search -------------------------------------------------------------
    def _select(self, root: ThoughtNode) -> ThoughtNode:
        node = root
        while node.children and node.depth < self.max_depth:
            node = max(node.children, key=lambda n: n.ucb1(self.c))
        return node

    @staticmethod
    def _backprop(node: ThoughtNode, value: float):
        while node is not None:
            node.visits += 1
            node.value += value
            node = node.parent

    def process(self, prompt, **kwargs):
        problem = prompt if isinstance(prompt, str) else str(prompt)
        root = ThoughtNode()
        root.visits = 1
        for it in range(self.max_iterations):
            leaf = self._select(root)
            if leaf.depth >= self.max_depth:
                break
            path = leaf.path_text()
            gen = [GenerationTask(
                self.thought_prompt(problem, path),
                dataclasses.replace(self.sp, seed=it * 97 + i,
                                    max_tokens=self.thought_tokens))
                for i in range(self.n_thoughts)]
            gen = yield gen
            children = [leaf.add_child((t.output_text or "").strip())
                        for t in gen]
            if self.judge:
                jt = [GenerationTask(
                    self.judge_prompt(problem, ch.path_text()),
                    SamplingParams(temperature=0.0, max_tokens=8))
                    for ch in children]
                jt = yield jt
                scores = [parse_judge_score(t.output_text) for t in jt]
            else:
                fn = self.score or _mean_logprob_score
                # normalize logprob scores into (0, 1) for UCB mixing
                scores = [1.0 / (1.0 + math.exp(-fn(t))) for t in gen]
            for ch, sc in zip(children, scores):
                ch.score = sc
                self._backprop(ch, sc)
        # best path: max mean value among visited leaves, then deepest
        best, stack = root, [root]
        while stack:
            n = stack.pop()
            stack.extend(n.children)
            if n.visits and (n.value / n.visits, n.depth) > \
                    (best.value / max(best.visits, 1), best.depth):
                best = n
        final = [GenerationTask(
            self.answer_prompt(problem, best.path_text()),
            SamplingParams(temperature=0.0, max_tokens=self.answer_tokens))]
        final = yield final
        return {"answer": final[0].output_text,
                "reasoning": best.path_text(),
                "iterations": it + 1, "root": root, "task": final[0]}


class TreeOfThoughtsController(Controller):
    """Breadth-first tree-of-thoughts with beam pruning (reference
    TOTController, tree_controllers.py:274): at each level every frontier
    node branches into `branching` sampled thoughts, candidates are scored
    (judge or logprob), and the best `beam_width` survive."""

    def __init__(self, max_depth: int = 3, branching: int = 3,
                 beam_width: int = 2, judge: bool = False,
                 score: Optional[Callable[[GenerationTask], float]] = None,
                 sampling_params: Optional[SamplingParams] = None,
                 thought_tokens: int = 64, answer_tokens: int = 128):
        self.max_depth = max_depth
        self.branching = branching
        self.beam_width = beam_width
        self.judge = judge
        self.score = score
        self.sp = sampling_params or SamplingParams(temperature=0.8,
                                                    logprobs=1)
        self.thought_tokens = thought_tokens
        self.answer_tokens = answer_tokens

    thought_prompt = MCTSController.thought_prompt
    judge_prompt = MCTSController.judge_prompt
    answer_prompt = MCTSController.answer_prompt

    def process(self, prompt, **kwargs):
        problem = prompt if isinstance(prompt, str) else str(prompt)
        frontier = [ThoughtNode()]
        for depth in range(self.max_depth):
            gen = [GenerationTask(
                self.thought_prompt(problem, node.path_text()),
                dataclasses.replace(self.sp, seed=depth * 131 + i,
                                    max_tokens=self.thought_tokens))
                for node in frontier for i in range(self.branching)]
            gen = yield gen
            cand = []
            for j, node in enumerate(frontier):
                for i in range(self.branching):
                    t = gen[j * self.branching + i]
                    cand.append((node.add_child(
                        (t.output_text or "").strip()), t))
            if self.judge:
                jt = [GenerationTask(
                    self.judge_prompt(problem, ch.path_text()),
                    SamplingParams(temperature=0.0, max_tokens=8))
                    for ch, _ in cand]
                jt = yield jt
                for (ch, _), t in zip(cand, jt):
                    ch.score = parse_judge_score(t.output_text)
            else:
                fn = self.score or _mean_logprob_score
                for ch, t in cand:
                    ch.score = fn(t)
            cand.sort(key=lambda p: -p[0].score)
            frontier = [ch for ch, _ in cand[: self.beam_width]]
        best = frontier[0]
        final = [GenerationTask(
            self.answer_prompt(problem, best.path_text()),
            SamplingParams(temperature=0.0, max_tokens=self.answer_tokens))]
        final = yield final
        return {"answer": final[0].output_text,
                "reasoning": best.path_text(), "task": final[0]}


class CertaintyStopController(Controller):
    """Dynasor-CoT-style adaptive compute (reference
    contrib/Dynasor/dynasor_controller.py): generate reasoning in chunks;
    after each chunk, probe the model for its current final answer with a
    cheap greedy continuation.  When `agreement` consecutive probes return
    the same answer the reasoning is confident — stop early and return it,
    spending tokens only on hard problems."""

    PROBE = "\n... Therefore, the final answer is:"

    def __init__(self, chunk_tokens: int = 64, max_chunks: int = 8,
                 agreement: int = 2, probe_tokens: int = 16,
                 extract: Optional[Callable[[str], str]] = None,
                 sampling_params: Optional[SamplingParams] = None):
        self.chunk_tokens = chunk_tokens
        self.max_chunks = max_chunks
        self.agreement = agreement
        self.probe_tokens = probe_tokens
        self.extract = extract or (lambda s: (s or "").strip().split("\n")[0])
        self.sp = sampling_params or SamplingParams(temperature=0.6)

    def process(self, prompt, **kwargs):
        problem = prompt if isinstance(prompt, str) else str(prompt)
        reasoning = ""
        answers: List[str] = []
        for chunk in range(self.max_chunks):
            gen = [GenerationTask(
                f"{problem}\n{reasoning}",
                dataclasses.replace(self.sp, seed=chunk,
                                    max_tokens=self.chunk_tokens))]
            gen = yield gen
            reasoning += (gen[0].output_text or "")
            probe = [GenerationTask(
                f"{problem}\n{reasoning}{self.PROBE}",
                SamplingParams(temperature=0.0,
                               max_tokens=self.probe_tokens))]
            probe = yield probe
            answers.append(self.extract(probe[0].output_text))
            if len(answers) >= self.agreement and len(set(
                    answers[-self.agreement:])) == 1 and answers[-1]:
                return {"answer": answers[-1], "chunks": chunk + 1,
                        "early_stop": True, "reasoning": reasoning,
                        "probes": answers}
        return {"answer": answers[-1] if answers else "",
                "chunks": self.max_chunks, "early_stop": False,
                "reasoning": reasoning, "probes": answers}


class JudgeRewardController(Controller):
    """Generate-then-judge (the capability analog of the reference's
    PRMController, controller.py:91, without a dedicated reward model):
    sample N candidates, have the model rate each, return the best."""

    def __init__(self, n_samples: int = 4,
                 sampling_params: Optional[SamplingParams] = None,
                 judge_template: Optional[str] = None,
                 answer_tokens: int = 128):
        self.n_samples = n_samples
        self.sp = sampling_params or SamplingParams(temperature=0.8)
        self.judge_template = judge_template or (
            "Question: {prompt}\nAnswer: {answer}\n"
            "Rate the answer's quality from 0 to 10. Reply with just the "
            "number.\nRating:")
        self.answer_tokens = answer_tokens

    def process(self, prompt, **kwargs):
        problem = prompt if isinstance(prompt, str) else str(prompt)
        gen = [GenerationTask(
            problem, dataclasses.replace(self.sp, seed=i,
                                         max_tokens=self.answer_tokens))
            for i in range(self.n_samples)]
        gen = yield gen
        jt = [GenerationTask(
            self.judge_template.format(prompt=problem,
                                       answer=t.output_text or ""),
            SamplingParams(temperature=0.0, max_tokens=8)) for t in gen]
        jt = yield jt
        scores = [parse_judge_score(t.output_text) for t in jt]
        best = max(range(len(gen)), key=lambda i: scores[i])
        return {"task": gen[best], "score": scores[best],
                "all_scores": scores, "all_tasks": gen}
