"""Accuracy evaluation tasks.

Counterpart of the reference's `tensorrt_llm/evaluate/` (MMLU, GSM8K,
CNN-dailymail via lm_eval) and its statistical accuracy harness
(`tests/integration/defs/accuracy/accuracy_core.py:42-70` compute_threshold):
scores pass if within a hypothesis-testing threshold of the reference
accuracy rather than exact-matching.
"""

from __future__ import annotations

import json
import math
import re
from typing import List, Optional

import numpy as np


def compute_threshold(num_samples: int, ref_accuracy: float,
                      sigma: float = 50.0, alpha: float = 0.05,
                      beta: float = 0.2) -> float:
    """Minimum acceptable accuracy: one-sided hypothesis test with type-I
    error alpha and power 1-beta at effect size derived from sigma
    (same contract as the reference's accuracy_core.compute_threshold)."""
    from math import sqrt
    # normal approximation z-quantiles
    def z(p):
        # Beasley-Springer-Moro inverse CDF approximation
        a = [2.50662823884, -18.61500062529, 41.39119773534, -25.44106049637]
        b = [-8.47351093090, 23.08336743743, -21.06224101826, 3.13082909833]
        u = p - 0.5
        if abs(u) < 0.42:
            r = u * u
            return u * (((a[3] * r + a[2]) * r + a[1]) * r + a[0]) / (
                (((b[3] * r + b[2]) * r + b[1]) * r + b[0]) * r + 1.0)
        r = p if u < 0 else 1 - p
        r = math.log(-math.log(r))
        c = [0.3374754822726147, 0.9761690190917186, 0.1607979714918209,
             0.0276438810333863, 0.0038405729373609, 0.0003951896511919,
             0.0000321767881768, 0.0000002888167364, 0.0000003960315187]
        v = sum(ci * r ** i for i, ci in enumerate(c))
        return -v if u < 0 else v

    se = sigma / sqrt(num_samples)
    return ref_accuracy - (z(1 - alpha) + z(1 - beta)) * se


class Task:
    name = "task"

    def evaluate(self, llm, data_path: Optional[str] = None,
                 num_samples: int = 64) -> dict:
        raise NotImplementedError

    @staticmethod
    def _load_jsonl(path: str, limit: int) -> List[dict]:
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
                if len(rows) >= limit:
                    break
        return rows


class Perplexity(Task):
    """Token perplexity by teacher forcing (uses LLM.score)."""

    name = "perplexity"

    def evaluate(self, llm, data_path=None, num_samples=64) -> dict:
        assert data_path, "perplexity requires --data (jsonl with 'text')"
        rows = self._load_jsonl(data_path, num_samples)
        total_lp, total_tokens = 0.0, 0
        for row in rows:
            ids = row.get("token_ids") or llm.tokenizer.encode(row["text"])
            lps = llm.score(ids)
            total_lp += float(np.sum(lps))
            total_tokens += len(lps)
        ppl = math.exp(-total_lp / max(total_tokens, 1))
        return {"task": "perplexity", "num_samples": len(rows),
                "tokens": total_tokens, "perplexity": round(ppl, 4)}


class MMLU(Task):
    """Multiple choice: generate a single letter answer.

    data jsonl rows: {"question": str, "choices": [str x4], "answer": "A".."D"}
    """

    name = "mmlu"

    PROMPT = ("{question}\n" + "\n".join(
        f"{l}. {{choices[{i}]}}" for i, l in enumerate("ABCD")) +
        "\nAnswer (A, B, C or D):")

    def evaluate(self, llm, data_path=None, num_samples=64) -> dict:
        from tensorrt_llm_tpu.llmapi import SamplingParams
        assert data_path, "mmlu requires --data"
        rows = self._load_jsonl(data_path, num_samples)
        prompts = [self.PROMPT.format(question=r["question"],
                                      choices=r["choices"]) for r in rows]
        outs = llm.generate(prompts, SamplingParams(max_tokens=4,
                                                    temperature=0.0))
        correct = 0
        for r, o in zip(rows, outs):
            m = re.search(r"[ABCD]", o.outputs[0].text)
            if m and m.group(0) == r["answer"]:
                correct += 1
        acc = 100.0 * correct / max(len(rows), 1)
        return {"task": "mmlu", "num_samples": len(rows),
                "accuracy": round(acc, 2),
                "threshold_ref75": round(compute_threshold(len(rows), 75.0), 2)}


class GSM8K(Task):
    """Grade-school math: extract the final number after '####'."""

    name = "gsm8k"

    def evaluate(self, llm, data_path=None, num_samples=64) -> dict:
        from tensorrt_llm_tpu.llmapi import SamplingParams
        assert data_path, "gsm8k requires --data"
        rows = self._load_jsonl(data_path, num_samples)
        prompts = [r["question"] + "\nAnswer step by step, then give the "
                   "final number after '####'." for r in rows]
        outs = llm.generate(prompts, SamplingParams(max_tokens=256,
                                                    temperature=0.0))
        correct = 0
        for r, o in zip(rows, outs):
            want = str(r["answer"]).replace(",", "").strip()
            m = re.findall(r"####\s*([-\d.,]+)", o.outputs[0].text)
            got = m[-1].replace(",", "").strip() if m else None
            if got == want:
                correct += 1
        acc = 100.0 * correct / max(len(rows), 1)
        return {"task": "gsm8k", "num_samples": len(rows),
                "accuracy": round(acc, 2)}


_TASKS = {t.name: t for t in (Perplexity(), MMLU(), GSM8K())}


def get_task(name: str) -> Task:
    return _TASKS[name]
