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


def _rouge_l(candidate: List[str], reference: List[str]) -> float:
    """ROUGE-L F1 over token lists (LCS-based, no external deps)."""
    m, n = len(candidate), len(reference)
    if m == 0 or n == 0:
        return 0.0
    dp = [0] * (n + 1)
    for i in range(1, m + 1):
        prev = 0
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = prev + 1 if candidate[i - 1] == reference[j - 1] \
                else max(dp[j], dp[j - 1])
            prev = cur
    lcs = dp[n]
    p, r = lcs / m, lcs / n
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


class CnnDailymail(Task):
    """Summarization scored by ROUGE-L (reference evaluate/ cnn_dailymail
    via lm_eval + ROUGE thresholds in the accuracy harness).

    data jsonl rows: {"article": str, "highlights": str}
    """

    name = "cnn_dailymail"

    def evaluate(self, llm, data_path=None, num_samples=64) -> dict:
        from tensorrt_llm_tpu.llmapi import SamplingParams
        assert data_path, "cnn_dailymail requires --data"
        rows = self._load_jsonl(data_path, num_samples)
        prompts = [f"Summarize the following article in 2-3 sentences.\n\n"
                   f"{r['article']}\n\nSummary:" for r in rows]
        outs = llm.generate(prompts, SamplingParams(max_tokens=128,
                                                    temperature=0.0))
        scores = [_rouge_l(o.outputs[0].text.lower().split(),
                           r["highlights"].lower().split())
                  for r, o in zip(rows, outs)]
        return {"task": "cnn_dailymail", "num_samples": len(rows),
                "rouge_l": round(100.0 * float(np.mean(scores)), 2)}


class JsonModeEval(Task):
    """Structured-output validity (reference evaluate/json_mode_eval):
    each row's schema constrains generation via guided decoding; score =
    % of outputs that parse as JSON AND validate against the schema.

    data jsonl rows: {"prompt": str, "schema": {...json schema...}}
    """

    name = "json_mode"

    @staticmethod
    def _validates(obj, schema) -> bool:
        t = schema.get("type")
        if t == "object":
            if not isinstance(obj, dict):
                return False
            props = schema.get("properties", {})
            for key in schema.get("required", []):
                if key not in obj:
                    return False
            return all(key not in props
                       or JsonModeEval._validates(val, props[key])
                       for key, val in obj.items())
        if t == "array":
            return isinstance(obj, list) and all(
                JsonModeEval._validates(v, schema.get("items", {}))
                for v in obj)
        if t == "string":
            return isinstance(obj, str)
        if t == "integer":
            return isinstance(obj, int) and not isinstance(obj, bool)
        if t == "number":
            return isinstance(obj, (int, float)) and \
                not isinstance(obj, bool)
        if t == "boolean":
            return isinstance(obj, bool)
        return True  # untyped: anything goes

    def evaluate(self, llm, data_path=None, num_samples=64) -> dict:
        from tensorrt_llm_tpu.llmapi import SamplingParams
        from tensorrt_llm_tpu.llmapi.sampling_params import (
            GuidedDecodingParams)
        assert data_path, "json_mode requires --data"
        rows = self._load_jsonl(data_path, num_samples)
        valid = 0
        for r in rows:
            sp = SamplingParams(
                max_tokens=128, temperature=0.0,
                guided_decoding=GuidedDecodingParams(json=r["schema"]))
            out = llm.generate([r["prompt"]], sp)[0].outputs[0].text
            try:
                obj = json.loads(out.strip().strip("\x00"))
            except json.JSONDecodeError:
                continue
            if self._validates(obj, r["schema"]):
                valid += 1
        return {"task": "json_mode", "num_samples": len(rows),
                "valid_pct": round(100.0 * valid / max(len(rows), 1), 2)}


class LongBenchRetrieval(Task):
    """Long-context retrieval (LongBench-v2-style capability probe,
    reference evaluate/ LongBench): a key fact is buried at a configurable
    depth inside filler context; score = exact recall of the fact.

    data jsonl rows: {"context": str, "question": str, "answer": str} —
    or synthesize with make_needle_rows().
    """

    name = "longbench_retrieval"

    @staticmethod
    def make_needle_rows(n: int = 8, context_tokens: int = 1500,
                         seed: int = 0) -> List[dict]:
        rng = np.random.RandomState(seed)
        rows = []
        filler = ("The sky was clear that day and the market opened "
                  "quietly. ")
        for i in range(n):
            code = int(rng.randint(1000, 9999))
            depth = float(rng.uniform(0.1, 0.9))
            n_fill = max(context_tokens // 12, 8)
            pre = int(n_fill * depth)
            ctx = (filler * pre
                   + f" The secret access code is {code}. "
                   + filler * (n_fill - pre))
            rows.append({"context": ctx,
                         "question": "What is the secret access code?",
                         "answer": str(code)})
        return rows

    def evaluate(self, llm, data_path=None, num_samples=64) -> dict:
        from tensorrt_llm_tpu.llmapi import SamplingParams
        rows = (self._load_jsonl(data_path, num_samples) if data_path
                else self.make_needle_rows(min(num_samples, 8)))
        prompts = [f"{r['context']}\n\nQuestion: {r['question']}\nAnswer:"
                   for r in rows]
        outs = llm.generate(prompts, SamplingParams(max_tokens=16,
                                                    temperature=0.0))
        correct = sum(1 for r, o in zip(rows, outs)
                      if str(r["answer"]) in o.outputs[0].text)
        return {"task": "longbench_retrieval", "num_samples": len(rows),
                "recall_pct": round(100.0 * correct / max(len(rows), 1), 2)}


_TASKS = {t.name: t for t in (Perplexity(), MMLU(), GSM8K(),
                              CnnDailymail(), JsonModeEval(),
                              LongBenchRetrieval())}


def get_task(name: str) -> Task:
    return _TASKS[name]
