"""`trtllm-tpu-eval` — accuracy evaluation CLI.

Counterpart of the reference's `trtllm-eval` (commands/eval.py +
tensorrt_llm/evaluate/): runs a task from tensorrt_llm_tpu.evaluate against a
served model and reports the score with the statistical threshold check
(reference accuracy_core.py:42-70).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser("trtllm-tpu-eval")
    p.add_argument("--model", required=True)
    p.add_argument("--task", default="perplexity",
                   choices=["perplexity", "mmlu", "gsm8k", "cnn_dailymail",
                            "json_mode", "longbench_retrieval"])
    p.add_argument("--data", default=None, help="dataset path (jsonl)")
    p.add_argument("--num-samples", type=int, default=64)
    p.add_argument("--tp-size", type=int, default=1)
    p.add_argument("--quant", default=None)
    args = p.parse_args(argv)

    from tensorrt_llm_tpu.llmapi import LLM
    from tensorrt_llm_tpu import evaluate

    llm = LLM(model=args.model, tensor_parallel_size=args.tp_size,
              quant_algo=args.quant)
    try:
        task = evaluate.get_task(args.task)
        result = task.evaluate(llm, data_path=args.data,
                               num_samples=args.num_samples)
        print(json.dumps(result, indent=2))
    finally:
        llm.shutdown()


if __name__ == "__main__":
    main()
