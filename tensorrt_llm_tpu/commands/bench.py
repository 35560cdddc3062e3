"""`trtllm-tpu-bench` — throughput/latency benchmark CLI.

Counterpart of the reference's `trtllm-bench` (commands/bench.py +
bench/dataclasses/reporting.py): measures output tokens/sec/chip under
continuous batching with synthetic or file-provided requests, reporting the
same headline metric as the reference's perf-overview tables.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_throughput(llm, isl: int, osl: int, num_requests: int,
                   concurrency: int, vocab: int, warmup: bool = True) -> dict:
    from tensorrt_llm_tpu.llmapi import SamplingParams

    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(10, max(vocab - 10, 11), isl))
               for _ in range(num_requests)]
    sp = SamplingParams(max_tokens=osl, ignore_eos=True)

    if warmup:
        # compile pass: full concurrency (reaches the same batch/table
        # buckets as the measured pass) but few output tokens
        wf = [llm.generate_async(p, SamplingParams(max_tokens=8,
                                                   ignore_eos=True))
              for p in prompts]
        for f in wf:
            f.result()

    t0 = time.perf_counter()
    futures = [llm.generate_async(p, sp) for p in prompts]
    results = [f.result() for f in futures]
    wall = time.perf_counter() - t0

    out_tokens = sum(len(r.outputs[0].token_ids) for r in results)
    ttfts = []
    for f, r in zip(futures, results):
        req = f.req
        if req.first_token_time and req.first_sched_time:
            ttfts.append(req.first_token_time - req.arrival_time)
    return {
        "num_requests": num_requests,
        "isl": isl,
        "osl": osl,
        "wall_s": round(wall, 3),
        "output_tokens": out_tokens,
        "output_tokens_per_sec": round(out_tokens / wall, 2),
        "requests_per_sec": round(num_requests / wall, 3),
        "mean_ttft_ms": round(float(np.mean(ttfts)) * 1e3, 1) if ttfts else None,
        "p99_ttft_ms": round(float(np.percentile(ttfts, 99)) * 1e3, 1) if ttfts else None,
    }


def main(argv=None):
    p = argparse.ArgumentParser("trtllm-tpu-bench")
    p.add_argument("--model", required=True)
    p.add_argument("--isl", type=int, default=128)
    p.add_argument("--osl", type=int, default=128)
    p.add_argument("--num-requests", type=int, default=32)
    p.add_argument("--concurrency", type=int, default=32)
    p.add_argument("--tp-size", type=int, default=1)
    p.add_argument("--quant", default=None)
    p.add_argument("--max-batch-size", type=int, default=64)
    p.add_argument("--max-seq-len", type=int, default=2048)
    args = p.parse_args(argv)

    from tensorrt_llm_tpu.llmapi import LLM

    llm = LLM(model=args.model, tensor_parallel_size=args.tp_size,
              quant_algo=args.quant, max_batch_size=args.max_batch_size,
              max_seq_len=args.max_seq_len)
    try:
        report = run_throughput(llm, args.isl, args.osl, args.num_requests,
                                args.concurrency,
                                llm.model_config.vocab_size)
        print(json.dumps(report, indent=2))
    finally:
        llm.shutdown()


if __name__ == "__main__":
    main()
