"""Minimal repro of the r5 bench ABORTED: exact bench_e2e tinyllama
config (free-mem pools, max_seq_len 2064, warmup ON, k=4), one request.

Usage: python benchmarks/probe_r5_benchmin.py [decode_steps] [osl]
"""

import faulthandler
import os
import sys
import time

os.environ.setdefault("TLLM_LOG_LEVEL", "INFO")
faulthandler.dump_traceback_later(600, repeat=True)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    osl = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import numpy as np
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
    from tensorrt_llm_tpu.commands.bench import MODEL_SHAPES
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(**MODEL_SHAPES["tinyllama-1.1b"])
    t0 = time.time()
    llm = LLM(model=cfg, skip_tokenizer_init=True, quant_algo="W4A16",
              max_batch_size=8, max_seq_len=2064, max_num_tokens=2048,
              max_decode_steps=steps)
    print(f"build+warmup: {time.time()-t0:.0f}s", flush=True)
    prompt = [int(x) for x in np.random.RandomState(0).randint(
        1, cfg.vocab_size - 1, 1000)]
    t0 = time.time()
    out = llm.generate([list(prompt)], SamplingParams(
        max_tokens=osl, temperature=0.0, ignore_eos=True))
    toks = out[0].outputs[0].token_ids
    dt = time.time() - t0
    print(f"generate: {dt:.1f}s ({osl} tokens, {dt/osl*1e3:.0f} ms/tok) "
          f"toks[:4]={toks[:4]}", flush=True)
    if os.environ.get("TLLM_PROBE_REQ2") == "1":
        # second request: its PREFILL consumes cache buffers produced by
        # the first request's multi-step executables (the poison pattern?)
        p2 = [int(x) for x in np.random.RandomState(1).randint(
            1, cfg.vocab_size - 1, 1000)]
        t0 = time.time()
        out = llm.generate([list(p2)], SamplingParams(
            max_tokens=osl, temperature=0.0, ignore_eos=True))
        print(f"generate2 (prefill-after-multi): {time.time()-t0:.1f}s "
              f"toks[:4]={out[0].outputs[0].token_ids[:4]}", flush=True)
    llm.shutdown()
    print("RESULT: OK", flush=True)


if __name__ == "__main__":
    main()
