"""Stage-by-stage isolation of the r5 bench-scale abort.

Builds the exact bench engine (warmup on, k=4), then drives prefill /
host-sample / decode / chain MANUALLY with a device fetch after every
stage, so the aborting program is named by the first failing fetch.

Usage: python benchmarks/probe_r5_stage.py [decode_steps]
"""

import os
import sys
import time

os.environ.setdefault("TLLM_LOG_LEVEL", "INFO")

import numpy as np


def fetch(name, arr):
    import jax
    t0 = time.time()
    try:
        jax.block_until_ready(arr)
        v = np.asarray(arr)
        print(f"  {name}: OK ({time.time()-t0:.1f}s) "
              f"shape={getattr(v, 'shape', None)}", flush=True)
        return v
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        raise SystemExit(1)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
    from tensorrt_llm_tpu.commands.bench import MODEL_SHAPES
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.runtime.sampler import (SamplingState,
                                                  sample_tokens)

    cfg = ModelConfig(**MODEL_SHAPES["tinyllama-1.1b"])
    llm = LLM(model=cfg, skip_tokenizer_init=True, quant_algo="W4A16",
              max_batch_size=8, max_seq_len=2064, max_num_tokens=2048,
              max_decode_steps=steps)
    # stop the executor loop so nothing else dispatches
    llm.executor._shutdown.set()
    time.sleep(0.3)
    eng, kv = llm.engine, llm.kv_manager
    print("warmup finished; manual stages:", flush=True)

    prompt = [int(x) for x in np.random.RandomState(0).randint(
        1, cfg.vocab_size - 1, 1000)]
    req = LlmRequest(list(prompt), SamplingParams(max_tokens=4,
                                                  temperature=0.0,
                                                  ignore_eos=True))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    req.start_context()
    kv.grow_sequence(req.request_id, 1000)
    logits = eng.run_prefill(eng.prepare_prefill_inputs(req, 1000))
    logits_h = fetch("prefill_logits", logits)

    state = SamplingState.from_params([req.sampling_params], step=0,
                                      pad_to=logits_h.shape[0])
    toks, logp = sample_tokens(logits_h, state)
    fetch("host_sample", toks)
    req.context_position = 1000
    req.finish_context()
    req.append_token(int(np.asarray(toks)[0]))

    kv.grow_sequence(req.request_id, req.num_tokens)
    dec = eng.run_decode(eng.prepare_decode_inputs([req]))
    fetch("decode_logits", dec)

    k = max(2, steps)
    kv.grow_sequence(req.request_id, req.num_tokens + k - 1)
    inputs = eng.prepare_decode_inputs([req], extra_tokens=k - 1)
    B = len(inputs.input_ids)
    st = np.zeros((k, B), np.int32)
    for j in range(k):
        st[j] = kv.slot_mapping(req.request_id, req.num_tokens - 1, k)[j]
    mstate = SamplingState.from_params(
        [req.sampling_params] * 1, step=0, pad_to=B)
    toks2, _ = eng.run_decode_multi(inputs, k, mstate, st)
    fetch("chain_multi", toks2)

    # and once more with SENTINEL slots (the warmup pattern)
    st2 = np.full((k, B), np.int64(2 ** 30), np.int32)
    toks3, _ = eng.run_decode_multi(inputs, k, mstate, st2)
    fetch("chain_multi_sentinel", toks3)

    # a prefill AFTER the sentinel multi
    req2 = LlmRequest([2] * 512, SamplingParams(max_tokens=1))
    kv.add_sequence(req2.request_id, req2.prompt_token_ids)
    kv.grow_sequence(req2.request_id, 512)
    lg2 = eng.run_prefill(eng.prepare_prefill_inputs(req2, 512))
    fetch("prefill_after_sentinel", lg2)

    print("RESULT: OK", flush=True)


if __name__ == "__main__":
    main()
