"""Isolate the multi-step decode ABORTED failure on the real chip (r4).

smoke2 (TLLM_SYNC_DISPATCH=1) pinned the r3 FAILED_PRECONDITION to the
fused multi-step executable: single-step decode runs, the k-step
lax.scan variant aborts at runtime.  Bisect: k=2 vs 4, Pallas vs XLA
attention backend, with/without on-device sampling state variety.
"""

import faulthandler
import os
import sys
import time

os.environ.setdefault("TLLM_LOG_LEVEL", "INFO")
faulthandler.dump_traceback_later(240, repeat=True)

import numpy as np


def build(attn="pallas", layers=22):
    from tensorrt_llm_tpu.llmapi import LLM
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    cfg = ModelConfig(vocab_size=32000, hidden_size=2048,
                      intermediate_size=5632, num_layers=layers,
                      num_heads=32, num_kv_heads=4, head_dim=64,
                      max_position=4096)
    return LLM(model=cfg, skip_tokenizer_init=True, quant_algo="W4A16",
               max_batch_size=2, max_seq_len=256, enable_warmup=False,
               attention_backend=attn)


def try_multi(llm, k):
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    from tensorrt_llm_tpu.runtime.sampler import SamplingState
    import jax
    eng = llm.engine
    kv = eng.kv_manager
    L = 30
    req = LlmRequest([1] * L, SamplingParams(max_tokens=1))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    kv.grow_sequence(req.request_id, L + k - 1)
    reqs = [req] * 2
    inputs = eng.prepare_decode_inputs(reqs, extra_tokens=k - 1)
    B = len(inputs.input_ids)
    st = np.zeros((k, B), np.int32)
    for j in range(k):
        st[j] = kv.slot_mapping(req.request_id, L - 1, k)[j]
    state = SamplingState.from_params(
        [req.sampling_params] * len(reqs), step=0, pad_to=B)
    t0 = time.time()
    try:
        toks, logps = eng.run_decode_multi(inputs, k, state, st)
        jax.block_until_ready(toks)
        print(f"  k={k}: OK ({time.time()-t0:.1f}s) toks={np.asarray(toks)[:, 0]}",
              flush=True)
        ok = True
    except Exception as e:  # noqa: BLE001
        print(f"  k={k}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        ok = False
    kv.free_sequence(req.request_id)
    return ok


def try_single(llm):
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    import jax
    eng = llm.engine
    kv = eng.kv_manager
    L = 30
    req = LlmRequest([1] * L, SamplingParams(max_tokens=1))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    kv.grow_sequence(req.request_id, L)
    inputs = eng.prepare_decode_inputs([req] * 2)
    try:
        logits = eng.run_decode(inputs)
        jax.block_until_ready(logits)
        print("  single-step decode: OK", flush=True)
        ok = True
    except Exception as e:  # noqa: BLE001
        print(f"  single-step decode: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        ok = False
    kv.free_sequence(req.request_id)
    return ok


def try_prefill(llm):
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    import jax
    eng = llm.engine
    kv = eng.kv_manager
    req = LlmRequest([1] * 64, SamplingParams(max_tokens=1))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    kv.grow_sequence(req.request_id, 64)
    try:
        logits = eng.run_prefill(eng.prepare_prefill_inputs(req, 64))
        jax.block_until_ready(logits)
        print("  prefill: OK", flush=True)
        ok = True
    except Exception as e:  # noqa: BLE001
        print(f"  prefill: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        ok = False
    kv.free_sequence(req.request_id)
    return ok


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    print(f"=== backend={which} layers={layers}", flush=True)
    llm = build(which, layers)
    try:
        try_single(llm)
        try_multi(llm, 2)
        try_multi(llm, 4)
        # r5: the bench dies at the FIRST prefill AFTER warmup ran the
        # multi-step variant — i.e. when another executable consumes the
        # multi executable's donated cache outputs.  Probe that order.
        print("  --- single/prefill AFTER multi (donated-cache handoff)",
              flush=True)
        try_single(llm)
        try_prefill(llm)
    finally:
        llm.shutdown()


if __name__ == "__main__":
    main()
