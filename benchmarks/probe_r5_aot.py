"""AOT-separated multi-step decode probe (VERDICT r4 #2).

The r4 probe could not distinguish a >4-min compile from a true runtime
hang.  Here lower / compile / execute are timed SEPARATELY via
``jit(...).lower(args).compile()`` so the phase that stalls is named.

Usage: python benchmarks/probe_r5_aot.py [backend] [layers] [k] [mode]
  backend: pallas | xla          (attention backend)
  mode:    scan | unroll         (TLLM_MULTI_STEP_UNROLL)
Run each configuration under `timeout` from the shell; the faulthandler
dump tells which phase was live when the clock ran out.
"""

import faulthandler
import os
import sys
import time

os.environ.setdefault("TLLM_LOG_LEVEL", "INFO")
faulthandler.dump_traceback_later(480, repeat=True)

import numpy as np


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    mode = sys.argv[4] if len(sys.argv) > 4 else "scan"
    if mode == "unroll":
        os.environ["TLLM_MULTI_STEP_UNROLL"] = "1"
    print(f"=== backend={backend} layers={layers} k={k} mode={mode}",
          flush=True)

    import jax
    import jax.numpy as jnp
    from tensorrt_llm_tpu.llmapi import LLM
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.runtime.sampler import SamplingState

    cfg = ModelConfig(vocab_size=32000, hidden_size=2048,
                      intermediate_size=5632, num_layers=layers,
                      num_heads=32, num_kv_heads=4, head_dim=64,
                      max_position=4096)
    llm = LLM(model=cfg, skip_tokenizer_init=True, quant_algo="W4A16",
              max_batch_size=2, max_seq_len=256, enable_warmup=False,
              attention_backend=backend)
    eng = llm.engine
    kv = eng.kv_manager
    try:
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
        local_st = np.zeros_like(st)
        _, lt = eng._locals_of(inputs)

        fn = eng._make_multi_step_fn(k)
        args = (eng.params, eng.kv_caches,
                jnp.asarray(inputs.input_ids), jnp.asarray(inputs.positions),
                jnp.asarray(st), jnp.asarray(inputs.block_tables),
                jnp.asarray(inputs.kv_lens), state,
                jnp.asarray(inputs.seq_slots),
                jnp.asarray(inputs.lora_ids),
                jnp.asarray(local_st), lt)

        t0 = time.time()
        lowered = fn.lower(*args)
        t1 = time.time()
        print(f"  lower: {t1 - t0:.1f}s", flush=True)
        compiled = lowered.compile()
        t2 = time.time()
        print(f"  compile: {t2 - t1:.1f}s", flush=True)
        toks, logps, caches = compiled(*args)
        jax.block_until_ready(toks)
        t3 = time.time()
        print(f"  execute[1]: {t3 - t2:.2f}s toks={np.asarray(toks)[:, 0]}",
              flush=True)
        # second call from the same executable (donated caches replaced)
        toks, logps, caches = compiled(
            args[0], caches, *args[2:])
        jax.block_until_ready(toks)
        print(f"  execute[2]: {time.time() - t3:.2f}s", flush=True)
        print("  RESULT: OK", flush=True)
    finally:
        llm.shutdown()


if __name__ == "__main__":
    main()
