import time
import numpy as np
import tensorrt_llm_tpu as tllm
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.quantization import QuantAlgo, QuantConfig

cfg = ModelConfig(
    architecture="LlamaForCausalLM", vocab_size=32000, hidden_size=2048,
    intermediate_size=5632, num_layers=22, num_heads=32, num_kv_heads=4,
    head_dim=64, max_position=2048,
    quant=QuantConfig(quant_algo=QuantAlgo.W4A16, group_size=128))
llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=512,
               max_batch_size=16, kv_num_blocks=512, kv_block_size=16,
               max_decode_steps=8, seed=0)
rng = np.random.RandomState(0)
prompts = [list(rng.randint(10, 31000, 64)) for _ in range(8)]
sp = tllm.SamplingParams(max_tokens=64, ignore_eos=True)
fw = [llm.generate_async(p, tllm.SamplingParams(max_tokens=8, ignore_eos=True)) for p in prompts]
for f in fw: f.result()
t0 = time.perf_counter()
futs = [llm.generate_async(p, sp) for p in prompts]
res = [f.result() for f in futs]
wall = time.perf_counter() - t0
out_toks = sum(len(r.outputs[0].token_ids) for r in res)
print(f"TinyLlama-1.1B W4A16 on v5e (tunneled): {out_toks} tokens in {wall:.2f}s = {out_toks/wall:.1f} tok/s")
llm.shutdown()
