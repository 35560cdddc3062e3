"""Engine warmup: every decode/table bucket precompiles so serving never
hits the compiler mid-run (the CUDA-graph capture analog)."""

import numpy as np

import tensorrt_llm_tpu as tllm
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig


def test_warmup_covers_table_buckets():
    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, max_position=512)
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=512,
                   max_batch_size=4, kv_num_blocks=256, kv_block_size=8,
                   max_decode_steps=4, enable_warmup=True, seed=0)
    try:
        compiled = set(llm.engine._fns.keys())
        # the fused multi-step executable must be warmed
        assert ("multi", 4) in compiled, compiled
        n_before = len(compiled)
        # a long generation crossing table buckets must not add executables
        out = llm.generate([1, 2, 3], tllm.SamplingParams(
            max_tokens=200, temperature=0.0, ignore_eos=True))
        assert len(out[0].outputs[0].token_ids) == 200
        assert len(llm.engine._fns) == n_before, (
            set(llm.engine._fns) - compiled)
    finally:
        llm.shutdown()


def test_warmup_multi_step_stays_inside_block_tables(monkeypatch):
    """r5 on-chip root cause: warmup ran the k-step variant at
    L = bucket_cap - 1 without growing the sequence, so steps 2..k
    indexed past the block table (an out-of-range scalar-prefetch DMA
    that wedged the chip).  Assert every warmup multi call keeps
    L + k - 1 within both the grown sequence and the table bucket."""
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine

    calls = []
    orig = ModelEngine.run_decode_multi

    def checked(self, inputs, num_steps, state, slot_table,
                local_slot_table=None):
        kv_lens = np.asarray(inputs.kv_lens)
        table_w = np.asarray(inputs.block_tables).shape[1]
        cap = table_w * self.kv_manager.block_size
        assert int(kv_lens.max()) + num_steps - 1 <= cap, (
            int(kv_lens.max()), num_steps, cap)
        calls.append(num_steps)
        return orig(self, inputs, num_steps, state, slot_table,
                    local_slot_table)

    monkeypatch.setattr(ModelEngine, "run_decode_multi", checked)
    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, max_position=512)
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=512,
                   max_batch_size=4, kv_num_blocks=256, kv_block_size=8,
                   max_decode_steps=4, enable_warmup=True, seed=0)
    llm.shutdown()
    assert calls, "warmup never exercised the multi-step variant"
