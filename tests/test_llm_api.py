"""LLM API tests (ModelConfig path, token-id prompts, streaming, batch)."""

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256)


@pytest.fixture(scope="module")
def llm():
    cfg = ModelConfig(**TINY)
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
              max_batch_size=8, kv_num_blocks=128, kv_block_size=8)
    yield llm
    llm.shutdown()


def test_generate_token_ids(llm):
    out = llm.generate([3, 4, 5], SamplingParams(max_tokens=6, ignore_eos=True))
    assert len(out) == 1
    assert len(out[0].outputs[0].token_ids) == 6
    assert out[0].finished


def test_generate_batch(llm):
    prompts = [[1, 2, 3], [7, 8], [9, 10, 11, 12]]
    outs = llm.generate(prompts, SamplingParams(max_tokens=4, ignore_eos=True))
    assert len(outs) == 3
    for o in outs:
        assert len(o.outputs[0].token_ids) == 4


def test_streaming(llm):
    fut = llm.generate_async([5, 6], SamplingParams(max_tokens=5,
                                                    ignore_eos=True),
                             streaming=True)
    seen = []
    for out in fut:
        seen.append(len(out.outputs[0].token_ids))
    assert seen[-1] == 5
    assert seen == sorted(seen)


def test_logprobs(llm):
    out = llm.generate([3, 1, 2],
                       SamplingParams(max_tokens=3, ignore_eos=True,
                                      logprobs=1))[0]
    assert out.outputs[0].logprobs and len(out.outputs[0].logprobs) == 3


def test_stats(llm):
    llm.generate([4, 4], SamplingParams(max_tokens=2, ignore_eos=True))
    stats = llm.get_stats()
    assert stats
    kv_stats = llm.get_kv_cache_stats()
    assert kv_stats["num_blocks"] == 128


def test_stream_interval_batches_pieces():
    """stream_interval=3: first token and finish always emit; middle
    emissions batch into every 3rd token (reference
    TorchLlmArgs.stream_interval, py_executor.py:2743)."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      max_position=256)
    # max_decode_steps=1: fused multi-step already batches tokens per
    # chunk; single-step isolates the interval gating itself
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=2, kv_num_blocks=32, kv_block_size=8,
                   seed=0, stream_interval=3, max_decode_steps=1)
    try:
        pieces = []
        for ev in llm.generate_async(
                [5, 9, 17], tllm.SamplingParams(
                    max_tokens=7, temperature=0.0, ignore_eos=True),
                streaming=True):
            pieces.append(len(ev.outputs[0].token_ids))
        # cumulative counts: 1 (first), 3, 6, 7 (finish)
        assert pieces == [1, 3, 6, 7], pieces

        # non-streaming unaffected
        out = llm.generate([[5, 9, 17]], tllm.SamplingParams(
            max_tokens=5, temperature=0.0, ignore_eos=True))
        assert len(out[0].outputs[0].token_ids) == 5
    finally:
        llm.shutdown()
