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
