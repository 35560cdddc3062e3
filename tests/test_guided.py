"""Guided decoding (choice matcher) tests."""

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.llmapi.sampling_params import GuidedDecodingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256)


class CharTokenizer:
    eos_token_id = 0
    bos_token_id = None
    chat_template = None

    def encode(self, text):
        return [max(1, ord(c) % 256) for c in text] or [1]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(i) if 0 < i < 128 else "" for i in ids)


@pytest.fixture(scope="module")
def llm():
    llm = LLM(model=ModelConfig(**TINY), tokenizer=CharTokenizer(),
              max_seq_len=128, max_batch_size=8, kv_num_blocks=128,
              kv_block_size=8)
    yield llm
    llm.shutdown()


def test_choice_constrained_output(llm):
    choices = ["yes", "no"]
    out = llm.generate(
        "anything",
        SamplingParams(max_tokens=10, temperature=1.0,
                       guided_decoding=GuidedDecodingParams(choice=choices)))[0]
    text = out.outputs[0].text
    assert text in choices, text
    assert out.outputs[0].finish_reason == "stop"


def test_choice_greedy(llm):
    choices = ["abc", "abd", "xyz"]
    out = llm.generate(
        "q", SamplingParams(max_tokens=10, temperature=0.0,
                            guided_decoding=GuidedDecodingParams(
                                choice=choices)))[0]
    assert out.outputs[0].text in choices


def test_unguided_unaffected(llm):
    out = llm.generate("hello", SamplingParams(max_tokens=5, ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 5
