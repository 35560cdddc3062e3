"""Stop strings + penalties + sampler unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.runtime.sampler import apply_penalties

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
        return "".join(chr(i) if 0 < i < 128 else "?" for i in ids)


@pytest.fixture(scope="module")
def llm():
    llm = LLM(model=ModelConfig(**TINY), tokenizer=CharTokenizer(),
              max_seq_len=128, max_batch_size=8, kv_num_blocks=128,
              kv_block_size=8)
    yield llm
    llm.shutdown()


def test_apply_penalties_op():
    logits = jnp.asarray(np.array([[2.0, -1.0, 0.5, 0.0]], np.float32))
    counts = jnp.asarray(np.array([[3, 1, 0, 0]], np.int32))
    out = np.asarray(apply_penalties(
        logits, counts,
        jnp.asarray([2.0]), jnp.asarray([0.1]), jnp.asarray([0.05])))
    # token0: 2.0/2 - 0.1 - 0.05*3 = 0.75; token1: -1*2 - 0.1 - 0.05 = -2.15
    np.testing.assert_allclose(out[0, 0], 0.75, atol=1e-5)
    np.testing.assert_allclose(out[0, 1], -2.15, atol=1e-5)
    np.testing.assert_allclose(out[0, 2], 0.5, atol=1e-5)


def test_repetition_penalty_reduces_repeats(llm):
    # with a huge repetition penalty, greedy decode shouldn't emit the same
    # token many times in a row
    out_plain = llm.generate([7, 7, 7], SamplingParams(
        max_tokens=12, temperature=0.0, ignore_eos=True))[0].outputs[0].token_ids
    out_pen = llm.generate([7, 7, 7], SamplingParams(
        max_tokens=12, temperature=0.0, ignore_eos=True,
        repetition_penalty=5.0))[0].outputs[0].token_ids
    assert len(set(out_pen)) >= len(set(out_plain))
    assert len(set(out_pen)) > 1


def test_stop_string(llm):
    # find what greedy produces, then stop on a substring of it
    probe = llm.generate("ab", SamplingParams(
        max_tokens=6, temperature=0.0, ignore_eos=True))[0].outputs[0]
    assert len(probe.text) > 0
    stop = probe.text[1:3]
    out = llm.generate("ab", SamplingParams(
        max_tokens=20, temperature=0.0, ignore_eos=True,
        stop=[stop]))[0].outputs[0]
    assert out.finish_reason == "stop_string"
    assert stop not in out.text  # trimmed by default
    out2 = llm.generate("ab", SamplingParams(
        max_tokens=20, temperature=0.0, ignore_eos=True, stop=[stop],
        include_stop_str_in_output=True))[0].outputs[0]
    assert stop in out2.text


def test_logit_controls():
    """min_tokens / bad_words / logit_bias / no_repeat_ngram /
    logits_processor (reference sampling_params coverage)."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, max_position=256)
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
                   max_batch_size=8, kv_num_blocks=128, kv_block_size=8,
                   seed=0)
    try:
        prompt = [3, 5, 3, 5, 7]
        base = llm.generate(list(prompt), tllm.SamplingParams(
            max_tokens=10, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids

        # logit_bias dominates everything when huge
        got = llm.generate(list(prompt), tllm.SamplingParams(
            max_tokens=4, temperature=0.0, ignore_eos=True,
            logit_bias={41: 1e9}))[0].outputs[0].token_ids
        assert got == [41, 41, 41, 41], got

        # bad_words: ban the single token the base run picks first
        got = llm.generate(list(prompt), tllm.SamplingParams(
            max_tokens=1, temperature=0.0, ignore_eos=True,
            bad_words=[[base[0]]]))[0].outputs[0].token_ids
        assert got[0] != base[0]

        # min_tokens suppresses a stop id that would otherwise fire
        got = llm.generate(list(prompt), tllm.SamplingParams(
            max_tokens=6, temperature=0.0, min_tokens=6,
            stop_token_ids=[base[0]],
            logit_bias={base[0]: 1e9}))[0].outputs[0].token_ids
        assert len(got) == 6

        # no_repeat_ngram_size=1: every token distinct
        got = llm.generate(list(prompt), tllm.SamplingParams(
            max_tokens=8, temperature=0.0, ignore_eos=True,
            no_repeat_ngram_size=1))[0].outputs[0].token_ids
        assert len(set(got)) == len(got), got

        # user logits processor forces a fixed token
        def proc(toks, logits):
            logits[:] = -1e30
            logits[13] = 0.0
            return logits
        got = llm.generate(list(prompt), tllm.SamplingParams(
            max_tokens=3, temperature=0.0, ignore_eos=True,
            logits_processor=proc))[0].outputs[0].token_ids
        assert got == [13, 13, 13], got
    finally:
        llm.shutdown()
