"""Prompt adapters / P-tuning (reference enable_prompt_adapter,
PromptAdapterRequest, max_prompt_adapter_token): learned virtual-token
embeddings prepended to the prompt in embedding space."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

CFG = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
           num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
           max_position=256)


def _llm(**kw):
    return LLM(model=ModelConfig(**CFG), skip_tokenizer_init=True,
               max_seq_len=128, max_batch_size=4, kv_num_blocks=64,
               kv_block_size=4, seed=11, **kw)


def test_adapter_of_real_token_embeddings_matches_text():
    """Virtual tokens equal to real token embeddings must decode exactly
    like those tokens written as text — proves correct embedding-space
    splice and position handling."""
    llm = _llm()
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    emb = np.asarray(llm.engine.params["embedding"]["weight"], np.float32)
    virt = emb[[5, 6, 7]]
    try:
        want = llm.generate([[5, 6, 7, 20, 21]], sp)[0].outputs[0].token_ids
        got = llm.generate_async(
            [20, 21], sp, prompt_adapter_request=virt).result(
                timeout=120).outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_named_adapter_and_reuse_isolation():
    """Named adapters resolve from LlmArgs.prompt_adapters; identical
    token ids under different adapters must NOT share KV (salt)."""
    rng = np.random.RandomState(0)
    a = rng.randn(2, CFG["hidden_size"]).astype(np.float32) * 0.02
    b = rng.randn(2, CFG["hidden_size"]).astype(np.float32) * 0.02
    llm = _llm(prompt_adapters={"a": a, "b": b})
    sp = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    try:
        out_a = llm.generate_async([9, 9, 9, 9, 9, 9], sp,
                                   prompt_adapter_request="a").result(
                                       timeout=120).outputs[0].token_ids
        out_b = llm.generate_async([9, 9, 9, 9, 9, 9], sp,
                                   prompt_adapter_request="b").result(
                                       timeout=120).outputs[0].token_ids
        # repeat adapter-a: deterministic even with a's blocks cached
        out_a2 = llm.generate_async([9, 9, 9, 9, 9, 9], sp,
                                    prompt_adapter_request="a").result(
                                        timeout=120).outputs[0].token_ids
        assert out_a == out_a2
        with pytest.raises(ValueError):
            llm.generate_async([1], sp, prompt_adapter_request="nope")
    finally:
        llm.shutdown()


def test_adapter_validation():
    llm = _llm(max_prompt_adapter_token=2)
    sp = SamplingParams(max_tokens=2, ignore_eos=True)
    try:
        with pytest.raises(ValueError):   # too many virtual tokens
            llm.generate_async(
                [1, 2], sp,
                prompt_adapter_request=np.zeros((3, CFG["hidden_size"]),
                                                np.float32))
        with pytest.raises(ValueError):   # wrong width
            llm.generate_async(
                [1, 2], sp,
                prompt_adapter_request=np.zeros((1, 8), np.float32))
    finally:
        llm.shutdown()
