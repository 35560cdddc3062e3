"""INT8 KV cache: accuracy vs BF16 KV."""

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.ops import attention_xla as axla

TINY = dict(vocab_size=128, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256)


def test_quantize_kv_roundtrip():
    import jax.numpy as jnp
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 64), jnp.bfloat16)
    q, s = axla.quantize_kv_token(x)
    deq = q.astype(np.float32) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x, np.float32)).max()
    assert err <= np.abs(np.asarray(x, np.float32)).max() / 127 + 1e-3


def test_int8_kv_write_and_gather():
    import jax.numpy as jnp
    NB, H, BS, D = 5, 2, 8, 32
    kc = (jnp.zeros((NB, H, BS, D), jnp.int8), jnp.zeros((NB, H, BS), jnp.float32))
    vc = (jnp.zeros((NB, H, BS, D), jnp.int8), jnp.zeros((NB, H, BS), jnp.float32))
    k_new = jax.random.normal(jax.random.PRNGKey(1), (6, H, D), jnp.bfloat16)
    v_new = jax.random.normal(jax.random.PRNGKey(2), (6, H, D), jnp.bfloat16)
    slots = jnp.asarray(np.array([8, 9, 10, 11, 12, 13], np.int32))  # block 1
    kc, vc = axla.write_kv_cache(kc, vc, k_new, v_new, slots)
    got = axla.gather_dequant(kc, jnp.asarray([1]))[0]  # [H, BS, D]
    ref = np.asarray(k_new, np.float32)  # tokens 0..5 at offsets 0..5
    for t in range(6):
        np.testing.assert_allclose(np.asarray(got[:, t], np.float32), ref[t],
                                   atol=np.abs(ref).max() / 100)


def test_int8_kv_end_to_end_close_to_bf16():
    cfg = ModelConfig(**TINY)
    prompt = list(np.random.RandomState(0).randint(1, 127, 16))

    def run(kv_quant):
        llm = LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
                  max_seq_len=128, max_batch_size=4, kv_num_blocks=64,
                  kv_block_size=8, kv_cache_quant=kv_quant, seed=3)
        try:
            out = llm.generate(list(prompt), SamplingParams(
                max_tokens=8, temperature=0.0, ignore_eos=True))
            return out[0].outputs[0].token_ids
        finally:
            llm.shutdown()

    bf16 = run("NONE")
    int8 = run("INT8")
    # int8 KV introduces small perturbations; require a long common prefix
    common = 0
    for a, b in zip(bf16, int8):
        if a != b:
            break
        common += 1
    assert common >= 4, (bf16, int8)


def test_fp8_kv_end_to_end_close_to_bf16():
    """FP8 (e4m3) KV pools: same harness as INT8 (reference KvCacheDataType::FP8)."""
    prompt = list(np.random.RandomState(4).randint(1, 127, 16))

    def run(kv_quant):
        llm = LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
                  max_seq_len=128, max_batch_size=4, kv_num_blocks=64,
                  kv_block_size=8, kv_cache_quant=kv_quant, seed=3)
        try:
            out = llm.generate(list(prompt), SamplingParams(
                max_tokens=8, temperature=0.0, ignore_eos=True))
            return out[0].outputs[0].token_ids
        finally:
            llm.shutdown()

    bf16 = run("NONE")
    fp8 = run("FP8")
    common = 0
    for a, b in zip(bf16, fp8):
        if a != b:
            break
        common += 1
    assert common >= 4, (bf16, fp8)
