"""Pre-quantized HF checkpoint ingestion (AWQ/GPTQ).

The packers here are written independently from the autoawq / AutoGPTQ
sources' documented semantics (nibble orders, zero offsets) and act as the
ground truth: unpack(pack(x)) must reproduce x exactly, and a full tiny-Llama
AWQ checkpoint must load into the LLM with bit-exact dequantized weights
(reference capability: _torch/modules/linear.py:1618-1692).
"""

import json

import numpy as np
import pytest

from tensorrt_llm_tpu.quantization.hf_ingest import (
    AWQ_ORDER, QTensor, maybe_load_quantized, quant_config_from_hf,
    unpack_awq, unpack_gptq, wcat)


# ---- reference packers (independent implementations) ------------------------
def pack_awq_words(u4_cols: np.ndarray) -> np.ndarray:
    """[R, C] uint4 -> int32 [R, C/8]; nibble i holds column AWQ_ORDER[i]."""
    R, C = u4_cols.shape
    out = np.zeros((R, C // 8), np.uint32)
    for i, m in enumerate(AWQ_ORDER):
        out |= u4_cols[:, m::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def pack_gptq_qweight(u4_rows: np.ndarray) -> np.ndarray:
    """[K, N] uint4 -> int32 [K/8, N]; nibble i holds row r*8+i."""
    K, N = u4_rows.shape
    out = np.zeros((K // 8, N), np.uint32)
    for i in range(8):
        out |= u4_rows[i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def pack_gptq_qzeros(z_u: np.ndarray, v2: bool = False) -> np.ndarray:
    """[K/G, N] uint4 zeros -> int32 [K/G, N/8] natural order, storing z-1
    (classic GPTQ) unless v2."""
    store = z_u if v2 else ((z_u.astype(np.int32) - 1) & 0xF)
    R, C = store.shape
    out = np.zeros((R, C // 8), np.uint32)
    for i in range(8):
        out |= store[:, i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def _random_quant(rng, K, N, G):
    q_u = rng.integers(0, 16, (K, N), np.uint8)
    z_u = rng.integers(0, 16, (K // G, N), np.uint8)
    s = (rng.random((K // G, N), np.float32) + 0.05).astype(np.float32)
    ref = ((q_u.astype(np.float32).reshape(K // G, G, N)
            - z_u[:, None, :]) * s[:, None, :]).reshape(K, N)
    return q_u, z_u, s, ref


def test_unpack_awq_exact():
    rng = np.random.default_rng(0)
    K, N, G = 64, 32, 16
    q_u, z_u, s, ref = _random_quant(rng, K, N, G)
    qt = unpack_awq(pack_awq_words(q_u), pack_awq_words(z_u), s)
    np.testing.assert_array_equal(qt.q, q_u.astype(np.int16) - 8)
    np.testing.assert_array_equal(qt.zeros, z_u.astype(np.float32) - 8.0)
    np.testing.assert_allclose(qt.dequant(), ref, rtol=0, atol=0)


@pytest.mark.parametrize("v2", [False, True])
def test_unpack_gptq_exact(v2):
    rng = np.random.default_rng(1)
    K, N, G = 64, 32, 32
    q_u, z_u, s, ref = _random_quant(rng, K, N, G)
    g_idx = np.arange(K, dtype=np.int32) // G
    qt = unpack_gptq(pack_gptq_qweight(q_u), pack_gptq_qzeros(z_u, v2), s,
                     g_idx, v2=v2)
    np.testing.assert_allclose(qt.dequant(), ref, rtol=0, atol=0)


def test_gptq_act_order_rejected():
    rng = np.random.default_rng(2)
    K, N, G = 64, 32, 32
    q_u, z_u, s, _ = _random_quant(rng, K, N, G)
    g_idx = rng.permutation(np.arange(K, dtype=np.int32) // G)
    with pytest.raises(NotImplementedError):
        unpack_gptq(pack_gptq_qweight(q_u), pack_gptq_qzeros(z_u), s, g_idx)


def test_qtensor_slice_and_cat():
    rng = np.random.default_rng(3)
    q_u, z_u, s, ref = _random_quant(rng, 32, 64, 16)
    qt = QTensor((q_u.astype(np.int16) - 8).astype(np.int8),
                 s, z_u.astype(np.float32) - 8.0)
    left, right = qt[:, 0:40], qt[:, 40:64]
    cat = wcat([left, right], axis=1)
    np.testing.assert_allclose(cat.dequant(), ref, rtol=0, atol=0)
    with pytest.raises(AssertionError):
        qt[0:2, :]  # K slicing would split scale groups


def test_quant_config_from_hf():
    out = quant_config_from_hf({"quant_method": "awq", "bits": 4,
                                "group_size": 64, "version": "GEMM",
                                "modules_to_not_convert": ["lm_head"]})
    assert out["algo"] == "W4A16_AWQ" and out["group_size"] == 64
    assert out["format"] == "awq" and out["exclude_modules"] == ("lm_head",)
    assert quant_config_from_hf({"quant_method": "fp8"}) is None
    assert quant_config_from_hf(None) is None
    with pytest.raises(NotImplementedError):
        quant_config_from_hf({"quant_method": "gptq", "bits": 8})


# ---- end-to-end: tiny AWQ llama checkpoint ----------------------------------
H, HEADS, KVH, D, I, V, G = 64, 4, 2, 16, 128, 256, 32


def _write_awq_checkpoint(dirpath):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(7)
    tensors = {}
    expected = {}   # name -> exact dequantized [in, out] f32

    def add_linear(base, K, N):
        q_u = rng.integers(0, 16, (K, N), np.uint8)
        z_u = rng.integers(0, 16, (K // G, N), np.uint8)
        s = (rng.random((K // G, N), np.float32) * 0.1 + 0.01).astype(
            np.float16)
        tensors[base + ".qweight"] = pack_awq_words(q_u)
        tensors[base + ".qzeros"] = pack_awq_words(z_u)
        tensors[base + ".scales"] = s
        sf = s.astype(np.float32)
        expected[base] = ((q_u.astype(np.float32).reshape(K // G, G, N)
                           - z_u[:, None, :]) * sf[:, None, :]).reshape(K, N)

    tensors["model.embed_tokens.weight"] = (
        rng.standard_normal((V, H)).astype(np.float16) * 0.02)
    tensors["model.norm.weight"] = np.ones((H,), np.float16)
    tensors["lm_head.weight"] = (
        rng.standard_normal((V, H)).astype(np.float16) * 0.02)
    for i in range(2):
        pre = f"model.layers.{i}."
        tensors[pre + "input_layernorm.weight"] = np.ones((H,), np.float16)
        tensors[pre + "post_attention_layernorm.weight"] = np.ones(
            (H,), np.float16)
        add_linear(pre + "self_attn.q_proj", H, HEADS * D)
        add_linear(pre + "self_attn.k_proj", H, KVH * D)
        add_linear(pre + "self_attn.v_proj", H, KVH * D)
        add_linear(pre + "self_attn.o_proj", HEADS * D, H)
        add_linear(pre + "mlp.gate_proj", H, I)
        add_linear(pre + "mlp.up_proj", H, I)
        add_linear(pre + "mlp.down_proj", I, H)
    save_file(tensors, str(dirpath / "model.safetensors"))

    config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": 2, "num_attention_heads": HEADS,
        "num_key_value_heads": KVH, "head_dim": D,
        "vocab_size": V, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "torch_dtype": "float16",
        "quantization_config": {
            "quant_method": "awq", "bits": 4, "group_size": G,
            "version": "GEMM", "zero_point": True,
            "modules_to_not_convert": None,
        },
    }
    (dirpath / "config.json").write_text(json.dumps(config))
    return expected


@pytest.mark.slow
def test_awq_checkpoint_end_to_end(tmp_path):
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
    from tensorrt_llm_tpu.quantization import QuantAlgo
    from tensorrt_llm_tpu.quantization.quantize import dequantize_w4_any

    expected = _write_awq_checkpoint(tmp_path)
    llm = LLM(model=str(tmp_path), skip_tokenizer_init=True, max_seq_len=128,
              max_batch_size=4, kv_num_blocks=64, kv_block_size=8)
    try:
        assert llm.model_config.quant.quant_algo == QuantAlgo.W4A16_AWQ
        assert llm.model_config.quant.group_size == G

        # loaded packed weights must dequantize bit-exactly to the
        # checkpoint's values (fused qkv: q|k|v concat at tp=1)
        lp = llm.engine.params["layers"][0]
        qkv = lp["attn"]["qkv"]
        got = np.asarray(dequantize_w4_any(
            qkv["qweight"], qkv["scales"], qkv.get("zeros")))
        pre = "model.layers.0.self_attn."
        want = np.concatenate([expected[pre + "q_proj"],
                               expected[pre + "k_proj"],
                               expected[pre + "v_proj"]], axis=1)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

        down = lp["mlp"]["down"]
        got = np.asarray(dequantize_w4_any(
            down["qweight"], down["scales"], down.get("zeros")))
        np.testing.assert_allclose(
            got, expected["model.layers.0.mlp.down_proj"], rtol=0, atol=0)

        out = llm.generate([[1, 2, 3]],
                           SamplingParams(max_tokens=4, ignore_eos=True))
        assert len(out[0].outputs[0].token_ids) == 4
    finally:
        llm.shutdown()
