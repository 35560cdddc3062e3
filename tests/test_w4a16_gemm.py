"""W4A16 fused GEMM correctness tests.

Tolerance model follows the reference's weight-only kernel test
(`cpp/tests/unit_tests/kernels/weightOnly/weightOnlyKernelTest.cpp:70-107`):
``max_diff <= max_val * quant_scale * mult`` with quant_scale = 1/2^(bits-1)
(=1/8 for INT4) and mult = 3.0 for bf16 activations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul, w4a16_matmul_xla
from tensorrt_llm_tpu.quantization import (
    dequantize_w4,
    pack_w4,
    quantize_w4,
    unpack_w4,
)

QUANT_SCALE_W4 = 1.0 / 8.0
BF16_MULT = 3.0


def make_case(key, M, K, N, group_size, symmetric):
    from tensorrt_llm_tpu.quantization import pack_group_for
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.1
    q, scales, zeros = quantize_w4(w, group_size, symmetric=symmetric)
    packed = pack_w4(q, pack_group_for(K, scales.shape[0]))
    return x, w, q, packed, scales, zeros


def ref_out(x, packed, scales, zeros):
    wdq = dequantize_w4(packed, scales, zeros)
    return np.asarray(x, np.float32) @ np.asarray(wdq, np.float32)


def check(out, ref):
    ref_max = np.abs(ref).max()
    tol = ref_max * QUANT_SCALE_W4 * BF16_MULT
    diff = np.abs(np.asarray(out, np.float32) - ref).max()
    assert diff <= tol, f"max diff {diff} > tol {tol}"


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(0)
    q = jax.random.randint(key, (256, 512), -8, 8, jnp.int8)
    packed = pack_w4(q)
    assert packed.shape == (128, 512)
    assert np.array_equal(np.asarray(unpack_w4(packed)), np.asarray(q))


def test_quantize_dequantize_close():
    w = jax.random.normal(jax.random.PRNGKey(1), (512, 256), jnp.float32)
    for symmetric in (True, False):
        q, s, z = quantize_w4(w, 128, symmetric=symmetric)
        wdq = dequantize_w4(pack_w4(q), s, z)
        # per-group quant error bounded by scale/2
        G = 128
        smax = np.asarray(s).repeat(G, axis=0)
        err = np.abs(np.asarray(wdq) - np.asarray(w))
        assert (err <= smax * 0.51 + 1e-6).all()


@pytest.mark.parametrize("M", [1, 16, 100, 256])
@pytest.mark.parametrize("symmetric", [True, False])
def test_w4a16_matmul_xla_vs_fp32(M, symmetric):
    x, w, q, packed, scales, zeros = make_case(
        jax.random.PRNGKey(2), M, 512, 512, 128, symmetric)
    out = w4a16_matmul_xla(x, packed, scales, zeros)
    check(out, ref_out(x, packed, scales, zeros))


@pytest.mark.parametrize("M,K,N", [(16, 512, 512), (1, 1024, 256), (64, 512, 1024)])
@pytest.mark.parametrize("symmetric", [True, False])
def test_w4a16_pallas_interpret_vs_fp32(M, K, N, symmetric):
    x, w, q, packed, scales, zeros = make_case(
        jax.random.PRNGKey(3), M, K, N, 128, symmetric)
    out = w4a16_matmul(x, packed, scales, zeros, interpret=True)
    ref = ref_out(x, packed, scales, zeros)
    check(out, ref)
    # kernel must agree with the XLA path much tighter than with fp32
    out_xla = w4a16_matmul_xla(x, packed, scales, zeros)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_xla, np.float32),
        rtol=2e-2, atol=2e-2 * np.abs(ref).max())


def test_w4a16_pallas_per_channel():
    # per-channel scales: group_size == K
    x, w, q, packed, scales, zeros = make_case(
        jax.random.PRNGKey(4), 16, 512, 512, -1, True)
    assert scales.shape[0] == 1
    out = w4a16_matmul(x, packed, scales, interpret=True)
    check(out, ref_out(x, packed, scales, None))


def test_w4a16_pallas_bias_silu():
    x, w, q, packed, scales, zeros = make_case(
        jax.random.PRNGKey(5), 16, 512, 512, 128, True)
    bias = jax.random.normal(jax.random.PRNGKey(6), (512,), jnp.float32)
    out = w4a16_matmul(x, packed, scales, bias=bias, activation="silu",
                       interpret=True)
    ref = ref_out(x, packed, scales, None) + np.asarray(bias)
    ref = ref / (1 + np.exp(-ref)) * 1.0  # silu
    check(out, ref)


def test_w4a16_batched_leading_dims():
    x, w, q, packed, scales, zeros = make_case(
        jax.random.PRNGKey(7), 8, 512, 512, 128, True)
    x3 = x.reshape(2, 4, 512)
    out = w4a16_matmul(x3, packed, scales)
    assert out.shape == (2, 4, 512)
    out2 = w4a16_matmul(x, packed, scales)
    np.testing.assert_allclose(np.asarray(out.reshape(8, 512)),
                               np.asarray(out2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("M,K,N,group,symmetric,act", [
    (16, 2048, 512, 128, True, None),
    (16, 2048, 512, 128, False, None),     # zeros (rank-1 correction)
    (5, 4096, 256, 128, True, "silu"),     # ramp schedule 1+3 slabs, bias+act
    (16, 2048, 512, -1, True, None),       # per-channel
])
def test_w4a16_ramp_variant(M, K, N, group, symmetric, act):
    """Manual-DMA ramp kernel == XLA reference (tiled packing, all epilogues)."""
    from tensorrt_llm_tpu.quantization import pack_w4_tiled
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.1
    q, scales, zeros = quantize_w4(w, group, symmetric=symmetric)
    p3 = pack_w4_tiled(q, 256)
    bias = (jax.random.normal(jax.random.PRNGKey(6), (N,), jnp.float32)
            if act else None)
    out = w4a16_matmul(x, p3, scales, zeros, bias=bias, activation=act,
                       variant="ramp", interpret=True)
    ref = np.asarray(w4a16_matmul_xla(x, p3, scales, zeros, bias=bias,
                                      activation=act), np.float32)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref,
        rtol=2e-2, atol=2e-2 * max(np.abs(ref).max(), 1.0))
    # also against fp32 with the reference tolerance
    check(out if act is None else out, ref) if act is None else None


def test_w4a16_ramp_large_m_falls_back_correctly():
    """M larger than one row block must not silently truncate: the ramp
    constraint falls back to the tiled kernel and output stays exact."""
    from tensorrt_llm_tpu.quantization import pack_w4_tiled
    M, K, N = 400, 2048, 512
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    x = jax.random.normal(k1, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.1
    q, scales, _ = quantize_w4(w, 128, True)
    p3 = pack_w4_tiled(q, 256)
    out = w4a16_matmul(x, p3, scales, variant="ramp", interpret=True)
    ref = np.asarray(w4a16_matmul_xla(x, p3, scales), np.float32)
    assert out.shape == (M, N)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-2 * np.abs(ref).max())


@pytest.mark.parametrize("variant", [None, "ramp"])
def test_w4a16_mixed_s4_feed(variant):
    """mixed=True hands the s4 view straight to the MXU dot; interpret-mode
    numerics must match the upcast path exactly."""
    from tensorrt_llm_tpu.quantization import pack_w4_tiled
    M, K, N = 16, 2048, 512
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    x = jax.random.normal(k1, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.1
    q, scales, _ = quantize_w4(w, 128, True)
    p3 = pack_w4_tiled(q, 256)
    a = w4a16_matmul(x, p3, scales, variant=variant, mixed=True,
                     interpret=True)
    b = w4a16_matmul(x, p3, scales, variant=variant, mixed=False,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), rtol=1e-5,
                               atol=1e-4)


# --------------------------------------------------------------- W4A8 ------

def _w4a8_exact_ref(x, q, scales, zeros):
    """Exact integer-math reference: dynamic int8 act quant + int4 weights
    with per-group scales/zeros, all accumulation in int32/f64."""
    from tensorrt_llm_tpu.ops.w4a16_gemm import quantize_act_int8
    xq, s_act = quantize_act_int8(jnp.asarray(x))
    xq = np.asarray(xq, np.int64)
    s_act = np.asarray(s_act, np.float64)
    qn = np.asarray(q, np.int64)                  # [K, N]
    K, N = qn.shape
    G = K // scales.shape[0]
    acc = np.zeros((xq.shape[0], N), np.float64)
    for g in range(K // G):
        xg = xq[:, g * G:(g + 1) * G]
        part = xg @ qn[g * G:(g + 1) * G]         # int64
        s = np.asarray(scales, np.float64)[g][None, :]
        acc += part * s
        if zeros is not None:
            z = np.asarray(zeros, np.float64)[g][None, :]
            acc -= xg.sum(1, keepdims=True) * (s * z)
    return acc * s_act


@pytest.mark.parametrize("M,K,N", [(16, 512, 512), (1, 1024, 256),
                                   (64, 512, 1024)])
@pytest.mark.parametrize("symmetric", [True, False])
def test_w4a8_pallas_interpret_vs_exact(M, K, N, symmetric):
    """int8-act kernel vs exact integer reference — the int math must be
    exact up to the f32 accumulator, so a much tighter bound than the
    quantization-error bound applies."""
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a8_matmul
    from tensorrt_llm_tpu.quantization import pack_w4_tiled

    x, w, q, packed, scales, zeros = make_case(
        jax.random.PRNGKey(7), M, K, N, 128, symmetric)
    p3 = pack_w4_tiled(q, 128)
    out = w4a8_matmul(x, p3, scales, zeros, interpret=True)
    ref = _w4a8_exact_ref(x, q, scales, zeros)
    rel = np.abs(np.asarray(out, np.float64) - ref).max() / \
        max(np.abs(ref).max(), 1e-9)
    assert rel < 1e-4, rel
    # and within the usual quant-error bound of the FP32 dense product
    check(out, ref_out(x, packed, scales, zeros))


def test_w4a8_xla_fallback_matches_kernel():
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a8_matmul
    from tensorrt_llm_tpu.quantization import pack_w4_tiled

    x, w, q, packed, scales, zeros = make_case(
        jax.random.PRNGKey(8), 8, 512, 256, 128, False)
    p3 = pack_w4_tiled(q, 128)
    out_k = w4a8_matmul(x, p3, scales, zeros, interpret=True)
    out_f = w4a8_matmul(x, p3, scales, zeros, interpret=None)  # CPU: XLA
    ref = ref_out(x, packed, scales, zeros)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_f, np.float32),
        rtol=3e-2, atol=3e-2 * np.abs(ref).max())


def test_w4a8_bias_silu_epilogue():
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a8_matmul
    from tensorrt_llm_tpu.quantization import pack_w4_tiled

    x, w, q, packed, scales, zeros = make_case(
        jax.random.PRNGKey(9), 16, 512, 256, 128, True)
    bias = jax.random.normal(jax.random.PRNGKey(10), (256,), jnp.float32)
    p3 = pack_w4_tiled(q, 128)
    out = w4a8_matmul(x, p3, scales, bias=bias, activation="silu",
                      interpret=True)
    ref = _w4a8_exact_ref(x, q, scales, None) + np.asarray(bias)[None, :]
    ref = ref / (1.0 + np.exp(-ref)) * 1.0  # silu
    rel = np.abs(np.asarray(out, np.float64) - ref).max() / \
        max(np.abs(ref).max(), 1e-9)
    assert rel < 1e-3, rel


def test_w4a8_linear_method_e2e():
    """Tiny model generates deterministically under W4A8_AWQ."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      max_position=256)
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=2, kv_num_blocks=32, kv_block_size=8,
                   seed=0, quant_algo="W4A8_AWQ", quant_group_size=64)
    try:
        sp = tllm.SamplingParams(max_tokens=5, temperature=0.0,
                                 ignore_eos=True)
        a = llm.generate([[3, 7, 11]], sp)[0].outputs[0].token_ids
        b = llm.generate([[3, 7, 11]], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 5
    finally:
        llm.shutdown()


@pytest.mark.parametrize("M,K,N,group,symmetric,act", [
    (16, 2048, 1024, 128, True, None),
    (16, 2048, 1024, 128, False, "silu"),
    (8, 2048, 512, -1, True, None),
    (64, 4096, 1024, 128, True, None),
])
def test_w4a16_stream_variant(M, K, N, group, symmetric, act):
    """Flat-grid manual-DMA stream kernel (uniform slabs, lookahead 4) ==
    XLA reference across group/per-channel, zeros and epilogues."""
    from tensorrt_llm_tpu.quantization import pack_w4_tiled
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    x = jax.random.normal(k1, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.1
    q, scales, zeros = quantize_w4(w, group, symmetric=symmetric)
    p3 = pack_w4_tiled(q, 256)
    bias = (jax.random.normal(jax.random.PRNGKey(6), (N,), jnp.float32)
            if act else None)
    out = w4a16_matmul(x, p3, scales, zeros, bias=bias, activation=act,
                       variant="stream", interpret=True)
    ref = np.asarray(w4a16_matmul_xla(x, p3, scales, zeros, bias=bias,
                                      activation=act), np.float32)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref,
        rtol=2e-2, atol=2e-2 * max(np.abs(ref).max(), 1.0))


def test_w4a16_stream_large_m_falls_back():
    """M above one row block: stream constraint falls back to tiled."""
    from tensorrt_llm_tpu.quantization import pack_w4_tiled
    M, K, N = 400, 2048, 512
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    x = jax.random.normal(k1, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.1
    q, scales, _ = quantize_w4(w, 128, True)
    p3 = pack_w4_tiled(q, 256)
    out = w4a16_matmul(x, p3, scales, variant="stream", interpret=True)
    ref = np.asarray(w4a16_matmul_xla(x, p3, scales), np.float32)
    assert out.shape == (M, N)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-2 * np.abs(ref).max())
