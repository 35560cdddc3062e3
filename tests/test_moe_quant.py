"""Quantized (W4A16) MoE experts: grouped kernel + layer + e2e.

Mirrors the reference's mixed-input grouped MoE GEMMs
(cutlass_kernels/moe_gemm/moe_gemm_kernels_bf16_uint4.cu) at the layer level:
expert weights live as packed int4 + per-group scales and are dequantized
inside the grouped matmul.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.layers.moe import MoE
from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.ops.moe_w4a16 import (
    dequantize_experts_w4,
    make_group_metadata,
    quantize_experts_w4,
    w4a16_grouped_matmul,
    w4a16_grouped_matmul_xla,
)
from tensorrt_llm_tpu.quantization import QuantAlgo, QuantConfig


def test_grouped_kernel_interpret_matches_xla():
    rng = np.random.default_rng(0)
    E, K, N, M = 4, 256, 256, 100
    w = jnp.asarray(rng.normal(size=(E, K, N)).astype(np.float32) * 0.1)
    xs = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    gs = jnp.asarray([30, 0, 50, 20], jnp.int32)
    for group, sym in ((128, True), (64, False), (-1, False)):
        packed, scales, zeros, _ = quantize_experts_w4(w, group, sym)
        ref = w4a16_grouped_matmul_xla(xs, packed, scales, gs, zeros)
        out = w4a16_grouped_matmul(xs, packed, scales, gs, zeros,
                                   block_m=32, block_k=128, interpret=True)
        rel = (np.abs(np.asarray(out) - np.asarray(ref)).max()
               / np.abs(np.asarray(ref)).max())
        assert rel < 2e-2, (group, sym, rel)


def test_grouped_kernel_mixed_s4_feed():
    """mixed=True hands the s4 expert tile straight to the MXU dot (and
    forces accumulator-side scaling); must match the bf16-upcast path."""
    rng = np.random.default_rng(7)
    E, K, N, M = 4, 256, 256, 96
    w = jnp.asarray(rng.normal(size=(E, K, N)).astype(np.float32) * 0.1)
    xs = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    gs = jnp.asarray([24, 8, 40, 24], jnp.int32)
    for group, sym in ((128, True), (64, False)):
        packed, scales, zeros, _ = quantize_experts_w4(w, group, sym)
        base = w4a16_grouped_matmul(xs, packed, scales, gs, zeros,
                                    block_m=32, block_k=128, interpret=True)
        mix = w4a16_grouped_matmul(xs, packed, scales, gs, zeros,
                                   block_m=32, block_k=128, mixed=True,
                                   interpret=True)
        if group == 128:
            # Gp=128 > 2*TM: base also scales the accumulator, so the only
            # difference is the s4-vs-bf16 MXU feed — int4 is exact in bf16
            np.testing.assert_allclose(np.asarray(mix), np.asarray(base),
                                       rtol=0, atol=1e-4)
        else:
            # Gp=64 == 2*TM: base scales the WEIGHT tile in bf16 (lossier);
            # mixed keeps the f32 accumulator scale — bound the drift by
            # bf16 rounding of the scaled weights
            rel = (np.abs(np.asarray(mix) - np.asarray(base)).max()
                   / np.abs(np.asarray(base)).max())
            assert rel < 2e-2, rel
        ref = w4a16_grouped_matmul_xla(xs, packed, scales, gs, zeros)
        rel = (np.abs(np.asarray(mix) - np.asarray(ref)).max()
               / np.abs(np.asarray(ref)).max())
        assert rel < 2e-2, (group, sym, rel)


def test_grouped_kernel_quant_tolerance_vs_float():
    """Reference tolerance discipline (weightOnlyKernelTest.cpp:70-107):
    max_diff <= max|ref| * quant_scale * 1.5 * 3 (bf16), quant_scale=1/8."""
    rng = np.random.default_rng(1)
    E, K, N, M = 4, 256, 384, 64
    w = jnp.asarray(rng.normal(size=(E, K, N)).astype(np.float32) * 0.05)
    xs = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    gs = jnp.asarray([16, 16, 16, 16], jnp.int32)
    packed, scales, _, _ = quantize_experts_w4(w, 128, True)
    out = np.asarray(w4a16_grouped_matmul(
        xs, packed, scales, gs, block_m=32, block_k=128, interpret=True))
    wf = np.asarray(w, np.float32)
    xf = np.asarray(xs, np.float32)
    ref = np.concatenate(
        [xf[16 * e:16 * (e + 1)] @ wf[e] for e in range(E)])
    assert np.abs(out - ref).max() <= np.abs(ref).max() / 8 * 1.5 * 3


def test_group_metadata_covers_rows_exactly():
    gs = jnp.asarray([5, 0, 200, 51], jnp.int32)
    meta = np.asarray(make_group_metadata(gs, m_tiles=4, tm=64, num_groups=4))
    mt, g, lo, hi, first = meta
    # every row of every tile is covered by exactly one (unit, group)
    cover = np.zeros((4, 64), np.int32)
    for u in range(meta.shape[1]):
        cover[mt[u], lo[u]:hi[u]] += 1
    flat = cover.reshape(-1)
    assert (flat[:256] == 1).all()
    # first flags: exactly one per touched m-tile
    touched = {}
    for u in range(meta.shape[1]):
        if hi[u] > lo[u]:
            touched.setdefault(mt[u], []).append(first[u])
    for tile, flags in touched.items():
        assert flags[0] == 1 and sum(flags) == 1, (tile, flags)


def test_quantize_roundtrip_experts():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(2, 128, 256)).astype(np.float32))
    packed, scales, zeros, bn = quantize_experts_w4(w, 64, False)
    deq = np.asarray(dequantize_experts_w4(packed, scales, zeros))
    err = np.abs(deq - np.asarray(w)).max()
    # per-group asymmetric int4: error <= scale/2 per element
    assert err <= float(np.asarray(scales).max()) * 0.51 + 1e-6


def _mk_moe(quant=None, **kw):
    base = dict(hidden_size=64, intermediate_size=128, num_experts=4,
                top_k=2, quant=quant)
    base.update(kw)
    return MoE(**base)


def test_moe_layer_quantized_close_to_bf16():
    moe_q = _mk_moe(QuantConfig(quant_algo=QuantAlgo.W4A16, group_size=32))
    assert moe_q.quant_experts
    moe_f = _mk_moe(None)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 5)
    H, E, I = 64, 4, 128
    std = 0.5 / (H ** 0.5)
    router = jax.random.normal(keys[0], (H, E), jnp.float32) * std
    gate = jax.random.normal(keys[1], (E, H, I), jnp.float32) * std
    up = jax.random.normal(keys[2], (E, H, I), jnp.float32) * std
    down = jax.random.normal(keys[3], (E, I, H), jnp.float32) * (0.5 / I ** .5)
    pq = moe_q.from_float(router, gate, up, down)
    assert "w_gate_up_s" in pq and pq["w_gate_up"].dtype == jnp.int8
    # bf16 MoE over the DEQUANTIZED weights: isolates the grouped-matmul
    # path from int4 quantization noise — must match to kernel tolerance
    dq_fused = dequantize_experts_w4(pq["w_gate_up"], pq["w_gate_up_s"])
    dq_down = dequantize_experts_w4(pq["w_down"], pq["w_down_s"])
    pf = moe_f.from_float(router, dq_fused[:, :, :I], dq_fused[:, :, I:],
                          dq_down)
    x = jax.random.normal(keys[4], (12, H), jnp.bfloat16)
    oq = np.asarray(moe_q(pq, x), np.float32)
    of = np.asarray(moe_f(pf, x), np.float32)
    rel = np.abs(oq - of).max() / (np.abs(of).max() + 1e-6)
    assert rel < 0.03, rel
    # and quantization noise vs the original floats stays bounded
    pf0 = moe_f.from_float(router, gate, up, down)
    of0 = np.asarray(moe_f(pf0, x), np.float32)
    rel0 = np.abs(oq - of0).max() / (np.abs(of0).max() + 1e-6)
    assert rel0 < 0.35, rel0


def test_moe_layer_awq_zero_points():
    q = QuantConfig(quant_algo=QuantAlgo.W4A16_AWQ, group_size=32,
                    has_zero_point=True)
    moe_q = _mk_moe(q)
    p = moe_q.init(jax.random.PRNGKey(0))
    assert "w_gate_up_z" in p and "w_down_z" in p
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64), jnp.bfloat16)
    out = moe_q(p, x)
    assert np.isfinite(np.asarray(out, np.float32)).all()


MOE_CFG = dict(vocab_size=96, hidden_size=64, intermediate_size=128,
               num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
               max_position=128, num_experts=4, num_experts_per_tok=2,
               moe_intermediate_size=64)


def test_llm_e2e_with_quantized_moe():
    cfg = ModelConfig(
        **MOE_CFG,
        quant=QuantConfig(quant_algo=QuantAlgo.W4A16, group_size=32))
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
              max_batch_size=4, kv_num_blocks=64, kv_block_size=8, seed=7)
    try:
        sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
        outs = llm.generate([[1, 2, 3], [7, 8]], sp)
        toks = [o.outputs[0].token_ids for o in outs]
        assert all(len(t) == 6 for t in toks)
        # greedy determinism with quantized experts
        outs2 = llm.generate([[1, 2, 3], [7, 8]], sp)
        assert [o.outputs[0].token_ids for o in outs2] == toks
    finally:
        llm.shutdown()


def test_rebalance_preserves_outputs_with_quantized_experts():
    cfg = ModelConfig(
        **MOE_CFG,
        quant=QuantConfig(quant_algo=QuantAlgo.W4A16, group_size=32))
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
              max_batch_size=4, kv_num_blocks=64, kv_block_size=8, seed=3)
    try:
        sp = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
        want = [o.outputs[0].token_ids
                for o in llm.generate([[2, 4, 6]], sp)]
        llm.rebalance_experts()
        got = [o.outputs[0].token_ids for o in llm.generate([[2, 4, 6]], sp)]
        assert got == want
    finally:
        llm.shutdown()
