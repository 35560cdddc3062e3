"""Tensor-parallel correctness on a virtual CPU mesh.

The reference needs real GPUs for multi-device tests (SURVEY.md §4.3); we run
the full TP path — shard_map'd forward, head-sharded KV, column/row-parallel
projections with psum — on 8 virtual CPU devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheConfig, KVCacheManager
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import LlmRequest

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
            max_position=256)


def random_hf_state_dict(seed=0):
    """Random float weights in HF naming/layout ([out, in] linears)."""
    rng = np.random.RandomState(seed)
    H, I, V = TINY["hidden_size"], TINY["intermediate_size"], TINY["vocab_size"]
    nH, nKV, D = TINY["num_heads"], TINY["num_kv_heads"], TINY["head_dim"]
    w = lambda *s: (rng.randn(*s) * 0.5 / np.sqrt(s[-1])).astype(np.float32)
    sd = {"model.embed_tokens.weight": (rng.randn(V, H) * 0.02).astype(np.float32),
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight": w(V, H)}
    for i in range(TINY["num_layers"]):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = w(nH * D, H)
        sd[p + "self_attn.k_proj.weight"] = w(nKV * D, H)
        sd[p + "self_attn.v_proj.weight"] = w(nKV * D, H)
        sd[p + "self_attn.o_proj.weight"] = w(H, nH * D)
        sd[p + "mlp.gate_proj.weight"] = w(I, H)
        sd[p + "mlp.up_proj.weight"] = w(I, H)
        sd[p + "mlp.down_proj.weight"] = w(H, I)
    return sd


def build(tp: int, sd=None, seed=0):
    cfg = ModelConfig(**TINY, mapping=Mapping(tp_size=tp))
    model = get_model_class(cfg.architecture)(cfg)
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
    sd = sd or random_hf_state_dict(seed)
    params = model.load_hf_weights(sd.get)
    engine = ModelEngine(model, params, kv, mapping=cfg.mapping,
                         max_seq_len=64, decode_buckets=(4,),
                         prefill_buckets=(16,))
    return engine, kv


def run_prefill_decode(engine, kv, prompt):
    req = LlmRequest(list(prompt), SamplingParams(max_tokens=4))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    req.start_context()
    kv.grow_sequence(req.request_id, req.prompt_len)
    logits_p = engine.run_prefill(
        engine.prepare_prefill_inputs(req, req.prompt_len))
    req.context_position = req.prompt_len
    req.finish_context()
    req.append_token(int(np.argmax(np.asarray(logits_p[0]))))
    kv.grow_sequence(req.request_id, req.num_tokens)
    logits_d = engine.run_decode(engine.prepare_decode_inputs([req]))
    return np.asarray(logits_p[0], np.float32), np.asarray(logits_d[0], np.float32)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_device(tp):
    if len(jax.devices()) < tp:
        pytest.skip("not enough devices")
    prompt = list(np.random.RandomState(0).randint(1, 255, 12))
    sd = random_hf_state_dict(0)

    e1, kv1 = build(1, sd)
    lp1, ld1 = run_prefill_decode(e1, kv1, prompt)

    etp, kvtp = build(tp, sd)
    lptp, ldtp = run_prefill_decode(etp, kvtp, prompt)

    np.testing.assert_allclose(lp1, lptp, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(ld1, ldtp, rtol=3e-2, atol=3e-2)


def test_tp_param_sharding_layout():
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    e, kv = build(2, random_hf_state_dict(0))
    qkv = e.params["layers"][0]["attn"]["qkv"]["weight"]
    # column-parallel: out dim sharded over 2 devices
    assert len(qkv.sharding.device_set) == 2
    k_cache, v_cache = e.kv_caches[0]
    assert len(k_cache.sharding.device_set) == 2


def random_mla_state_dict(seed=0, H=128, nH=8, ql=48, kvl=32, nope=32,
                          rope=16, vd=32, I=256, V=256, layers=2):
    rng = np.random.RandomState(seed)
    w = lambda *s: (rng.randn(*s) * 0.5 / np.sqrt(s[-1])).astype(np.float32)
    sd = {"model.embed_tokens.weight": (rng.randn(V, H) * 0.02).astype(np.float32),
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight": w(V, H)}
    for i in range(layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_a_proj.weight"] = w(ql, H)
        sd[p + "self_attn.q_a_layernorm.weight"] = np.ones(ql, np.float32)
        sd[p + "self_attn.q_b_proj.weight"] = w(nH * (nope + rope), ql)
        sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = w(kvl + rope, H)
        sd[p + "self_attn.kv_a_layernorm.weight"] = np.ones(kvl, np.float32)
        sd[p + "self_attn.kv_b_proj.weight"] = w(nH * (nope + vd), kvl)
        sd[p + "self_attn.o_proj.weight"] = w(H, nH * vd)
        sd[p + "mlp.gate_proj.weight"] = w(I, H)
        sd[p + "mlp.up_proj.weight"] = w(I, H)
        sd[p + "mlp.down_proj.weight"] = w(H, I)
    return sd


def build_mla(tp: int, sd):
    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=8, num_kv_heads=8, max_position=256,
        architecture="DeepseekV3ForCausalLM",
        q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, mapping=Mapping(tp_size=tp))
    model = get_model_class(cfg.architecture)(cfg)
    kv = KVCacheManager(KVCacheConfig(block_size=8, layout="latent"),
                        cfg.num_layers, cfg.kv_pool_heads, cfg.kv_pool_dim,
                        num_blocks=64)
    params = model.load_hf_weights(sd.get)
    engine = ModelEngine(model, params, kv, mapping=cfg.mapping,
                         max_seq_len=64, decode_buckets=(4,),
                         prefill_buckets=(16,))
    return engine, kv


def test_mla_tp_matches_single_device():
    """MLA under TP: query heads sharded, latent cache replicated."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    prompt = list(np.random.RandomState(0).randint(1, 255, 12))
    sd = random_mla_state_dict(0)

    e1, kv1 = build_mla(1, sd)
    lp1, ld1 = run_prefill_decode(e1, kv1, prompt)

    e2, kv2 = build_mla(2, sd)
    lp2, ld2 = run_prefill_decode(e2, kv2, prompt)

    np.testing.assert_allclose(lp1, lp2, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(ld1, ld2, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("pp,tp", [(2, 1), (2, 2), (4, 1)])
def test_pp_matches_single_device(pp, tp):
    """Pipeline stages on sub-meshes reproduce the fused single-device
    forward exactly (residual materialization at stage cuts is lossless)."""
    if len(jax.devices()) < pp * tp:
        pytest.skip("not enough devices")
    prompt = list(np.random.RandomState(4).randint(1, 255, 12))
    sd = random_hf_state_dict(0)

    e1, kv1 = build(1, sd)
    lp1, ld1 = run_prefill_decode(e1, kv1, prompt)

    cfg = ModelConfig(**TINY, mapping=Mapping(pp_size=pp, tp_size=tp))
    from tensorrt_llm_tpu.models import get_model_class as gmc
    model = gmc(cfg.architecture)(cfg)
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
    params = model.load_hf_weights(sd.get)
    epp = ModelEngine(model, params, kv, mapping=cfg.mapping,
                      max_seq_len=64, decode_buckets=(4,),
                      prefill_buckets=(16,))
    lpp, ldp = run_prefill_decode(epp, kv, prompt)

    np.testing.assert_allclose(lp1, lpp, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(ld1, ldp, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("cp,tp", [(2, 1), (2, 2), (4, 1)])
def test_ulysses_cp_matches_single_device(cp, tp):
    """Ulysses sequence parallelism: seq-sharded prefill with
    head-scatter/seq-gather all_to_all and head-sliced decode must match the
    single-device forward."""
    if len(jax.devices()) < cp * tp:
        pytest.skip("not enough devices")
    prompt = list(np.random.RandomState(9).randint(1, 255, 12))
    sd = random_hf_state_dict(1)

    e1, kv1 = build(1, sd, seed=1)
    lp1, ld1 = run_prefill_decode(e1, kv1, prompt)

    cfg = ModelConfig(**TINY, mapping=Mapping(cp_size=cp, tp_size=tp))
    from tensorrt_llm_tpu.models import get_model_class as gmc
    model = gmc(cfg.architecture)(cfg)
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
    params = model.load_hf_weights(sd.get)
    ecp = ModelEngine(model, params, kv, mapping=cfg.mapping,
                      max_seq_len=64, decode_buckets=(4,),
                      prefill_buckets=(16,))
    lcp, ldc = run_prefill_decode(ecp, kv, prompt)

    np.testing.assert_allclose(lp1, lcp, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(ld1, ldc, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("dp", [2, 4])
def test_attention_dp_matches_single_device(dp):
    """Attention-DP: rank-grouped decode batches + owner-masked replicated
    prefill reproduce single-device greedy outputs for every request."""
    if len(jax.devices()) < dp:
        pytest.skip("not enough devices")
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams

    TINY_M = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                  max_position=128)
    prompts = [list(np.random.RandomState(i).randint(1, 120, 5 + 3 * i))
               for i in range(5)]
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    ref = LLM(model=ModelConfig(**TINY_M), skip_tokenizer_init=True,
              max_seq_len=64, max_batch_size=8, kv_num_blocks=64,
              kv_block_size=8, seed=3)
    try:
        want = [o.outputs[0].token_ids
                for o in ref.generate([list(p) for p in prompts], sp)]
    finally:
        ref.shutdown()

    llm = LLM(model=ModelConfig(**TINY_M), skip_tokenizer_init=True,
              max_seq_len=64, max_batch_size=8, kv_num_blocks=64,
              kv_block_size=8, seed=3, data_parallel_size=dp)
    try:
        got = [o.outputs[0].token_ids
               for o in llm.generate([list(p) for p in prompts], sp)]
        st = llm.get_kv_cache_stats()
        assert st["dp_size"] == dp
    finally:
        llm.shutdown()
    assert got == want, (got, want)


@pytest.mark.parametrize("cp,tp", [(2, 1), (4, 1), (2, 2)])
def test_ring_cp_matches_single_device(cp, tp):
    """Ring attention CP (blockwise KV rotation): single-chunk prefill +
    replicated decode match the single-device forward.  Unlike Ulysses this
    needs no head divisibility — runs with kv_heads=4 at cp=4xtp=1 AND with
    the awkward kv_heads/tp=4 at cp=2xtp=2."""
    if len(jax.devices()) < cp * tp:
        pytest.skip("not enough devices")
    prompt = list(np.random.RandomState(11).randint(1, 255, 12))
    sd = random_hf_state_dict(2)

    e1, kv1 = build(1, sd, seed=2)
    lp1, ld1 = run_prefill_decode(e1, kv1, prompt)

    cfg = ModelConfig(**TINY, mapping=Mapping(cp_size=cp, tp_size=tp,
                                              cp_type="ring"))
    from tensorrt_llm_tpu.models import get_model_class as gmc
    model = gmc(cfg.architecture)(cfg)
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
    params = model.load_hf_weights(sd.get)
    ecp = ModelEngine(model, params, kv, mapping=cfg.mapping,
                      max_seq_len=64, decode_buckets=(4,),
                      prefill_buckets=(16,))
    lcp, ldc = run_prefill_decode(ecp, kv, prompt)

    np.testing.assert_allclose(lp1, lcp, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(ld1, ldc, rtol=3e-2, atol=3e-2)


def test_low_precision_all_reduce():
    """int8-wire all-reduce (reference customLowPrecisionAllReduceKernels
    analog): numerics within 1 LSB/partial of exact psum, and the psum
    path switches over via TLLM_LOW_PRECISION_ALLREDUCE."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from tensorrt_llm_tpu.parallel.ops import (tp_all_reduce,
                                               tp_all_reduce_int8)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("ep", "tp"))
    x = jnp.asarray(np.random.RandomState(0).randn(8, 16, 256)
                    .astype(np.float32), jnp.bfloat16)

    def lp(v):
        return tp_all_reduce_int8(v)

    def exact(v):
        return jax.lax.psum(v, ("ep", "tp"))

    sm = dict(mesh=mesh, in_specs=P(("ep", "tp")),
              out_specs=P(("ep", "tp")), check_vma=False)
    a = np.asarray(jax.jit(jax.shard_map(lp, **sm))(x), np.float32)
    b = np.asarray(jax.jit(jax.shard_map(exact, **sm))(x), np.float32)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert rel < 0.02, rel

    import os
    os.environ["TLLM_LOW_PRECISION_ALLREDUCE"] = "1"
    try:
        c = np.asarray(jax.jit(jax.shard_map(
            lambda v: tp_all_reduce(v), **sm))(x), np.float32)
    finally:
        del os.environ["TLLM_LOW_PRECISION_ALLREDUCE"]
    np.testing.assert_allclose(c, a, rtol=0, atol=0)
