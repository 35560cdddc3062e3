"""Helix decode context parallelism on the virtual CPU mesh.

Reference: helix CP (docs/source/features/helix.md, kernels/helixKernels.cu)
— KV pages block-cyclic over "cp", per-rank partial attention, softmax-stat
combine over ICI (psum instead of the reference's alltoall)."""

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.runtime.kv_cache_manager import (HelixKVCacheManager,
                                                       KVCacheConfig,
                                                       KVCacheManager)
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import LlmRequest

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
            max_position=256)


def random_sd(seed=0):
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


def build(mapping, sd):
    cfg = ModelConfig(**TINY, mapping=mapping)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(sd.get)
    if mapping.cp_size > 1 and mapping.cp_type == "helix":
        kv = HelixKVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                                 cfg.num_kv_heads, cfg.head_dim,
                                 num_blocks_per_rank=32,
                                 cp_size=mapping.cp_size)
    else:
        kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                            cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
    engine = ModelEngine(model, params, kv, mapping=mapping, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(32,))
    return engine, kv


def run(engine, kv, prompt, n_decode=6):
    """Prefill (spanning several blocks) + greedy decode steps."""
    req = LlmRequest(prompt, SamplingParams(max_tokens=n_decode))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    req.start_context()
    kv.grow_sequence(req.request_id, req.prompt_len)
    logits = engine.run_prefill(
        engine.prepare_prefill_inputs(req, req.prompt_len))
    req.context_position = req.prompt_len
    req.finish_context()
    outs = [np.asarray(logits, np.float32)[0]]
    for _ in range(n_decode):
        req.append_token(int(np.argmax(outs[-1])))
        kv.grow_sequence(req.request_id, req.num_tokens)
        logits = engine.run_decode(engine.prepare_decode_inputs([req]))
        outs.append(np.asarray(logits, np.float32)[0])
    return np.stack(outs)


@pytest.mark.parametrize("cp,tp", [(2, 1), (4, 1), (2, 2)])
def test_helix_matches_single_device(cp, tp):
    if len(jax.devices()) < cp * tp:
        pytest.skip("not enough devices")
    sd = random_sd(0)
    # prompt spans > cp blocks so every rank owns pages
    prompt = list(np.random.RandomState(1).randint(1, 255, 26))
    e1, kv1 = build(Mapping(), sd)
    ref = run(e1, kv1, prompt)
    eh, kvh = build(Mapping(tp_size=tp, cp_size=cp, cp_type="helix"), sd)
    got = run(eh, kvh, prompt)
    np.testing.assert_allclose(ref, got, rtol=3e-2, atol=3e-2)
    # greedy choices identical
    assert (np.argmax(ref, -1) == np.argmax(got, -1)).all()


def test_helix_manager_geometry():
    kv = HelixKVCacheManager(KVCacheConfig(block_size=8), 2, 4, 32,
                             num_blocks_per_rank=16, cp_size=2)
    kv.add_sequence(1, list(range(20)))
    kv.grow_sequence(1, 20)  # 3 global blocks: ranks get 2 and 1
    assert kv.ranks[0].num_seq_blocks(1) == 2
    assert kv.ranks[1].num_seq_blocks(1) == 1
    maps = kv.rank_slot_mapping(1, 0, 20, pad_slot=-1)
    for p in range(20):
        owner = (p // 8) % 2
        for r in range(2):
            if r == owner:
                assert maps[r][p] >= 0
            else:
                assert maps[r][p] == -1
    kv.free_sequence(1)
    assert kv.num_seq_blocks(1) == 0


@pytest.mark.parametrize("cp", [2, 4])
def test_helix_with_sinks_matches_single_device(cp):
    """Attention sinks (GPT-OSS) under helix CP: the sink logit joins the
    softmax denominator once, AFTER the cross-rank stat combine."""
    if len(jax.devices()) < cp:
        pytest.skip("not enough devices")
    sd = random_sd(3)
    rng = np.random.RandomState(7)
    for i in range(TINY["num_layers"]):
        sd[f"model.layers.{i}.self_attn.sinks"] = \
            rng.randn(TINY["num_heads"]).astype(np.float32)

    def build_s(mapping):
        cfg = ModelConfig(**TINY, mapping=mapping, has_sinks=True)
        model = get_model_class(cfg.architecture)(cfg)
        params = model.load_hf_weights(sd.get)
        if mapping.cp_size > 1:
            kv = HelixKVCacheManager(
                KVCacheConfig(block_size=8), cfg.num_layers,
                cfg.num_kv_heads, cfg.head_dim, num_blocks_per_rank=32,
                cp_size=mapping.cp_size)
        else:
            kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                                cfg.num_kv_heads, cfg.head_dim,
                                num_blocks=64)
        return ModelEngine(model, params, kv, mapping=mapping,
                           max_seq_len=64, decode_buckets=(4,),
                           prefill_buckets=(32,)), kv

    prompt = list(np.random.RandomState(2).randint(1, 255, 26))
    e1, kv1 = build_s(Mapping())
    ref = run(e1, kv1, prompt)
    eh, kvh = build_s(Mapping(cp_size=cp, cp_type="helix"))
    got = run(eh, kvh, prompt)
    np.testing.assert_allclose(ref, got, rtol=3e-2, atol=3e-2)
    assert (np.argmax(ref, -1) == np.argmax(got, -1)).all()
