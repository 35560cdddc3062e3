"""MoE layer + Mixtral/Qwen3-MoE model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.layers.moe import MoE
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheConfig, KVCacheManager
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams


def moe_reference(params, x, top_k, renormalize, inter, tp_size=1):
    """Dense-loop reference for the sorted ragged_dot MoE."""
    xf = np.asarray(x, np.float32)
    router = np.asarray(params["router"])
    wgu = np.asarray(params["w_gate_up"], np.float32)
    wd = np.asarray(params["w_down"], np.float32)
    T, H = xf.shape
    E = router.shape[1]
    logits = xf @ router
    scores = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    out = np.zeros((T, H), np.float32)
    Il = inter // tp_size
    for t in range(T):
        top = np.argsort(-scores[t])[:top_k]
        w = scores[t][top]
        if renormalize:
            w = w / w.sum()
        for e, wt in zip(top, w):
            h = xf[t] @ wgu[e]
            gate, up = h[:Il], h[Il:]
            act = gate / (1 + np.exp(-gate)) * up
            out[t] += wt * (act @ wd[e])
    return out


def test_moe_layer_matches_dense_reference():
    moe = MoE(hidden_size=64, intermediate_size=128, num_experts=4, top_k=2)
    params = moe.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 64), jnp.bfloat16)
    out = moe(params, x)
    ref = moe_reference(params, x, 2, True, 128)
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.05, rel


def test_moe_topk1_no_renorm():
    moe = MoE(hidden_size=64, intermediate_size=128, num_experts=8, top_k=1,
              renormalize=False)
    params = moe.init(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (6, 64), jnp.bfloat16)
    out = moe(params, x)
    ref = moe_reference(params, x, 1, False, 128)
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.06, rel


MOE_TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
                num_layers=2, num_heads=8, num_kv_heads=8, head_dim=16,
                max_position=256, num_experts=4, num_experts_per_tok=2,
                moe_intermediate_size=128)


@pytest.mark.parametrize("arch", ["MixtralForCausalLM", "Qwen3MoeForCausalLM"])
def test_moe_model_decodes(arch):
    cfg = ModelConfig(**MOE_TINY, architecture=arch)
    model = get_model_class(arch)(cfg)
    params = model.init(jax.random.PRNGKey(0))
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=32)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(16,))
    req = LlmRequest([1, 2, 3, 4, 5], SamplingParams(max_tokens=2))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    req.start_context()
    kv.grow_sequence(req.request_id, req.prompt_len)
    logits = engine.run_prefill(engine.prepare_prefill_inputs(req, 5))
    assert np.isfinite(np.asarray(logits[0], np.float32)).all()
    req.context_position = 5
    req.finish_context()
    req.append_token(int(np.argmax(np.asarray(logits[0]))))
    kv.grow_sequence(req.request_id, req.num_tokens)
    out = engine.run_decode(engine.prepare_decode_inputs([req]))
    assert np.isfinite(np.asarray(out[0], np.float32)).all()


def random_hf_moe_sd(seed=0):
    """Random float HF-style state dict for a tiny Qwen3-MoE model."""
    rng = np.random.RandomState(seed)
    c = MOE_TINY
    H, I, V = c["hidden_size"], c["moe_intermediate_size"], c["vocab_size"]
    nH, nKV, D = c["num_heads"], c["num_kv_heads"], c["head_dim"]
    E = c["num_experts"]
    w = lambda *s: (rng.randn(*s) * 0.5 / np.sqrt(s[-1])).astype(np.float32)
    sd = {"model.embed_tokens.weight": (rng.randn(V, H) * 0.02).astype(np.float32),
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight": w(V, H)}
    for i in range(c["num_layers"]):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = w(nH * D, H)
        sd[p + "self_attn.k_proj.weight"] = w(nKV * D, H)
        sd[p + "self_attn.v_proj.weight"] = w(nKV * D, H)
        sd[p + "self_attn.o_proj.weight"] = w(H, nH * D)
        sd[p + "self_attn.q_norm.weight"] = np.ones(D, np.float32)
        sd[p + "self_attn.k_norm.weight"] = np.ones(D, np.float32)
        sd[p + "mlp.gate.weight"] = w(E, H)
        for j in range(E):
            sd[p + f"mlp.experts.{j}.gate_proj.weight"] = w(I, H)
            sd[p + f"mlp.experts.{j}.up_proj.weight"] = w(I, H)
            sd[p + f"mlp.experts.{j}.down_proj.weight"] = w(H, I)
    return sd


@pytest.mark.parametrize("ep,tp", [(2, 1), (1, 2), (2, 2), (4, 2)])
def test_moe_ep_tp_matches_single_device(ep, tp):
    """EP x TP sharded MoE model == single-device logits."""
    if len(jax.devices()) < ep * tp:
        pytest.skip("not enough devices")
    sd = random_hf_moe_sd(0)

    def engine_for(mapping):
        cfg = ModelConfig(**MOE_TINY, architecture="Qwen3MoeForCausalLM",
                          mapping=mapping)
        model = get_model_class(cfg.architecture)(cfg)
        params = model.load_hf_weights(sd.get)
        kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                            cfg.num_kv_heads, cfg.head_dim, num_blocks=32)
        return ModelEngine(model, params, kv, mapping=mapping, max_seq_len=64,
                           decode_buckets=(4,), prefill_buckets=(16,)), kv

    def run(engine, kv):
        req = LlmRequest([1, 2, 3, 4, 5, 6, 7, 8], SamplingParams(max_tokens=2))
        kv.add_sequence(req.request_id, req.prompt_token_ids)
        req.start_context()
        kv.grow_sequence(req.request_id, req.prompt_len)
        logits = engine.run_prefill(engine.prepare_prefill_inputs(req, 8))
        return np.asarray(logits[0], np.float32)

    e1, kv1 = engine_for(Mapping())
    ref = run(e1, kv1)
    etp, kvtp = engine_for(Mapping(tp_size=ep * tp, moe_ep_size=ep,
                                   moe_tp_size=tp))
    got = run(etp, kvtp)
    np.testing.assert_allclose(ref, got, rtol=3e-2, atol=3e-2)
