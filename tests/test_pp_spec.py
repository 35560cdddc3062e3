"""PP parity for fused multi-step decode + tree verification, and the
spec-decode AUTO heuristic (reference auto_heuristic.py:1
suggest_spec_config; PP overlap loop py_executor.py:1101)."""

import jax
import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.runtime.kv_cache_manager import (KVCacheConfig,
                                                       KVCacheManager)
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.runtime.sampler import SamplingState

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
            max_position=256)


def random_hf_state_dict(seed=0):
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
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=64)
    params = model.load_hf_weights(sd.get)
    engine = ModelEngine(model, params, kv, mapping=mapping,
                         max_seq_len=64, decode_buckets=(4,),
                         prefill_buckets=(16,))
    return engine, kv


def prefill(engine, kv, prompt):
    req = LlmRequest(list(prompt), SamplingParams(max_tokens=8))
    kv.add_sequence(req.request_id, req.prompt_token_ids)
    req.start_context()
    kv.grow_sequence(req.request_id, req.prompt_len)
    logits = engine.run_prefill(
        engine.prepare_prefill_inputs(req, req.prompt_len))
    req.context_position = req.prompt_len
    req.finish_context()
    req.append_token(int(np.argmax(np.asarray(logits[0]))))
    return req


def multi_step_tokens(engine, kv, prompt, k=3):
    req = prefill(engine, kv, prompt)
    kv.grow_sequence(req.request_id, req.num_tokens + k - 1)
    inputs = engine.prepare_decode_inputs([req])
    B = len(inputs.input_ids)
    slot_table = np.full((k, B), np.int64(2**30), np.int32)
    slot_table[:, 0] = kv.slot_mapping(req.request_id, req.num_tokens - 1, k)
    state = SamplingState.from_params(
        [SamplingParams(temperature=0.0)] * 1, step=0, pad_to=B)
    toks, _ = engine.run_decode_multi(inputs, k, state, slot_table)
    return np.asarray(toks)[:, 0].tolist()


def test_pp_multi_step_decode_matches_single_device():
    """Fused multi-step decode under PP (device-chained stage dispatches)
    must produce the same greedy tokens as the single-device scan."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    prompt = list(np.random.RandomState(7).randint(1, 255, 12))
    sd = random_hf_state_dict(0)
    e1, kv1 = build(Mapping(), sd)
    t1 = multi_step_tokens(e1, kv1, prompt)
    e2, kv2 = build(Mapping(pp_size=2), sd)
    t2 = multi_step_tokens(e2, kv2, prompt)
    assert t1 == t2, (t1, t2)


def verify_chain_logits(engine, kv, prompt, draft):
    req = prefill(engine, kv, prompt)
    kv.grow_sequence(req.request_id, req.num_tokens + len(draft))
    tokens = [req.output_token_ids[-1]] + list(draft)
    pos = np.arange(req.num_tokens - 1,
                    req.num_tokens - 1 + len(tokens), dtype=np.int32)
    inputs = engine.prepare_tree_verify_inputs(
        req, tokens, pos, [True] * len(tokens))
    Tp = len(inputs.input_ids)
    pm = np.tril(np.ones((Tp, Tp), bool))
    logits = engine.run_verify_tree(inputs, pm)
    return np.asarray(logits)[:len(tokens)]


def test_pp_tree_verify_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    prompt = list(np.random.RandomState(3).randint(1, 255, 10))
    draft = [5, 9, 13]
    sd = random_hf_state_dict(1)
    e1, kv1 = build(Mapping(), sd)
    l1 = verify_chain_logits(e1, kv1, prompt, draft)
    e2, kv2 = build(Mapping(pp_size=2), sd)
    l2 = verify_chain_logits(e2, kv2, prompt, draft)
    np.testing.assert_allclose(l1, l2, rtol=3e-2, atol=3e-2)


# ------------------------------------------------------------- AUTO mode ----
def test_suggest_spec_config_small_batch():
    from tensorrt_llm_tpu.speculative import (SpeculativeMode,
                                              suggest_spec_config)
    cfg = suggest_spec_config(4)
    assert cfg.mode == SpeculativeMode.NGRAM
    assert cfg.max_draft_len == 5
    assert cfg.max_concurrency == 32
    cfg = suggest_spec_config(64)
    assert cfg.max_draft_len == 3


def test_auto_resolves_to_ngram_drafter():
    from tensorrt_llm_tpu.speculative import get_drafter
    from tensorrt_llm_tpu.speculative.ngram import NGramDrafter

    class A:
        max_batch_size = 4
    d = get_drafter("AUTO", A())
    assert isinstance(d, NGramDrafter)
    assert d.cfg.max_concurrency == 32


def test_auto_spec_end_to_end_greedy_parity():
    """LLM(speculative_config="AUTO") must keep greedy outputs identical to
    the non-speculative engine (NGram acceptance is exact)."""
    import tensorrt_llm_tpu as tllm
    cfg = ModelConfig(**TINY)
    sp = tllm.SamplingParams(max_tokens=16, temperature=0.0, ignore_eos=True)
    prompt = [7, 9, 7, 9, 7, 9, 7, 9]  # periodic: ngram-friendly
    base = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
                    max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                    seed=0)
    ref = base.generate([prompt], sp)[0].outputs[0].token_ids
    base.shutdown()
    spec = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
                    max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                    seed=0, speculative_config="AUTO")
    out = spec.generate([prompt], sp)[0].outputs[0].token_ids
    stats = spec.executor.spec_stats
    spec.shutdown()
    assert out == ref, (out, ref)
    assert stats["rounds"] > 0, "AUTO speculation never engaged"
