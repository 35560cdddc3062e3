"""HF-parity tests across the model zoo (random tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheConfig, KVCacheManager
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import LlmRequest
from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams

COMMON = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, head_dim=32,
              max_position_embeddings=256, attention_dropout=0.0)


def hf_parity(hf_cfg, arch, prompt_len=12, corr_min=0.99, perturb=()):
    torch = pytest.importorskip("torch")
    import transformers

    torch.manual_seed(0)
    hf_model = transformers.AutoModelForCausalLM.from_config(hf_cfg)
    hf_model.eval()
    # ones-initialized norms can hide placement bugs (e.g. pre- vs
    # post-rope qk-norm commute when the weight is constant): scramble the
    # named params so the test actually pins the order
    with torch.no_grad():
        for n, prm in hf_model.named_parameters():
            if any(t in n for t in perturb):
                prm.mul_(torch.rand_like(prm) + 0.5)
    sd = {k: v.detach().float().numpy() for k, v in hf_model.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = arch
    model = get_model_class(arch)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))

    prompt = list(np.random.RandomState(0).randint(1, 255, prompt_len))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].numpy()

    kv = KVCacheManager(
        KVCacheConfig(block_size=8, layout="latent" if cfg.is_mla else "kv"),
        cfg.num_layers, cfg.kv_pool_heads, cfg.kv_pool_dim, num_blocks=32)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,),
                         prefill_buckets=(max(16, prompt_len),))
    req = LlmRequest(prompt, SamplingParams(max_tokens=1))
    kv.add_sequence(req.request_id, prompt)
    req.start_context()
    kv.grow_sequence(req.request_id, len(prompt))
    ours = np.asarray(
        engine.run_prefill(engine.prepare_prefill_inputs(req, len(prompt)))[0],
        np.float32)

    assert np.argmax(ours) == np.argmax(hf_logits), (
        np.argsort(ours)[-3:], np.argsort(hf_logits)[-3:])
    corr = np.corrcoef(ours, hf_logits)[0, 1]
    assert corr > corr_min, corr


def test_gemma2_parity():
    import transformers
    hf_cfg = transformers.Gemma2Config(
        **COMMON, hidden_activation="gelu_pytorch_tanh",
        query_pre_attn_scalar=32, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=16,
        tie_word_embeddings=True)
    hf_parity(hf_cfg, "Gemma2ForCausalLM")


def test_gemma3_parity():
    import transformers
    hf_cfg = transformers.Gemma3TextConfig(
        **COMMON, hidden_activation="gelu_pytorch_tanh",
        query_pre_attn_scalar=32, sliding_window=16,
        sliding_window_pattern=2, rope_local_base_freq=10000.0,
        rope_theta=1000000.0, tie_word_embeddings=True)
    hf_parity(hf_cfg, "Gemma3ForCausalLM")


def test_phi3_parity():
    import transformers
    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.Phi3Config(**common, tie_word_embeddings=False,
                                     pad_token_id=0)
    hf_parity(hf_cfg, "Phi3ForCausalLM")


def test_mixtral_parity():
    import transformers
    hf_cfg = transformers.MixtralConfig(
        **COMMON, num_local_experts=4, num_experts_per_tok=2,
        tie_word_embeddings=False)
    hf_parity(hf_cfg, "MixtralForCausalLM", corr_min=0.98)


def test_qwen3_moe_parity():
    import transformers
    hf_cfg = transformers.Qwen3MoeConfig(
        **COMMON, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=128, decoder_sparse_step=1,
        norm_topk_prob=True, tie_word_embeddings=False)
    hf_parity(hf_cfg, "Qwen3MoeForCausalLM", corr_min=0.98)


def test_deepseek_v3_parity():
    import transformers
    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.DeepseekV3Config(
        **common, q_lora_rank=48, kv_lora_rank=32,
        qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, routed_scaling_factor=2.5,
        first_k_dense_replace=1, moe_intermediate_size=64,
        norm_topk_prob=True, tie_word_embeddings=False)
    hf_parity(hf_cfg, "DeepseekV3ForCausalLM", corr_min=0.98)


def test_deepseek_v3_yarn_parity():
    """YaRN rope scaling + mscale attention temperature, long-ish prompt."""
    import transformers
    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.DeepseekV3Config(
        **common, q_lora_rank=None, kv_lora_rank=32,
        qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        n_group=1, topk_group=1, first_k_dense_replace=0,
        moe_intermediate_size=64,
        rope_scaling={"type": "yarn", "factor": 4.0, "beta_fast": 32,
                      "beta_slow": 1, "mscale": 1.0, "mscale_all_dim": 1.0,
                      "original_max_position_embeddings": 64},
        tie_word_embeddings=False)
    hf_parity(hf_cfg, "DeepseekV3ForCausalLM", prompt_len=24, corr_min=0.98)


def test_deepseek_v3_decode_greedy_matches_hf():
    """Greedy decode over the paged latent cache matches HF token-for-token."""
    torch = pytest.importorskip("torch")
    import transformers

    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.DeepseekV3Config(
        **common, q_lora_rank=48, kv_lora_rank=32,
        qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, routed_scaling_factor=2.5,
        first_k_dense_replace=1, moe_intermediate_size=64,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    hf_model = transformers.AutoModelForCausalLM.from_config(hf_cfg)
    hf_model.eval()
    sd = {k: v.detach().float().numpy() for k, v in hf_model.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))

    prompt = list(np.random.RandomState(5).randint(1, 255, 10))
    n_new = 5
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False)
    hf_toks = hf_out[0, len(prompt):].tolist()

    kv = KVCacheManager(KVCacheConfig(block_size=8, layout="latent"),
                        cfg.num_layers, cfg.kv_pool_heads, cfg.kv_pool_dim,
                        num_blocks=32)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(16,))
    req = LlmRequest(prompt, SamplingParams(max_tokens=n_new))
    kv.add_sequence(req.request_id, prompt)
    req.start_context()
    kv.grow_sequence(req.request_id, len(prompt))
    logits = engine.run_prefill(engine.prepare_prefill_inputs(req, len(prompt)))
    req.context_position = len(prompt)
    req.finish_context()
    ours = [int(np.argmax(np.asarray(logits[0])))]
    req.append_token(ours[-1])
    for _ in range(n_new - 1):
        kv.grow_sequence(req.request_id, req.num_tokens)
        logits = engine.run_decode(engine.prepare_decode_inputs([req]))
        tok = int(np.argmax(np.asarray(logits[0])))
        ours.append(tok)
        req.append_token(tok)
    assert ours == hf_toks, (ours, hf_toks)


def test_gpt_oss_parity():
    import transformers
    hf_cfg = transformers.GptOssConfig(
        vocab_size=256, hidden_size=128, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2, sliding_window=16,
        layer_types=["sliding_attention", "full_attention"],
        rope_scaling={"rope_type": "yarn", "factor": 8.0, "beta_fast": 32.0,
                      "beta_slow": 1.0, "truncate": False,
                      "original_max_position_embeddings": 32},
        rope_theta=150000.0, attention_bias=True, attention_dropout=0.0,
        tie_word_embeddings=False)
    hf_parity(hf_cfg, "GptOssForCausalLM", prompt_len=20, corr_min=0.98)


def test_gpt_oss_decode_greedy_matches_hf():
    """Sinks + sliding/full alternation through the batched decode path."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.GptOssConfig(
        vocab_size=256, hidden_size=128, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2, sliding_window=8,
        layer_types=["sliding_attention", "full_attention"],
        rope_theta=150000.0, attention_bias=True, attention_dropout=0.0,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    hf_model = transformers.AutoModelForCausalLM.from_config(hf_cfg)
    hf_model.eval()
    sd = {k: v.detach().float().numpy() for k, v in hf_model.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))

    prompt = list(np.random.RandomState(8).randint(1, 255, 12))
    n_new = 6
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False)
    hf_toks = hf_out[0, len(prompt):].tolist()

    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.kv_pool_heads, cfg.kv_pool_dim, num_blocks=32)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(16,))
    req = LlmRequest(prompt, SamplingParams(max_tokens=n_new))
    kv.add_sequence(req.request_id, prompt)
    req.start_context()
    kv.grow_sequence(req.request_id, len(prompt))
    logits = engine.run_prefill(engine.prepare_prefill_inputs(req, len(prompt)))
    req.context_position = len(prompt)
    req.finish_context()
    # teacher-force HF's greedy tokens through OUR decode path: each step's
    # logits must rank HF's pick in our top-2 (random-weight models have
    # near-tie logits that bf16 can flip) with high correlation
    with torch.no_grad():
        hf_logits_all = hf_model(
            torch.tensor([prompt + hf_toks])).logits[0].numpy()
    row = np.asarray(logits[0], np.float32)
    for j, tok in enumerate(hf_toks):
        hf_row = hf_logits_all[len(prompt) - 1 + j]
        assert np.corrcoef(row, hf_row)[0, 1] > 0.99
        assert tok in np.argsort(row)[::-1][:2], (j, tok)
        req.append_token(int(tok))
        if j == len(hf_toks) - 1:
            break
        kv.grow_sequence(req.request_id, req.num_tokens)
        row = np.asarray(
            engine.run_decode(engine.prepare_decode_inputs([req]))[0],
            np.float32)


def test_llama4_parity():
    """Llama4 text: NoPE layers + chunked attention + qk-l2norm + input-
    weighted sigmoid MoE routing + shared expert (HF modeling_llama4)."""
    import transformers
    hf_cfg = transformers.Llama4TextConfig(
        vocab_size=256, hidden_size=128, intermediate_size=192,
        intermediate_size_mlp=256, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        max_position_embeddings=256, attention_dropout=0.0,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, no_rope_layer_interval=2,
        attention_chunk_size=8, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=4.0, attn_scale=0.1,
        rope_theta=500000.0)
    hf_parity(hf_cfg, "Llama4ForCausalLM", prompt_len=20)


def test_llama4_decode_greedy_matches_hf():
    """Greedy decode across chunk boundaries matches HF step-for-step."""
    torch = pytest.importorskip("torch")
    import transformers

    torch.manual_seed(1)
    hf_cfg = transformers.Llama4TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128, attention_dropout=0.0,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, no_rope_layer_interval=2,
        attention_chunk_size=8, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=4.0, attn_scale=0.1)
    hf_model = transformers.AutoModelForCausalLM.from_config(hf_cfg)
    hf_model.eval()
    sd = {k: v.detach().float().numpy()
          for k, v in hf_model.state_dict().items()}

    prompt = list(np.random.RandomState(5).randint(1, 127, 11))
    n_steps = 8
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=n_steps, do_sample=False)
    hf_toks = hf_out[0, len(prompt):].tolist()
    with torch.no_grad():
        hf_logits_all = hf_model(
            torch.tensor([prompt + hf_toks])).logits[0].numpy()

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Llama4ForCausalLM"
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))
    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.kv_pool_heads, cfg.kv_pool_dim, num_blocks=48)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(16,))
    assert engine._vswa  # chunked layers ride the ring pools
    req = LlmRequest(prompt, SamplingParams(max_tokens=n_steps))
    kv.add_sequence(req.request_id, prompt)
    req.start_context()
    kv.grow_sequence(req.request_id, len(prompt))
    logits = engine.run_prefill(
        engine.prepare_prefill_inputs(req, len(prompt)))
    req.context_position = len(prompt)
    req.finish_context()
    # teacher-force HF's greedy tokens through OUR decode path (crossing the
    # 8-token chunk boundary): top-2 rank + high correlation per step
    # (random-weight near-ties flip under bf16)
    row = np.asarray(logits[0], np.float32)
    for j, tok in enumerate(hf_toks):
        hf_row = hf_logits_all[len(prompt) - 1 + j]
        assert np.corrcoef(row, hf_row)[0, 1] > 0.99, j
        assert tok in np.argsort(row)[::-1][:2], (j, tok)
        req.append_token(int(tok))
        if j == len(hf_toks) - 1:
            break
        kv.grow_sequence(req.request_id, req.num_tokens)
        row = np.asarray(
            engine.run_decode(engine.prepare_decode_inputs([req]))[0],
            np.float32)


def test_starcoder2_parity():
    import transformers
    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.Starcoder2Config(
        **common, hidden_act="gelu_pytorch_tanh", use_bias=True,
        tie_word_embeddings=True, pad_token_id=0)
    hf_parity(hf_cfg, "Starcoder2ForCausalLM")


def test_nemotron_parity():
    import transformers
    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.NemotronConfig(
        **common, hidden_act="relu2", partial_rotary_factor=0.5,
        tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "NemotronForCausalLM")


def test_glm_parity():
    import transformers
    hf_cfg = transformers.GlmConfig(
        **COMMON, partial_rotary_factor=0.5, attention_bias=True,
        tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "GlmForCausalLM")


def test_glm4_parity():
    import transformers
    hf_cfg = transformers.Glm4Config(
        **COMMON, partial_rotary_factor=0.5, attention_bias=True,
        tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "Glm4ForCausalLM")


def test_seed_oss_parity():
    import transformers
    hf_cfg = transformers.SeedOssConfig(
        **COMMON, attention_bias=True, tie_word_embeddings=False,
        pad_token_id=0)
    hf_parity(hf_cfg, "SeedOssForCausalLM")


def test_smollm3_parity():
    import transformers
    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.SmolLM3Config(
        **common, no_rope_layers=[1, 0],   # layer 1 is NoPE
        tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "SmolLM3ForCausalLM")


def test_granite_parity():
    import transformers
    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.GraniteConfig(
        **common, embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.2, logits_scaling=3.0,
        tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "GraniteForCausalLM")


def test_olmo2_parity():
    import transformers
    common = {k: v for k, v in COMMON.items() if k != "head_dim"}
    hf_cfg = transformers.Olmo2Config(
        **common, tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "Olmo2ForCausalLM")


def test_exaone4_parity():
    import transformers
    hf_cfg = transformers.Exaone4Config(
        **COMMON, sliding_window=16, sliding_window_pattern=2,
        tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "Exaone4ForCausalLM")


def test_glm4_moe_parity():
    import transformers
    hf_cfg = transformers.Glm4MoeConfig(
        **COMMON, n_routed_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=64, first_k_dense_replace=1,
        n_shared_experts=1, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, norm_topk_prob=True, use_qk_norm=True,
        partial_rotary_factor=0.5, tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "Glm4MoeForCausalLM", corr_min=0.98)


def test_dots1_parity():
    import transformers
    hf_cfg = transformers.Dots1Config(
        **COMMON, n_routed_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=64, first_k_dense_replace=1,
        n_shared_experts=1, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, norm_topk_prob=True,
        tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "Dots1ForCausalLM", corr_min=0.98)


def test_hunyuan_dense_parity():
    import transformers
    hf_cfg = transformers.HunYuanDenseV1Config(
        **COMMON, tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "HunYuanDenseV1ForCausalLM")


def test_hunyuan_dense_post_rope_qk_norm_parity():
    """Perturbed query/key_layernorm weights pin the POST-rope placement
    (reference modeling_hunyuan_dense.py: norm applied after rotary)."""
    import transformers
    hf_cfg = transformers.HunYuanDenseV1Config(
        **COMMON, tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "HunYuanDenseV1ForCausalLM",
              perturb=("query_layernorm", "key_layernorm"))


def test_hunyuan_moe_parity():
    """HunYuan MoE: renormalized softmax top-k + always-on shared MLP
    (reference modeling_hunyuan_moe.py HunyuanMoE)."""
    import transformers
    hf_cfg = transformers.HunYuanMoEV1Config(
        **COMMON, tie_word_embeddings=False, pad_token_id=0,
        num_experts=4, moe_topk=2)
    hf_parity(hf_cfg, "HunYuanMoEV1ForCausalLM", corr_min=0.98,
              perturb=("query_layernorm", "key_layernorm"))


def test_apertus_parity():
    """Apertus: learned-xIELU non-gated MLP + pre-rope qk-norm + llama3
    rope scaling (HF modeling_apertus.py)."""
    import transformers
    hf_cfg = transformers.ApertusConfig(
        **COMMON, tie_word_embeddings=False, pad_token_id=0)
    hf_parity(hf_cfg, "ApertusForCausalLM",
              perturb=("q_norm", "k_norm", "alpha_p", "alpha_n"))


# ---- reference-only archs (no transformers class; config-driven) -----------

def _tiny_llm(cfg, **kw):
    import tensorrt_llm_tpu as tllm
    return tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                    max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                    seed=0, **kw)


def test_decilm_nas_blocks():
    """DeciLM/Nemotron-NAS: per-layer heterogeneous blocks.  All-no-op
    layers must reduce to lm_head(norm(embed)); a mixed config (GQA /
    linear-attention / no-op FFN) must generate deterministically."""
    import jax.numpy as jnp
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.ops.norms import rms_norm

    noop = {"attention": {"no_op": True}, "ffn": {"no_op": True}}
    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=8, max_position=128,
        architecture="DeciLMForCausalLM", tie_word_embeddings=False,
        extra={"block_configs": [noop, noop]})
    llm = _tiny_llm(cfg)
    try:
        prompt = [3, 7, 11]
        out = llm.generate(list(prompt), tllm.SamplingParams(
            max_tokens=1, temperature=0.0, ignore_eos=True))
        got = out[0].outputs[0].token_ids[0]
        p = llm.engine.params
        emb = llm.model.embedding(p["embedding"],
                                  jnp.asarray(prompt[-1:]))
        h = rms_norm(emb, p["final_norm"], cfg.rms_eps)
        logits = llm.model.lm_head(p["lm_head"], h)
        assert got == int(np.argmax(np.asarray(logits)[0]))
    finally:
        llm.shutdown()

    mixed = [
        {"attention": {"n_heads_in_group": 2}, "ffn": {"ffn_mult": 1.0}},
        {"attention": {"replace_with_linear": True}, "ffn": {"no_op": True}},
        {"attention": {"no_op": True}, "ffn": {"ffn_mult": 0.5}},
    ]
    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=3,
        num_heads=4, num_kv_heads=4, head_dim=8, max_position=128,
        architecture="DeciLMForCausalLM", tie_word_embeddings=False,
        extra={"block_configs": mixed})
    llm = _tiny_llm(cfg)
    try:
        sp = tllm.SamplingParams(max_tokens=8, temperature=0.0,
                                 ignore_eos=True)
        a = llm.generate([1, 2, 3], sp)[0].outputs[0].token_ids
        b = llm.generate([1, 2, 3], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 8
        # per-layer kv-head counts landed in the pools
        assert llm.engine.kv_caches[0][0].shape[1] == 2
        assert llm.engine.kv_caches[1].shape == (1,)
    finally:
        llm.shutdown()


def test_mistral_large3_weight_renames():
    """MistralLarge3 == DeepSeek arch + renorm-softmax routing, loaded from
    mistral-native names; the rename path must produce the same params as
    HF-style names."""
    import jax
    import tensorrt_llm_tpu as tllm

    kw = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
              num_layers=2, num_heads=2, num_kv_heads=2, head_dim=16,
              max_position=128, q_lora_rank=None, kv_lora_rank=32,
              qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
              num_experts=4, num_experts_per_tok=2,
              moe_intermediate_size=32, mlp_only_layers=(0,),
              tie_word_embeddings=False)
    cfg = ModelConfig(**kw, architecture="MistralLarge3ForCausalLM")
    llm = _tiny_llm(cfg)
    try:
        model = llm.model
        base = model.init(__import__("jax").random.PRNGKey(0))
        # export with HF deepseek names is impractical here; instead check
        # the renamer resolves mistral names for a spot set of keys
        captured = []
        def mget(name):
            captured.append(name)
            return None
        try:
            model.load_hf_weights(mget)
        except Exception:
            pass
        joined = "\n".join(captured)
        assert "tok_embeddings.weight" in joined
        sp = tllm.SamplingParams(max_tokens=6, temperature=0.0,
                                 ignore_eos=True)
        a = llm.generate([5, 9, 5, 9], sp)[0].outputs[0].token_ids
        b = llm.generate([5, 9, 5, 9], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 6
    finally:
        llm.shutdown()


def test_minimax_m2_generates():
    """MiniMax-M2: flat qk-norm + sigmoid-bias-renorm MoE routing."""
    import tensorrt_llm_tpu as tllm
    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=128,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        architecture="MiniMaxM2ForCausalLM", tie_word_embeddings=False)
    llm = _tiny_llm(cfg)
    try:
        assert llm.model.cfg.qk_norm_flat and \
            llm.model.cfg.moe_score_func == "sigmoid"
        sp = tllm.SamplingParams(max_tokens=6, temperature=0.0,
                                 ignore_eos=True)
        a = llm.generate([5, 9, 5, 9], sp)[0].outputs[0].token_ids
        b = llm.generate([5, 9, 5, 9], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 6
    finally:
        llm.shutdown()


def test_exaone_moe_generates():
    """EXAONE-MoE: EXAONE-4 hybrid attention + sigmoid-bias MoE with
    shared experts."""
    import tensorrt_llm_tpu as tllm
    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=128,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        sliding_window=16, layer_types=["sliding_attention",
                                        "full_attention"],
        architecture="ExaoneMoEForCausalLM", tie_word_embeddings=False,
        extra={"num_shared_experts": 1})
    llm = _tiny_llm(cfg)
    try:
        assert llm.model.cfg.n_shared_experts == 1
        assert llm.model.cfg.is_nope_layer(1) and \
            not llm.model.cfg.is_nope_layer(0)
        sp = tllm.SamplingParams(max_tokens=6, temperature=0.0,
                                 ignore_eos=True)
        a = llm.generate([5, 9, 5, 9], sp)[0].outputs[0].token_ids
        b = llm.generate([5, 9, 5, 9], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 6
    finally:
        llm.shutdown()
