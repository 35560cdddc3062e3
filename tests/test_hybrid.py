"""Hybrid (Nemotron-H-style) model: mamba/attention/MLP layer mix."""

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig


def mk_cfg(pattern="M*-M"):
    return ModelConfig(
        architecture="NemotronHForCausalLM", vocab_size=96, hidden_size=64,
        intermediate_size=128, num_layers=len(pattern), num_heads=4,
        num_kv_heads=2, head_dim=16, max_position=128,
        ssm_state_size=16, ssm_num_heads=4, ssm_head_dim=16, ssm_n_groups=2,
        ssm_conv_kernel=4, ssm_chunk_size=8, tie_word_embeddings=True,
        extra={"hybrid_override_pattern": pattern})


def mk_llm(pattern="M*-M", seed=0):
    return LLM(model=mk_cfg(pattern), skip_tokenizer_init=True,
               max_seq_len=64, max_batch_size=4, kv_num_blocks=64,
               kv_block_size=8, seed=seed)


def test_hybrid_decode_matches_prefill():
    """Logits for token t from decode-with-state == prefill over prefix+t,
    across mamba AND attention layers in one stack."""
    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig, KVCacheManager)
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    import jax

    cfg = mk_cfg()
    model = get_model_class(cfg.architecture)(cfg)
    params = model.init(jax.random.PRNGKey(3))
    prompt = list(np.random.RandomState(1).randint(1, 95, 14))

    def make():
        kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                            cfg.num_kv_heads, cfg.head_dim, num_blocks=32,
                            max_slots=8)
        eng = ModelEngine(model, params, kv, max_seq_len=64,
                          decode_buckets=(4,), prefill_buckets=(8, 16))
        return eng, kv

    def prefill(eng, kv, req, chunks):
        kv.add_sequence(req.request_id, req.prompt_token_ids)
        req.start_context()
        logits = None
        for c in chunks:
            kv.grow_sequence(req.request_id, req.context_position + c)
            logits = eng.run_prefill(eng.prepare_prefill_inputs(req, c))
            req.context_position += c
        return np.asarray(logits[0], np.float32)

    # A: prefill 13 then decode token 14
    engA, kvA = make()
    rA = LlmRequest(prompt[:13], SamplingParams(max_tokens=2))
    prefill(engA, kvA, rA, [13])
    rA.finish_context()
    rA.append_token(prompt[13])
    kvA.grow_sequence(rA.request_id, rA.num_tokens)
    lA = np.asarray(engA.run_decode(engA.prepare_decode_inputs([rA]))[0],
                    np.float32)

    # B: prefill all 14 at once; C: chunked prefill 8+6
    engB, kvB = make()
    rB = LlmRequest(list(prompt), SamplingParams(max_tokens=2))
    lB = prefill(engB, kvB, rB, [14])
    engC, kvC = make()
    rC = LlmRequest(list(prompt), SamplingParams(max_tokens=2))
    lC = prefill(engC, kvC, rC, [8, 6])

    np.testing.assert_allclose(lA, lB, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(lB, lC, rtol=2e-2, atol=2e-2)


def test_hybrid_e2e_batched_greedy_deterministic():
    llm = mk_llm(seed=4)
    try:
        sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
        outs1 = llm.generate([[1, 2, 3], [7, 8, 9, 10, 11]], sp)
        outs2 = llm.generate([[1, 2, 3], [7, 8, 9, 10, 11]], sp)
        toks1 = [o.outputs[0].token_ids for o in outs1]
        toks2 = [o.outputs[0].token_ids for o in outs2]
        assert toks1 == toks2
        assert all(len(t) == 6 for t in toks1)
    finally:
        llm.shutdown()


def test_hybrid_tp_matches_single_device():
    """SSM TP: mamba heads/groups + attention heads + MLP sharded over the
    tp axis; logits == single-device (gated-norm variance psums over the
    full d_inner; interleaved in_proj/conv layouts survive the cuts)."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from tensorrt_llm_tpu.parallel.mapping import Mapping
    prompt = list(np.random.RandomState(7).randint(1, 95, 13))
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)

    llm1 = mk_llm(seed=4)
    try:
        want = llm1.generate([prompt], sp)[0].outputs[0].token_ids
    finally:
        llm1.shutdown()

    cfg = mk_cfg()
    cfg.mapping = Mapping(tp_size=2)
    llm2 = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
               max_batch_size=4, kv_num_blocks=64, kv_block_size=8, seed=4)
    try:
        got = llm2.generate([prompt], sp)[0].outputs[0].token_ids
    finally:
        llm2.shutdown()
    assert got == want, (got, want)


def test_mamba2_tp_matches_single_device():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from tensorrt_llm_tpu.parallel.mapping import Mapping

    def cfg_for(tp):
        return ModelConfig(
            architecture="Mamba2ForCausalLM", vocab_size=96, hidden_size=64,
            intermediate_size=128, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16, max_position=128,
            ssm_state_size=16, ssm_num_heads=4, ssm_head_dim=16,
            ssm_n_groups=2, ssm_conv_kernel=4, ssm_chunk_size=8,
            tie_word_embeddings=True, mapping=Mapping(tp_size=tp))

    prompt = [5, 9, 5, 9, 13, 2]
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    llm1 = LLM(model=cfg_for(1), skip_tokenizer_init=True, max_seq_len=64,
               max_batch_size=4, kv_num_blocks=64, kv_block_size=8, seed=6)
    try:
        want = llm1.generate([prompt], sp)[0].outputs[0].token_ids
    finally:
        llm1.shutdown()
    llm2 = LLM(model=cfg_for(2), skip_tokenizer_init=True, max_seq_len=64,
               max_batch_size=4, kv_num_blocks=64, kv_block_size=8, seed=6)
    try:
        got = llm2.generate([prompt], sp)[0].outputs[0].token_ids
    finally:
        llm2.shutdown()
    assert got == want, (got, want)


def test_bamba_hf_parity():
    """Bamba (mamba2+attention hybrid) against HF transformers logits —
    the first hybrid arch with a full HF weight loader."""
    torch = pytest.importorskip("torch")
    import jax
    import transformers
    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig, KVCacheManager)
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest

    torch.manual_seed(0)
    hf_cfg = transformers.BambaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0,
        mamba_n_heads=8, mamba_d_head=16, mamba_d_state=32,
        mamba_n_groups=1, mamba_expand=2, mamba_d_conv=4,
        mamba_chunk_size=8, attn_layer_indices=[1],
        tie_word_embeddings=False)
    hf = transformers.AutoModelForCausalLM.from_config(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "BambaForCausalLM"
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))

    prompt = list(np.random.RandomState(0).randint(1, 95, 12))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([prompt])).logits[0, -1].numpy()

    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=32,
                        max_slots=8)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(16,))
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams as SP
    req = LlmRequest(prompt, SP(max_tokens=1))
    kv.add_sequence(req.request_id, prompt)
    req.start_context()
    kv.grow_sequence(req.request_id, len(prompt))
    ours = np.asarray(engine.run_prefill(
        engine.prepare_prefill_inputs(req, len(prompt)))[0], np.float32)

    assert np.argmax(ours) == np.argmax(hf_logits), (
        np.argsort(ours)[-3:], np.argsort(hf_logits)[-3:])
    corr = np.corrcoef(ours, hf_logits)[0, 1]
    assert corr > 0.98, corr


def test_granite_hybrid_hf_parity():
    """Granite 4.0 hybrid (dense shared-MLP): NoPE attention + multipliers
    + fused gate|up shared MLP against HF logits."""
    torch = pytest.importorskip("torch")
    import jax
    import transformers
    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig, KVCacheManager)
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams as SP

    torch.manual_seed(0)
    hf_cfg = transformers.GraniteMoeHybridConfig(
        vocab_size=96, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, pad_token_id=0,
        mamba_n_heads=8, mamba_d_head=16, mamba_d_state=32,
        mamba_n_groups=1, mamba_expand=2, mamba_d_conv=4,
        mamba_chunk_size=8, layer_types=["mamba", "attention", "mamba"],
        shared_intermediate_size=128, num_local_experts=0,
        num_experts_per_tok=0, embedding_multiplier=2.0,
        residual_multiplier=0.5, attention_multiplier=0.2,
        logits_scaling=3.0, tie_word_embeddings=False)
    hf = transformers.AutoModelForCausalLM.from_config(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "GraniteMoeHybridForCausalLM"
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))

    prompt = list(np.random.RandomState(0).randint(1, 95, 12))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([prompt])).logits[0, -1].numpy()

    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=32,
                        max_slots=8)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(16,))
    req = LlmRequest(prompt, SP(max_tokens=1))
    kv.add_sequence(req.request_id, prompt)
    req.start_context()
    kv.grow_sequence(req.request_id, len(prompt))
    ours = np.asarray(engine.run_prefill(
        engine.prepare_prefill_inputs(req, len(prompt)))[0], np.float32)
    assert np.argmax(ours) == np.argmax(hf_logits), (
        np.argsort(ours)[-3:], np.argsort(hf_logits)[-3:])
    corr = np.corrcoef(ours, hf_logits)[0, 1]
    assert corr > 0.98, corr


def test_minimax_hf_parity():
    """MiniMax hybrid: lightning linear attention + full attention + MoE vs
    HF logits, including greedy decode through the recurrent state."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm

    torch.manual_seed(0)
    hf_cfg = transformers.MiniMaxConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0,
        num_local_experts=4, num_experts_per_tok=2, block_size=8,
        layer_types=["linear_attention", "full_attention"],
        tie_word_embeddings=False)
    hf = transformers.AutoModelForCausalLM.from_config(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "MiniMaxForCausalLM"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))
        prompt = list(np.random.RandomState(0).randint(1, 95, 19))
        with torch.no_grad():
            want = hf.generate(torch.tensor([prompt]), max_new_tokens=6,
                               do_sample=False).numpy()[0][len(prompt):]
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=6, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want.tolist(), (got, want.tolist())
    finally:
        llm.shutdown()


def test_qwen3_next_hf_parity():
    """Qwen3-Next: gated deltanet + gated attention + gated-shared MoE vs
    HF greedy continuation (prefill chunk rule + decode recurrence)."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm

    torch.manual_seed(0)
    hf_cfg = transformers.Qwen3NextConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, pad_token_id=0,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, shared_expert_intermediate_size=32,
        decoder_sparse_step=1,
        layer_types=["linear_attention", "full_attention"],
        tie_word_embeddings=False)
    hf = transformers.Qwen3NextForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Qwen3NextForCausalLM"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))
        prompt = list(np.random.RandomState(0).randint(1, 95, 19))
        with torch.no_grad():
            want = hf.generate(torch.tensor([prompt]), max_new_tokens=6,
                               do_sample=False).numpy()[0][len(prompt):]
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=6, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want.tolist(), (got, want.tolist())
    finally:
        llm.shutdown()


def test_lfm2_hf_parity_and_decode():
    """LFM2 (gated short-conv + attention hybrid): prefill logits vs HF and
    a chunked-prefill + decode greedy continuation vs HF generate."""
    torch = pytest.importorskip("torch")
    import transformers
    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig, KVCacheManager)
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams as SP

    torch.manual_seed(0)
    hf_cfg = transformers.Lfm2Config(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0, conv_L_cache=3,
        layer_types=["conv", "full_attention", "conv"],
        block_multiple_of=32, tie_word_embeddings=False)
    hf = transformers.AutoModelForCausalLM.from_config(hf_cfg).eval()
    with torch.no_grad():
        for n, prm in hf.named_parameters():
            if "layernorm" in n:
                prm.mul_(torch.rand_like(prm) + 0.5)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Lfm2ForCausalLM"
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))

    prompt = list(np.random.RandomState(0).randint(1, 95, 12))
    with torch.no_grad():
        hf_logits = hf(torch.tensor([prompt])).logits[0, -1].numpy()
        hf_gen = hf.generate(
            torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            pad_token_id=0)[0, len(prompt):].tolist()

    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=32,
                        max_slots=8)
    engine = ModelEngine(model, params, kv, max_seq_len=64,
                         decode_buckets=(4,), prefill_buckets=(8, 16))
    req = LlmRequest(prompt, SP(max_tokens=1))
    kv.add_sequence(req.request_id, prompt)
    req.start_context()
    kv.grow_sequence(req.request_id, len(prompt))
    # chunked prefill exercises conv-state carry across chunks
    i1 = engine.prepare_prefill_inputs(req, 8)
    engine.run_prefill(i1)
    req.context_position += 8
    ours = np.asarray(engine.run_prefill(
        engine.prepare_prefill_inputs(req, 4))[0], np.float32)
    assert np.argmax(ours) == np.argmax(hf_logits), (
        np.argsort(ours)[-3:], np.argsort(hf_logits)[-3:])
    corr = np.corrcoef(ours, hf_logits)[0, 1]
    assert corr > 0.98, corr

    got = []
    toks = list(prompt)
    tok = int(np.argmax(ours))
    for _ in range(6):
        got.append(tok)
        toks.append(tok)
        req.append_token(tok)
        kv.grow_sequence(req.request_id, len(toks))
        logits = np.asarray(engine.run_decode(
            engine.prepare_decode_inputs([req])), np.float32)[0]
        tok = int(np.argmax(logits))
    assert got == hf_gen, (got, hf_gen)
