"""Multimodal (LLaVA): vision tower parity + fused-embedding generation."""

import numpy as np
import pytest

from tensorrt_llm_tpu.models import get_model_class
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

IMG_TOK = 100


def _hf_setup():
    torch = pytest.importorskip("torch")
    import transformers
    hf_cfg = transformers.LlavaConfig(
        vision_config=dict(hidden_size=32, image_size=28, patch_size=14,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64),
        text_config=dict(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=16, max_position_embeddings=128),
        image_token_index=IMG_TOK)
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(hf_cfg)
    hf.eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    cfg = ModelConfig.from_hf_config(hf_cfg)
    assert cfg.architecture == "LlavaForConditionalGeneration"
    model = get_model_class(cfg.architecture)(cfg)
    params = model.load_hf_weights(lambda n: sd.get(n))
    return hf, hf_cfg, cfg, model, params


def test_vision_tower_parity():
    torch = pytest.importorskip("torch")
    hf, hf_cfg, cfg, model, params = _hf_setup()
    pix = np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        hf_feats = hf.model.vision_tower(
            torch.tensor(pix), output_hidden_states=True
        ).hidden_states[-2][:, 1:].numpy()  # llava default: layer -2, no CLS
    ours = np.asarray(model.vision(params["vision"],
                                   np.asarray(pix)), np.float32)
    assert np.corrcoef(ours.ravel(), hf_feats.ravel())[0, 1] > 0.99
    np.testing.assert_allclose(ours, hf_feats, rtol=5e-2, atol=5e-2)


def test_llava_logits_parity_with_image():
    torch = pytest.importorskip("torch")
    hf, hf_cfg, cfg, model, params = _hf_setup()
    pix = np.random.RandomState(1).randn(1, 3, 28, 28).astype(np.float32)
    # prompt: text, image placeholder, text (HF expects pre-expanded ids)
    n_img = model.num_image_tokens
    prompt = [5, 6, IMG_TOK, 7, 8, 9]

    expanded, embeds = model.process_multimodal(
        params, prompt, [pix[0]])
    assert len(expanded) == len(prompt) - 1 + n_img

    with torch.no_grad():
        hf_ids = [5, 6] + [IMG_TOK] * n_img + [7, 8, 9]
        hf_logits = hf(input_ids=torch.tensor([hf_ids]),
                       pixel_values=torch.tensor(pix)).logits[0, -1].numpy()

    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig, KVCacheManager)
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams

    kv = KVCacheManager(KVCacheConfig(block_size=8), cfg.num_layers,
                        cfg.num_kv_heads, cfg.head_dim, num_blocks=32)
    eng = ModelEngine(model, params, kv, max_seq_len=64, decode_buckets=(4,),
                      prefill_buckets=(16,))
    req = LlmRequest(expanded, SamplingParams(max_tokens=1))
    req.prompt_embeds = embeds
    kv.add_sequence(req.request_id, expanded)
    req.start_context()
    kv.grow_sequence(req.request_id, len(expanded))
    ours = np.asarray(
        eng.run_prefill(eng.prepare_prefill_inputs(req, len(expanded)))[0],
        np.float32)
    assert np.argmax(ours) == np.argmax(hf_logits)
    assert np.corrcoef(ours, hf_logits)[0, 1] > 0.99


def test_llava_e2e_generate_with_image():
    """Full LLM API with a multimodal dict prompt; greedy matches HF."""
    torch = pytest.importorskip("torch")
    hf, hf_cfg, cfg, model, params = _hf_setup()
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams

    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
              max_batch_size=4, kv_num_blocks=64, kv_block_size=8)
    # swap in the HF-parity weights
    llm.engine.update_params(params)
    llm.model = model
    pix = np.random.RandomState(2).randn(3, 28, 28).astype(np.float32)
    n_img = model.num_image_tokens
    try:
        out = llm.generate_async(
            {"prompt_token_ids": [4, IMG_TOK, 11, 12],
             "multi_modal_data": {"image": [pix]}},
            SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
        ).result(timeout=120)
        got = out.outputs[0].token_ids
        with torch.no_grad():
            hf_ids = [4] + [IMG_TOK] * n_img + [11, 12]
            hf_out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(pix[None]),
                max_new_tokens=4, do_sample=False)
        want = hf_out[0, len(hf_ids):].tolist()
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_preprocess_raw_uint8():
    from tensorrt_llm_tpu.inputs import preprocess_images

    class V:
        image_size = 28
        num_channels = 3

    img = (np.random.RandomState(3).rand(56, 40, 3) * 255).astype(np.uint8)
    out = preprocess_images([img], V())
    assert out[0].shape == (3, 28, 28)
    assert out[0].dtype == np.float32


def test_qwen2_vl_mrope_parity():
    """Qwen2-VL: ViT features + fused embeddings + M-RoPE positions give
    HF-identical greedy continuation (prefill 3D rope + decode delta)."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    hf_cfg = transformers.Qwen2VLConfig(
        text_config=dict(vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256, rope_theta=10000.0,
                         rope_scaling={"type": "mrope",
                                       "mrope_section": [2, 3, 3]}),
        vision_config=dict(depth=2, embed_dim=32, num_heads=2,
                           hidden_size=64, in_channels=3, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2,
                           mlp_ratio=4.0),
        image_token_id=250, vision_start_token_id=249)
    hf = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Qwen2VLForConditionalGeneration"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))

        # one 56x56 image -> grid (1,4,4) -> 16 patches -> 4 merged tokens
        rng = np.random.RandomState(0)
        patches = rng.randn(16, 3 * 2 * 14 * 14).astype(np.float32) * 0.5
        grid = (1, 4, 4)
        text1, text2 = [5, 9, 17], [23, 31]
        hf_ids = text1 + [250] * 4 + text2

        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([list(grid)]),
                max_new_tokens=6, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        prompt = {"prompt_token_ids": text1 + [250] + text2,
                  "multi_modal_data": {"image": [
                      {"pixel_values": patches, "grid_thw": grid}]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=6, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_qwen2_vl_patchify_matches_hf_processor():
    """Raw-image path: our patchifier == HF Qwen2VLImageProcessor for an
    image already sized to a multiple of patch*merge."""
    pytest.importorskip("torch")
    import transformers
    from tensorrt_llm_tpu.models.vision.qwen2_vit import Qwen2VisionTower
    from tensorrt_llm_tpu.models.qwen2_vl import (
        Qwen2VLForConditionalGeneration)

    proc = transformers.Qwen2VLImageProcessor(
        min_pixels=56 * 56, max_pixels=56 * 56 * 16, patch_size=14,
        temporal_patch_size=2, merge_size=2)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (56, 56, 3), np.uint8)
    out = proc(images=[img], return_tensors="np")
    hf_patches = out["pixel_values"]
    hf_grid = tuple(int(v) for v in out["image_grid_thw"][0])

    tower = Qwen2VisionTower(embed_dim=32, depth=1, num_heads=2,
                             out_hidden=64)
    self_like = type("S", (), {"vision": tower})()
    ours, grid = Qwen2VLForConditionalGeneration._patchify(self_like, img)
    assert grid == hf_grid, (grid, hf_grid)
    np.testing.assert_allclose(ours, hf_patches, rtol=2e-2, atol=2e-2)


def test_qwen2_5_vl_mrope_parity():
    """Qwen2.5-VL: windowed RMSNorm/SwiGLU ViT + M-RoPE greedy vs HF."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    hf_cfg = transformers.Qwen2_5_VLConfig(
        text_config=dict(vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256, rope_theta=10000.0,
                         rope_scaling={"type": "mrope",
                                       "mrope_section": [2, 3, 3]}),
        vision_config=dict(depth=2, hidden_size=32, num_heads=2,
                           out_hidden_size=64, intermediate_size=64,
                           patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2, window_size=28,
                           fullatt_block_indexes=[1]),
        image_token_id=250, vision_start_token_id=249)
    hf = transformers.Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Qwen2_5_VLForConditionalGeneration"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))
        rng = np.random.RandomState(0)
        # 84x84 -> grid (1,6,6): 36 patches, 9 merged tokens; window 28
        # covers 1 merge-unit => real windowed + fullatt mix
        patches = rng.randn(36, 3 * 2 * 14 * 14).astype(np.float32) * 0.5
        grid = (1, 6, 6)
        text1, text2 = [5, 9, 17], [23, 31]
        hf_ids = text1 + [250] * 9 + text2
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([list(grid)]),
                max_new_tokens=6, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        prompt = {"prompt_token_ids": text1 + [250] + text2,
                  "multi_modal_data": {"image": [
                      {"pixel_values": patches, "grid_thw": grid}]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=6, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_gemma3_vl_parity():
    """Gemma3 VLM: SigLIP tower + avg-pool projector + bidirectional image
    spans (custom-visibility prefill) vs HF greedy."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    hf_cfg = transformers.Gemma3Config(
        text_config=dict(vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=16, max_position_embeddings=256,
                         sliding_window=16, sliding_window_pattern=2,
                         rope_theta=1000000.0, rope_local_base_freq=10000.0),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=56, patch_size=14),
        mm_tokens_per_image=4, image_token_index=250,
        boi_token_index=248, eoi_token_index=249)
    hf = transformers.Gemma3ForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Gemma3ForConditionalGeneration"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))
        rng = np.random.RandomState(0)
        img = rng.randn(3, 56, 56).astype(np.float32) * 0.5
        text1, text2 = [5, 9, 17], [23, 31]
        hf_ids = text1 + [250] * 4 + text2
        token_type = [0] * 3 + [1] * 4 + [0] * 2
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(img)[None],
                token_type_ids=torch.tensor([token_type]),
                max_new_tokens=6, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        prompt = {"prompt_token_ids": text1 + [250] + text2,
                  "multi_modal_data": {"image": [img]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=6, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_qwen3_vl_deepstack_mrope_parity():
    """Qwen3-VL: learned-pos-embed ViT + DeepStack layer injection +
    INTERLEAVED M-RoPE give HF-identical greedy continuation."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    hf_cfg = transformers.Qwen3VLConfig(
        text_config=dict(vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=3,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=16, max_position_embeddings=256,
                         rope_theta=10000.0,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [2, 3, 3],
                                       "mrope_interleaved": True}),
        vision_config=dict(depth=3, hidden_size=32, num_heads=2,
                           out_hidden_size=64, intermediate_size=64,
                           in_channels=3, patch_size=14,
                           num_position_embeddings=64,
                           spatial_merge_size=2, temporal_patch_size=2,
                           deepstack_visual_indexes=[0, 1]),
        image_token_id=250, vision_start_token_id=249)
    hf = transformers.Qwen3VLForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Qwen3VLForConditionalGeneration"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))

        rng = np.random.RandomState(0)
        patches = rng.randn(16, 3 * 2 * 14 * 14).astype(np.float32) * 0.5
        grid = (1, 4, 4)
        # vision_start (249) must precede the image run for HF grid rope
        text1, text2 = [5, 9, 249], [23, 31]
        hf_ids = text1 + [250] * 4 + text2

        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([list(grid)]),
                max_new_tokens=6, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        prompt = {"prompt_token_ids": text1 + [250] + text2,
                  "multi_modal_data": {"image": [
                      {"pixel_values": patches, "grid_thw": grid}]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=6, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_qwen3_vl_moe_parity():
    """Qwen3-VL-MoE: packed gate_up/down expert tensors + deepstack +
    interleaved M-RoPE — HF-identical greedy continuation."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    hf_cfg = transformers.Qwen3VLMoeConfig(
        text_config=dict(vocab_size=128, hidden_size=64,
                         intermediate_size=128, moe_intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16, num_experts=4,
                         num_experts_per_tok=2, max_position_embeddings=256,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [2, 3, 3],
                                       "mrope_interleaved": True}),
        vision_config=dict(depth=2, hidden_size=32, num_heads=2,
                           out_hidden_size=64, intermediate_size=64,
                           patch_size=14, num_position_embeddings=64,
                           spatial_merge_size=2, temporal_patch_size=2,
                           deepstack_visual_indexes=[0]),
        image_token_id=120, vision_start_token_id=119)
    hf = transformers.Qwen3VLMoeForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Qwen3VLMoeForConditionalGeneration"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))

        rng = np.random.RandomState(0)
        patches = rng.randn(16, 3 * 2 * 14 * 14).astype(np.float32) * 0.5
        grid = (1, 4, 4)
        text1, text2 = [5, 9, 119], [23, 31]
        hf_ids = text1 + [120] * 4 + text2

        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([list(grid)]),
                max_new_tokens=6, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        prompt = {"prompt_token_ids": text1 + [120] + text2,
                  "multi_modal_data": {"image": [
                      {"pixel_values": patches, "grid_thw": grid}]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=6, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_llava_next_anyres_parity():
    """LLaVA-NeXT anyres: tile features re-assembled + unpadded +
    image_newline — HF-identical greedy continuation."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    S = 28   # tiny CLIP: image 28, patch 14 -> 2x2 patches per tile
    hf_cfg = transformers.LlavaNextConfig(
        text_config=dict(model_type="llama", vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256),
        vision_config=dict(model_type="clip_vision_model", hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, image_size=S,
                           patch_size=14, projection_dim=32),
        image_grid_pinpoints=[[28, 56], [56, 28], [56, 56]],
        image_token_index=250, vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    hf = transformers.LlavaNextForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "LlavaNextForConditionalGeneration"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))

        rng = np.random.RandomState(0)
        # a 40x56 original image tiled at pinpoint (56, 56): base + 4 tiles
        tiles = rng.randn(5, 3, S, S).astype(np.float32) * 0.5
        image_size = (40, 56)
        # feature count: base 4 + unpadded grid rows x (cols+1); read it
        # off our packer (shape-only — the values come from HF generate)
        import jax.numpy as jnp
        dummy = np.zeros((5, 4, 64), np.float32)
        n_feat = llm.model._pack_anyres(
            llm.engine.params, dummy, image_size).shape[0]

        text1, text2 = [5, 9, 17], [23, 31]
        hf_ids = text1 + [250] * n_feat + text2
        # random init gives near-flat logits (top-2 margins ~1e-3), so
        # match 3 greedy steps and pin the expanded prompt length
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(tiles[None]),
                image_sizes=torch.tensor([list(image_size)]),
                max_new_tokens=3, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        exp, emb = llm.model.process_multimodal(
            llm.engine.params, text1 + [250] + text2,
            llm.model.preprocess_images(
                [{"pixel_values": tiles, "image_size": image_size}]))
        assert len(exp) == len(hf_ids)

        prompt = {"prompt_token_ids": text1 + [250] + text2,
                  "multi_modal_data": {"image": [
                      {"pixel_values": tiles, "image_size": image_size}]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=3, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_pixtral_parity():
    """Pixtral: variable-resolution tower (interleaved 2D rope) + IMG/
    IMG_BREAK/IMG_END row layout — HF-identical greedy continuation."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    hf_cfg = transformers.LlavaConfig(
        text_config=dict(model_type="mistral", vocab_size=128,
                         hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2,
                         max_position_embeddings=256),
        vision_config=dict(model_type="pixtral", hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, head_dim=16,
                           image_size=56, patch_size=14,
                           rope_theta=10000.0),
        image_token_index=100, projector_hidden_act="gelu",
        vision_feature_select_strategy="full", image_seq_length=1)
    hf = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    assert cfg.architecture == "PixtralForConditionalGeneration"
    cfg.extra["image_break_token_id"] = 12
    cfg.extra["image_end_token_id"] = 13
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))

        rng = np.random.RandomState(0)
        img = rng.randn(3, 28, 42).astype(np.float32) * 0.5   # 2x3 patches
        h, w = 2, 3
        row = [100] * w
        img_ids = row + [12] + row + [13]
        text1, text2 = [5, 9, 17], [23, 31]
        hf_ids = text1 + img_ids + text2
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                pixel_values=torch.tensor(img[None]),
                image_sizes=torch.tensor([[28, 42]]),
                max_new_tokens=4, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        prompt = {"prompt_token_ids": text1 + [100] + text2,
                  "multi_modal_data": {"image": [img]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=4, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_mllama_cross_attention_parity():
    """Mllama (Llama 3.2 Vision): tiled gated vision encoder + cross-
    attention layers reading slot-injected vision K/V — HF-identical
    greedy continuation for a single-image prompt."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    V = 96
    hf_cfg = transformers.MllamaConfig(
        text_config=dict(vocab_size=V, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=3,
                         num_attention_heads=4, num_key_value_heads=2,
                         cross_attention_layers=[1], rope_theta=10000.0,
                         max_position_embeddings=256,
                         rope_scaling={"rope_type": "default"},
                         pad_token_id=0),
        vision_config=dict(hidden_size=32, num_hidden_layers=2,
                           num_global_layers=1, attention_heads=2,
                           intermediate_size=64, image_size=28,
                           patch_size=14, max_num_tiles=2,
                           intermediate_layers_indices=[0],
                           supported_aspect_ratios=[[1, 1], [1, 2]],
                           vision_output_dim=64),
        image_token_index=V)
    hf = transformers.MllamaForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "MllamaForConditionalGeneration"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))

        rng = np.random.RandomState(0)
        tiles = rng.randn(2, 3, 28, 28).astype(np.float32) * 0.5
        ids = [5, V, 9, 17, 23]          # image token at position 1
        L = len(ids)
        # tokens at/after the image attend both tiles
        cam = np.zeros((1, L, 1, 2), np.int64)
        cam[0, 1:, 0, :] = 1
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(tiles[None, None]),
                aspect_ratio_ids=torch.tensor([[2]]),
                aspect_ratio_mask=torch.tensor([[[1, 1]]]),
                cross_attention_mask=torch.tensor(cam),
                max_new_tokens=5, do_sample=False)
        want = out[0][L:].tolist()

        prompt = {"prompt_token_ids": ids,
                  "multi_modal_data": {"image": [
                      {"pixel_values": tiles, "aspect_ratio_id": 2,
                       "num_tiles": 2}]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=5, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_vila_downsample_and_generate():
    """VILA: 2x2 block-concat downsample ordering (row-major within each
    block) + SigLIP->projector->splice generate."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.models.vila import downsample_concat

    # characterization: out[(R,C)] = [p(2R,2C); p(2R,2C+1); p(2R+1,2C);
    # p(2R+1,2C+1)] channels
    rng = np.random.RandomState(0)
    f = rng.randn(16, 3).astype(np.float32)      # 4x4 grid
    out = downsample_concat(f, 2)
    g = f.reshape(4, 4, 3)
    want0 = np.concatenate([g[0, 0], g[0, 1], g[1, 0], g[1, 1]])
    want3 = np.concatenate([g[2, 2], g[2, 3], g[3, 2], g[3, 3]])
    np.testing.assert_allclose(out[0], want0)
    np.testing.assert_allclose(out[3], want3)

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=128,
        architecture="LlavaLlamaModel", tie_word_embeddings=False,
        extra={"vision_tower_cfg": {"hidden_size": 16,
                                    "num_hidden_layers": 2,
                                    "num_attention_heads": 2,
                                    "intermediate_size": 32,
                                    "image_size": 28, "patch_size": 14},
               "mm_projector_cfg": {"mm_projector_type": "mlp_downsample"},
               "mm_hidden_size": 16,
               "image_token_index": 60})
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        img = np.random.RandomState(1).randn(3, 28, 28).astype(np.float32)
        prompt = {"prompt_token_ids": [5, 60, 9],
                  "multi_modal_data": {"image": [img]}}
        sp = tllm.SamplingParams(max_tokens=5, temperature=0.0,
                                 ignore_eos=True)
        a = llm.generate([prompt], sp)[0].outputs[0].token_ids
        b = llm.generate([prompt], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 5
        # 28/14 = 2x2 patches -> one downsampled image token
        assert llm.model.num_image_tokens == 1
    finally:
        llm.shutdown()


def test_nemotron_nano_vl_generates():
    """Nemotron-H Nano VL: RADIO tower + pixel-shuffle + ReLU^2 projector
    on the NemotronH hybrid LM — fused-embeds generate."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=128,
        architecture="NemotronH_Nano_VL_V2", tie_word_embeddings=False,
        extra={"hybrid_override_pattern": "M*",
               "vision_config": {"hidden_size": 16, "num_hidden_layers": 2,
                                 "num_attention_heads": 2,
                                 "image_size": 32, "patch_size": 8,
                                 "mlp_ratio": 2.0,
                                 "args": {"num_cls_tokens": 1,
                                          "num_registers": 3}},
               "force_image_size": 32, "patch_size": 8,
               "downsample_ratio": 0.5, "projector_hidden_size": 48,
               "vit_hidden_size": 16, "image_token_index": 60,
               # mamba mixer dims for the hybrid layer
               "mamba_num_heads": 4, "mamba_head_dim": 8,
               "ssm_state_size": 16, "n_groups": 1, "expand": 2,
               "conv_kernel": 4, "chunk_size": 8})
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        assert llm.model.num_image_tokens == 4   # (32/8 / 2)^2
        img = np.random.RandomState(1).randn(3, 32, 32).astype(np.float32)
        prompt = {"prompt_token_ids": [5, 60, 9],
                  "multi_modal_data": {"image": [img]}}
        sp = tllm.SamplingParams(max_tokens=5, temperature=0.0,
                                 ignore_eos=True)
        a = llm.generate([prompt], sp)[0].outputs[0].token_ids
        b = llm.generate([prompt], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 5
    finally:
        llm.shutdown()


def test_phi4_multimodal_vision_parity():
    """Phi-4-MM HD transform: SigLIP feature tap + avg-pool compression +
    sub/global newline assembly + up/gelu/down projection — HF-identical
    greedy continuation."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    S = 32
    vc = transformers.Phi4MultimodalVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=S, patch_size=8, crop_size=S,
        image_token_id=90, feature_layer=-2)
    ac = transformers.Phi4MultimodalAudioConfig(
        hidden_size=32, intermediate_size=64, num_blocks=1,
        num_attention_heads=2, depthwise_seperable_out_channel=32,
        depthwise_multiplier=1, nemo_conv_channels=32, attention_dim=32)
    hf_cfg = transformers.Phi4MultimodalConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, vision_config=vc, audio_config=ac,
        pad_token_id=0)
    hf = transformers.Phi4MultimodalForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Phi4MultimodalForCausalLM"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))

        rng = np.random.RandomState(0)
        # global crop + 2 sub tiles: original 32x64 at crop 32
        crops = rng.randn(3, 3, S, S).astype(np.float32) * 0.5
        image_size = (32, 64)
        # token count: sub 2x(4x(8+1)*... compute via our packer
        n_feat = llm.model._embed_image(
            llm.engine.params,
            np.zeros((3, 3, S, S), np.float32), image_size).shape[0]

        text1, text2 = [5, 9, 17], [23, 31]
        hf_ids = text1 + [90] * n_feat + text2
        am = np.ones((1, 3, S // 8, S // 8), np.int64)
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                image_pixel_values=torch.tensor(crops[None]),
                image_sizes=torch.tensor([list(image_size)]),
                image_attention_mask=torch.tensor(am, dtype=torch.bool),
                max_new_tokens=4, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        prompt = {"prompt_token_ids": text1 + [90] + text2,
                  "multi_modal_data": {"image": [
                      {"pixel_values": crops, "image_size": image_size}]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=4, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_phi4_multimodal_audio_parity():
    """Phi-4-MM audio: conformer encoder (NeMo subsampling, relative
    attention bias, GLU conv modules) + speech projection — HF-identical
    greedy continuation."""
    torch = pytest.importorskip("torch")
    import transformers
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    torch.manual_seed(0)
    vc = transformers.Phi4MultimodalVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8, crop_size=32,
        image_token_id=90, feature_layer=-2)
    ac = transformers.Phi4MultimodalAudioConfig(
        hidden_size=32, intermediate_size=48, num_blocks=2,
        num_attention_heads=2, ext_pw_out_channel=32,
        depthwise_separable_out_channel=32, depthwise_multiplier=1,
        nemo_conv_channels=16, input_size=80, nemo_final_size=10,
        time_reduction=8, audio_token_id=91, bias_max_distance=100)
    hf_cfg = transformers.Phi4MultimodalConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, vision_config=vc, audio_config=ac,
        pad_token_id=0)
    hf = transformers.Phi4MultimodalForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "Phi4MultimodalForCausalLM"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=4, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        llm.engine.update_params(llm.model.load_hf_weights(
            lambda n: sd.get(n)))

        rng = np.random.RandomState(0)
        T = 64                                 # frames -> 8 audio tokens
        feats = rng.randn(T, 80).astype(np.float32)
        n_tok = llm.model._embed_audio(feats, "speech").shape[0]

        text1, text2 = [5, 9, 17], [23, 31]
        hf_ids = text1 + [91] * n_tok + text2
        with torch.no_grad():
            out = hf.generate(
                input_ids=torch.tensor([hf_ids]),
                audio_input_features=torch.tensor(feats[None]),
                audio_embed_sizes=torch.tensor([n_tok]),
                max_new_tokens=4, do_sample=False)
        want = out[0][len(hf_ids):].tolist()

        prompt = {"prompt_token_ids": text1 + [91] + text2,
                  "multi_modal_data": {"audio": [feats]}}
        got = llm.generate([prompt], tllm.SamplingParams(
            max_tokens=4, temperature=0.0,
            ignore_eos=True))[0].outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        llm.shutdown()


def test_hyperclovax_c_abstractor_torch_oracle():
    """C-Abstractor vs a torch replica of the timm RegStage structure
    (the reference builds it from timm.models.regnet.RegStage with
    stride=1/dilation=1/SiLU/LayerNorm2d — modeling_hyperclovax.py:515-553);
    state-dict names mirror timm so this also pins the weight loader."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F
    import jax
    import jax.numpy as jnp
    from tensorrt_llm_tpu.models.vision.c_abstractor import CAbstractor

    class LayerNorm2d(nn.LayerNorm):
        def __init__(self, c):
            super().__init__(c, eps=1e-6)

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = F.layer_norm(x, self.normalized_shape, self.weight,
                             self.bias, self.eps)
            return x.permute(0, 3, 1, 2)

    class ConvNormAct(nn.Module):       # timm names: .conv / .bn
        def __init__(self, i, o, k, groups=1, act=True):
            super().__init__()
            self.conv = nn.Conv2d(i, o, k, padding=k // 2, groups=groups,
                                  bias=False)
            self.bn = LayerNorm2d(o)
            self.act = act

        def forward(self, x):
            x = self.bn(self.conv(x))
            return F.silu(x) if self.act else x

    class SE(nn.Module):
        def __init__(self, c, rd):
            super().__init__()
            self.fc1 = nn.Conv2d(c, rd, 1, bias=True)
            self.fc2 = nn.Conv2d(rd, c, 1, bias=True)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = self.fc2(F.silu(self.fc1(s)))
            return x * s.sigmoid()

    class Bottleneck(nn.Module):        # timm regnet defaults:
        def __init__(self, i, o):       # bottle_ratio=1, group_size=1
            super().__init__()          # (depthwise), se_ratio=0.25
            self.conv1 = ConvNormAct(i, o, 1)
            self.conv2 = ConvNormAct(o, o, 3, groups=o)
            self.se = SE(o, int(round(i * 0.25)))
            self.conv3 = ConvNormAct(o, o, 1, act=False)

        def forward(self, x):
            return F.silu(self.conv3(self.se(self.conv2(self.conv1(x))))
                          + x)

    class RegStage(nn.Module):
        def __init__(self, depth, i, o):
            super().__init__()
            for b in range(depth):
                self.add_module(f"b{b + 1}",
                                Bottleneck(i if b == 0 else o, o))

        def forward(self, x):
            for m in self.children():
                x = m(x)
            return x

    class TorchCAbstractor(nn.Module):
        def __init__(self, n_q, n_tok, E, C, O):
            super().__init__()
            self.pos_emb = nn.Parameter(torch.randn(1, n_tok, E) * 0.02)
            hw = int(n_q ** 0.5)
            self.net = nn.Sequential(RegStage(3, E, C),
                                     nn.AdaptiveAvgPool2d((hw, hw)),
                                     RegStage(3, C, C))
            self.readout = nn.Sequential(nn.Linear(C, O), nn.SiLU(),
                                         nn.Linear(O, O))

        def forward(self, x):
            x = x + self.pos_emb
            B, L, D = x.shape
            g = int(L ** 0.5)
            x = x.view(B, g, g, D).permute(0, 3, 1, 2)
            x = self.net(x)
            x = x.flatten(2).transpose(1, 2)
            return self.readout(x)

    torch.manual_seed(0)
    E, C, O, n_tok, n_q = 8, 8, 12, 25, 4   # 5x5 grid -> 2x2 queries
    ref = TorchCAbstractor(n_q, n_tok, E, C, O).eval()
    sd = {"mm_projector." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}

    ca = CAbstractor(num_queries=n_q, num_input_tokens=n_tok,
                     encoder_hidden_size=E, hidden_size=C,
                     output_hidden_size=O, dtype=jnp.float32)
    params = ca.load_hf_weights(lambda n: sd.get(n), "mm_projector.")

    x = np.random.RandomState(1).randn(2, n_tok, E).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(ca(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_hyperclovax_anyres_generate():
    """HCX-VLM e2e: anyres tile packing (base + unpadded grid +
    image_newline columns, (w, h)-ordered image sizes) through the
    fused-embeds engine path."""
    import tensorrt_llm_tpu as tllm

    hf_cfg = {
        "architectures": ["HCXVisionForCausalLM"],
        "model_type": "hyperclovax_vlm",
        "language_config": dict(
            model_type="llama", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256),
        "vision_config": dict(
            model_type="siglip_vision_model", hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14),
        "num_queries_vis_abstractor": 4,
        "proj_pos_emb": True, "proj_prenorm": False,
        "anyres": True, "unpad": True, "max_num_grids": 4,
        "use_nth_layer": -1,
    }
    cfg = ModelConfig.from_hf_config(hf_cfg)
    assert cfg.architecture == "HCXVisionForCausalLM"
    assert cfg.vocab_size == 128 and cfg.hidden_size == 64

    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=2, kv_num_blocks=64, kv_block_size=8,
                   seed=0)
    try:
        img_tok = llm.model.image_token_index
        assert img_tok == 129     # vocab_size + 1 sentinel

        # original image w=50, h=27 -> best grid (28, 56): 1x2 tiles.
        # feature side 2: grid [H, 2, 4]; aspect 50/27 < 4/2 keeps all
        # cols (pad 0); +newline col -> 2*(4+1)=10 rows + base 4 = 14
        rng = np.random.RandomState(0)
        tiles = rng.randn(3, 3, 28, 28).astype(np.float32) * 0.5
        image = {"pixel_values": tiles, "image_size": (50, 27)}

        exp, emb = llm.model.process_multimodal(
            llm.engine.params, [5, img_tok, 9], [image])
        assert len(exp) == 2 + 14 and emb.shape == (16, 64)
        assert np.isfinite(emb).all()

        prompt = {"prompt_token_ids": [5, img_tok, 9],
                  "multi_modal_data": {"image": [image]}}
        sp = tllm.SamplingParams(max_tokens=4, temperature=0.0,
                                 ignore_eos=True)
        a = llm.generate([prompt], sp)[0].outputs[0].token_ids
        b = llm.generate([prompt], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 4

        # single-tile (non-grid) image: 4 queries + newline row
        one = {"pixel_values": tiles[:1], "image_size": (28, 28)}
        exp1, emb1 = llm.model.process_multimodal(
            llm.engine.params, [5, img_tok], [one])
        assert len(exp1) == 1 + 5
    finally:
        llm.shutdown()


def test_epd_encode_then_generate_matches_direct():
    """EPD disagg: encode_multimodal on one LLM instance + a generation
    request fed multi_modal_embeddings must match the direct multimodal
    path exactly (reference MultimodalEncoder + mm_embedding flow)."""
    pytest.importorskip("torch")
    hf, hf_cfg, cfg, model, params = _hf_setup()
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams

    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
              max_batch_size=4, kv_num_blocks=64, kv_block_size=8)
    llm.engine.update_params(params)
    llm.model = model
    pix = np.random.RandomState(3).randn(3, 28, 28).astype(np.float32)
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    mm_prompt = {"prompt_token_ids": [4, IMG_TOK, 11, 12],
                 "multi_modal_data": {"image": [pix]}}
    try:
        direct = llm.generate_async(mm_prompt, sp).result(
            timeout=120).outputs[0].token_ids
        payload = llm.encode_multimodal(mm_prompt)
        assert payload["embeds"].ndim == 2
        assert payload["mm_hash"]
        epd = llm.generate_async(
            {"multi_modal_embeddings": payload}, sp).result(
                timeout=120).outputs[0].token_ids
        assert epd == direct, (epd, direct)
    finally:
        llm.shutdown()


def test_epd_mm_embeddings_route_and_handle():
    """/v1/mm_embeddings returns a handle; chat with the handle generates
    the same tokens as direct image chat."""
    pytest.importorskip("torch")
    import asyncio
    import base64
    import io

    from aiohttp.test_utils import TestClient, TestServer
    from tensorrt_llm_tpu.llmapi import LLM
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    hf, hf_cfg, cfg, model, params = _hf_setup()

    class Tok:
        eos_token_id = None
        bos_token_id = None
        chat_template = "custom"  # truthy => apply_chat_template is used

        def encode(self, text):
            out = []
            for w in text.split():
                out.append(IMG_TOK if w == "<image>" else
                           (sum(map(ord, w)) % 90) + 5)
            return out

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

        def apply_chat_template(self, msgs, tokenize=False,
                                add_generation_prompt=True):
            parts = []
            for m in msgs:
                c = m["content"]
                if isinstance(c, list):
                    parts.extend("<image>" if p.get("type") == "image"
                                 else str(p.get("text", "")) for p in c)
                else:
                    parts.append(str(c))
            return " ".join(parts)

    llm = LLM(model=cfg, tokenizer=Tok(), max_seq_len=64, max_batch_size=4,
              kv_num_blocks=64, kv_block_size=8)
    llm.engine.update_params(params)
    llm.model = model
    server = OpenAIServer(llm, "tiny-vlm")
    loop = asyncio.new_event_loop()
    tc = TestClient(TestServer(server.app, loop=loop), loop=loop)
    loop.run_until_complete(tc.start_server())
    try:
        # a 2x2 RGB png as data URL
        from PIL import Image
        img = Image.fromarray(
            np.random.RandomState(5).randint(0, 255, (28, 28, 3), "uint8"))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        durl = "data:image/png;base64," + \
            base64.b64encode(buf.getvalue()).decode()
        msgs = [{"role": "user", "content": [
            {"type": "text", "text": "look"},
            {"type": "image_url", "image_url": {"url": durl}},
        ]}]
        r = loop.run_until_complete(tc.post("/v1/mm_embeddings", json={
            "model": "tiny-vlm", "messages": msgs}))
        assert r.status == 200, loop.run_until_complete(r.text())
        enc = loop.run_until_complete(r.json())
        handle = enc["mm_embedding_handle"]
        assert handle["format"] == "npz_b64" and handle["mm_hash"]

        r1 = loop.run_until_complete(tc.post("/v1/chat/completions", json={
            "model": "tiny-vlm", "messages": msgs, "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True}))
        assert r1.status == 200, loop.run_until_complete(r1.text())
        direct = loop.run_until_complete(r1.json())

        r2 = loop.run_until_complete(tc.post("/v1/chat/completions", json={
            "model": "tiny-vlm", "messages": msgs, "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True,
            "multi_modal_embeddings": handle}))
        assert r2.status == 200, loop.run_until_complete(r2.text())
        epd = loop.run_until_complete(r2.json())
        assert (epd["choices"][0]["message"]["content"]
                == direct["choices"][0]["message"]["content"])
    finally:
        loop.run_until_complete(tc.close())
        loop.close()
        llm.shutdown()


def test_multimodal_encoder_class_is_encode_only():
    pytest.importorskip("torch")
    from tensorrt_llm_tpu.llmapi import MultimodalEncoder, SamplingParams
    hf, hf_cfg, cfg, model, params = _hf_setup()
    enc = MultimodalEncoder(model=cfg, skip_tokenizer_init=True,
                            max_seq_len=64, max_batch_size=2,
                            kv_block_size=8)
    enc.engine.update_params(params)
    enc.model = model
    pix = np.random.RandomState(4).randn(3, 28, 28).astype(np.float32)
    try:
        payload = enc.encode_multimodal(
            {"prompt_token_ids": [4, IMG_TOK, 11],
             "multi_modal_data": {"image": [pix]}})
        assert payload["embeds"].shape[0] == len(payload["token_ids"])
        with pytest.raises(RuntimeError):
            enc.generate(["hi"], SamplingParams(max_tokens=2))
    finally:
        enc.shutdown()
