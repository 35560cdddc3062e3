"""Video frame sampling + EVS token pruning (reference inputs/evs.py)."""

import numpy as np

from tensorrt_llm_tpu.inputs.evs import (compute_retained_tokens_count,
                                         compute_retention_mask,
                                         prune_video_embeddings,
                                         sample_video_frames)


def test_sample_video_frames_uniform():
    video = np.stack([np.full((4, 4, 3), i, np.uint8) for i in range(32)])
    frames = sample_video_frames(video, 8)
    assert len(frames) == 8
    vals = [int(f[0, 0, 0]) for f in frames]
    assert vals[0] == 0 and vals[-1] == 31
    assert vals == sorted(vals)
    # short videos keep every frame
    assert len(sample_video_frames(video[:3], 8)) == 3


def test_retained_count_floor_is_one_frame():
    # heavy pruning can never drop below one full frame of tokens
    assert compute_retained_tokens_count((10, 8, 8), 2, 0.99) == 16
    assert compute_retained_tokens_count((10, 8, 8), 2, 0.5) == 80


def test_retention_mask_keeps_first_frame_and_changes():
    T, Hm, Wm, D = 4, 2, 2, 8
    rng = np.random.RandomState(0)
    base = rng.randn(Hm, Wm, D).astype(np.float32)
    frames = [base.copy() for _ in range(T)]
    # frame 2, position (1, 1) changes drastically
    frames[2] = base.copy()
    frames[2][1, 1] = -base[1, 1] + rng.randn(D)
    embeds = np.stack(frames).reshape(T * Hm * Wm, D)
    mask = compute_retention_mask(embeds, (T, Hm * 2, Wm * 2), 2,
                                  pruning_ratio=0.5)
    m = mask.reshape(T, Hm, Wm)
    assert m[0].all(), "first frame must be fully retained"
    assert m[2, 1, 1], "the changed token must be retained"
    assert mask.sum() == compute_retained_tokens_count(
        (T, Hm * 2, Wm * 2), 2, 0.5)
    # static positions in later frames are the ones pruned
    assert not m[1:].all()


def test_prune_video_embeddings_roundtrip():
    T, Hm, Wm, D = 3, 2, 2, 4
    embeds = np.random.RandomState(1).randn(T * Hm * Wm, D).astype(
        np.float32)
    kept, idx = prune_video_embeddings(embeds, (T, Hm * 2, Wm * 2), 2, 0.4)
    assert kept.shape[0] == len(idx) == compute_retained_tokens_count(
        (T, Hm * 2, Wm * 2), 2, 0.4)
    np.testing.assert_array_equal(kept, embeds[idx])


def test_video_prompt_feeds_frames_to_vlm():
    """{"multi_modal_data": {"video": [...]}} routes sampled frames through
    the model's image pipeline end-to-end (LLaVA-class, raw uint8 frames
    through the bicubic preprocessor)."""
    import pytest
    pytest.importorskip("transformers")
    import transformers

    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    IMG_TOK = 100
    hf_cfg = transformers.LlavaConfig(
        vision_config=dict(hidden_size=32, image_size=28, patch_size=14,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64),
        text_config=dict(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=16, max_position_embeddings=128),
        image_token_index=IMG_TOK)
    cfg = ModelConfig.from_hf_config(hf_cfg)
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
                   max_batch_size=2, kv_num_blocks=64, kv_block_size=8)
    video = np.random.RandomState(0).randint(
        0, 256, (6, 24, 24, 3), dtype=np.uint8)
    n_frames = 2
    prompt = {"prompt_token_ids": [5, IMG_TOK, IMG_TOK, 7],
              "multi_modal_data": {"video": [video],
                                   "num_frames": n_frames}}
    out = llm.generate([prompt], tllm.SamplingParams(max_tokens=3,
                                                     ignore_eos=True))
    assert len(out[0].outputs[0].token_ids) == 3
    llm.shutdown()
