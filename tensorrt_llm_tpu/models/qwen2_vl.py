"""Qwen2-VL vision-language model (M-RoPE + native-resolution ViT).

Counterpart of the reference's `_torch/models/modeling_qwen2vl.py`: a
Qwen2 language model whose rope is the multimodal 3D variant (temporal /
height / width position per token — `ops/rope.apply_mrope`), fed by the
Qwen2 vision transformer (models/vision/qwen2_vit.py) whose merged patch
features are spliced into the prompt embeddings at the image-placeholder
rows (the fused-embedding prefill path shared with LLaVA).

`process_multimodal` additionally returns the request's M-RoPE inputs: the
[3, P] prompt position grid (text runs sequential, image tokens indexed by
their (t, h, w) grid — HF `get_rope_index`) and the decode-position delta
(generated tokens continue from max(position) + 1, usually < prompt
length because 2D image positions compress)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.vision.qwen2_vit import Qwen2VisionTower

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def build_mrope_positions(token_ids: List[int], image_token: int,
                          grids: List[Tuple[int, int, int]], merge: int
                          ) -> Tuple[np.ndarray, int]:
    """HF `get_rope_index` for image prompts: returns ([3, P] positions,
    decode delta) where generated tokens continue at P + delta."""
    out = [[], [], []]
    st = 0
    i = 0
    img = 0
    n = len(token_ids)
    while i < n:
        if token_ids[i] == image_token:
            t, h, w = grids[img]
            img += 1
            lh, lw = h // merge, w // merge
            cnt = t * lh * lw
            ti = np.repeat(np.arange(t), lh * lw)
            hi = np.tile(np.repeat(np.arange(lh), lw), t)
            wi = np.tile(np.arange(lw), t * lh)
            out[0].extend((st + ti).tolist())
            out[1].extend((st + hi).tolist())
            out[2].extend((st + wi).tolist())
            st += max(t, lh, lw)
            i += cnt
        else:
            out[0].append(st)
            out[1].append(st)
            out[2].append(st)
            st += 1
            i += 1
    return np.asarray(out, np.int32), st - n


@register_auto_model("Qwen2VLForConditionalGeneration")
class Qwen2VLForConditionalGeneration(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.attention_bias = True    # Qwen2 LM: biased QKV
        assert cfg.rope.mrope_sections, \
            "Qwen2-VL needs rope_scaling={'type': 'mrope', 'mrope_section': …}"
        super().__init__(cfg)
        vc = cfg.extra.get("vision_config") or {}
        self.image_token_index = (cfg.extra.get("image_token_id")
                                  or cfg.extra.get("image_token_index")
                                  or 151655)
        self.vision = self._make_vision(vc, cfg)

    def _make_vision(self, vc, cfg):
        return Qwen2VisionTower(
            embed_dim=vc.get("embed_dim", 1280),
            depth=vc.get("depth", 32),
            num_heads=vc.get("num_heads", 16),
            out_hidden=vc.get("hidden_size", cfg.hidden_size),
            patch_size=vc.get("patch_size", 14),
            temporal_patch=vc.get("temporal_patch_size", 2),
            in_channels=vc.get("in_channels", 3),
            spatial_merge=vc.get("spatial_merge_size", 2),
            mlp_ratio=vc.get("mlp_ratio", 4.0),
            dtype=cfg.dtype,
        )

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        params = super().init(k1)
        params["vision"] = self.vision.init(k2)
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init(jax.random.PRNGKey(0)))
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        def lm_get(name):
            for fmt in (name.replace("model.", "model.language_model.", 1),
                        "language_model." + name):
                a = get_tensor(fmt)
                if a is not None:
                    return a
            return get_tensor(name)   # lm_head.weight is top-level

        params = super().load_hf_weights(lm_get, dtype=dtype)
        params["vision"] = self.vision.load_hf_weights(
            get_tensor, "model.visual.")
        return params

    # ---- image preprocessing ----------------------------------------------------
    def preprocess_images(self, images):
        """Raw HWC uint8 images (or HF-processor dicts with pixel_values +
        grid_thw) -> [(patches [N, C*T*p*p], (t, h, w))]."""
        out = []
        for im in images:
            if isinstance(im, dict):
                out.append((np.asarray(im["pixel_values"], np.float32),
                            tuple(int(v) for v in im["grid_thw"])))
                continue
            out.append(self._patchify(np.asarray(im)))
        return out

    def _patchify(self, a: np.ndarray):
        """HF Qwen2VLImageProcessor flattening for one HWC uint8 image."""
        p = self.vision.patch_size
        m = self.vision.merge
        T = self.vision.temporal_patch
        assert a.ndim == 3 and a.shape[-1] == 3, f"bad image {a.shape}"
        h, w = a.shape[:2]
        f = p * m
        rh = max(round(h / f), 1) * f
        rw = max(round(w / f), 1) * f
        yi = (np.arange(rh) * h // rh).clip(0, h - 1)
        xi = (np.arange(rw) * w // rw).clip(0, w - 1)
        r = a[yi][:, xi].astype(np.float32) / 255.0
        r = (r - CLIP_MEAN) / CLIP_STD
        chw = np.transpose(r, (2, 0, 1))                 # [C, rh, rw]
        frames = np.repeat(chw[None], T, axis=0)         # [T, C, rh, rw]
        gh, gw = rh // p, rw // p
        pt = frames.reshape(1, T, 3, gh // m, m, p, gw // m, m, p)
        pt = pt.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        return (pt.reshape(gh * gw, 3 * T * p * p).astype(np.float32),
                (1, gh, gw))

    # ---- multimodal fusion ------------------------------------------------------
    def process_multimodal(self, params, token_ids: List[int], images):
        """(ids with placeholders, [(patches, grid)]) -> (expanded ids,
        fused [P, H] embeddings, {"mrope_positions", "mrope_delta"})."""
        m2 = self.vision.merge ** 2
        grids = [g for _, g in images]
        n_tok = [t * h * w // m2 for t, h, w in grids]
        expanded: List[int] = []
        slots: List[Tuple[int, int]] = []
        img = 0
        for t in token_ids:
            if t == self.image_token_index:
                slots.append((len(expanded), n_tok[img]))
                expanded.extend([self.image_token_index] * n_tok[img])
                img += 1
            else:
                expanded.append(int(t))
        assert img == len(images), (
            f"{img} image placeholders but {len(images)} images")

        ids = jnp.asarray(np.asarray(expanded, np.int32))
        emb = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        if images:
            patches = jnp.asarray(np.concatenate([p for p, _ in images]))
            feats = np.asarray(self.vision(
                params["vision"], patches, grids).astype(jnp.float32))
            off = 0
            for (pos, cnt) in slots:
                emb[pos:pos + cnt] = feats[off:off + cnt]
                off += cnt
        mrope, delta = build_mrope_positions(
            expanded, self.image_token_index, grids, self.vision.merge)
        return expanded, emb, {"mrope_positions": mrope,
                               "mrope_delta": int(delta)}


@register_auto_model("Qwen2_5_VLForConditionalGeneration")
class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """Qwen2.5-VL: the Qwen2-VL stack with the updated vision transformer —
    RMSNorm blocks, biased SwiGLU MLPs, and window attention (tokens
    reordered into merge-unit windows; only `fullatt_block_indexes` blocks
    attend across the whole image)."""

    def _make_vision(self, vc, cfg):
        return Qwen2VisionTower(
            embed_dim=vc.get("hidden_size", 1280),   # 2.5 naming
            depth=vc.get("depth", 32),
            num_heads=vc.get("num_heads", 16),
            out_hidden=vc.get("out_hidden_size", cfg.hidden_size),
            patch_size=vc.get("patch_size", 14),
            temporal_patch=vc.get("temporal_patch_size", 2),
            in_channels=vc.get("in_channels", 3),
            spatial_merge=vc.get("spatial_merge_size", 2),
            mlp_hidden=vc.get("intermediate_size", 0),
            norm_type="rmsnorm",
            mlp_type="swiglu",
            window_size=vc.get("window_size", 112),
            fullatt_idx=tuple(vc.get("fullatt_block_indexes", ())),
            dtype=cfg.dtype,
        )
