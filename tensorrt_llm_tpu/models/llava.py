"""LLaVA-class vision-language model.

Counterpart of the reference's multimodal model zoo
(`_torch/models/modeling_llava*.py`, `modeling_vila.py`, and the input
processor registry `tensorrt_llm/inputs/registry.py`): a CLIP vision tower
(models/vision/clip.py) feeds a 2-layer projector; the projected patch
features are spliced into the text embedding sequence at the image
placeholder rows, and the language model runs on fused embeddings
(engine "prefill_embeds" path).  Generation decodes text tokens only, so
decode steps are unchanged.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.vision.clip import CLIPVisionTower, quick_gelu


@register_auto_model("LlavaForConditionalGeneration")
class LlavaForConditionalGeneration(DecoderModelForCausalLM):
    """Language model + vision tower + projector.

    The engine drives this exactly like a text model (forward/caches are the
    language model's); `process_multimodal` is the input-processor hook that
    turns (token ids with image placeholders, images) into fused prompt
    embeddings before submission.
    """

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        vc = cfg.extra.get("vision_config") or {}
        self.image_token_index = cfg.extra.get("image_token_index", 32000)
        self.vision = CLIPVisionTower(
            hidden_size=vc.get("hidden_size", 1024),
            image_size=vc.get("image_size", 336),
            patch_size=vc.get("patch_size", 14),
            num_layers=vc.get("num_hidden_layers", 24),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4096),
            hidden_act=vc.get("hidden_act", "quick_gelu"),
            layer_norm_eps=vc.get("layer_norm_eps", 1e-5),
            feature_layer=cfg.extra.get("vision_feature_layer", -2),
            drop_cls=cfg.extra.get(
                "vision_feature_select_strategy", "default") == "default",
            dtype=cfg.dtype,
        )
        self.num_image_tokens = self.vision.num_patches + (
            0 if self.vision.drop_cls else 1)

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1)
        H, VH = self.cfg.hidden_size, self.vision.hidden_size
        params["vision"] = self.vision.init(k2)
        ka, kb = jax.random.split(k3)
        params["projector"] = {
            "linear_1": ((jax.random.normal(ka, (VH, H), jnp.float32)
                          * (0.5 / VH ** 0.5)).astype(self.cfg.dtype),
                         jnp.zeros((H,), jnp.float32)),
            "linear_2": ((jax.random.normal(kb, (H, H), jnp.float32)
                          * (0.5 / H ** 0.5)).astype(self.cfg.dtype),
                         jnp.zeros((H,), jnp.float32)),
        }
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        # vision tower + projector replicate (ViT batches are tiny)
        rep = lambda t: jax.tree.map(lambda _: P(), t)
        specs["vision"] = rep(self.vision.init(jax.random.PRNGKey(0)))
        specs["projector"] = {"linear_1": (P(), P()), "linear_2": (P(), P())}
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        # language model keys live under "model.language_model." (new HF
        # naming) or "language_model.model." (legacy)
        def lm_get(name):
            for fmt in (name.replace("model.", "model.language_model.", 1),
                        "language_model." + name):
                a = get_tensor(fmt)
                if a is not None:
                    return a
            return get_tensor(name)  # lm_head.weight is top-level

        params = super().load_hf_weights(lm_get, dtype=dtype)
        params["vision"] = self.vision.load_hf_weights(
            get_tensor, "model.vision_tower.vision_model.")

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        pre = "model.multi_modal_projector."
        params["projector"] = {
            "linear_1": (arr(pre + "linear_1.weight").T.astype(self.cfg.dtype),
                         arr(pre + "linear_1.bias")),
            "linear_2": (arr(pre + "linear_2.weight").T.astype(self.cfg.dtype),
                         arr(pre + "linear_2.bias")),
        }
        return params

    # ---- multimodal input processing ---------------------------------------------
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, C, S, S] -> projected features [B, n_tokens, H]."""
        feats = self.vision(params["vision"], pixel_values)
        p = params["projector"]
        h = jnp.einsum("bsv,vh->bsh", feats,
                       p["linear_1"][0].astype(feats.dtype)) \
            + p["linear_1"][1].astype(feats.dtype)
        h = quick_gelu(h.astype(jnp.float32)).astype(feats.dtype)
        h = jnp.einsum("bsh,hk->bsk", h,
                       p["linear_2"][0].astype(h.dtype)) \
            + p["linear_2"][1].astype(h.dtype)
        return h

    def process_multimodal(self, params, token_ids: List[int],
                           images) -> Tuple[List[int], np.ndarray]:
        """Expand each image placeholder to num_image_tokens rows and build
        fused prompt embeddings [P, H] (text embeds + projected features).

        images: list of np arrays [C, S, S] (preprocessed pixel values),
        one per placeholder occurrence, in order.
        """
        n_img = self.num_image_tokens
        expanded: List[int] = []
        img_slots: List[int] = []
        for t in token_ids:
            if t == self.image_token_index:
                img_slots.append(len(expanded))
                expanded.extend([self.image_token_index] * n_img)
            else:
                expanded.append(int(t))
        assert len(img_slots) == len(images), (
            f"{len(img_slots)} image placeholders but {len(images)} images")

        ids = jnp.asarray(np.asarray(expanded, np.int32))
        text_emb = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        if images:
            pv = jnp.asarray(np.stack([np.asarray(im, np.float32)
                                       for im in images]))
            feats = np.asarray(
                self.encode_images(params, pv).astype(jnp.float32))
            for j, pos in enumerate(img_slots):
                text_emb[pos:pos + n_img] = feats[j]
        return expanded, text_emb
