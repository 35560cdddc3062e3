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


@register_auto_model("LlavaNextForConditionalGeneration")
class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):
    """LLaVA-NeXT / LLaVA-1.6 anyres tiling (reference
    `_torch/models/modeling_llava_next.py`; HF `LlavaNextModel.
    pack_image_features`): each image arrives as [base_tile; grid tiles],
    all run through the CLIP tower + projector; tile features re-assemble
    into the full-resolution grid, get unpadded back to the original
    aspect ratio, gain an image_newline column, and are flattened after
    the base features."""

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        params = super().load_hf_weights(get_tensor, dtype=dtype)
        nl = get_tensor("model.image_newline")
        if nl is not None:
            params["image_newline"] = jnp.asarray(
                np.asarray(nl)).astype(jnp.float32)
        return params

    def init(self, key) -> Dict:
        params = super().init(key)
        params["image_newline"] = (jax.random.normal(
            jax.random.PRNGKey(13), (self.cfg.hidden_size,), jnp.float32)
            * 0.02)
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["image_newline"] = P(None)
        return specs

    def preprocess_images(self, images):
        """Anyres inputs are HF-processor dicts {"pixel_values":
        [n_tiles, C, S, S], "image_size": (h, w)} — pass through."""
        out = []
        for im in images:
            assert isinstance(im, dict) and "pixel_values" in im \
                and "image_size" in im, \
                "LLaVA-Next needs {'pixel_values', 'image_size'} dicts"
            out.append({"pixel_values": np.asarray(im["pixel_values"],
                                                   np.float32),
                        "image_size": tuple(im["image_size"])})
        return out

    def _pack_anyres(self, params, feats: np.ndarray,
                     image_size) -> np.ndarray:
        """feats [n_tiles+1, hw, H] -> packed [n_feat, H] (HF
        pack_image_features for one image)."""
        side = self.vision.image_size // self.vision.patch_size
        H = feats.shape[-1]
        newline = np.asarray(params["image_newline"], np.float32)
        if feats.shape[0] == 1:
            return np.concatenate([feats[0], newline[None]], 0)
        base, tiles = feats[0], feats[1:]
        pins = self.cfg.extra.get("image_grid_pinpoints") or []
        oh, ow = image_size
        # select_best_resolution: max effective, min wasted resolution
        best, br = None, None
        for ph, pw in pins:
            scale = min(pw / ow, ph / oh)
            eff = min(int(ow * scale) * int(oh * scale), ow * oh)
            waste = pw * ph - eff
            if best is None or eff > best[0] or (eff == best[0]
                                                and waste < best[1]):
                best, br = (eff, waste), (ph, pw)
        nph, npw = br[0] // self.vision.image_size, \
            br[1] // self.vision.image_size
        grid = tiles.reshape(nph, npw, side, side, H)
        grid = grid.transpose(4, 0, 2, 1, 3).reshape(
            H, nph * side, npw * side)
        # unpad back to the original aspect ratio
        ch, cw = grid.shape[1:]
        if ow / oh > cw / ch:
            nh = int(round(oh * (cw / ow), 7))
            pad = (ch - nh) // 2
            grid = grid[:, pad:ch - pad, :]
        else:
            nw = int(round(ow * (ch / oh), 7))
            pad = (cw - nw) // 2
            grid = grid[:, :, pad:cw - pad]
        nl = np.broadcast_to(newline[:, None, None],
                             (H, grid.shape[1], 1))
        grid = np.concatenate([grid, nl], axis=2)
        flat = grid.reshape(H, -1).T                  # [h*(w+1), H]
        return np.concatenate([base, flat], 0)

    def process_multimodal(self, params, token_ids: List[int], images):
        """images: list of dicts {"pixel_values": [n_tiles, C, S, S],
        "image_size": (h, w)} — the HF LlavaNextImageProcessor output."""
        packed = []
        for im in images:
            pv = jnp.asarray(np.asarray(im["pixel_values"], np.float32))
            feats = np.asarray(
                self.encode_images(params, pv).astype(jnp.float32))
            packed.append(self._pack_anyres(
                params, feats, tuple(im["image_size"])))

        expanded: List[int] = []
        slots: List[Tuple[int, int]] = []
        img = 0
        for t in token_ids:
            if t == self.image_token_index:
                slots.append((len(expanded), packed[img].shape[0]))
                expanded.extend([self.image_token_index]
                                * packed[img].shape[0])
                img += 1
            else:
                expanded.append(int(t))
        assert img == len(images), (
            f"{img} image placeholders but {len(images)} images")
        ids = jnp.asarray(np.asarray(expanded, np.int32))
        emb = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        for j, (pos, cnt) in enumerate(slots):
            emb[pos:pos + cnt] = packed[j]
        return expanded, emb


@register_auto_model("PixtralForConditionalGeneration")
class PixtralForConditionalGeneration(DecoderModelForCausalLM):
    """Pixtral (reference `_torch/models/modeling_pixtral.py`; HF ships it
    under the Llava arch name with a pixtral vision tower): a Mistral LM
    fed by the variable-resolution Pixtral encoder.  Each image expands to
    h rows of w `[IMG]` tokens terminated by `[IMG_BREAK]`, with the final
    break replaced by `[IMG_END]`; features splice into the `[IMG]` rows
    only — break/end rows keep their text embeddings."""

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        from tensorrt_llm_tpu.models.vision.pixtral_vit import (
            PixtralVisionTower)
        vc = cfg.extra.get("vision_config") or {}
        self.image_token_index = cfg.extra.get("image_token_index", 10)
        self.image_break = cfg.extra.get("image_break_token_id", 12)
        self.image_end = cfg.extra.get("image_end_token_id", 13)
        self.proj_act = cfg.extra.get("projector_hidden_act", "gelu")
        self.vision = PixtralVisionTower(
            hidden_size=vc.get("hidden_size", 1024),
            num_layers=vc.get("num_hidden_layers", 24),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4096),
            head_dim=vc.get("head_dim"),
            image_size=vc.get("image_size", 1024),
            patch_size=vc.get("patch_size", 16),
            rope_theta=vc.get("rope_theta", 10000.0),
            dtype=cfg.dtype,
        )

    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1)
        H, VH = self.cfg.hidden_size, self.vision.E
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
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init(jax.random.PRNGKey(0)))
        specs["projector"] = jax.tree.map(
            lambda _: P(),
            self.init(jax.random.PRNGKey(0))["projector"])
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        def lm_get(name):
            for fmt in (name.replace("model.", "model.language_model.", 1),
                        "language_model." + name):
                a = get_tensor(fmt)
                if a is not None:
                    return a
            return get_tensor(name)

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = super().load_hf_weights(lm_get, dtype=dtype)
        params["vision"] = self.vision.load_hf_weights(
            get_tensor, "model.vision_tower.")
        pre = "model.multi_modal_projector."
        params["projector"] = {
            "linear_1": (arr(pre + "linear_1.weight").T.astype(
                self.cfg.dtype), arr(pre + "linear_1.bias")),
            "linear_2": (arr(pre + "linear_2.weight").T.astype(
                self.cfg.dtype), arr(pre + "linear_2.bias")),
        }
        return params

    def preprocess_images(self, images):
        """[3, H, W] float pixel arrays (HF-processor normalized) ->
        [(patches, (h, w))]."""
        return [self.vision.patchify(np.asarray(im, np.float32))
                for im in images]

    def process_multimodal(self, params, token_ids: List[int], images):
        feats = None
        if images:
            raw = np.asarray(self.vision(
                params["vision"], images).astype(jnp.float32))
            p = params["projector"]
            h = raw @ np.asarray(p["linear_1"][0], np.float32) \
                + np.asarray(p["linear_1"][1], np.float32)
            if self.proj_act == "gelu":
                from scipy.special import erf  # type: ignore
                h = h * 0.5 * (1.0 + erf(h / np.sqrt(2.0)))
            else:
                h = h * (1.0 / (1.0 + np.exp(-1.702 * h)))   # quick_gelu
            feats = h @ np.asarray(p["linear_2"][0], np.float32) \
                + np.asarray(p["linear_2"][1], np.float32)

        expanded: List[int] = []
        spans: List[Tuple[int, int]] = []   # ([IMG]-row ranges per image)
        img = 0
        for t in token_ids:
            if t == self.image_token_index:
                _, (h, w) = images[img]
                for r in range(h):
                    spans.append((len(expanded), w))
                    expanded.extend([self.image_token_index] * w)
                    expanded.append(self.image_break if r < h - 1
                                    else self.image_end)
                img += 1
            else:
                expanded.append(int(t))
        assert img == len(images), (
            f"{img} image placeholders but {len(images)} images")

        ids = jnp.asarray(np.asarray(expanded, np.int32))
        emb = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        off = 0
        for pos, cnt in spans:
            emb[pos:pos + cnt] = feats[off:off + cnt]
            off += cnt
        return expanded, emb
