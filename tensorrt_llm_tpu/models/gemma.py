"""Gemma family (Gemma, Gemma-2, Gemma-3 text).

Counterpart of the reference's `modeling_gemma3.py`: zero-centered (1+w)
RMSNorm, sqrt(hidden) embedding scaling, post-attn/post-ffw norms, logit
soft-capping (Gemma-2), q/k norm + dual-frequency RoPE with a 5:1
local:global sliding pattern (Gemma-3).

The (1+w) norm convention is folded into the loaded weights (+1 at load), so
the shared RMSNorm kernelpath is unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


class _GemmaBase(DecoderModelForCausalLM):
    GEMMA_NORM_PLUS_ONE = True

    def load_hf_weights(self, get_tensor, dtype=None):
        if not self.GEMMA_NORM_PLUS_ONE:
            return super().load_hf_weights(get_tensor, dtype)

        def wrapped(name):
            arr = get_tensor(name)
            if arr is not None and (
                    name.endswith("layernorm.weight")
                    or name.endswith("_norm.weight")
                    or name.endswith("norm.weight")):
                arr = np.asarray(arr, np.float32) + 1.0
            return arr
        return super().load_hf_weights(wrapped, dtype)


@register_auto_model("GemmaForCausalLM")
class GemmaForCausalLM(_GemmaBase):
    def __init__(self, cfg: ModelConfig):
        cfg.tie_word_embeddings = True
        cfg.embedding_multiplier = cfg.hidden_size ** 0.5
        cfg.activation = "gelu"
        super().__init__(cfg)


@register_auto_model("Gemma2ForCausalLM")
class Gemma2ForCausalLM(_GemmaBase):
    def __init__(self, cfg: ModelConfig):
        cfg.tie_word_embeddings = True
        cfg.embedding_multiplier = cfg.hidden_size ** 0.5
        cfg.activation = "gelu"
        cfg.post_norms = True
        cfg.query_pre_attn_scalar = cfg.extra.get("query_pre_attn_scalar")
        cfg.attn_logit_softcap = cfg.extra.get("attn_logit_softcapping")
        cfg.final_logit_softcap = cfg.extra.get("final_logit_softcapping")
        cfg.sliding_window_pattern = 2   # alternating local/global
        super().__init__(cfg)


@register_auto_model("Gemma3ForCausalLM", "Gemma3TextModel")
class Gemma3ForCausalLM(_GemmaBase):
    def __init__(self, cfg: ModelConfig):
        cfg.tie_word_embeddings = True
        cfg.embedding_multiplier = cfg.hidden_size ** 0.5
        cfg.activation = "gelu"
        cfg.post_norms = True
        cfg.qk_norm = True
        cfg.query_pre_attn_scalar = cfg.extra.get("query_pre_attn_scalar")
        cfg.sliding_window_pattern = cfg.extra.get("sliding_window_pattern", 6)
        cfg.rope_local_theta = cfg.extra.get("rope_local_base_freq", 10000.0)
        super().__init__(cfg)


@register_auto_model("Gemma3ForConditionalGeneration")
class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    """Gemma3 VLM (reference `_torch/models/modeling_gemma3vl.py`): SigLIP
    vision tower, average-pool + soft-token-norm projector, and
    BIDIRECTIONAL attention within each image span (carried as a
    host-built prefill pair mask through the custom-visibility path)."""

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        import jax.numpy as _jnp
        from tensorrt_llm_tpu.models.vision.siglip import SiglipVisionTower
        vc = cfg.extra.get("vision_config") or {}
        self.image_token_index = (cfg.extra.get("image_token_id")
                                  or cfg.extra.get("image_token_index")
                                  or 262144)
        self.mm_tokens_per_image = cfg.extra.get("mm_tokens_per_image", 256)
        self.vision = SiglipVisionTower(
            hidden_size=vc.get("hidden_size", 1152),
            num_layers=vc.get("num_hidden_layers", 27),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4304),
            image_size=vc.get("image_size", 896),
            patch_size=vc.get("patch_size", 14),
            layer_norm_eps=vc.get("layer_norm_eps", 1e-6),
            dtype=cfg.dtype)

    # ---- params -----------------------------------------------------------------
    def init(self, key):
        import jax as _jax
        import jax.numpy as _jnp
        k1, k2, k3 = _jax.random.split(key, 3)
        params = super().init(k1)
        params["vision"] = self.vision.init(k2)
        params["projector"] = {
            "mm_input_projection": (_jax.random.normal(
                k3, (self.vision.H, self.cfg.hidden_size), _jnp.float32)
                * 0.02).astype(self.cfg.dtype),
            "mm_soft_emb_norm": _jnp.ones((self.vision.H,), _jnp.float32),
        }
        return params

    def param_specs(self):
        import jax as _jax
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["vision"] = _jax.tree.map(
            lambda _: P(), self.vision.init(_jax.random.PRNGKey(0)))
        specs["projector"] = {"mm_input_projection": P(None, None),
                              "mm_soft_emb_norm": P(None)}
        return specs

    def load_hf_weights(self, get_tensor, dtype=None):
        import jax.numpy as _jnp

        def lm_get(name):
            for fmt in (name.replace("model.", "model.language_model.", 1),
                        "language_model." + name):
                a = get_tensor(fmt)
                if a is not None:
                    return a
            return get_tensor(name)

        params = super().load_hf_weights(lm_get, dtype=dtype)
        params["vision"] = self.vision.load_hf_weights(
            get_tensor, "model.vision_tower.vision_model.")
        proj = get_tensor("model.multi_modal_projector."
                          "mm_input_projection_weight")
        norm = get_tensor("model.multi_modal_projector."
                          "mm_soft_emb_norm.weight")
        params["projector"] = {
            "mm_input_projection": _jnp.asarray(
                np.asarray(proj)).astype(self.cfg.dtype),
            # Gemma (1+w) RMSNorm convention, folded like the text norms
            "mm_soft_emb_norm": _jnp.asarray(
                np.asarray(norm)).astype(_jnp.float32) + 1.0,
        }
        return params

    # ---- multimodal -------------------------------------------------------------
    def encode_images(self, params, pixel_values):
        """[B, 3, S, S] -> [B, mm_tokens_per_image, H_text]."""
        import jax
        import jax.numpy as _jnp
        feats = self.vision(params["vision"], pixel_values)   # [B, P^2, VH]
        B, N, VH = feats.shape
        g = int(N ** 0.5)
        t = int(self.mm_tokens_per_image ** 0.5)
        kern = g // t
        f = feats.reshape(B, g, g, VH).astype(_jnp.float32)
        f = f.reshape(B, t, kern, t, kern, VH).mean(axis=(2, 4))  # avg pool
        f = f.reshape(B, t * t, VH)
        var = (f * f).mean(-1, keepdims=True)
        f = f * jax.lax.rsqrt(var + 1e-6) \
            * params["projector"]["mm_soft_emb_norm"]
        out = _jnp.einsum("btv,vh->bth", f.astype(self.cfg.dtype),
                          params["projector"]["mm_input_projection"])
        return out

    def process_multimodal(self, params, token_ids, images):
        """Expand image placeholders, build PRE-scaled fused embeddings and
        the bidirectional-image-span prefill pair mask."""
        import jax.numpy as _jnp
        n_img = self.mm_tokens_per_image
        expanded, slots = [], []
        for tkn in token_ids:
            if tkn == self.image_token_index:
                slots.append(len(expanded))
                expanded.extend([self.image_token_index] * n_img)
            else:
                expanded.append(int(tkn))
        assert len(slots) == len(images), (len(slots), len(images))
        ids = _jnp.asarray(np.asarray(expanded, np.int32))
        emb = np.array(self.embedding(params["embedding"], ids
                                      ).astype(_jnp.float32))
        emb *= self.cfg.embedding_multiplier   # text scaling (pre-fusion)
        if images:
            pv = _jnp.asarray(np.stack([np.asarray(im, np.float32)
                                        for im in images]))
            feats = np.asarray(self.encode_images(params, pv
                                                  ).astype(_jnp.float32))
            for j, pos in enumerate(slots):
                emb[pos:pos + n_img] = feats[j]
        # causal everywhere + bidirectional within each image span
        P = len(expanded)
        mask = np.tril(np.ones((P, P), bool))
        for pos in slots:
            mask[pos:pos + n_img, pos:pos + n_img] = True
        return expanded, emb, {"prefill_pair_mask": mask}
