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
