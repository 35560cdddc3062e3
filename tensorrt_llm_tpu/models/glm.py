"""GLM-4 family (reference `_torch/models/modeling_glm.py` lineage):
interleaved-pair partial rotary, biased QKV, fused gate_up MLP weight;
Glm4 adds sandwich (post-self-attn / post-mlp) norms."""

from __future__ import annotations

import jax.numpy as jnp

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("GlmForCausalLM")
class GlmForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.attention_bias = True
        cfg.o_bias = False
        # HF Glm rotates adjacent pairs (2i, 2i+1) over the leading
        # partial_rotary_factor dims — our interleaved mode produces the
        # same values in de-interleaved order (a fixed q/k permutation,
        # invariant in the attention scores)
        cfg.gqa_rope_interleave = True
        cfg.extra.setdefault("partial_rotary_factor", 0.5)
        super().__init__(cfg)

    def _load_mlp(self, layer, get_tensor, pre: str, t):
        from tensorrt_llm_tpu.layers.moe import MoE
        if isinstance(layer.mlp, MoE):
            return super()._load_mlp(layer, get_tensor, pre, t)
        gu = t(pre + "mlp.gate_up_proj.weight")   # [H, 2I]
        I = self.cfg.intermediate_size
        return layer.mlp.from_float(gu[:, :I], gu[:, I:],
                                    t(pre + "mlp.down_proj.weight"))


@register_auto_model("Glm4ForCausalLM")
class Glm4ForCausalLM(GlmForCausalLM):
    """Glm4: GLM + sandwich norms (post_self_attn / post_mlp layernorm) —
    the same structure as Gemma2's post_norms under different HF names."""

    NORM_KEYS = {"input_norm": "input_layernorm",
                 "post_attn_norm": "post_self_attn_layernorm",
                 "pre_ffw_norm": "post_attention_layernorm",
                 "post_ffw_norm": "post_mlp_layernorm"}

    def __init__(self, cfg: ModelConfig):
        cfg.post_norms = True
        super().__init__(cfg)
