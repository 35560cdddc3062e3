"""IBM Granite (reference `_torch/models` granite lineage): Llama decoder
with four scalar multipliers — embedding, per-block residual, attention
softmax scale, and logits division."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("GraniteForCausalLM")
class GraniteForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        ex = cfg.extra
        cfg.embedding_multiplier = ex.get("embedding_multiplier")
        cfg.residual_multiplier = ex.get("residual_multiplier")
        cfg.logits_scaling = ex.get("logits_scaling")
        am = ex.get("attention_multiplier")
        if am:
            # Attention.scale = query_pre_attn_scalar ** -0.5, so am**-2
            # makes the softmax scale exactly attention_multiplier
            cfg.query_pre_attn_scalar = am ** -2
        super().__init__(cfg)
