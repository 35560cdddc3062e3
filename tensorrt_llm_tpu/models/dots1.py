"""rednote dots.llm1 (HF Dots1ForCausalLM): DeepSeek-V3-style noaux-tc MoE
routing (sigmoid + e_score_correction_bias + group top-k) over standard GQA
attention with per-head q/k RMSNorm — MLA-free DeepSeek routing, like
GLM-4.5-MoE but with full-dim rotary."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("Dots1ForCausalLM")
class Dots1ForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.moe_score_func = "sigmoid"
        cfg.moe_has_score_bias = True
        cfg.qk_norm = True
        super().__init__(cfg)
