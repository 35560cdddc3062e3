"""GLM-4.5 MoE (HF Glm4MoeForCausalLM): DeepSeek-style noaux-tc routing
(sigmoid scores + e_score_correction_bias + group-limited top-k + routed
scaling) over standard GQA attention with partial rotary; optional per-head
qk-norm; leading dense layers via first_k_dense_replace."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("Glm4MoeForCausalLM")
class Glm4MoeForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.moe_score_func = "sigmoid"
        cfg.moe_has_score_bias = True
        cfg.qk_norm = bool(cfg.extra.get("use_qk_norm", False))
        cfg.extra.setdefault("partial_rotary_factor", 0.5)
        super().__init__(cfg)
