"""LG EXAONE-MoE (reference `_torch/models/modeling_exaone_moe.py`):
EXAONE-4's hybrid attention (post-block norms, per-head qk-norm; SLIDING
layers apply rope, global layers are NoPE) with a DeepSeek-V3-class MoE —
sigmoid scoring + e_score_correction_bias routing and
``num_shared_experts`` shared experts of ``moe_intermediate_size``."""

from __future__ import annotations

from tensorrt_llm_tpu.models.exaone4 import Exaone4ForCausalLM
from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)


@register_auto_model("ExaoneMoEForCausalLM")
class ExaoneMoEForCausalLM(Exaone4ForCausalLM):
    MOE_SHARED_PREFIX = "mlp.shared_experts."

    def __init__(self, cfg: ModelConfig):
        cfg.moe_score_func = "sigmoid"
        cfg.norm_topk_prob = True
        ns = cfg.extra.get("num_shared_experts")
        if ns:
            cfg.n_shared_experts = int(ns)
        super().__init__(cfg)
