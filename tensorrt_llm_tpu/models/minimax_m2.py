"""MiniMax-M2 / M2.1 (reference `_torch/models/modeling_minimaxm2.py`):
full-attention decoder with FLAT q/k RMSNorm (over num_heads * head_dim —
the reference allgathers q/k under TP just to normalize across the whole
width) and a Mixtral-shaped MoE routed sigmoid -> +e_score_correction_bias
-> top-k -> renormalize (noaux-tc without the group limit)."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("MiniMaxM2ForCausalLM")
class MiniMaxM2ForCausalLM(DecoderModelForCausalLM):
    MOE_ROUTER_KEY = "block_sparse_moe.gate.weight"
    MOE_EXPERT_KEY = "block_sparse_moe.experts.{j}.{proj}.weight"
    MOE_PROJ_NAMES = {"gate": "w1", "up": "w3", "down": "w2"}
    MOE_BIAS_KEY = "block_sparse_moe.e_score_correction_bias"

    def __init__(self, cfg: ModelConfig):
        cfg.qk_norm = True
        cfg.qk_norm_flat = True
        cfg.moe_score_func = "sigmoid"
        cfg.norm_topk_prob = True
        cfg.n_group = 1
        cfg.topk_group = 1
        cfg.routed_scaling_factor = 1.0
        super().__init__(cfg)
