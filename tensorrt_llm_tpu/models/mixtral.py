"""Mixtral + Qwen-MoE architectures.

Counterpart of the reference's `modeling_mixtral.py` / `modeling_qwen3_moe.py`
— MoE specializations of the shared decoder with per-arch weight-name maps.
"""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("MixtralForCausalLM")
class MixtralForCausalLM(DecoderModelForCausalLM):
    """Mixtral 8x7B/8x22B: softmax->topk->renormalize routing."""

    MOE_ROUTER_KEY = "block_sparse_moe.gate.weight"
    MOE_EXPERT_KEY = "block_sparse_moe.experts.{j}.{proj}.weight"
    MOE_PROJ_NAMES = {"gate": "w1", "up": "w3", "down": "w2"}

    def __init__(self, cfg: ModelConfig):
        cfg.norm_topk_prob = True          # mixtral renormalizes top-k
        cfg.moe_intermediate_size = cfg.intermediate_size
        super().__init__(cfg)


@register_auto_model("Qwen3MoeForCausalLM")
class Qwen3MoeForCausalLM(DecoderModelForCausalLM):
    """Qwen3-MoE (30B-A3B / 235B-A22B): q/k norm + MoE every sparse step."""

    def __init__(self, cfg: ModelConfig):
        cfg.qk_norm = True
        cfg.attention_bias = False
        super().__init__(cfg)


@register_auto_model("Qwen2MoeForCausalLM")
class Qwen2MoeForCausalLM(DecoderModelForCausalLM):
    """Qwen2-MoE: shared expert + gated routing (softmax, no renorm)."""

    def __init__(self, cfg: ModelConfig):
        cfg.attention_bias = True
        cfg.norm_topk_prob = bool(cfg.extra.get("norm_topk_prob", False))
        super().__init__(cfg)
