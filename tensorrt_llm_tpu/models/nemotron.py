"""Nemotron dense (reference `_torch/models/modeling_nemotron.py`):
LayerNorm1P ((1+w) folded into the weights at load), squared-ReLU non-gated
MLP, partial rotary."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("NemotronForCausalLM")
class NemotronForCausalLM(DecoderModelForCausalLM):
    NORM_WEIGHT_OFFSET = 1.0   # layernorm1p: ln(x) * (1 + w) + b

    def __init__(self, cfg: ModelConfig):
        cfg.norm_type = "layernorm"
        cfg.norm_bias = True
        cfg.mlp_gated = False
        cfg.activation = "relu2"
        cfg.extra.setdefault("partial_rotary_factor", 0.5)
        super().__init__(cfg)
