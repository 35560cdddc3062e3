"""StarCoder2 (reference `_torch/models/modeling_starcoder2.py`): LayerNorm
(+bias) everywhere, biased projections, non-gated c_fc/c_proj gelu MLP."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("Starcoder2ForCausalLM")
class Starcoder2ForCausalLM(DecoderModelForCausalLM):
    MLP_UP_KEY = "mlp.c_fc"
    MLP_DOWN_KEY = "mlp.c_proj"

    def __init__(self, cfg: ModelConfig):
        cfg.norm_type = "layernorm"
        cfg.norm_bias = True
        cfg.mlp_gated = False
        cfg.mlp_bias = bool(cfg.extra.get("use_bias", True))
        cfg.attention_bias = bool(cfg.extra.get("use_bias", True))
        cfg.o_bias = cfg.attention_bias
        cfg.activation = "gelu"   # gelu_pytorch_tanh
        super().__init__(cfg)
