"""Tencent HunYuan dense v1 (reference `_torch/models/modeling_hunyuan_*`):
Llama-family decoder with per-head q/k RMSNorm under HunYuan's
query_layernorm/key_layernorm HF names."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("HunYuanDenseV1ForCausalLM")
class HunYuanDenseV1ForCausalLM(DecoderModelForCausalLM):
    Q_NORM_KEY = "self_attn.query_layernorm.weight"
    K_NORM_KEY = "self_attn.key_layernorm.weight"

    def __init__(self, cfg: ModelConfig):
        cfg.qk_norm = True
        super().__init__(cfg)
