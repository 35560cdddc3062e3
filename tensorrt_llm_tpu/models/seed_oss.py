"""ByteDance Seed-OSS (reference `_torch/models/modeling_seedoss.py`):
Llama-family decoder with biased QKV and explicit head_dim."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("SeedOssForCausalLM")
class SeedOssForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.attention_bias = True
        super().__init__(cfg)
