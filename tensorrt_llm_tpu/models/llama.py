"""Llama-family architectures.

Counterpart of the reference's `_torch/models/modeling_llama.py:1055`
(`LlamaForCausalLM`) plus the Mistral/Qwen dense variants — all are config
specializations of the shared decoder in `modeling_utils.py`.
"""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("LlamaForCausalLM", "MistralForCausalLM")
class LlamaForCausalLM(DecoderModelForCausalLM):
    pass


@register_auto_model("Qwen2ForCausalLM")
class Qwen2ForCausalLM(DecoderModelForCausalLM):
    """Qwen2/2.5: QKV bias."""

    def __init__(self, cfg: ModelConfig):
        cfg.attention_bias = True
        super().__init__(cfg)


@register_auto_model("Qwen3ForCausalLM")
class Qwen3ForCausalLM(DecoderModelForCausalLM):
    """Qwen3 dense: per-head q/k RMSNorm, no qkv bias."""

    def __init__(self, cfg: ModelConfig):
        cfg.attention_bias = False
        cfg.qk_norm = True
        super().__init__(cfg)
