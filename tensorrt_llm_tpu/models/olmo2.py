"""OLMo-2 (HF Olmo2ForCausalLM): post-block norms (x += norm(attn(x))) and
q/k RMSNorm over the flattened heads*head_dim projection output."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("Olmo2ForCausalLM")
class Olmo2ForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.post_block_norms = True
        cfg.qk_norm = True
        cfg.qk_norm_flat = True
        super().__init__(cfg)
