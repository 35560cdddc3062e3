"""SmolLM3 (HF SmolLM3ForCausalLM): Llama-family decoder whose
`no_rope_layers` list marks NoPE layers (every 4th by default)."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    register_auto_model,
)


@register_auto_model("SmolLM3ForCausalLM")
class SmolLM3ForCausalLM(DecoderModelForCausalLM):
    pass
