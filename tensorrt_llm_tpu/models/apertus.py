"""Apertus (Swiss AI; reference arch list `modeling_auto.py` /
HF `modeling_apertus.py`): Llama-family decoder with a NON-gated MLP under
a learned xIELU activation (per-layer alpha_p/alpha_n, arXiv:2411.13010),
pre-rope per-head q/k RMSNorm, llama3-scaled rope, and
attention_layernorm/feedforward_layernorm norm names."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("ApertusForCausalLM")
class ApertusForCausalLM(DecoderModelForCausalLM):
    NORM_KEYS = {"input_norm": "attention_layernorm",
                 "post_attn_norm": "feedforward_layernorm"}

    def __init__(self, cfg: ModelConfig):
        cfg.qk_norm = True
        cfg.mlp_gated = False
        cfg.activation = "xielu"
        super().__init__(cfg)
