"""LG EXAONE-4 (reference `_torch/models/modeling_exaone4.py`): post-block
norms, per-head q/k RMSNorm, hybrid attention — sliding layers use RoPE,
global layers are NoPE (HF Exaone4Attention applies rope only when
`sliding_window is None or is_sliding`)."""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("Exaone4ForCausalLM")
class Exaone4ForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.post_block_norms = True
        cfg.qk_norm = True
        if cfg.layer_types is not None and cfg.sliding_window is not None \
                and "full_attention" in cfg.layer_types:
            # hybrid: global layers skip rope entirely
            cfg.extra["no_rope_layers"] = [
                0 if t == "full_attention" else 1 for t in cfg.layer_types]
        super().__init__(cfg)
