"""Mistral Large 3 (reference `_torch/models/modeling_mistral_large3.py`):
the DeepSeek-V3 architecture (MLA + MoE) with RENORMALIZED softmax top-k
routing instead of noaux-tc sigmoid, loaded from mistral-native weight
names (reference checkpoints/mistral/weight_mapper.py
MistralLarge3WeightMapper: layers./attention./feed_forward./tok_embeddings
-> the HF DeepSeek names)."""

from __future__ import annotations

from tensorrt_llm_tpu.models.deepseek import DeepseekForCausalLM
from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)

_RENAMES = (
    ("model.embed_tokens", "tok_embeddings"),
    ("model.layers", "layers"),
    ("model.norm", "norm"),
    ("lm_head", "output"),
    ("self_attn", "attention"),
    ("input_layernorm", "attention_norm"),
    ("post_attention_layernorm", "ffn_norm"),
    ("mlp", "feed_forward"),
)


@register_auto_model("MistralLarge3ForCausalLM")
class MistralLarge3ForCausalLM(DeepseekForCausalLM):
    def __init__(self, cfg: ModelConfig):
        cfg.moe_score_func = "softmax"
        cfg.norm_topk_prob = True
        cfg.n_group = 1
        cfg.topk_group = 1
        cfg.routed_scaling_factor = 1.0
        super().__init__(cfg)

    def load_hf_weights(self, get_tensor, dtype=None):
        def mget(name):
            a = get_tensor(name)
            if a is not None:
                return a
            alt = name
            for ours, theirs in _RENAMES:
                alt = alt.replace(ours, theirs)
            return get_tensor(alt)

        return super().load_hf_weights(mget, dtype=dtype)
