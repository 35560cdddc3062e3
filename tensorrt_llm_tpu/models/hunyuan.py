"""Tencent HunYuan v1 dense + MoE (reference
`_torch/models/modeling_hunyuan_dense.py`, `modeling_hunyuan_moe.py`):
Llama-family decoder whose per-head q/k RMSNorm (HF names
query_layernorm/key_layernorm) applies AFTER rope; the MoE variant adds
Mixtral-style softmax-topk-renormalize routing plus an always-on shared
gated MLP (HunYuanMoEV1Moe: final = experts(x) + shared_mlp(x))."""

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
        cfg.qk_norm_post_rope = True
        super().__init__(cfg)


@register_auto_model("HunYuanMoEV1ForCausalLM")
class HunYuanMoEV1ForCausalLM(HunYuanDenseV1ForCausalLM):
    MOE_ROUTER_KEY = "mlp.gate.wg.weight"
    MOE_SHARED_PREFIX = "mlp.shared_mlp."

    def __init__(self, cfg: ModelConfig):
        # every layer is MoE; experts and the shared MLP share one
        # intermediate size (HF HunYuanMoEV1MLP uses intermediate_size for
        # both), routing renormalizes the top-k softmax
        cfg.norm_topk_prob = True
        cfg.n_shared_experts = 1
        if isinstance(cfg.num_experts_per_tok, list):
            cfg.num_experts_per_tok = cfg.num_experts_per_tok[0]
        tk = cfg.extra.get("moe_topk")
        if tk:
            cfg.num_experts_per_tok = tk[0] if isinstance(tk, list) else tk
        cfg.moe_intermediate_size = cfg.intermediate_size
        super().__init__(cfg)
