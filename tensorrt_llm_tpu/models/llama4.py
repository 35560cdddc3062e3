"""Llama-4 (Scout / Maverick) text architecture.

Counterpart of the reference's Llama4 support in
`_torch/models/modeling_llama.py:54-430` (`Llama4Attention`, `Llama4MoE`),
semantics matched against HF `modeling_llama4.py`:

  * NoPE every `no_rope_layer_interval`-th layer: no rotary, global
    attention, and q temperature tuning
    (q *= log1p(floor((pos+1)/floor_scale)) * attn_scale + 1);
  * rope layers use adjacent-pair (interleaved) rotary + unweighted q/k RMS
    (Llama4TextL2Norm) after rope, and CHUNKED attention
    (same-`attention_chunk_size`-chunk keys only) — chunked layers ride the
    VSWA cyclic-ring KV pools;
  * MoE: top-k on raw router logits, sigmoid weights (no renorm), router
    weight applied to the expert INPUT, one always-on shared expert;
    experts stored fused+stacked in HF ([E, H, 2I] gate_up / [E, I, H] down);
  * dense (non-MoE) layers use the wider `intermediate_size_mlp`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("Llama4ForCausalLM", "Llama4TextModel",
                     "Llama4ForConditionalGeneration")
class Llama4ForCausalLM(DecoderModelForCausalLM):

    def __init__(self, cfg: ModelConfig):
        ex = cfg.extra
        cfg.gqa_rope_interleave = True
        cfg.qk_norm_l2 = bool(ex.get("use_qk_norm", True))
        cfg.attn_temperature_tuning = bool(
            ex.get("attn_temperature_tuning", True))
        cfg.floor_scale = float(ex.get("floor_scale", 8192.0))
        cfg.attn_scale = float(ex.get("attn_scale", 0.1))
        cfg.no_rope_layer_interval = int(ex.get("no_rope_layer_interval", 4))
        if cfg.attention_chunk_size is None:
            cfg.attention_chunk_size = ex.get("attention_chunk_size", 8192)
        if cfg.num_experts > 0:
            cfg.moe_topk_then_sigmoid = True
            cfg.moe_apply_router_weight_on_input = True
            cfg.norm_topk_prob = False
            cfg.moe_score_func = "softmax"  # unused with topk_then_sigmoid
            cfg.n_shared_experts = 1
            cfg.decoder_sparse_step = int(
                ex.get("interleave_moe_layer_step", 1))
            # experts + shared expert use HF intermediate_size; dense layers
            # use the wider intermediate_size_mlp
            cfg.moe_intermediate_size = cfg.intermediate_size
            cfg.intermediate_size = int(
                ex.get("intermediate_size_mlp", cfg.intermediate_size))
        super().__init__(cfg)

    # ---- weights -------------------------------------------------------------
    def load_hf_weights(self, get_tensor, dtype=None):
        def get(name):
            arr = get_tensor(name)
            if arr is None:
                # Llama4ForConditionalGeneration checkpoints prefix the text
                # stack with "language_model."
                arr = get_tensor("language_model." + name)
            return arr
        return super().load_hf_weights(get, dtype=dtype)

    def _load_mlp(self, layer, get_tensor, pre: str, t):
        from tensorrt_llm_tpu.layers.moe import MoE
        if not isinstance(layer.mlp, MoE):
            return layer.mlp.from_float(
                t(pre + "feed_forward.gate_proj.weight"),
                t(pre + "feed_forward.up_proj.weight"),
                t(pre + "feed_forward.down_proj.weight"))

        def raw(name):
            return jnp.asarray(
                np.asarray(get_tensor(pre + name))).astype(jnp.float32)

        router = t(pre + "feed_forward.router.weight")        # [H, E]
        gu = raw("feed_forward.experts.gate_up_proj")         # [E, H, 2I]
        I = layer.mlp.intermediate_size
        down = raw("feed_forward.experts.down_proj")          # [E, I, H]
        sp = pre + "feed_forward.shared_expert."
        shared = layer.mlp.shared.from_float(
            t(sp + "gate_proj.weight"), t(sp + "up_proj.weight"),
            t(sp + "down_proj.weight"))
        return layer.mlp.from_float(router, gu[..., :I], gu[..., I:], down,
                                    shared=shared)
