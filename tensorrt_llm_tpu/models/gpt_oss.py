"""GPT-OSS (OpenAI open-weight MoE) causal LM.

Counterpart of the reference's `modeling_gpt_oss.py` (`_torch/models/`):
alternating sliding/full attention layers (config.layer_types), per-head
attention-sink logits, biased QKV/O projections, and an all-MoE FFN stack
with a biased router (top-k on raw logits, softmax over the k), per-expert
gate_up/down biases, and the clamped swiglu activation
(alpha=1.702, limit=7).  HF checkpoints store experts as stacked tensors
with gate/up channel-interleaved; the loader de-interleaves into this
framework's [gate | up] fused layout.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    register_auto_model,
)


@register_auto_model("GptOssForCausalLM")
class GptOssForCausalLM(DecoderModelForCausalLM):

    def _load_mlp(self, layer, get_tensor, pre: str, t):
        def arr(name):
            a = get_tensor(pre + name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        router = arr("mlp.router.weight").T          # [H, E]
        router_bias = arr("mlp.router.bias")         # [E]
        gate_up = arr("mlp.experts.gate_up_proj")    # [E, H, 2I] interleaved
        gate_w, up_w = gate_up[..., ::2], gate_up[..., 1::2]
        gub = arr("mlp.experts.gate_up_proj_bias")   # [E, 2I] interleaved
        gate_b, up_b = gub[..., ::2], gub[..., 1::2]
        down_w = arr("mlp.experts.down_proj")        # [E, I, H]
        down_b = arr("mlp.experts.down_proj_bias")   # [E, H]
        return layer.mlp.from_float(
            router, gate_w, up_w, down_w,
            router_bias=router_bias, gate_b=gate_b, up_b=up_b, down_b=down_b)
