"""Phi-3 / Phi-4 family.

Counterpart of the reference's `modeling_phi3.py`: Llama-structured decoder
whose HF checkpoints ship *pre-fused* qkv_proj and gate_up_proj tensors —
the loader splits them back into per-projection floats so the shared
TP-interleaving path applies.
"""

from __future__ import annotations

import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)


@register_auto_model("Phi3ForCausalLM", "Phi4ForCausalLM")
class Phi3ForCausalLM(DecoderModelForCausalLM):
    def load_hf_weights(self, get_tensor, dtype=None):
        cfg = self.cfg
        qd = cfg.num_heads * cfg.head_dim
        kvd = cfg.num_kv_heads * cfg.head_dim

        def wrapped(name):
            arr = get_tensor(name)
            if arr is not None:
                return arr
            # split fused checkpoints back into per-proj tensors ([out, in])
            if ".self_attn.q_proj.weight" in name:
                fused = get_tensor(name.replace("q_proj", "qkv_proj"))
                return None if fused is None else np.asarray(fused)[:qd]
            if ".self_attn.k_proj.weight" in name:
                fused = get_tensor(name.replace("k_proj", "qkv_proj"))
                return None if fused is None else np.asarray(fused)[qd:qd + kvd]
            if ".self_attn.v_proj.weight" in name:
                fused = get_tensor(name.replace("v_proj", "qkv_proj"))
                return None if fused is None else np.asarray(fused)[qd + kvd:]
            if ".mlp.gate_proj.weight" in name:
                fused = get_tensor(name.replace("gate_proj", "gate_up_proj"))
                return None if fused is None else np.asarray(fused)[:cfg.intermediate_size]
            if ".mlp.up_proj.weight" in name:
                fused = get_tensor(name.replace("up_proj", "gate_up_proj"))
                return None if fused is None else np.asarray(fused)[cfg.intermediate_size:]
            return None
        return super().load_hf_weights(wrapped, dtype)
