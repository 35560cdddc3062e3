"""DeepSeek V2/V3 (MLA + noaux-tc MoE) causal LM.

Counterpart of the reference's `modeling_deepseekv3.py`
(`_torch/models/modeling_deepseekv3.py:671,717`): MLA attention with a paged
latent cache (layers/mla.py), first_k_dense_replace leading dense layers,
sigmoid routing with e_score_correction_bias and group-limited top-k, shared
experts, YaRN rope with interleaved pairs.  The MTP speculative head is wired
through speculative/mtp.py.
"""

from __future__ import annotations

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    register_auto_model,
)


@register_auto_model("DeepseekV3ForCausalLM", "DeepseekV2ForCausalLM")
class DeepseekForCausalLM(DecoderModelForCausalLM):
    """MLA attention loader: q (optionally low-rank), compressed KV, o."""

    def _load_attn(self, layer, pre: str, t, vec):
        a = pre + "self_attn."
        kwargs = {}
        if layer.attn.q_lora_rank is not None:
            kwargs["q_a_w"] = t(a + "q_a_proj.weight")
            kwargs["q_norm"] = vec(a + "q_a_layernorm.weight")
            kwargs["q_b_w"] = t(a + "q_b_proj.weight")
        else:
            kwargs["q_w"] = t(a + "q_proj.weight")
        if layer.attn.sparse is not None:
            # DSA lightning indexer (V3.2; reference dsa.py:869-893 —
            # wq_b/wk/k_norm/weights_proj under self_attn.indexer.)
            i = a + "indexer."
            kwargs["indexer"] = {
                "wq_b": t(i + "wq_b.weight"),
                "wk": t(i + "wk.weight"),
                "k_norm_w": vec(i + "k_norm.weight"),
                "k_norm_b": vec(i + "k_norm.bias"),
                "weights_proj": t(i + "weights_proj.weight"),
            }
        return layer.attn.from_float(
            t(a + "kv_a_proj_with_mqa.weight"),
            t(a + "kv_b_proj.weight"),
            t(a + "o_proj.weight"),
            vec(a + "kv_a_layernorm.weight"),
            **kwargs,
        )
