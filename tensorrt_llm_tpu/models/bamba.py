"""IBM Bamba (HF BambaForCausalLM): Mamba2/attention hybrid where EVERY
layer is mixer + gated FFN (reference `_torch/models` bamba/granite-hybrid
lineage).

Mapped onto the Nemotron-H hybrid stack as two pseudo-layers per HF layer:
``input_layernorm + mixer`` (M or *) followed by ``pre_ff_layernorm + FFN``
(-) — identical math, shared Mamba2 mixer, paged-KV attention and
slot-state machinery.  Attention layers use partial rotary (factor from the
HF config)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.nemotron_h import NemotronHForCausalLM
from tensorrt_llm_tpu.ops.rope import make_rope_tables


@register_auto_model("BambaForCausalLM")
class BambaForCausalLM(NemotronHForCausalLM):
    FFN_NORM_KEY = "pre_ff_layernorm.weight"
    FINAL_NORM_KEY = "model.final_layernorm.weight"

    def __init__(self, cfg: ModelConfig):
        L = cfg.num_layers
        attn_idx = set(cfg.extra.get("attn_layer_indices") or [])
        lt = cfg.extra.get("layer_types") or cfg.layer_types
        if lt and not attn_idx:
            attn_idx = {i for i, t in enumerate(lt) if "attention" in t}
        self.hf_layers = L
        cfg.extra["hybrid_override_pattern"] = "".join(
            ("*-" if i in attn_idx else "M-") for i in range(L))
        cfg.num_layers = 2 * L
        cfg.layer_types = None          # VSWA pattern logic off
        super().__init__(cfg)

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        cfg = self.cfg

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = {
            "embedding": self.embedding.from_float(
                arr("model.embed_tokens.weight")),
            "final_norm": arr(self.FINAL_NORM_KEY),
            "rope": tuple(make_rope_tables(cfg.rope)),
            "layers": [],
        }
        for j in range(self.hf_layers):
            pre = f"model.layers.{j}."
            mixer_t = self.pattern[2 * j]
            comp = self.components[2 * j]
            if mixer_t == "M":
                conv_w = arr(pre + "mamba.conv1d.weight")  # [conv_dim, 1, K]
                conv_b = arr(pre + "mamba.conv1d.bias")
                mixer = {
                    "in_proj": comp.shard_in_proj(
                        arr(pre + "mamba.in_proj.weight").T.astype(cfg.dtype)),
                    "conv_w": comp.shard_conv(
                        jnp.transpose(conv_w[:, 0, :], (1, 0))),
                    "conv_b": comp.shard_conv(
                        conv_b if conv_b is not None
                        else jnp.zeros((comp.conv_dim_global,), jnp.float32)),
                    "A_log": arr(pre + "mamba.A_log"),
                    "D": arr(pre + "mamba.D"),
                    "dt_bias": arr(pre + "mamba.dt_bias"),
                    "gated_norm": arr(pre + "mamba.norm.weight"),
                    "out_proj": arr(pre + "mamba.out_proj.weight").T.astype(
                        cfg.dtype),
                }
            else:
                a = pre + "self_attn."
                mixer = comp.from_float(
                    arr(a + "q_proj.weight").T,
                    arr(a + "k_proj.weight").T,
                    arr(a + "v_proj.weight").T,
                    arr(a + "o_proj.weight").T)
            ffn = self._load_ffn(self.components[2 * j + 1], arr, pre)
            params["layers"].append({
                "norm": arr(pre + "input_layernorm.weight"),
                "comp": mixer,
            })
            params["layers"].append({
                "norm": arr(pre + self.FFN_NORM_KEY),
                "comp": ffn,
            })
        if not cfg.tie_word_embeddings:
            params["lm_head"] = arr("lm_head.weight").T.astype(cfg.dtype)
        return params

    def _load_ffn(self, comp, arr, pre):
        return comp.from_float(
            arr(pre + "feed_forward.gate_proj.weight").T,
            arr(pre + "feed_forward.up_proj.weight").T,
            arr(pre + "feed_forward.down_proj.weight").T)


@register_auto_model("GraniteMoeHybridForCausalLM")
class GraniteMoeHybridForCausalLM(BambaForCausalLM):
    """IBM Granite 4.0 hybrid (HF GraniteMoeHybridForCausalLM, dense
    shared-MLP variant): Bamba-style mamba/attention + FFN layers with
    Granite's four scalar multipliers, NoPE attention (no positional
    embedding by default), and a fused gate|up shared-MLP weight."""

    FFN_NORM_KEY = "post_attention_layernorm.weight"
    FINAL_NORM_KEY = "model.norm.weight"

    def __init__(self, cfg: ModelConfig):
        ex = cfg.extra
        if cfg.num_experts:
            raise NotImplementedError(
                "Granite hybrid MoE experts land later; dense shared-MLP "
                "models are supported")
        if ex.get("shared_intermediate_size"):
            cfg.intermediate_size = ex["shared_intermediate_size"]
        cfg.embedding_multiplier = ex.get("embedding_multiplier")
        cfg.residual_multiplier = ex.get("residual_multiplier")
        cfg.logits_scaling = ex.get("logits_scaling")
        am = ex.get("attention_multiplier")
        if am:
            cfg.query_pre_attn_scalar = am ** -2
        if ex.get("position_embedding_type") != "rope":
            ex["nope_attention"] = True
        super().__init__(cfg)

    def _load_ffn(self, comp, arr, pre):
        gu = arr(pre + "shared_mlp.input_linear.weight").T   # [H, 2I]
        I = self.cfg.intermediate_size
        return comp.from_float(
            gu[:, :I], gu[:, I:],
            arr(pre + "shared_mlp.output_linear.weight").T)
