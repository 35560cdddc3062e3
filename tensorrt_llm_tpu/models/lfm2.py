"""LiquidAI LFM2 (reference arch list `modeling_auto.py` / HF
`modeling_lfm2.py`): conv/attention hybrid where every layer is
``operator_norm + mixer`` then ``ffn_norm + SwiGLU``.  Conv layers are
gated short convolutions (Lfm2ShortConv): in_proj splits to (B, C, x),
a depthwise causal conv of length ``conv_L_cache`` runs over B*x, and the
output is gated by C before out_proj.  Attention layers use per-head
q/k RMSNorm before rope.

Mapped onto the Nemotron-H hybrid stack as two pseudo-layers per HF layer
('C-' conv / '*-' attention) with slot-addressed [L-1, H] conv states —
the same machinery as Mamba conv history."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.nemotron_h import NemotronHForCausalLM
from tensorrt_llm_tpu.ops.rope import make_rope_tables
from tensorrt_llm_tpu.ops.ssm import causal_conv1d_chunk, causal_conv1d_step


class ShortConvMixer:
    """Gated depthwise short conv (HF Lfm2ShortConv.slow_forward)."""

    def __init__(self, cfg: ModelConfig):
        self.H = cfg.hidden_size
        self.K = int(cfg.extra.get("conv_L_cache") or 3)
        self.has_bias = bool(cfg.extra.get("conv_bias"))
        self.dtype = cfg.dtype

    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        H = self.H
        std = 0.5 / H ** 0.5
        p = {
            "in_proj": (jax.random.normal(k1, (H, 3 * H), jnp.float32)
                        * std).astype(self.dtype),
            "conv_w": jax.random.normal(k2, (self.K, H), jnp.float32) * 0.2,
            "conv_b": (jnp.zeros((H,), jnp.float32)
                       if self.has_bias else None),
            "out_proj": (jax.random.normal(k3, (H, H), jnp.float32)
                         * std).astype(self.dtype),
        }
        if not self.has_bias:
            p.pop("conv_b")
        return p

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        p = {"in_proj": P(None, None), "conv_w": P(None, None),
             "out_proj": P(None, None)}
        if self.has_bias:
            p["conv_b"] = P(None)
        return p

    def cache_specs(self):
        from jax.sharding import PartitionSpec as P
        return P(None, None, None)

    def __call__(self, params, x, cache, meta: AttentionMetadata):
        """cache = conv state pool [S, K-1, H] bf16."""
        Tb = x.shape[0]
        bcx = jnp.dot(x, params["in_proj"].astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)
        b, c, xx = jnp.split(bcx, 3, axis=-1)
        bx = b * xx
        w = params["conv_w"]
        bias = params.get("conv_b")

        if meta.mode == "prefill":
            slot = meta.seq_slots[0]
            fresh = meta.q_offset == 0
            hist = jnp.where(fresh, 0.0,
                             cache[slot].astype(jnp.float32)).astype(x.dtype)
            conv_out, _ = causal_conv1d_chunk(bx, w, bias, hist)
            # carry the last K-1 VALID inputs (chunk may be padded)
            L = meta.kv_lens[0] - meta.q_offset
            full = jnp.concatenate([hist, bx], axis=0)
            idx = jnp.clip(L + jnp.arange(self.K - 1), 0, full.shape[0] - 1)
            new_hist = full[idx]
            wr = jnp.where(meta.seq_slots[0] < cache.shape[0],
                           meta.seq_slots[0], cache.shape[0])
            cache = cache.at[wr].set(new_hist.astype(cache.dtype),
                                     mode="drop")
        else:
            slots = jnp.where(meta.seq_slots >= cache.shape[0],
                              cache.shape[0] - 1, meta.seq_slots)
            hist = cache[slots].astype(x.dtype)         # [B, K-1, H]
            conv_out, new_hist = causal_conv1d_step(bx, w, bias, hist)
            pad_guard = meta.seq_slots < cache.shape[0]
            wr = jnp.where(pad_guard, meta.seq_slots, cache.shape[0])
            cache = cache.at[wr].set(new_hist.astype(cache.dtype),
                                     mode="drop")
        y = c * conv_out.astype(x.dtype)
        return jnp.dot(y, params["out_proj"].astype(x.dtype),
                       preferred_element_type=jnp.float32
                       ).astype(x.dtype), cache


def lfm2_ffn_dim(cfg_extra: dict, intermediate_size: int) -> int:
    """HF Lfm2MLP's auto-adjusted feed-forward width."""
    if not cfg_extra.get("block_auto_adjust_ff_dim"):
        return intermediate_size
    d = int(2 * intermediate_size / 3)
    mult = cfg_extra.get("block_ffn_dim_multiplier")
    if mult is not None:
        d = int(mult * d)
    m = int(cfg_extra.get("block_multiple_of") or 256)
    return m * ((d + m - 1) // m)


@register_auto_model("Lfm2ForCausalLM")
class Lfm2ForCausalLM(NemotronHForCausalLM):
    STATE_TYPES = ("M", "L", "C")

    def __init__(self, cfg: ModelConfig):
        L = cfg.num_layers
        lt = cfg.extra.get("layer_types") or cfg.layer_types or []
        cfg.extra["hybrid_override_pattern"] = "".join(
            ("*-" if "attention" in t else "C-") for t in lt) or "C-" * L
        cfg.qk_norm = True
        cfg.intermediate_size = lfm2_ffn_dim(cfg.extra,
                                             cfg.intermediate_size)
        self.hf_layers = L
        cfg.num_layers = 2 * L
        cfg.layer_types = None
        super().__init__(cfg)

    def _make_component(self, t: str, idx: int):
        if t == "C":
            return ShortConvMixer(self.cfg)
        comp = super()._make_component(t, idx)
        if t == "*":
            comp.has_qk_norm = True
        return comp

    def make_layer_caches(self, kv_manager):
        caches = super().make_layer_caches(kv_manager)
        S = kv_manager.slots.max_slots
        for i, t in enumerate(self.pattern):
            if t == "C":
                comp = self.components[i]
                caches[i] = jnp.zeros((S, comp.K - 1, comp.H), jnp.bfloat16)
        return caches

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        cfg = self.cfg

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = {
            "embedding": self.embedding.from_float(
                arr("model.embed_tokens.weight")),
            "final_norm": arr("model.embedding_norm.weight"),
            "rope": tuple(make_rope_tables(cfg.rope)),
            "layers": [],
        }
        for j in range(self.hf_layers):
            pre = f"model.layers.{j}."
            mixer_t = self.pattern[2 * j]
            comp = self.components[2 * j]
            if mixer_t == "C":
                conv_w = arr(pre + "conv.conv.weight")   # [H, 1, K]
                mixer = {
                    "in_proj": arr(pre + "conv.in_proj.weight").T.astype(
                        cfg.dtype),
                    "conv_w": jnp.transpose(conv_w[:, 0, :], (1, 0)),
                    "out_proj": arr(pre + "conv.out_proj.weight").T.astype(
                        cfg.dtype),
                }
                cb = arr(pre + "conv.conv.bias")
                if cb is not None:
                    mixer["conv_b"] = cb
            else:
                a = self.components[2 * j]
                mixer = a.from_float(
                    arr(pre + "self_attn.q_proj.weight").T,
                    arr(pre + "self_attn.k_proj.weight").T,
                    arr(pre + "self_attn.v_proj.weight").T,
                    arr(pre + "self_attn.out_proj.weight").T,
                    q_norm=arr(pre + "self_attn.q_layernorm.weight"),
                    k_norm=arr(pre + "self_attn.k_layernorm.weight"))
            ffn = self.components[2 * j + 1].from_float(
                arr(pre + "feed_forward.w1.weight").T,
                arr(pre + "feed_forward.w3.weight").T,
                arr(pre + "feed_forward.w2.weight").T)
            params["layers"].append(
                {"norm": arr(pre + "operator_norm.weight"), "comp": mixer})
            params["layers"].append(
                {"norm": arr(pre + "ffn_norm.weight"), "comp": ffn})
        if not cfg.tie_word_embeddings:
            params["lm_head"] = arr("lm_head.weight").T.astype(cfg.dtype)
        return params
