"""MiniMax-Text-01 / M1-class hybrid: lightning (linear) attention + full
attention + Mixtral-style MoE.

Counterpart of the reference's MiniMax support
(`_torch/models/modeling_minimaxm2.py` lineage): `layer_types` alternates
``linear_attention`` and ``full_attention`` mixers, every layer followed by
a sparse-MoE FFN.  Lightning attention (TransNormer decay kernel) keeps a
per-sequence ``[H, D, D]`` recurrent KV state in a slot-addressed pool —
the same machinery as the Mamba2 SSM states — with exact chunked prefill
(intra-block decay mask + inter-block decayed state, the HF block
recurrence reorganized for the MXU) and a one-step decode recurrence.

Mapped onto the Nemotron-H hybrid stack as two pseudo-layers per HF layer:
(input_layernorm + mixer) then (post_attention_layernorm + MoE)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.moe import MoE
from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.nemotron_h import NemotronHForCausalLM
from tensorrt_llm_tpu.ops.rope import make_rope_tables


class LightningMixer:
    """TransNormer/lightning linear attention with per-head exponential
    decay (HF MiniMaxLightningAttention)."""

    def __init__(self, cfg: ModelConfig, hf_idx: int, block_size: int = 256):
        self.H = cfg.num_heads
        self.D = cfg.head_dim
        self.hidden = cfg.hidden_size
        self.B = block_size
        self.dtype = cfg.dtype
        base = 1.0 / (2.0 ** (8.0 / self.H))
        factor = 1 - hf_idx / (cfg.num_layers // 2 - 1 + 1e-5) + 1e-5
        self.slope = (base ** (np.arange(self.H) + 1) * factor
                      ).astype(np.float32)                  # [H]

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        H, D, HID = self.H, self.D, self.hidden
        std = 0.5 / HID ** 0.5
        return {
            "qkv": (jax.random.normal(k1, (HID, 3 * H * D), jnp.float32)
                    * std).astype(self.dtype),
            "out": (jax.random.normal(k2, (H * D, HID), jnp.float32)
                    * std).astype(self.dtype),
            "gate": (jax.random.normal(k3, (HID, H * D), jnp.float32)
                     * std).astype(self.dtype),
            "norm": jnp.ones((H * D,), jnp.float32),
        }

    def param_specs(self) -> Dict:
        return {"qkv": P(None, None), "out": P(None, None),
                "gate": P(None, None), "norm": P(None)}

    def cache_specs(self):
        return P(None, None, None, None)

    def load_hf(self, arr, pre: str) -> Dict:
        return {
            "qkv": arr(pre + "qkv_proj.weight").T.astype(self.dtype),
            "out": arr(pre + "out_proj.weight").T.astype(self.dtype),
            "gate": arr(pre + "output_gate.weight").T.astype(self.dtype),
            "norm": arr(pre + "norm.weight"),
        }

    # ---- forward ----------------------------------------------------------------
    def __call__(self, params: Dict, x: jax.Array, state: jax.Array,
                 meta: AttentionMetadata):
        T = x.shape[0]
        H, D = self.H, self.D
        qkv = jax.nn.silu(jnp.dot(x, params["qkv"],
                                  preferred_element_type=jnp.float32))
        qkv = qkv.reshape(T, H, 3 * D)
        q, k, v = jnp.split(qkv, 3, axis=-1)               # [T, H, D] f32
        slope = jnp.asarray(self.slope)                    # [H]

        if meta.mode == "decode":
            # one token per row; each row owns a state slot
            slots = meta.seq_slots
            st = state[jnp.minimum(slots, state.shape[0] - 1)]  # [B, H, D, D]
            kv = jnp.einsum("bhd,bhe->bhde", k, v)
            st2 = jnp.exp(-slope)[None, :, None, None] * st + kv
            out = jnp.einsum("bhd,bhde->bhe", q, st2)
            state = state.at[slots].set(st2, mode="drop")
        else:
            # chunked prefill: one sequence; trailing rows are padding
            n_valid = meta.kv_lens[0] - meta.q_offset
            valid = (jnp.arange(T) < n_valid)
            k = jnp.where(valid[:, None, None], k, 0.0)
            v = jnp.where(valid[:, None, None], v, 0.0)
            slot = meta.seq_slots[0]
            st = state[jnp.minimum(slot, state.shape[0] - 1)]  # [H, D, D]
            B = min(self.B, T)
            nb = (T + B - 1) // B
            outs = []
            idx = jnp.arange(B, dtype=jnp.float32)
            # intra-block decay mask exp(-slope * (i - j)), i >= j
            dd = idx[:, None] - idx[None, :]
            intra = jnp.where(dd >= 0,
                              jnp.exp(-slope[:, None, None] * dd[None]),
                              0.0)                          # [H, B, B]
            for b in range(nb):
                Bb = min(B, T - b * B)       # last block may be ragged
                qb = q[b * B:b * B + Bb]                   # [Bb, H, D]
                kb = k[b * B:b * B + Bb]
                vb = v[b * B:b * B + Bb]
                nv = jnp.clip(n_valid - b * B, 0, Bb).astype(jnp.float32)
                ib = idx[:Bb]
                # inter: decayed query against the carried state
                q_dec = jnp.exp(-slope[None, :] * (ib[:, None] + 1.0))
                inter = jnp.einsum("bhd,hde->bhe", qb * q_dec[..., None], st)
                # intra: masked decay attention within the block
                sc = jnp.einsum("ihd,jhd->hij", qb, kb) * intra[:, :Bb, :Bb]
                intra_out = jnp.einsum("hij,jhd->ihd", sc, vb)
                outs.append(inter + intra_out)
                # state update: keys decay by remaining VALID steps
                k_dec = jnp.exp(slope[None, :] * (ib[:, None] + 1.0 - nv))
                k_dec = jnp.where((ib[:, None] < nv), k_dec, 0.0)
                kv = jnp.einsum("bhd,bhe->hde", kb * k_dec[..., None], vb)
                st = jnp.exp(-slope * nv)[:, None, None] * st + kv
            out = jnp.concatenate(outs, axis=0)
            state = state.at[slot].set(st, mode="drop")

        # RMSNorm over the flattened heads + sigmoid output gate
        flat = out.reshape(T, H * D)
        var = jnp.mean(flat * flat, axis=-1, keepdims=True)
        flat = flat * jax.lax.rsqrt(var + 1e-6) * params["norm"]
        gate = jax.nn.sigmoid(jnp.dot(x.astype(jnp.float32),
                                      params["gate"].astype(jnp.float32)))
        y = (flat * gate).astype(self.dtype)
        return jnp.dot(y, params["out"]).astype(x.dtype), state


@register_auto_model("MiniMaxForCausalLM")
class MiniMaxForCausalLM(NemotronHForCausalLM):
    """layer_types linear/full attention mixers + Mixtral-style MoE FFNs."""

    def __init__(self, cfg: ModelConfig):
        L = cfg.num_layers
        lt = cfg.extra.get("layer_types") or cfg.layer_types or \
            ["linear_attention"] * L
        self.hf_layers = L
        self._block_size = cfg.extra.get("block_size", 256)
        cfg.extra["hybrid_override_pattern"] = "".join(
            ("*E" if "full" in t else "LE") for t in lt)
        cfg.num_layers = 2 * L
        cfg.layer_types = None
        super().__init__(cfg)

    def _make_component(self, t: str, idx: int):
        cfg = self.cfg
        if t == "L":
            return LightningMixer(cfg, idx // 2, self._block_size)
        if t == "E":
            return MoE(
                hidden_size=cfg.hidden_size,
                intermediate_size=cfg.moe_intermediate_size,
                num_experts=cfg.num_experts,
                top_k=cfg.num_experts_per_tok,
                activation=cfg.activation,
                renormalize=cfg.norm_topk_prob,
                dtype=cfg.dtype, quant=cfg.quant,
                ep_size=cfg.mapping.moe_ep_size,
                tp_size=cfg.mapping.moe_tp_size)
        return super()._make_component(t, idx)

    # ---- HF weights -------------------------------------------------------------
    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        cfg = self.cfg

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = {
            "embedding": self.embedding.from_float(
                arr("model.embed_tokens.weight")),
            "final_norm": arr("model.norm.weight"),
            "rope": tuple(make_rope_tables(cfg.rope)),
            "layers": [],
        }
        for j in range(self.hf_layers):
            pre = f"model.layers.{j}."
            comp = self.components[2 * j]
            if isinstance(comp, LightningMixer):
                mixer = comp.load_hf(arr, pre + "self_attn.")
            else:
                a = pre + "self_attn."
                mixer = comp.from_float(
                    arr(a + "q_proj.weight").T, arr(a + "k_proj.weight").T,
                    arr(a + "v_proj.weight").T, arr(a + "o_proj.weight").T)
            moe = self.components[2 * j + 1]
            router = arr(pre + "block_sparse_moe.gate.weight").T  # [H, E]
            stacks = {}
            for kind, proj in (("gate", "w1"), ("up", "w3"), ("down", "w2")):
                mats = [arr(pre + f"block_sparse_moe.experts.{e}."
                            f"{proj}.weight").T
                        for e in range(cfg.num_experts)]
                stacks[kind] = jnp.stack(mats)
            ffn = moe.from_float(router, stacks["gate"], stacks["up"],
                                 stacks["down"])
            params["layers"].append({
                "norm": arr(pre + "input_layernorm.weight"), "comp": mixer})
            params["layers"].append({
                "norm": arr(pre + "post_attention_layernorm.weight"),
                "comp": ffn})
        if not cfg.tie_word_embeddings:
            params["lm_head"] = arr("lm_head.weight").T.astype(cfg.dtype)
        return params

    def forward(self, params, input_ids, kv_caches, meta,
                logit_indices=None, return_hidden: bool = False,
                capture: str = "final", input_embeds=None):
        """MiniMax residual flow (deepnorm-style post-norm): the residual is
        the NORMED stream with per-layer-type alpha/beta factors —
        x = norm(x)*alpha + block(norm(x))*beta — unlike the pre-norm hybrids."""
        import jax.numpy as jnp
        from tensorrt_llm_tpu.ops.norms import rms_norm
        cfg = self.cfg
        ex = cfg.extra
        x = (input_embeds.astype(cfg.dtype) if input_embeds is not None
             else self.embedding(params["embedding"], input_ids))
        rope_tables = params["rope"]
        new_caches = []
        for i, (t, comp) in enumerate(zip(self.pattern, self.components)):
            lp = params["layers"][i]
            h = rms_norm(x, lp["norm"], cfg.rms_eps)
            if t == "L":
                out, cache = comp(lp["comp"], h, kv_caches[i], meta)
                a = ex.get("linear_attn_alpha_factor", 1.0)
                b = ex.get("linear_attn_beta_factor", 1.0)
            elif t == "*":
                out, cache = comp(lp["comp"], h, rope_tables, kv_caches[i],
                                  meta)
                a = ex.get("full_attn_alpha_factor", 1.0)
                b = ex.get("full_attn_beta_factor", 1.0)
            else:
                out, cache = comp(lp["comp"], h), kv_caches[i]
                a = ex.get("mlp_alpha_factor", 1.0)
                b = ex.get("mlp_beta_factor", 1.0)
            x = (h.astype(jnp.float32) * a
                 + out.astype(jnp.float32) * b).astype(x.dtype)
            new_caches.append(cache)
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        if logit_indices is not None:
            x = x[logit_indices]
        if cfg.tie_word_embeddings:
            logits = jnp.dot(x, params["embedding"]["weight"].T.astype(x.dtype),
                             preferred_element_type=jnp.float32)
        else:
            logits = jnp.dot(x, params["lm_head"].astype(x.dtype),
                             preferred_element_type=jnp.float32)
        if return_hidden:
            return logits, x, new_caches
        return logits, new_caches


