"""Nemotron-H-class hybrid model: Mamba2 / attention / MLP layer mix.

Counterpart of the reference's hybrid-model support
(`_torch/models/modeling_nemotron_h.py`, `mamba_cache_manager.py` +
`rnnStateManager.cpp` alongside paged KV): each block is
``x + component(norm(x))`` where the component per layer is chosen by
``hybrid_override_pattern`` — 'M' = Mamba2 mixer, '*' = attention, '-' = MLP
(the Nemotron-H notation).  Attention layers use the paged KV pools; Mamba
layers use slot-addressed state pools; MLP layers carry no state — the
per-layer cache pytree mixes all three.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.attention import Attention
from tensorrt_llm_tpu.layers.embedding import Embedding
from tensorrt_llm_tpu.layers.linear import Linear, make_linear_method
from tensorrt_llm_tpu.layers.mlp import GatedMLP
from tensorrt_llm_tpu.models.mamba2 import Mamba2Mixer
from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.ops.norms import rms_norm
from tensorrt_llm_tpu.ops.rope import make_rope_tables


@register_auto_model("NemotronHForCausalLM")
class NemotronHForCausalLM:
    """Hybrid decoder; layer pattern via cfg.extra['hybrid_override_pattern']."""

    # per-char component call conventions (subclasses extend):
    # STATE: comp(params, h, cache, meta); ATTN: comp(params, h, rope, cache,
    # meta); anything else: comp(params, h) stateless
    STATE_TYPES = ("M", "L")
    ATTN_TYPES = ("*",)

    def __init__(self, cfg: ModelConfig):
        assert cfg.mapping.pp_size == 1 and cfg.mapping.cp_size == 1 \
            and cfg.mapping.dp_size == 1, \
            "hybrid-model PP/CP/DP sharding lands in a later round"
        self.cfg = cfg
        tp = cfg.mapping.tp_size
        self.pattern = cfg.extra.get(
            "hybrid_override_pattern", "M" * cfg.num_layers)
        assert len(self.pattern) == cfg.num_layers, (
            len(self.pattern), cfg.num_layers)
        self.embedding = Embedding(cfg.vocab_size, cfg.hidden_size, cfg.dtype)
        self.components = [self._make_component(t, i)
                           for i, t in enumerate(self.pattern)]

    def _make_component(self, t: str, idx: int):
        """One layer component: 'M' Mamba2, '*' attention, '-' MLP.
        Subclasses add types (MiniMax 'L' lightning / 'E' MoE)."""
        cfg = self.cfg
        tp = cfg.mapping.tp_size
        if t == "M":
            return Mamba2Mixer(cfg)
        if t == "*":
            return Attention(
                hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
                num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
                rope=cfg.rope, rms_eps=cfg.rms_eps, dtype=cfg.dtype,
                quant=cfg.quant, tp_size=tp,
                # Granite-hybrid: NoPE attention + explicit softmax scale
                nope=bool(cfg.extra.get("nope_attention")),
                scale=(cfg.query_pre_attn_scalar ** -0.5
                       if cfg.query_pre_attn_scalar else None))
        if t == "-":
            return GatedMLP(
                hidden_size=cfg.hidden_size,
                intermediate_size=cfg.intermediate_size,
                activation=cfg.activation, dtype=cfg.dtype,
                quant=cfg.quant, tp_size=tp)
        raise ValueError(f"unknown hybrid layer type {t!r}")

    # ---- engine hooks -----------------------------------------------------------
    def make_layer_caches(self, kv_manager):
        S = kv_manager.slots.max_slots
        caches = []
        kv_shape = (kv_manager.num_blocks, kv_manager.num_kv_heads,
                    kv_manager.block_size, kv_manager.head_dim)
        for t, comp in zip(self.pattern, self.components):
            if t == "M":
                caches.append((
                    jnp.zeros((S, comp.K - 1, comp.conv_dim_global),
                              jnp.bfloat16),
                    jnp.zeros((S, comp.H_global, comp.P, comp.N),
                              jnp.float32)))
            elif t == "L":
                # lightning linear attention: per-slot [H, D, D] KV state
                caches.append(jnp.zeros((S, comp.H, comp.D, comp.D),
                                        jnp.float32))
            elif t == "*":
                caches.append((jnp.zeros(kv_shape, kv_manager.cfg.dtype),
                               jnp.zeros(kv_shape, kv_manager.cfg.dtype)))
            else:
                caches.append(jnp.zeros((1,), jnp.float32))  # stateless
        return caches

    def cache_specs(self, pools, default_fn):
        out = []
        for t, comp, pool in zip(self.pattern, self.components, pools):
            if t in self.STATE_TYPES:
                out.append(comp.cache_specs())
            else:
                out.append(jax.tree.map(default_fn, pool))
        return out

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        keys = jax.random.split(key, self.cfg.num_layers + 2)
        params = {
            "embedding": self.embedding.init(keys[0]),
            "final_norm": jnp.ones((self.cfg.hidden_size,), jnp.float32),
            "rope": tuple(make_rope_tables(self.cfg.rope)),
            "layers": [],
        }
        for i, comp in enumerate(self.components):
            params["layers"].append({
                "norm": jnp.ones((self.cfg.hidden_size,), jnp.float32),
                "comp": comp.init(keys[i + 1]),
            })
        if not self.cfg.tie_word_embeddings:
            params["lm_head"] = (jax.random.normal(
                keys[-1], (self.cfg.hidden_size, self.cfg.vocab_size),
                jnp.float32) * 0.02).astype(self.cfg.dtype)
        return params

    def param_specs(self):
        from jax.sharding import PartitionSpec as P
        layers = []
        for t, comp in zip(self.pattern, self.components):
            layers.append({"norm": P(None), "comp": comp.param_specs()})
        return {
            "embedding": jax.tree.map(
                lambda _: P(), self.embedding.init(jax.random.PRNGKey(0))),
            "final_norm": P(None),
            "rope": (P(None, None), P(None, None)),
            "layers": layers,
            **({} if self.cfg.tie_word_embeddings
               else {"lm_head": P(None, None)}),
        }

    # ---- forward ------------------------------------------------------------------
    def forward(self, params, input_ids, kv_caches, meta: AttentionMetadata,
                logit_indices=None, return_hidden: bool = False,
                capture: str = "final", input_embeds=None):
        cfg = self.cfg
        x = (input_embeds.astype(cfg.dtype) if input_embeds is not None
             else self.embedding(params["embedding"], input_ids))
        if cfg.embedding_multiplier:
            x = (x.astype(jnp.float32)
                 * cfg.embedding_multiplier).astype(x.dtype)
        rope_tables = params["rope"]
        rm = cfg.residual_multiplier
        new_caches = []
        for i, (t, comp) in enumerate(zip(self.pattern, self.components)):
            lp = params["layers"][i]
            h = rms_norm(x, lp["norm"], cfg.rms_eps)
            if t in self.STATE_TYPES:
                out, cache = comp(lp["comp"], h, kv_caches[i], meta)
            elif t in self.ATTN_TYPES:
                out, cache = comp(lp["comp"], h, rope_tables,
                                  kv_caches[i], meta)
            else:
                out, cache = comp(lp["comp"], h), kv_caches[i]
            out = out.astype(jnp.float32)
            if rm is not None:
                out = out * rm
            x = (x.astype(jnp.float32) + out).astype(x.dtype)
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
        if cfg.logits_scaling:
            logits = logits / cfg.logits_scaling   # Granite hybrids
        if return_hidden:
            return logits, x, new_caches
        return logits, new_caches
