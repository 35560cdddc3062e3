"""Nemotron NAS / DeciLM (reference `_torch/models/modeling_nemotron_nas.py`):
a NAS'd Llama whose per-layer ``block_configs`` vary every block —
attention may be regular GQA with a PER-LAYER kv-head count
(num_heads / n_heads_in_group), replaced by a single linear, or a no-op;
the FFN may be a GatedMLP with a per-layer width derived from ``ffn_mult``
(int(2*mult*H/3) rounded up to 256), a linear, or a no-op.  No-op halves
skip their norm entirely (reference NemotronNASDecoderLayer.forward).

Each layer keeps the DecoderLayer call signature, so the standard
DecoderModelForCausalLM forward/engine drive it unchanged; attention
layers allocate pools with their own kv-head count."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.attention import Attention
from tensorrt_llm_tpu.layers.mlp import GatedMLP
from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    _add_norm,
    register_auto_model,
)


def _ffn_mult_to_intermediate(mult: float, h: int) -> int:
    n = int(2 * mult * h / 3)
    return n if n % 256 == 0 else n + 256 - (n % 256)


def _cfg_get(block, *path, default=None):
    cur = block
    for k in path:
        if cur is None:
            return default
        cur = cur.get(k) if isinstance(cur, dict) else getattr(cur, k, None)
    return default if cur is None else cur


class NASLayer:
    """One heterogeneous block; cache = (k, v) pools when attention is
    real, a scalar placeholder otherwise."""

    skip_base_load = True

    # base-model hooks (final_norm init/spec are read off layers[0])
    def _norm_init(self):
        return jnp.ones((self.cfg.hidden_size,), jnp.float32)

    def _norm_spec(self):
        from jax.sharding import PartitionSpec as P
        return P(None)

    def __init__(self, cfg: ModelConfig, layer_idx: int, block):
        self.cfg = cfg
        self.layer_idx = layer_idx
        H = cfg.hidden_size
        self.attn_no_op = bool(_cfg_get(block, "attention", "no_op",
                                        default=False))
        self.attn_linear = bool(_cfg_get(block, "attention",
                                         "replace_with_linear",
                                         default=False))
        self.ffn_no_op = bool(_cfg_get(block, "ffn", "no_op", default=False))
        self.ffn_linear = bool(_cfg_get(block, "ffn", "replace_with_linear",
                                        default=False))
        self.kvh = 0
        self.attn = None
        if not self.attn_no_op and not self.attn_linear:
            g = int(_cfg_get(block, "attention", "n_heads_in_group",
                             default=1) or 1)
            self.kvh = cfg.num_heads // g
            self.attn = Attention(
                hidden_size=H, num_heads=cfg.num_heads,
                num_kv_heads=self.kvh, head_dim=cfg.head_dim,
                rope=cfg.rope, rms_eps=cfg.rms_eps, dtype=cfg.dtype,
                quant=cfg.quant, tp_size=1)
        self.mlp = None
        if not self.ffn_no_op and not self.ffn_linear:
            mult = float(_cfg_get(block, "ffn", "ffn_mult", default=4.0)
                         or 4.0)
            self.inter = _ffn_mult_to_intermediate(mult, H)
            self.mlp = GatedMLP(
                hidden_size=H, intermediate_size=self.inter,
                activation=cfg.activation, dtype=cfg.dtype, quant=cfg.quant,
                tp_size=1)

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        H = self.cfg.hidden_size
        ks = iter(jax.random.split(key, 4))
        p = {}
        if not self.attn_no_op:
            p["input_norm"] = jnp.ones((H,), jnp.float32)
            if self.attn_linear:
                p["attn"] = (jax.random.normal(next(ks), (H, H), jnp.float32)
                             * (0.5 / H ** 0.5)).astype(self.cfg.dtype)
            else:
                p["attn"] = self.attn.init(next(ks))
        if not self.ffn_no_op:
            p["post_attn_norm"] = jnp.ones((H,), jnp.float32)
            if self.ffn_linear:
                p["mlp"] = (jax.random.normal(next(ks), (H, H), jnp.float32)
                            * (0.5 / H ** 0.5)).astype(self.cfg.dtype)
            else:
                p["mlp"] = self.mlp.init(next(ks))
        return p

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        return jax.tree.map(lambda _: P(), self.init(jax.random.PRNGKey(0)))

    def __call__(self, params, x, residual, rope_tables, kv_cache,
                 meta: AttentionMetadata):
        cfg = self.cfg
        eps = cfg.rms_eps
        out, res = x, residual
        if not self.attn_no_op:
            h, res = _add_norm(cfg, out, res, params["input_norm"], eps)
            if self.attn_linear:
                out = jnp.dot(h, params["attn"].astype(h.dtype))
            else:
                out, kv_cache = self.attn(params["attn"], h,
                                          rope_tables[0], kv_cache, meta)
        if not self.ffn_no_op:
            h, res = _add_norm(cfg, out, res, params["post_attn_norm"], eps)
            if self.ffn_linear:
                out = jnp.dot(h, params["mlp"].astype(h.dtype))
            else:
                out = self.mlp(params["mlp"], h)
        return out, res, kv_cache


@register_auto_model("DeciLMForCausalLM", "NemotronNASForCausalLM")
class DeciLMForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        assert cfg.mapping.world_size == 1, \
            "NAS per-layer sharding lands in a later round"
        blocks = cfg.extra.get("block_configs")
        assert blocks and len(blocks) == cfg.num_layers, \
            "DeciLM needs block_configs (one per layer) in the HF config"
        if not isinstance(cfg.num_kv_heads, int):
            cfg.num_kv_heads = cfg.num_heads   # per-layer counts rule
        super().__init__(cfg)
        self.layers = [NASLayer(cfg, i, b) for i, b in enumerate(blocks)]

    def make_layer_caches(self, kv_manager):
        caches = []
        for layer in self.layers:
            if layer.attn is not None:
                shape = (kv_manager.num_blocks, layer.kvh,
                         kv_manager.block_size, self.cfg.head_dim)
                caches.append((jnp.zeros(shape, jnp.bfloat16),
                               jnp.zeros(shape, jnp.bfloat16)))
            else:
                caches.append(jnp.zeros((1,), jnp.float32))
        return caches

    def cache_specs(self, pools, default_fn):
        return [jax.tree.map(default_fn, pool) for pool in pools]

    def init(self, key) -> Dict:
        params = super().init(key)
        keys = jax.random.split(key, len(self.layers))
        params["layers"] = [l.init(k) for l, k in zip(self.layers, keys)]
        return params

    def param_specs(self) -> Dict:
        specs = super().param_specs()
        specs["layers"] = [l.param_specs() for l in self.layers]
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        params = super().load_hf_weights(get_tensor, dtype=dtype)
        cfg = self.cfg

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        for i, layer in enumerate(self.layers):
            pre = f"model.layers.{i}."
            lp = {}
            if not layer.attn_no_op:
                lp["input_norm"] = arr(pre + "input_layernorm.weight")
                if layer.attn_linear:
                    lp["attn"] = arr(
                        pre + "self_attn.linear_attn.weight").T.astype(
                        cfg.dtype)
                else:
                    a = pre + "self_attn."
                    lp["attn"] = layer.attn.from_float(
                        arr(a + "q_proj.weight").T,
                        arr(a + "k_proj.weight").T,
                        arr(a + "v_proj.weight").T,
                        arr(a + "o_proj.weight").T)
            if not layer.ffn_no_op:
                lp["post_attn_norm"] = arr(
                    pre + "post_attention_layernorm.weight")
                if layer.ffn_linear:
                    lp["mlp"] = arr(
                        pre + "mlp.linear_mlp.weight").T.astype(cfg.dtype)
                else:
                    lp["mlp"] = layer.mlp.from_float(
                        arr(pre + "mlp.gate_proj.weight").T,
                        arr(pre + "mlp.up_proj.weight").T,
                        arr(pre + "mlp.down_proj.weight").T)
            params["layers"][i] = lp
        return params
