"""Mllama — Llama 3.2 Vision (reference `_torch/models/modeling_mllama.py`).

A Llama text model where every layer in ``cross_attention_layers`` is a
CROSS-attention block: queries come from the text stream (per-head q RMS
norm), keys/values from the projected vision features (per-head k norm),
with tanh-gated residuals and a full-text-row mask that zeroes both the
attention and MLP contributions for rows that see no image.

TPU-native runtime design: the cross K/V are FIXED per request, so they
live in slot-addressed state pools (like SSM states) — `inject_cross`
writes them once when the request enters prefill (a jitted, donated
update), and the regular bucketed step functions only ever read them.
The visibility rule kept for round 1 is the leading-image(s) form: rows
at/after the first image position attend all injected image rows
(exact for single-image prompts; interleaved multi-image masks land with
the full cross-mask plumbing).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.layers.linear import Linear
from tensorrt_llm_tpu.layers.mlp import GatedMLP
from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderLayer,
    DecoderModelForCausalLM,
    ModelConfig,
    _add_norm,
    register_auto_model,
)
from tensorrt_llm_tpu.models.vision.mllama_vit import MllamaVisionTower
from tensorrt_llm_tpu.ops.norms import rms_norm


class MllamaCrossLayer:
    """One cross-attention decoder block (MllamaCrossAttentionDecoderLayer).

    Cache = (k_pool [S, N, kvh, D] bf16, v_pool, meta_pool [S, 2] int32
    holding (cross_len, image_start))."""

    def __init__(self, cfg: ModelConfig, layer_idx: int):
        self.cfg = cfg
        self.layer_idx = layer_idx
        self.qh = cfg.num_heads
        self.kvh = cfg.num_kv_heads
        self.D = cfg.head_dim
        H = cfg.hidden_size
        self.mlp = GatedMLP(
            hidden_size=H, intermediate_size=cfg.intermediate_size,
            activation=cfg.activation, dtype=cfg.dtype, quant=cfg.quant,
            tp_size=1)

    def init(self, key) -> Dict:
        ks = iter(jax.random.split(key, 8))
        H, D = self.cfg.hidden_size, self.D

        def lin(o):
            return (jax.random.normal(next(ks), (H, o), jnp.float32)
                    * (0.5 / H ** 0.5)).astype(self.cfg.dtype)

        return {
            "input_norm": jnp.ones((H,), jnp.float32),
            "post_attn_norm": jnp.ones((H,), jnp.float32),
            "attn": {
                "q": lin(self.qh * D), "k": lin(self.kvh * D),
                "v": lin(self.kvh * D),
                "o": (jax.random.normal(next(ks), (self.qh * D, H),
                                        jnp.float32)
                      * (0.5 / (self.qh * D) ** 0.5)).astype(self.cfg.dtype),
                "q_norm": jnp.ones((D,), jnp.float32),
                "k_norm": jnp.ones((D,), jnp.float32),
            },
            "gate_attn": jnp.zeros((1,), jnp.float32),
            "gate_mlp": jnp.zeros((1,), jnp.float32),
            "mlp": self.mlp.init(next(ks)),
        }

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        return jax.tree.map(lambda _: P(),
                            self.init(jax.random.PRNGKey(0)))

    def cache_specs(self):
        from jax.sharding import PartitionSpec as P
        return (P(None, None, None, None), P(None, None, None, None),
                P(None, None))

    def compute_kv(self, params, states: jax.Array):
        """Projected vision features [N, H] -> (k [N, kvh, D], v)."""
        N = states.shape[0]
        k = jnp.dot(states, params["attn"]["k"].astype(states.dtype)
                    ).reshape(N, self.kvh, self.D)
        k = rms_norm(k, params["attn"]["k_norm"], self.cfg.rms_eps)
        v = jnp.dot(states, params["attn"]["v"].astype(states.dtype)
                    ).reshape(N, self.kvh, self.D)
        return k, v

    def __call__(self, params, x, residual, rope_tables, cache,
                 meta: AttentionMetadata):
        cfg = self.cfg
        eps = cfg.rms_eps
        k_pool, v_pool, meta_pool = cache
        T = x.shape[0]
        G = self.qh // self.kvh

        h, residual = _add_norm(cfg, x, residual, params["input_norm"], eps)
        q = jnp.dot(h, params["attn"]["q"].astype(h.dtype)
                    ).reshape(T, self.qh, self.D)
        q = rms_norm(q, params["attn"]["q_norm"], eps)

        S = k_pool.shape[0]
        if meta.mode == "prefill":
            slot = jnp.minimum(meta.seq_slots[0], S - 1)
            k = k_pool[slot]                        # [N, kvh, D]
            v = v_pool[slot]
            clen = meta_pool[slot, 0]
            istart = meta_pool[slot, 1]
            pos = meta.positions[:T]
            s = jnp.einsum("qhd,khd->hqk",
                           q.reshape(T, self.kvh, G, self.D).reshape(
                               T, self.qh, self.D).astype(jnp.float32),
                           jnp.repeat(k, G, axis=1).astype(jnp.float32)
                           ) * self.D ** -0.5
            col_ok = jnp.arange(k.shape[0])[None, None, :] < clen
            vis_row = (pos >= istart) & (clen > 0)          # [T]
            s = jnp.where(col_ok & vis_row[None, :, None], s, -1e30)
            pr = jax.nn.softmax(s, axis=-1)
            att = jnp.einsum("hqk,khd->qhd", pr,
                             jnp.repeat(v, G, axis=1).astype(jnp.float32))
            att = att * vis_row[:, None, None]
        else:
            slots = jnp.minimum(meta.seq_slots, S - 1)      # [B]
            k = k_pool[slots]                               # [B, N, kvh, D]
            v = v_pool[slots]
            clen = meta_pool[slots, 0]                      # [B]
            vis_row = clen > 0
            s = jnp.einsum("bhd,bkhd->bhk", q.astype(jnp.float32),
                           jnp.repeat(k, G, axis=2).astype(jnp.float32)
                           ) * self.D ** -0.5
            col_ok = jnp.arange(k.shape[1])[None, None, :] < \
                clen[:, None, None]
            s = jnp.where(col_ok & vis_row[:, None, None], s, -1e30)
            pr = jax.nn.softmax(s, axis=-1)
            att = jnp.einsum("bhk,bkhd->bhd", pr,
                             jnp.repeat(v, G, axis=2).astype(jnp.float32))
            att = att * vis_row[:, None, None]

        att = att.reshape(T, self.qh * self.D).astype(x.dtype)
        att = jnp.dot(att, params["attn"]["o"].astype(x.dtype))
        h = (jnp.tanh(params["gate_attn"])
             * att.astype(jnp.float32)).astype(x.dtype)

        h2, residual = _add_norm(cfg, h, residual,
                                 params["post_attn_norm"], eps)
        m = self.mlp(params["mlp"], h2)
        m = (m.astype(jnp.float32) * vis_row.reshape(T, 1)
             ).astype(x.dtype)
        out = (jnp.tanh(params["gate_mlp"])
               * m.astype(jnp.float32)).astype(x.dtype)
        return out, residual, cache


@register_auto_model("MllamaForConditionalGeneration")
class MllamaForConditionalGeneration(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        assert cfg.mapping.world_size == 1, \
            "Mllama sharding lands in a later round"
        super().__init__(cfg)
        # HF reserves 8 extra embedding rows past the vocab (<|image|> and
        # friends); the lm_head still scores vocab_size only
        from tensorrt_llm_tpu.layers.embedding import Embedding
        self.embedding = Embedding(cfg.vocab_size + 8, cfg.hidden_size,
                                   cfg.dtype)
        self.cross_idx = list(cfg.extra.get("cross_attention_layers") or [])
        for i in self.cross_idx:
            self.layers[i] = MllamaCrossLayer(cfg, i)
        vc = cfg.extra.get("vision_config") or {}
        self.image_token_index = cfg.extra.get("image_token_index", 128256)
        self.vision = MllamaVisionTower(
            hidden_size=vc.get("hidden_size", 1280),
            num_layers=vc.get("num_hidden_layers", 32),
            num_global_layers=vc.get("num_global_layers", 8),
            num_heads=vc.get("attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 5120),
            image_size=vc.get("image_size", 448),
            patch_size=vc.get("patch_size", 14),
            max_num_tiles=vc.get("max_num_tiles", 4),
            intermediate_layers_indices=vc.get(
                "intermediate_layers_indices", []),
            supported_aspect_ratios=vc.get(
                "supported_aspect_ratios", [[1, 1]]),
            norm_eps=vc.get("norm_eps", 1e-5),
            dtype=cfg.dtype,
        )
        # max cross rows per request: all tiles of one image
        self.max_cross_len = self.vision.T * self.vision.P

    # ---- caches -----------------------------------------------------------------
    def make_layer_caches(self, kv_manager):
        caches = super().make_layer_caches(kv_manager)
        S = kv_manager.slots.max_slots
        for i in self.cross_idx:
            caches[i] = (
                jnp.zeros((S, self.max_cross_len, self.cfg.num_kv_heads,
                           self.cfg.head_dim), jnp.bfloat16),
                jnp.zeros((S, self.max_cross_len, self.cfg.num_kv_heads,
                           self.cfg.head_dim), jnp.bfloat16),
                jnp.zeros((S, 2), jnp.int32),
            )
        return caches

    def cache_specs(self, pools, default_fn):
        out = []
        for i, pool in enumerate(pools):
            if i in self.cross_idx:
                out.append(self.layers[i].cache_specs())
            else:
                out.append(jax.tree.map(default_fn, pool))
        return out

    # ---- cross-state injection ---------------------------------------------------
    def inject_cross(self, params, caches, slot, states, cross_len,
                     image_start):
        """Write one request's cross K/V into the slot pools (called by the
        engine inside a jitted, donated update).  states [Nmax, H] padded;
        cross_len/image_start scalars."""
        new = list(caches)
        for i in self.cross_idx:
            layer = self.layers[i]
            k_pool, v_pool, meta_pool = caches[i]
            k, v = layer.compute_kv(params["layers"][i],
                                    states.astype(self.cfg.dtype))
            new[i] = (k_pool.at[slot].set(k.astype(k_pool.dtype)),
                      v_pool.at[slot].set(v.astype(v_pool.dtype)),
                      meta_pool.at[slot].set(
                          jnp.stack([cross_len, image_start])))
        return new

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1)
        for i in self.cross_idx:
            params["layers"][i] = self.layers[i].init(
                jax.random.fold_in(k2, i))
        params["vision"] = self.vision.init(k3)
        H = self.cfg.hidden_size
        params["projector"] = (
            (jax.random.normal(jax.random.fold_in(k3, 1),
                               (self.vision.out_dim, H), jnp.float32)
             * (0.5 / self.vision.out_dim ** 0.5)).astype(self.cfg.dtype),
            jnp.zeros((H,), jnp.float32))
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        for i in self.cross_idx:
            specs["layers"][i] = self.layers[i].param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init(jax.random.PRNGKey(0)))
        specs["projector"] = (P(None, None), P(None))
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        def lm_get(name):
            for fmt in (name.replace("model.", "model.language_model.", 1),
                        "language_model." + name):
                a = get_tensor(fmt)
                if a is not None:
                    return a
            return get_tensor(name)

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = super().load_hf_weights(lm_get, dtype=dtype)
        cfg = self.cfg
        for i in self.cross_idx:
            pre = f"model.language_model.layers.{i}."
            params["layers"][i] = {
                "input_norm": arr(pre + "input_layernorm.weight"),
                "post_attn_norm": arr(pre + "post_attention_layernorm.weight"),
                "attn": {
                    "q": arr(pre + "cross_attn.q_proj.weight").T.astype(
                        cfg.dtype),
                    "k": arr(pre + "cross_attn.k_proj.weight").T.astype(
                        cfg.dtype),
                    "v": arr(pre + "cross_attn.v_proj.weight").T.astype(
                        cfg.dtype),
                    "o": arr(pre + "cross_attn.o_proj.weight").T.astype(
                        cfg.dtype),
                    "q_norm": arr(pre + "cross_attn.q_norm.weight"),
                    "k_norm": arr(pre + "cross_attn.k_norm.weight"),
                },
                "gate_attn": arr(pre + "cross_attn_attn_gate").reshape(1),
                "gate_mlp": arr(pre + "cross_attn_mlp_gate").reshape(1),
                "mlp": self.layers[i].mlp.from_float(
                    arr(pre + "mlp.gate_proj.weight").T,
                    arr(pre + "mlp.up_proj.weight").T,
                    arr(pre + "mlp.down_proj.weight").T),
            }
        params["vision"] = self.vision.load_hf_weights(
            get_tensor, "model.vision_model.")
        params["projector"] = (
            arr("model.multi_modal_projector.weight").T.astype(cfg.dtype),
            arr("model.multi_modal_projector.bias"))
        return params

    # ---- multimodal -------------------------------------------------------------
    def preprocess_images(self, images):
        """Images are HF-processor dicts {"pixel_values": [T, 3, S, S],
        "aspect_ratio_id": int, "num_tiles": int} — pass through."""
        out = []
        for im in images:
            assert isinstance(im, dict) and "pixel_values" in im, \
                "Mllama needs {'pixel_values', 'aspect_ratio_id', " \
                "'num_tiles'} dicts"
            out.append(im)
        return out

    def process_multimodal(self, params, token_ids: List[int], images):
        """The <|image|> token stays a single prompt row (its normal
        embedding); vision features become per-request cross states."""
        assert len(images) <= 1, \
            "multi-image Mllama cross masks land in a later round"
        extra = {}
        if images:
            im = images[0]
            T = self.vision.T
            pv = np.zeros((T, 3, self.vision.image_size,
                           self.vision.image_size), np.float32)
            n = int(im.get("num_tiles", len(im["pixel_values"])))
            pv[:n] = np.asarray(im["pixel_values"], np.float32)[:n]
            feats = self.vision(params["vision"], jnp.asarray(pv),
                                int(im["aspect_ratio_id"]), n)
            w, b = params["projector"]
            flat = feats.reshape(-1, self.vision.out_dim)
            proj = (jnp.dot(flat.astype(w.dtype), w)
                    + b.astype(w.dtype)).astype(jnp.float32)
            proj = np.asarray(proj)              # [T*P, H]
            valid = n * self.vision.P
            extra = {
                "cross_states": proj[:valid],
                "cross_image_start": token_ids.index(
                    self.image_token_index)
                if self.image_token_index in token_ids else 0,
            }
        return list(token_ids), None, extra
