"""Mllama (Llama 3.2 Vision) encoder in JAX.

Counterpart of the reference's `_torch/models/modeling_mllama.py` vision
stack (HF `MllamaVisionModel`): tiled images with precomputed
aspect-ratio tile embeddings, a gated learned position embedding (the
gate blends per-tile and global position tables), CLS token, a local
pre-LN transformer whose intermediate layer outputs are collected, and a
gated global transformer across all tiles.  The output concatenates the
global features with the stacked intermediates — [T, P+1, E*(1+n_int)].

HF pads the patch dim to a multiple of 8 for its kernels and masks the
pad rows; padded rows never influence valid ones, so this implementation
skips the padding entirely."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MllamaVisionTower:
    def __init__(self, hidden_size: int, num_layers: int,
                 num_global_layers: int, num_heads: int,
                 intermediate_size: int, image_size: int, patch_size: int,
                 max_num_tiles: int, intermediate_layers_indices,
                 supported_aspect_ratios, norm_eps: float = 1e-5,
                 dtype=jnp.bfloat16):
        self.E = hidden_size
        self.L = num_layers
        self.GL = num_global_layers
        self.nH = num_heads
        self.D = hidden_size // num_heads
        self.I = intermediate_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.T = max_num_tiles
        self.P = (image_size // patch_size) ** 2 + 1   # incl CLS
        self.int_idx = list(intermediate_layers_indices)
        self.aspect_ratios = [tuple(a) for a in supported_aspect_ratios]
        self.max_ar_id = len(self.aspect_ratios)
        self.eps = norm_eps
        self.patch_in = 3 * patch_size ** 2
        self.num_channels = 3
        self.out_dim = hidden_size * (1 + len(self.int_idx))
        self.dtype = dtype

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        ks = iter(jax.random.split(key, 8 * (self.L + self.GL) + 16))
        E, I = self.E, self.I

        def lin(i, o, bias=True):
            w = (jax.random.normal(next(ks), (i, o), jnp.float32)
                 * (0.5 / i ** 0.5)).astype(self.dtype)
            return (w, jnp.zeros((o,), jnp.float32)) if bias else (w, None)

        def ln():
            return {"weight": jnp.ones((E,), jnp.float32),
                    "bias": jnp.zeros((E,), jnp.float32)}

        def block(gated):
            b = {"input_ln": ln(), "post_ln": ln(),
                 "q": lin(E, E, False), "k": lin(E, E, False),
                 "v": lin(E, E, False), "o": lin(E, E, False),
                 "fc1": lin(E, I), "fc2": lin(I, E)}
            if gated:
                b["gate_attn"] = jnp.full((1,), np.pi / 4, jnp.float32)
                b["gate_ffn"] = jnp.full((1,), np.pi / 4, jnp.float32)
            return b

        return {
            "patch_embed": (jax.random.normal(
                next(ks), (self.patch_in, E), jnp.float32) * 0.02
            ).astype(self.dtype),
            "class_embedding": jax.random.normal(
                next(ks), (E,), jnp.float32) * E ** -0.5,
            "pos_embed": jax.random.normal(
                next(ks), (self.P, E), jnp.float32) * E ** -0.5,
            "pos_gate": jnp.zeros((1,), jnp.float32),
            "tile_pos_embed": jnp.zeros(
                (self.max_ar_id + 1, self.T * self.P * E), jnp.float32),
            "pre_tile": {"embedding": jnp.zeros(
                (self.max_ar_id + 1, self.T * E), jnp.float32),
                "gate": jnp.zeros((1,), jnp.float32)},
            "post_tile": {"embedding": jnp.zeros(
                (self.max_ar_id + 1, self.T * E), jnp.float32),
                "gate": jnp.zeros((1,), jnp.float32)},
            "ln_pre": ln(), "ln_post": ln(),
            "layers": [block(False) for _ in range(self.L)],
            "global_layers": [block(True) for _ in range(self.GL)],
        }

    def load_hf_weights(self, get_tensor, prefix: str) -> Dict:
        def arr(name):
            a = get_tensor(prefix + name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        def lin(name, bias=True):
            return (arr(name + ".weight").T.astype(self.dtype),
                    arr(name + ".bias") if bias else None)

        def ln(name):
            return {"weight": arr(name + ".weight"),
                    "bias": arr(name + ".bias")}

        def block(pre, gated):
            b = {"input_ln": ln(pre + "input_layernorm"),
                 "post_ln": ln(pre + "post_attention_layernorm"),
                 "q": lin(pre + "self_attn.q_proj", False),
                 "k": lin(pre + "self_attn.k_proj", False),
                 "v": lin(pre + "self_attn.v_proj", False),
                 "o": lin(pre + "self_attn.o_proj", False),
                 "fc1": lin(pre + "mlp.fc1"), "fc2": lin(pre + "mlp.fc2")}
            if gated:
                b["gate_attn"] = arr(pre + "gate_attn").reshape(1)
                b["gate_ffn"] = arr(pre + "gate_ffn").reshape(1)
            return b

        conv = arr("patch_embedding.weight")   # [E, 3, p, p]
        return {
            "patch_embed": conv.reshape(self.E, self.patch_in).T.astype(
                self.dtype),
            "class_embedding": arr("class_embedding"),
            "pos_embed": arr("gated_positional_embedding.embedding"),
            "pos_gate": arr("gated_positional_embedding.gate").reshape(1),
            "tile_pos_embed": arr(
                "gated_positional_embedding.tile_embedding.weight"),
            "pre_tile": {
                "embedding": arr(
                    "pre_tile_positional_embedding.embedding.weight"),
                "gate": arr(
                    "pre_tile_positional_embedding.gate").reshape(1)},
            "post_tile": {
                "embedding": arr(
                    "post_tile_positional_embedding.embedding.weight"),
                "gate": arr(
                    "post_tile_positional_embedding.gate").reshape(1)},
            "ln_pre": ln("layernorm_pre"), "ln_post": ln("layernorm_post"),
            "layers": [block(f"transformer.layers.{i}.", False)
                       for i in range(self.L)],
            "global_layers": [block(f"global_transformer.layers.{i}.", True)
                              for i in range(self.GL)],
        }

    # ---- forward ----------------------------------------------------------------
    def __call__(self, params: Dict, tiles: jax.Array, aspect_ratio_id: int,
                 num_tiles: int) -> jax.Array:
        """tiles [T_max, 3, S, S] (pad tiles zero), one image ->
        [T_max, P, E*(1+n_int)] features (pad tiles carry garbage — the
        LM-side cross mask only exposes the valid rows)."""
        eps = self.eps
        E, P, T = self.E, self.P, self.T
        nH, D = self.nH, self.D

        def ln(x, p):
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            return ((xf - mean) * jax.lax.rsqrt(var + eps)
                    * p["weight"] + p["bias"]).astype(x.dtype)

        # patch embed (conv == linear over flattened patches)
        p_ = self.patch_size
        g = self.image_size // p_
        px = tiles.reshape(T, 3, g, p_, g, p_)
        px = px.transpose(0, 2, 4, 1, 3, 5).reshape(T, g * g, self.patch_in)
        x = jnp.dot(px.astype(self.dtype), params["patch_embed"])  # [T,P-1,E]

        # pre-tile embedding (gated), CLS, gated position embedding
        pre = params["pre_tile"]["embedding"][aspect_ratio_id].reshape(
            T, 1, E)
        x = x + (jnp.tanh(params["pre_tile"]["gate"]) * pre).astype(x.dtype)
        cls = jnp.broadcast_to(
            params["class_embedding"].astype(x.dtype), (T, 1, E))
        x = jnp.concatenate([cls, x], axis=1)                      # [T, P, E]
        gate = jnp.tanh(params["pos_gate"])
        x = x + ((1 - gate) * params["pos_embed"])[None].astype(x.dtype)
        tile_pos = params["tile_pos_embed"][aspect_ratio_id].reshape(
            T, P, E)
        x = x + (gate * tile_pos).astype(x.dtype)
        x = ln(x, params["ln_pre"])

        # attention masks: valid tiles attend within the whole image
        tile_valid = (jnp.arange(T) < num_tiles)
        row_valid = jnp.repeat(tile_valid, P)                      # [T*P]
        mask = row_valid[:, None] & row_valid[None, :]

        def block(x2, bp, gated):
            N = x2.shape[0]
            h0 = ln(x2, bp["input_ln"])
            q = jnp.dot(h0, bp["q"][0]).reshape(N, nH, D)
            k = jnp.dot(h0, bp["k"][0]).reshape(N, nH, D)
            v = jnp.dot(h0, bp["v"][0]).reshape(N, nH, D)
            s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * D ** -0.5
            s = jnp.where(mask[None], s, -1e30)
            pr = jax.nn.softmax(s, axis=-1)
            att = jnp.einsum("hqk,khd->qhd", pr, v.astype(jnp.float32))
            att = jnp.dot(att.reshape(N, nH * D).astype(x2.dtype),
                          bp["o"][0])
            if gated:
                att = (jnp.tanh(bp["gate_attn"]) * att.astype(jnp.float32)
                       ).astype(x2.dtype)
            x2 = x2 + att
            h1 = ln(x2, bp["post_ln"])
            m = jnp.dot(h1, bp["fc1"][0]) + bp["fc1"][1].astype(x2.dtype)
            m = jax.nn.gelu(m.astype(jnp.float32),
                            approximate=False).astype(x2.dtype)
            m = jnp.dot(m, bp["fc2"][0]) + bp["fc2"][1].astype(x2.dtype)
            if gated:
                m = (jnp.tanh(bp["gate_ffn"]) * m.astype(jnp.float32)
                     ).astype(x2.dtype)
            return x2 + m

        x = x.reshape(T * P, E)
        intermediates = []
        for li, bp in enumerate(params["layers"]):
            x = block(x, bp, False)
            if li in self.int_idx:
                intermediates.append(x)
        x = ln(x, params["ln_post"])

        post = params["post_tile"]["embedding"][aspect_ratio_id].reshape(
            T, 1, E)
        x = x.reshape(T, P, E) \
            + (jnp.tanh(params["post_tile"]["gate"]) * post).astype(x.dtype)
        x = x.reshape(T * P, E)
        for bp in params["global_layers"]:
            x = block(x, bp, True)

        out = jnp.concatenate(
            [x] + intermediates, axis=-1)          # [T*P, E*(1+n_int)]
        return out.reshape(T, P, self.out_dim)
