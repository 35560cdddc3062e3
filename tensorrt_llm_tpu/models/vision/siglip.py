"""SigLIP vision tower in JAX (reference `_torch/models/modeling_siglip`
lineage; HF `SiglipVisionModel` minus the attention-pool head, which
Gemma3 does not use): conv patch embedding with bias, learned position
embeddings (no CLS token), pre-LN encoder blocks with gelu-tanh MLPs, and
a final post-layernorm."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class SiglipVisionTower:
    def __init__(self, hidden_size: int, num_layers: int, num_heads: int,
                 intermediate_size: int, image_size: int, patch_size: int,
                 layer_norm_eps: float = 1e-6, feature_layer=None,
                 dtype=jnp.bfloat16):
        # feature_layer (Phi-4-MM): tap the RAW hidden state at HF's
        # output_hidden_states index (-2 = after layer L-2, no post-LN)
        self.H = hidden_size
        self.L = num_layers
        self.nH = num_heads
        self.D = hidden_size // num_heads
        self.I = intermediate_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_patches = (image_size // patch_size) ** 2
        self.eps = layer_norm_eps
        self.dtype = dtype
        self.num_channels = 3
        self.patch_in = 3 * patch_size * patch_size
        if feature_layer is None:
            self.run_layers = num_layers
            self.post_ln = True
        else:
            idx = (feature_layer if feature_layer >= 0
                   else num_layers + 1 + feature_layer)
            self.run_layers = idx
            self.post_ln = False

    def init(self, key) -> Dict:
        ks = iter(jax.random.split(key, 6 * self.L + 4))
        H, I = self.H, self.I

        def lin(i, o):
            return ((jax.random.normal(next(ks), (i, o), jnp.float32)
                     * (0.5 / i ** 0.5)).astype(self.dtype),
                    jnp.zeros((o,), jnp.float32))

        def ln():
            return {"w": jnp.ones((H,), jnp.float32),
                    "b": jnp.zeros((H,), jnp.float32)}

        p = {
            "patch_w": (jax.random.normal(
                next(ks), (self.patch_in, H), jnp.float32) * 0.02
            ).astype(self.dtype),
            "patch_b": jnp.zeros((H,), jnp.float32),
            "pos_emb": (jax.random.normal(
                next(ks), (self.num_patches, H), jnp.float32) * 0.02
            ).astype(self.dtype),
            "post_ln": ln(),
            "layers": [],
        }
        for _ in range(self.L):
            p["layers"].append({
                "ln1": ln(), "ln2": ln(),
                "q": lin(H, H), "k": lin(H, H), "v": lin(H, H),
                "o": lin(H, H), "fc1": lin(H, I), "fc2": lin(I, H),
            })
        return p

    def load_hf_weights(self, get_tensor, prefix: str) -> Dict:
        def arr(name):
            a = get_tensor(prefix + name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        def lin(name):
            return (arr(name + ".weight").T.astype(self.dtype),
                    arr(name + ".bias"))

        def ln(name):
            return {"w": arr(name + ".weight"), "b": arr(name + ".bias")}

        conv = arr("embeddings.patch_embedding.weight")  # [H, 3, p, p]
        p = {
            "patch_w": conv.reshape(self.H, -1).T.astype(self.dtype),
            "patch_b": arr("embeddings.patch_embedding.bias"),
            "pos_emb": arr("embeddings.position_embedding.weight"
                           ).astype(self.dtype),
            "post_ln": ln("post_layernorm"),
            "layers": [],
        }
        for i in range(self.L):
            pre = f"encoder.layers.{i}."
            p["layers"].append({
                "ln1": ln(pre + "layer_norm1"),
                "ln2": ln(pre + "layer_norm2"),
                "q": lin(pre + "self_attn.q_proj"),
                "k": lin(pre + "self_attn.k_proj"),
                "v": lin(pre + "self_attn.v_proj"),
                "o": lin(pre + "self_attn.out_proj"),
                "fc1": lin(pre + "mlp.fc1"),
                "fc2": lin(pre + "mlp.fc2"),
            })
        return p

    def __call__(self, params: Dict, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] -> [B, num_patches, H] (post-layernormed)."""
        B = pixel_values.shape[0]
        p = self.patch_size
        g = self.image_size // p

        def ln(x, pp):
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            return ((xf - mean) * jax.lax.rsqrt(var + self.eps)
                    * pp["w"] + pp["b"]).astype(x.dtype)

        # conv patch embed == linear over flattened [3, p, p] patches
        px = pixel_values.reshape(B, 3, g, p, g, p)
        px = px.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, self.patch_in)
        x = (jnp.dot(px.astype(self.dtype), params["patch_w"])
             + params["patch_b"].astype(self.dtype))
        x = x + params["pos_emb"][None]

        nH, D = self.nH, self.D
        N = g * g
        for lp in params["layers"][:self.run_layers]:
            h = ln(x, lp["ln1"])
            q = (jnp.dot(h, lp["q"][0]) + lp["q"][1].astype(h.dtype)
                 ).reshape(B, N, nH, D)
            k = (jnp.dot(h, lp["k"][0]) + lp["k"][1].astype(h.dtype)
                 ).reshape(B, N, nH, D)
            v = (jnp.dot(h, lp["v"][0]) + lp["v"][1].astype(h.dtype)
                 ).reshape(B, N, nH, D)
            sc = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * D ** -0.5
            pr = jax.nn.softmax(sc, axis=-1)
            att = jnp.einsum("bhij,bjhd->bihd", pr, v.astype(jnp.float32))
            att = att.reshape(B, N, self.H).astype(x.dtype)
            x = x + jnp.dot(att, lp["o"][0]) + lp["o"][1].astype(x.dtype)
            h = ln(x, lp["ln2"])
            m = jnp.dot(h, lp["fc1"][0]) + lp["fc1"][1].astype(x.dtype)
            m = jax.nn.gelu(m.astype(jnp.float32),
                            approximate=True).astype(x.dtype)
            x = x + jnp.dot(m, lp["fc2"][0]) + lp["fc2"][1].astype(x.dtype)
        return ln(x, params["post_ln"]) if self.post_ln else x
