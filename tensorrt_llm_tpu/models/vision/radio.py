"""C-RADIO vision transformer in JAX (reference
`_torch/models/modeling_radio.py`, itself from nvidia/C-RADIOv2): a plain
pre-LN ViT with a linear patch embedder, absolute position embeddings on
the patch tokens only, learned CLS + register tokens PREPENDED to the
sequence, biased gelu MLPs, and a final LayerNorm.  The model output is
the patch tokens (cls/registers stripped); the Nano-VL input conditioner
is identity (normalization lives in the image processor)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class RadioVisionTower:
    def __init__(self, embed_dim: int, num_layers: int, num_heads: int,
                 image_size: int, patch_size: int, mlp_ratio: float = 4.0,
                 num_cls_tokens: int = 1, num_registers: int = 0,
                 qkv_bias: bool = True, patch_bias: bool = False,
                 dtype=jnp.bfloat16):
        self.E = embed_dim
        self.L = num_layers
        self.nH = num_heads
        self.D = embed_dim // num_heads
        self.I = int(embed_dim * mlp_ratio)
        self.image_size = image_size
        self.patch_size = patch_size
        self.side = image_size // patch_size
        self.num_patches = self.side ** 2
        self.num_skip = num_cls_tokens + num_registers
        self.qkv_bias = qkv_bias
        self.patch_bias = patch_bias
        self.patch_in = 3 * patch_size ** 2
        self.num_channels = 3
        self.dtype = dtype

    def init(self, key) -> Dict:
        ks = iter(jax.random.split(key, 8 * self.L + 8))
        E, I = self.E, self.I

        def lin(i, o, bias=True):
            w = (jax.random.normal(next(ks), (i, o), jnp.float32)
                 * (0.5 / i ** 0.5)).astype(self.dtype)
            return (w, jnp.zeros((o,), jnp.float32) if bias else None)

        def ln():
            return {"w": jnp.ones((E,), jnp.float32),
                    "b": jnp.zeros((E,), jnp.float32)}

        p = {
            "patch": lin(self.patch_in, E, self.patch_bias),
            "pos_embed": (jax.random.normal(
                next(ks), (self.num_patches, E), jnp.float32)
                * E ** -0.5).astype(jnp.float32),
            "cls_token": (jax.random.normal(
                next(ks), (self.num_skip, E), jnp.float32) * E ** -0.5
            ).astype(jnp.float32) if self.num_skip else None,
            "norm": ln(),
            "layers": [],
        }
        if p["cls_token"] is None:
            p.pop("cls_token")
        for _ in range(self.L):
            p["layers"].append({
                "norm1": ln(), "norm2": ln(),
                "qkv": lin(E, 3 * E, self.qkv_bias),
                "proj": lin(E, E),
                "fc1": lin(E, I), "fc2": lin(I, E),
            })
        return p

    def load_hf_weights(self, get_tensor, prefix: str) -> Dict:
        def arr(name):
            a = get_tensor(prefix + name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        def lin(name, bias=True):
            w = arr(name + ".weight")
            return (w.T.astype(self.dtype),
                    arr(name + ".bias") if bias else None)

        def ln(name):
            return {"w": arr(name + ".weight"), "b": arr(name + ".bias")}

        pg = "model.patch_generator."
        pe = arr(pg + "pos_embed")
        p = {
            "patch": lin(pg + "embedder", self.patch_bias),
            "pos_embed": pe.reshape(-1, self.E),
            "norm": ln("model.norm"),
            "layers": [],
        }
        cls = arr(pg + "cls_token.token")
        if cls is not None:
            p["cls_token"] = cls
        for i in range(self.L):
            b = f"model.blocks.{i}."
            p["layers"].append({
                "norm1": ln(b + "norm1"), "norm2": ln(b + "norm2"),
                "qkv": lin(b + "attn.qkv", self.qkv_bias),
                "proj": lin(b + "attn.proj"),
                "fc1": lin(b + "mlp.fc1"), "fc2": lin(b + "mlp.fc2"),
            })
        return p

    def __call__(self, params: Dict, pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] -> patch features [B, num_patches, E]."""
        B = pixel_values.shape[0]
        p_ = self.patch_size
        g = self.side
        eps = 1e-6

        def ln(x, pp):
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            return ((xf - mean) * jax.lax.rsqrt(var + eps)
                    * pp["w"] + pp["b"]).astype(x.dtype)

        px = pixel_values.reshape(B, 3, g, p_, g, p_)
        px = px.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, self.patch_in)
        x = jnp.dot(px.astype(self.dtype), params["patch"][0])
        if params["patch"][1] is not None:
            x = x + params["patch"][1].astype(x.dtype)
        x = x + params["pos_embed"][None].astype(x.dtype)
        if "cls_token" in params:
            tok = jnp.broadcast_to(
                params["cls_token"].astype(x.dtype),
                (B, self.num_skip, self.E))
            x = jnp.concatenate([tok, x], axis=1)

        N = x.shape[1]
        nH, D = self.nH, self.D
        for lp in params["layers"]:
            h0 = ln(x, lp["norm1"])
            qkv = jnp.dot(h0, lp["qkv"][0])
            if lp["qkv"][1] is not None:
                qkv = qkv + lp["qkv"][1].astype(x.dtype)
            q, k, v = [a.reshape(B, N, nH, D)
                       for a in jnp.split(qkv, 3, -1)]
            s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * D ** -0.5
            pr = jax.nn.softmax(s, axis=-1)
            att = jnp.einsum("bhqk,bkhd->bqhd", pr,
                             v.astype(jnp.float32))
            att = att.reshape(B, N, nH * D).astype(x.dtype)
            x = x + jnp.dot(att, lp["proj"][0]) \
                + lp["proj"][1].astype(x.dtype)
            h1 = ln(x, lp["norm2"])
            m = jnp.dot(h1, lp["fc1"][0]) + lp["fc1"][1].astype(x.dtype)
            m = jax.nn.gelu(m.astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            x = x + jnp.dot(m, lp["fc2"][0]) + lp["fc2"][1].astype(x.dtype)
        x = ln(x, params["norm"])
        return x[:, self.num_skip:]
