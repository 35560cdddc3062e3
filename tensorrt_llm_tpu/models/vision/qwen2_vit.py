"""Qwen2-VL vision transformer in JAX.

Counterpart of the reference's Qwen2-VL vision encoder
(`_torch/models/modeling_qwen2vl.py` vision tower; HF
`Qwen2VisionTransformerPretrainedModel`): 3D patch embedding (a linear over
the flattened [C, temporal, p, p] patch), 2D rotary position embedding over
the (h, w) grid with the 2x2 spatial-merge reorder, pre-LN attention blocks
with QuickGELU MLPs, and the PatchMerger that concatenates each 2x2 patch
group and projects to the language-model width.

Patches arrive pre-flattened (the HF image-processor layout):
``[n_patches, C * temporal_patch * p * p]`` plus a (t, h, w) grid."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class Qwen2VisionTower:
    def __init__(self, embed_dim: int, depth: int, num_heads: int,
                 out_hidden: int, patch_size: int = 14,
                 temporal_patch: int = 2, in_channels: int = 3,
                 spatial_merge: int = 2, mlp_ratio: float = 4.0,
                 dtype=jnp.bfloat16):
        self.embed_dim = embed_dim
        self.depth = depth
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.out_hidden = out_hidden
        self.patch_size = patch_size
        self.temporal_patch = temporal_patch
        self.in_channels = in_channels
        self.merge = spatial_merge
        self.mlp_dim = int(embed_dim * mlp_ratio)
        self.patch_in = in_channels * temporal_patch * patch_size ** 2
        self.dtype = dtype

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        ks = jax.random.split(key, 2 * self.depth + 3)
        E, M = self.embed_dim, self.mlp_dim
        mh = E * self.merge ** 2

        def lin(k, i, o):
            return ((jax.random.normal(k, (i, o), jnp.float32)
                     * (0.5 / i ** 0.5)).astype(self.dtype),
                    jnp.zeros((o,), jnp.float32))

        p = {
            "patch_embed": (jax.random.normal(
                ks[0], (self.patch_in, E), jnp.float32) * 0.02
            ).astype(self.dtype),
            "blocks": [],
            "merger": {
                "ln_q": {"weight": jnp.ones((E,), jnp.float32),
                         "bias": jnp.zeros((E,), jnp.float32)},
                "mlp_0": lin(ks[1], mh, mh),
                "mlp_2": lin(ks[2], mh, self.out_hidden),
            },
        }
        for i in range(self.depth):
            k1, k2 = ks[3 + 2 * i], ks[4 + 2 * i]
            p["blocks"].append({
                "norm1": {"weight": jnp.ones((E,), jnp.float32),
                          "bias": jnp.zeros((E,), jnp.float32)},
                "norm2": {"weight": jnp.ones((E,), jnp.float32),
                          "bias": jnp.zeros((E,), jnp.float32)},
                "qkv": lin(k1, E, 3 * E),
                "proj": lin(k1, E, E),
                "fc1": lin(k2, E, M),
                "fc2": lin(k2, M, E),
            })
        return p

    def load_hf_weights(self, get_tensor, prefix: str = "model.visual."
                        ) -> Dict:
        def arr(name):
            a = get_tensor(prefix + name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        def lin(name):
            return (arr(name + ".weight").T.astype(self.dtype),
                    arr(name + ".bias"))

        p = {
            # Conv3d [E, C, T, p, p] == linear over the flattened patch
            "patch_embed": jnp.reshape(
                arr("patch_embed.proj.weight"),
                (self.embed_dim, self.patch_in)).T.astype(self.dtype),
            "blocks": [],
            "merger": {
                "ln_q": {"weight": arr("merger.ln_q.weight"),
                         "bias": arr("merger.ln_q.bias")},
                "mlp_0": lin("merger.mlp.0"),
                "mlp_2": lin("merger.mlp.2"),
            },
        }
        for i in range(self.depth):
            b = f"blocks.{i}."
            p["blocks"].append({
                "norm1": {"weight": arr(b + "norm1.weight"),
                          "bias": arr(b + "norm1.bias")},
                "norm2": {"weight": arr(b + "norm2.weight"),
                          "bias": arr(b + "norm2.bias")},
                "qkv": lin(b + "attn.qkv"),
                "proj": lin(b + "attn.proj"),
                "fc1": lin(b + "mlp.fc1"),
                "fc2": lin(b + "mlp.fc2"),
            })
        return p

    # ---- geometry ---------------------------------------------------------------
    def rot_pos_ids(self, grid_thw) -> np.ndarray:
        """(h, w) id per patch in the 2x2-merge-blocked order HF uses."""
        out = []
        m = self.merge
        for t, h, w in grid_thw:
            hp = np.arange(h)[:, None].repeat(w, 1)
            hp = hp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).ravel()
            wp = np.arange(w)[None, :].repeat(h, 0)
            wp = wp.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).ravel()
            ids = np.stack([hp, wp], -1)
            out.append(np.tile(ids, (t, 1)))
        return np.concatenate(out, 0)      # [N, 2]

    # ---- forward ----------------------------------------------------------------
    def __call__(self, params: Dict, patches: jax.Array,
                 grid_thw: List[Tuple[int, int, int]]) -> jax.Array:
        """patches [N, patch_in] -> merged features [N // merge^2, out]."""
        eps = 1e-6

        def ln(x, p):
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + eps)
            return (y * p["weight"] + p["bias"]).astype(x.dtype)

        x = jnp.dot(patches.astype(self.dtype), params["patch_embed"])
        N = x.shape[0]
        H, D = self.num_heads, self.head_dim

        # 2D rotary: head_dim/4 freqs each for h and w -> D/2, doubled
        ids = self.rot_pos_ids(grid_thw)                     # [N, 2]
        dim4 = D // 4
        inv = 1.0 / (10000.0 ** (np.arange(0, dim4 * 2, 2) / (dim4 * 2.0)))
        freqs_h = np.outer(ids[:, 0], inv)                   # [N, D/4]
        freqs_w = np.outer(ids[:, 1], inv)
        half = np.concatenate([freqs_h, freqs_w], -1)        # [N, D/2]
        emb = np.concatenate([half, half], -1)               # [N, D]
        cos = jnp.asarray(np.cos(emb), jnp.float32)[:, None, :]
        sin = jnp.asarray(np.sin(emb), jnp.float32)[:, None, :]

        def rope(v):
            vf = v.astype(jnp.float32)
            r = jnp.concatenate([-vf[..., D // 2:], vf[..., :D // 2]], -1)
            return (vf * cos + r * sin).astype(v.dtype)

        # block-diagonal mask per image (patches never attend across images)
        seg = np.repeat(np.arange(len(grid_thw)),
                        [t * h * w for t, h, w in grid_thw])
        mask = jnp.asarray(seg[:, None] == seg[None, :])

        for bp in params["blocks"]:
            h0 = ln(x, bp["norm1"])
            qkv = jnp.dot(h0, bp["qkv"][0]) + bp["qkv"][1].astype(x.dtype)
            q, k, v = [a.reshape(N, H, D) for a in jnp.split(qkv, 3, -1)]
            q, k = rope(q), rope(k)
            scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                                k.astype(jnp.float32)) * D ** -0.5
            scores = jnp.where(mask[None], scores, -1e30)
            pr = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum("hqk,khd->qhd", pr, v.astype(jnp.float32))
            att = att.reshape(N, H * D).astype(x.dtype)
            x = x + jnp.dot(att, bp["proj"][0]) \
                + bp["proj"][1].astype(x.dtype)
            h1 = ln(x, bp["norm2"])
            m = jnp.dot(h1, bp["fc1"][0]) + bp["fc1"][1].astype(x.dtype)
            m = quick_gelu(m.astype(jnp.float32)).astype(x.dtype)
            x = x + jnp.dot(m, bp["fc2"][0]) + bp["fc2"][1].astype(x.dtype)

        mg = params["merger"]
        y = ln(x, mg["ln_q"])
        y = y.reshape(-1, self.embed_dim * self.merge ** 2)
        y = jnp.dot(y, mg["mlp_0"][0]) + mg["mlp_0"][1].astype(y.dtype)
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
            self.dtype)
        y = jnp.dot(y, mg["mlp_2"][0]) + mg["mlp_2"][1].astype(y.dtype)
        return y
