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
                 mlp_hidden: int = 0, norm_type: str = "layernorm",
                 mlp_type: str = "quick_gelu", window_size: int = 0,
                 fullatt_idx=(), dtype=jnp.bfloat16):
        # Qwen2.5-VL variant: RMSNorm blocks, biased SwiGLU MLPs, window
        # attention (tokens reordered into merge-unit windows; only the
        # fullatt blocks see the whole image)
        self.embed_dim = embed_dim
        self.depth = depth
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.out_hidden = out_hidden
        self.patch_size = patch_size
        self.temporal_patch = temporal_patch
        self.in_channels = in_channels
        self.merge = spatial_merge
        self.mlp_dim = mlp_hidden or int(embed_dim * mlp_ratio)
        self.norm_type = norm_type
        self.mlp_type = mlp_type
        self.window_size = window_size
        self.fullatt_idx = set(fullatt_idx)
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
            blk = {
                "norm1": {"weight": jnp.ones((E,), jnp.float32),
                          "bias": jnp.zeros((E,), jnp.float32)},
                "norm2": {"weight": jnp.ones((E,), jnp.float32),
                          "bias": jnp.zeros((E,), jnp.float32)},
                "qkv": lin(k1, E, 3 * E),
                "proj": lin(k1, E, E),
            }
            if self.mlp_type == "swiglu":
                blk["gate"] = lin(k2, E, M)
                blk["up"] = lin(k2, E, M)
                blk["down"] = lin(k2, M, E)
            else:
                blk["fc1"] = lin(k2, E, M)
                blk["fc2"] = lin(k2, M, E)
            p["blocks"].append(blk)
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
            blk = {
                "norm1": {"weight": arr(b + "norm1.weight"),
                          "bias": arr(b + "norm1.bias")},
                "norm2": {"weight": arr(b + "norm2.weight"),
                          "bias": arr(b + "norm2.bias")},
                "qkv": lin(b + "attn.qkv"),
                "proj": lin(b + "attn.proj"),
            }
            if self.mlp_type == "swiglu":
                blk["gate"] = lin(b + "mlp.gate_proj")
                blk["up"] = lin(b + "mlp.up_proj")
                blk["down"] = lin(b + "mlp.down_proj")
            else:
                blk["fc1"] = lin(b + "mlp.fc1")
                blk["fc2"] = lin(b + "mlp.fc2")
            p["blocks"].append(blk)
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

    def window_index(self, grid_thw):
        """Qwen2.5-VL window reorder: merged-token (merge-unit) permutation
        + cumulative window lengths in PATCH rows (HF get_window_index)."""
        m = self.merge
        vw = self.window_size // m // self.patch_size
        order: List[np.ndarray] = []
        cu = [0]
        base = 0
        for t, h, w in grid_thw:
            lh, lw = h // m, w // m
            idx = np.arange(t * lh * lw).reshape(t, lh, lw)
            ph, pw = (-lh) % vw, (-lw) % vw
            pad = np.full((t, lh + ph, lw + pw), -100, np.int64)
            pad[:, :lh, :lw] = idx
            nh, nw = (lh + ph) // vw, (lw + pw) // vw
            pad = pad.reshape(t, nh, vw, nw, vw).transpose(0, 1, 3, 2, 4)
            pad = pad.reshape(t, nh * nw, vw, vw)
            seqlens = (pad != -100).sum((2, 3)).reshape(-1)
            flat = pad.reshape(-1)
            order.append(flat[flat != -100] + base)
            for s in seqlens:
                if s:
                    cu.append(cu[-1] + int(s) * m * m)
            base += t * lh * lw
        return np.concatenate(order), np.asarray(cu)

    # ---- forward ----------------------------------------------------------------
    def __call__(self, params: Dict, patches: jax.Array,
                 grid_thw: List[Tuple[int, int, int]]) -> jax.Array:
        """patches [N, patch_in] -> merged features [N // merge^2, out]."""
        eps = 1e-6

        def ln(x, p):
            xf = x.astype(jnp.float32)
            if self.norm_type == "rmsnorm":
                var = (xf * xf).mean(-1, keepdims=True)
                return (xf * jax.lax.rsqrt(var + eps)
                        * p["weight"]).astype(x.dtype)
            mean = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + eps)
            return (y * p["weight"] + p["bias"]).astype(x.dtype)

        x = jnp.dot(patches.astype(self.dtype), params["patch_embed"])
        N = x.shape[0]
        H, D = self.num_heads, self.head_dim

        # 2D rotary: head_dim/4 freqs each for h and w -> D/2, doubled
        ids = self.rot_pos_ids(grid_thw)                     # [N, 2]
        def build_rope(ids):
            dim4 = D // 4
            inv = 1.0 / (10000.0 ** (np.arange(0, dim4 * 2, 2)
                                     / (dim4 * 2.0)))
            half = np.concatenate([np.outer(ids[:, 0], inv),
                                   np.outer(ids[:, 1], inv)], -1)
            emb = np.concatenate([half, half], -1)           # [N, D]
            return (jnp.asarray(np.cos(emb), jnp.float32)[:, None, :],
                    jnp.asarray(np.sin(emb), jnp.float32)[:, None, :])

        def rope(v):
            vf = v.astype(jnp.float32)
            r = jnp.concatenate([-vf[..., D // 2:], vf[..., :D // 2]], -1)
            return (vf * cos + r * sin).astype(v.dtype)

        # block-diagonal mask per image (patches never attend across images)
        seg = np.repeat(np.arange(len(grid_thw)),
                        [t * h * w for t, h, w in grid_thw])

        win_idx = None
        win_mask = None
        if self.window_size:
            # Qwen2.5-VL: reorder PATCH rows into merge-unit windows; window
            # blocks attend within cu_window segments, fullatt within images
            win_idx, cu_win = self.window_index(grid_thw)
            mu = self.merge ** 2
            row_perm = (win_idx[:, None] * mu
                        + np.arange(mu)[None, :]).reshape(-1)
            x = x[jnp.asarray(row_perm)]
            ids = ids[row_perm]
            seg = seg[row_perm]
            wseg = np.zeros(N, np.int64)
            wseg[cu_win[1:-1]] = 1
            wseg = np.cumsum(wseg)
            win_mask = jnp.asarray(wseg[:, None] == wseg[None, :])
        mask = jnp.asarray(seg[:, None] == seg[None, :])

        cos, sin = build_rope(ids)

        for li, bp in enumerate(params["blocks"]):
            blk_mask = mask
            if win_mask is not None and li not in self.fullatt_idx:
                blk_mask = win_mask
            h0 = ln(x, bp["norm1"])
            qkv = jnp.dot(h0, bp["qkv"][0]) + bp["qkv"][1].astype(x.dtype)
            q, k, v = [a.reshape(N, H, D) for a in jnp.split(qkv, 3, -1)]
            q, k = rope(q), rope(k)
            scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                                k.astype(jnp.float32)) * D ** -0.5
            scores = jnp.where(blk_mask[None], scores, -1e30)
            pr = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum("hqk,khd->qhd", pr, v.astype(jnp.float32))
            att = att.reshape(N, H * D).astype(x.dtype)
            x = x + jnp.dot(att, bp["proj"][0]) \
                + bp["proj"][1].astype(x.dtype)
            h1 = ln(x, bp["norm2"])
            if self.mlp_type == "swiglu":
                g = jnp.dot(h1, bp["gate"][0]) + bp["gate"][1].astype(x.dtype)
                u = jnp.dot(h1, bp["up"][0]) + bp["up"][1].astype(x.dtype)
                m = (jax.nn.silu(g.astype(jnp.float32))
                     * u.astype(jnp.float32)).astype(x.dtype)
                x = x + jnp.dot(m, bp["down"][0])                     + bp["down"][1].astype(x.dtype)
            else:
                m = jnp.dot(h1, bp["fc1"][0]) + bp["fc1"][1].astype(x.dtype)
                m = quick_gelu(m.astype(jnp.float32)).astype(x.dtype)
                x = x + jnp.dot(m, bp["fc2"][0])                     + bp["fc2"][1].astype(x.dtype)

        mg = params["merger"]
        y = ln(x, mg["ln_q"])
        y = y.reshape(-1, self.embed_dim * self.merge ** 2)
        y = jnp.dot(y, mg["mlp_0"][0]) + mg["mlp_0"][1].astype(y.dtype)
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(
            self.dtype)
        y = jnp.dot(y, mg["mlp_2"][0]) + mg["mlp_2"][1].astype(y.dtype)
        if win_idx is not None:
            y = y[jnp.asarray(np.argsort(win_idx))]   # undo window reorder
        return y
