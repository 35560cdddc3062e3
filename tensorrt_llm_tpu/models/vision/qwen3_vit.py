"""Qwen3-VL vision transformer in JAX.

Counterpart of the reference's Qwen3-VL vision encoder
(`_torch/models/modeling_qwen3vl.py`; HF `Qwen3VLVisionModel`): biased
Conv3d patch embedding, a LEARNED position embedding bilinearly
interpolated to each image's (h, w) grid (HF fast_pos_embed_interpolate)
and reordered into the 2x2 spatial-merge layout, pre-LN blocks with biased
gelu-tanh MLPs and 2D rotary attention, a PatchMerger head, and — the
Qwen3-VL novelty — DeepStack taps: features from intermediate blocks pass
through their own post-shuffle-norm mergers and are later injected into
the early language-model layers (arXiv:2406.04334)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Qwen3VisionTower:
    def __init__(self, embed_dim: int, depth: int, num_heads: int,
                 out_hidden: int, intermediate: int,
                 num_position_embeddings: int = 2304,
                 patch_size: int = 16, temporal_patch: int = 2,
                 in_channels: int = 3, spatial_merge: int = 2,
                 deepstack_indexes=(), dtype=jnp.bfloat16):
        self.embed_dim = embed_dim
        self.depth = depth
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.out_hidden = out_hidden
        self.mlp_dim = intermediate
        self.num_pos = num_position_embeddings
        self.grid_side = int(num_position_embeddings ** 0.5)
        self.patch_size = patch_size
        self.temporal_patch = temporal_patch
        self.in_channels = in_channels
        self.merge = spatial_merge
        self.deepstack_indexes = list(deepstack_indexes)
        self.patch_in = in_channels * temporal_patch * patch_size ** 2
        self.dtype = dtype

    # ---- params -----------------------------------------------------------------
    def _merger_shape(self):
        mh = self.embed_dim * self.merge ** 2
        return mh

    def init(self, key) -> Dict:
        ks = iter(jax.random.split(key, 4 * self.depth + 16))
        E, M = self.embed_dim, self.mlp_dim
        mh = self._merger_shape()

        def lin(i, o):
            return ((jax.random.normal(next(ks), (i, o), jnp.float32)
                     * (0.5 / i ** 0.5)).astype(self.dtype),
                    jnp.zeros((o,), jnp.float32))

        def ln(n):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        def merger(norm_dim):
            return {"norm": ln(norm_dim), "fc1": lin(mh, mh),
                    "fc2": lin(mh, self.out_hidden)}

        p = {
            "patch_embed": lin(self.patch_in, E),
            "pos_embed": (jax.random.normal(
                next(ks), (self.num_pos, E), jnp.float32) * 0.02
            ).astype(jnp.float32),
            "blocks": [],
            "merger": merger(E),
            "ds_mergers": [merger(mh) for _ in self.deepstack_indexes],
        }
        for _ in range(self.depth):
            p["blocks"].append({
                "norm1": ln(E), "norm2": ln(E),
                "qkv": lin(E, 3 * E), "proj": lin(E, E),
                "fc1": lin(E, M), "fc2": lin(M, E),
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

        def ln(name):
            return {"weight": arr(name + ".weight"),
                    "bias": arr(name + ".bias")}

        def merger(pre):
            return {"norm": ln(pre + "norm"),
                    "fc1": lin(pre + "linear_fc1"),
                    "fc2": lin(pre + "linear_fc2")}

        conv = arr("patch_embed.proj.weight")   # [E, C, T, p, p]
        p = {
            "patch_embed": (
                conv.reshape(self.embed_dim, self.patch_in).T.astype(
                    self.dtype),
                arr("patch_embed.proj.bias")),
            "pos_embed": arr("pos_embed.weight"),
            "blocks": [],
            "merger": merger("merger."),
            "ds_mergers": [merger(f"deepstack_merger_list.{i}.")
                           for i in range(len(self.deepstack_indexes))],
        }
        for i in range(self.depth):
            b = f"blocks.{i}."
            p["blocks"].append({
                "norm1": ln(b + "norm1"), "norm2": ln(b + "norm2"),
                "qkv": lin(b + "attn.qkv"), "proj": lin(b + "attn.proj"),
                "fc1": lin(b + "mlp.linear_fc1"),
                "fc2": lin(b + "mlp.linear_fc2"),
            })
        return p

    # ---- geometry ---------------------------------------------------------------
    def rot_pos_ids(self, grid_thw) -> np.ndarray:
        """(row, col) per patch in the 2x2-merge-blocked order."""
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

    def interp_pos_embed(self, pos_embed: np.ndarray, grid_thw) -> np.ndarray:
        """HF fast_pos_embed_interpolate: bilinear resample of the learned
        side x side grid to each image's (h, w), then merge-permute."""
        side = self.grid_side
        m = self.merge
        out = []
        for t, h, w in grid_thw:
            hi = np.linspace(0, side - 1, h)
            wi = np.linspace(0, side - 1, w)
            hf = hi.astype(np.int32)
            wf = wi.astype(np.int32)
            hc = np.clip(hf + 1, None, side - 1)
            wc = np.clip(wf + 1, None, side - 1)
            dh = (hi - hf)[:, None]
            dw = (wi - wf)[None, :]
            g = pos_embed.reshape(side, side, -1)
            pe = ((1 - dh)[..., None] * (1 - dw)[..., None] * g[hf][:, wf]
                  + (1 - dh)[..., None] * dw[..., None] * g[hf][:, wc]
                  + dh[..., None] * (1 - dw)[..., None] * g[hc][:, wf]
                  + dh[..., None] * dw[..., None] * g[hc][:, wc])  # [h, w, E]
            pe = np.tile(pe.reshape(1, h, w, -1), (t, 1, 1, 1))
            pe = pe.reshape(t, h // m, m, w // m, m, -1)
            pe = pe.transpose(0, 1, 3, 2, 4, 5).reshape(t * h * w, -1)
            out.append(pe)
        return np.concatenate(out, 0)

    # ---- forward ----------------------------------------------------------------
    def __call__(self, params: Dict, patches: jax.Array,
                 grid_thw: List[Tuple[int, int, int]]):
        """patches [N, patch_in] -> (merged [N/m^2, out],
        deepstack [n_ds, N/m^2, out])."""
        eps = 1e-6

        def ln(x, p):
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            return ((xf - mean) * jax.lax.rsqrt(var + eps)
                    * p["weight"] + p["bias"]).astype(x.dtype)

        x = (jnp.dot(patches.astype(self.dtype), params["patch_embed"][0])
             + params["patch_embed"][1].astype(self.dtype))
        pe = self.interp_pos_embed(np.asarray(params["pos_embed"],
                                              np.float32), grid_thw)
        x = x + jnp.asarray(pe).astype(x.dtype)
        N = x.shape[0]
        H, D = self.num_heads, self.head_dim

        ids = self.rot_pos_ids(grid_thw)
        dim4 = D // 4
        inv = 1.0 / (10000.0 ** (np.arange(0, dim4 * 2, 2) / (dim4 * 2.0)))
        half = np.concatenate([np.outer(ids[:, 0], inv),
                               np.outer(ids[:, 1], inv)], -1)
        emb = np.concatenate([half, half], -1)           # [N, D]
        cos = jnp.asarray(np.cos(emb), jnp.float32)[:, None, :]
        sin = jnp.asarray(np.sin(emb), jnp.float32)[:, None, :]

        def rope(v):
            vf = v.astype(jnp.float32)
            r = jnp.concatenate([-vf[..., D // 2:], vf[..., :D // 2]], -1)
            return (vf * cos + r * sin).astype(v.dtype)

        seg = np.repeat(np.arange(len(grid_thw)),
                        [t * h * w for t, h, w in grid_thw])
        mask = jnp.asarray(seg[:, None] == seg[None, :])

        def merger(y, mp):
            mh = self._merger_shape()
            if mp["norm"]["weight"].shape[0] == mh:   # post-shuffle norm
                y = ln(y.reshape(-1, mh), mp["norm"])
            else:
                y = ln(y, mp["norm"]).reshape(-1, mh)
            y = jnp.dot(y, mp["fc1"][0]) + mp["fc1"][1].astype(y.dtype)
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False
                            ).astype(self.dtype)
            return jnp.dot(y, mp["fc2"][0]) + mp["fc2"][1].astype(y.dtype)

        deepstack = []
        for li, bp in enumerate(params["blocks"]):
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
            mm = jnp.dot(h1, bp["fc1"][0]) + bp["fc1"][1].astype(x.dtype)
            mm = jax.nn.gelu(mm.astype(jnp.float32),
                             approximate=True).astype(x.dtype)
            x = x + jnp.dot(mm, bp["fc2"][0]) + bp["fc2"][1].astype(x.dtype)
            if li in self.deepstack_indexes:
                j = self.deepstack_indexes.index(li)
                deepstack.append(merger(x, params["ds_mergers"][j]))

        return merger(x, params["merger"]), deepstack
