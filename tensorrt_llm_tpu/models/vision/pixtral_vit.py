"""Pixtral vision encoder in JAX.

Counterpart of the reference's `_torch/models/modeling_pixtral.py` (HF
`PixtralVisionModel`): variable-resolution patch conv (no bias), RMSNorm
pre-norm blocks with SwiGLU MLPs, and 2D rope whose h/w frequencies
interleave (h gets freqs[::2], w gets freqs[1::2]; position id =
row * max_side + col).  Images never attend across each other
(block-diagonal mask)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PixtralVisionTower:
    def __init__(self, hidden_size: int, num_layers: int, num_heads: int,
                 intermediate_size: int, head_dim: int = None,
                 image_size: int = 1024, patch_size: int = 16,
                 rope_theta: float = 10000.0, dtype=jnp.bfloat16):
        self.E = hidden_size
        self.L = num_layers
        self.nH = num_heads
        self.D = head_dim or hidden_size // num_heads
        self.I = intermediate_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.max_side = image_size // patch_size
        self.theta = rope_theta
        self.patch_in = 3 * patch_size ** 2
        self.num_channels = 3
        self.dtype = dtype

    def init(self, key) -> Dict:
        ks = iter(jax.random.split(key, 8 * self.L + 2))
        E, I, nH, D = self.E, self.I, self.nH, self.D

        def lin(i, o):
            return (jax.random.normal(next(ks), (i, o), jnp.float32)
                    * (0.5 / i ** 0.5)).astype(self.dtype)

        p = {"patch_conv": lin(self.patch_in, E),
             "ln_pre": jnp.ones((E,), jnp.float32),
             "layers": []}
        for _ in range(self.L):
            p["layers"].append({
                "attention_norm": jnp.ones((E,), jnp.float32),
                "ffn_norm": jnp.ones((E,), jnp.float32),
                "q": lin(E, nH * D), "k": lin(E, nH * D),
                "v": lin(E, nH * D), "o": lin(nH * D, E),
                "gate": lin(E, I), "up": lin(E, I), "down": lin(I, E),
            })
        return p

    def load_hf_weights(self, get_tensor, prefix: str) -> Dict:
        def arr(name):
            a = get_tensor(prefix + name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        def lin(name):
            return arr(name + ".weight").T.astype(self.dtype)

        conv = arr("patch_conv.weight")      # [E, 3, p, p]
        p = {"patch_conv": conv.reshape(self.E, self.patch_in).T.astype(
                 self.dtype),
             "ln_pre": arr("ln_pre.weight"),
             "layers": []}
        for i in range(self.L):
            pre = f"transformer.layers.{i}."
            p["layers"].append({
                "attention_norm": arr(pre + "attention_norm.weight"),
                "ffn_norm": arr(pre + "ffn_norm.weight"),
                "q": lin(pre + "attention.q_proj"),
                "k": lin(pre + "attention.k_proj"),
                "v": lin(pre + "attention.v_proj"),
                "o": lin(pre + "attention.o_proj"),
                "gate": lin(pre + "feed_forward.gate_proj"),
                "up": lin(pre + "feed_forward.up_proj"),
                "down": lin(pre + "feed_forward.down_proj"),
            })
        return p

    def patchify(self, image: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
        """[3, H, W] pixel values -> ([h*w, 3*p*p] patches, (h, w) grid).
        Conv2d(stride=p) == linear over the flattened [3, p, p] patch."""
        p = self.patch_size
        C, H, W = image.shape
        h, w = H // p, W // p
        a = image[:, :h * p, :w * p].reshape(C, h, p, w, p)
        a = a.transpose(1, 3, 0, 2, 4).reshape(h * w, C * p * p)
        return a.astype(np.float32), (h, w)

    def __call__(self, params: Dict, patch_sets) -> jax.Array:
        """patch_sets: [(patches [N_i, 3*p*p], (h, w))] -> [N_total, E]."""
        eps = 1e-5

        def rms(x, w):
            xf = x.astype(jnp.float32)
            var = (xf * xf).mean(-1, keepdims=True)
            return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)

        patches = jnp.asarray(np.concatenate([p for p, _ in patch_sets]))
        x = jnp.dot(patches.astype(self.dtype), params["patch_conv"])
        x = rms(x, params["ln_pre"])
        N = x.shape[0]
        nH, D = self.nH, self.D

        # interleaved 2D rope table: h rows own freqs[::2], w cols freqs[1::2]
        freqs = 1.0 / (self.theta ** (np.arange(0, D, 2) / D))
        rows, cols = [], []
        for _, (h, w) in patch_sets:
            rows.append(np.repeat(np.arange(h), w))
            cols.append(np.tile(np.arange(w), h))
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        half = np.concatenate(
            [np.outer(rows, freqs[::2]), np.outer(cols, freqs[1::2])], -1)
        # HF stores freqs (h‖w) then duplicates: emb = cat(freqs, freqs)
        emb = np.concatenate([half, half], -1)               # [N, D]
        cos = jnp.asarray(np.cos(emb), jnp.float32)[:, None, :]
        sin = jnp.asarray(np.sin(emb), jnp.float32)[:, None, :]

        def rope(v):
            vf = v.astype(jnp.float32)
            r = jnp.concatenate([-vf[..., D // 2:], vf[..., :D // 2]], -1)
            return (vf * cos + r * sin).astype(v.dtype)

        seg = np.repeat(np.arange(len(patch_sets)),
                        [h * w for _, (h, w) in patch_sets])
        mask = jnp.asarray(seg[:, None] == seg[None, :])

        for lp in params["layers"]:
            h0 = rms(x, lp["attention_norm"])
            q = jnp.dot(h0, lp["q"]).reshape(N, nH, D)
            k = jnp.dot(h0, lp["k"]).reshape(N, nH, D)
            v = jnp.dot(h0, lp["v"]).reshape(N, nH, D)
            q, k = rope(q), rope(k)
            s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * D ** -0.5
            s = jnp.where(mask[None], s, -1e30)
            pr = jax.nn.softmax(s, axis=-1)
            att = jnp.einsum("hqk,khd->qhd", pr, v.astype(jnp.float32))
            x = x + jnp.dot(att.reshape(N, nH * D).astype(x.dtype), lp["o"])
            h1 = rms(x, lp["ffn_norm"])
            g = jnp.dot(h1, lp["gate"])
            u = jnp.dot(h1, lp["up"])
            m = (jax.nn.silu(g.astype(jnp.float32))
                 * u.astype(jnp.float32)).astype(x.dtype)
            x = x + jnp.dot(m, lp["down"])
        return x
