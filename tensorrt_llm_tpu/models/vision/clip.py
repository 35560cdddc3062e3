"""CLIP vision tower (ViT) in JAX.

Counterpart of the reference's multimodal vision encoders
(`_torch/models/modeling_clip*.py` / vision components of the VLM model
zoo): patch conv embedding + class token + learned positions, pre-LN
transformer encoder, feature extraction at a configurable layer (LLaVA uses
layer -2 and drops the CLS token).  Pure batched dense compute — no KV
cache — so it runs as one jitted call per image batch, and XLA maps the
patch conv + MHA directly onto the MXU.  Numerics mirror HF
`modeling_clip.py` CLIPVisionModel for checkpoint parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.ops.norms import layer_norm


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACT = {"quick_gelu": quick_gelu, "gelu": jax.nn.gelu,
        "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True)}


@dataclass
class CLIPVisionTower:
    hidden_size: int = 1024
    image_size: int = 336
    patch_size: int = 14
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    num_channels: int = 3
    # LLaVA feature selection
    feature_layer: int = -2            # hidden_states index (post-embedding)
    drop_cls: bool = True              # "default" strategy drops CLS
    dtype: jnp.dtype = jnp.bfloat16

    def __post_init__(self):
        self.num_patches = (self.image_size // self.patch_size) ** 2
        self.head_dim = self.hidden_size // self.num_heads

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        H, I = self.hidden_size, self.intermediate_size
        keys = jax.random.split(key, 2 + self.num_layers)
        std = 0.5 / H ** 0.5
        p = {
            "class_embedding": jax.random.normal(keys[0], (H,), jnp.float32),
            "patch_embedding": jax.random.normal(
                keys[1], (self.patch_size, self.patch_size,
                          self.num_channels, H), jnp.float32) * 0.02,
            "position_embedding": jnp.zeros((self.num_patches + 1, H),
                                            jnp.float32),
            "pre_ln": (jnp.ones((H,), jnp.float32),
                       jnp.zeros((H,), jnp.float32)),
            "post_ln": (jnp.ones((H,), jnp.float32),
                        jnp.zeros((H,), jnp.float32)),
            "layers": [],
        }
        for i in range(self.num_layers):
            ks = jax.random.split(keys[2 + i], 6)
            rnd = lambda k, sh, s=std: (jax.random.normal(k, sh, jnp.float32)
                                        * s)
            p["layers"].append({
                "ln1": (jnp.ones((H,), jnp.float32), jnp.zeros((H,), jnp.float32)),
                "ln2": (jnp.ones((H,), jnp.float32), jnp.zeros((H,), jnp.float32)),
                "q": (rnd(ks[0], (H, H)), jnp.zeros((H,), jnp.float32)),
                "k": (rnd(ks[1], (H, H)), jnp.zeros((H,), jnp.float32)),
                "v": (rnd(ks[2], (H, H)), jnp.zeros((H,), jnp.float32)),
                "o": (rnd(ks[3], (H, H)), jnp.zeros((H,), jnp.float32)),
                "fc1": (rnd(ks[4], (H, I)), jnp.zeros((I,), jnp.float32)),
                "fc2": (rnd(ks[5], (I, H), 0.5 / I ** 0.5),
                        jnp.zeros((H,), jnp.float32)),
            })
        return p

    def load_hf_weights(self, get_tensor, prefix: str) -> Dict:
        """prefix e.g. 'model.vision_tower.vision_model.'."""
        def arr(name):
            a = get_tensor(prefix + name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        def lin(name):  # HF [out, in] -> ([in, out], bias)
            return (arr(name + ".weight").T, arr(name + ".bias"))

        # HF conv weight [H, C, P, P] -> [P, P, C, H]
        conv = jnp.transpose(arr("embeddings.patch_embedding.weight"),
                             (2, 3, 1, 0))
        p = {
            "class_embedding": arr("embeddings.class_embedding"),
            "patch_embedding": conv,
            "position_embedding": arr("embeddings.position_embedding.weight"),
            # (sic) HF attribute is spelled "pre_layrnorm"
            "pre_ln": (arr("pre_layrnorm.weight"), arr("pre_layrnorm.bias")),
            "post_ln": (arr("post_layernorm.weight"),
                        arr("post_layernorm.bias")),
            "layers": [],
        }
        for i in range(self.num_layers):
            lp = f"encoder.layers.{i}."
            p["layers"].append({
                "ln1": (arr(lp + "layer_norm1.weight"),
                        arr(lp + "layer_norm1.bias")),
                "ln2": (arr(lp + "layer_norm2.weight"),
                        arr(lp + "layer_norm2.bias")),
                "q": lin(lp + "self_attn.q_proj"),
                "k": lin(lp + "self_attn.k_proj"),
                "v": lin(lp + "self_attn.v_proj"),
                "o": lin(lp + "self_attn.out_proj"),
                "fc1": lin(lp + "mlp.fc1"),
                "fc2": lin(lp + "mlp.fc2"),
            })
        return p

    # ---- forward ------------------------------------------------------------------
    def _mha(self, lp, x):
        B, S, H = x.shape
        nh, d = self.num_heads, self.head_dim
        proj = lambda wb: (jnp.einsum("bsh,hk->bsk", x, wb[0].astype(x.dtype))
                           + wb[1].astype(x.dtype))
        q = proj(lp["q"]).reshape(B, S, nh, d)
        k = proj(lp["k"]).reshape(B, S, nh, d)
        v = proj(lp["v"]).reshape(B, S, nh, d)
        scores = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (d ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", probs, v.astype(jnp.float32))
        out = out.reshape(B, S, H).astype(x.dtype)
        return jnp.einsum("bsh,hk->bsk", out, lp["o"][0].astype(x.dtype)) \
            + lp["o"][1].astype(x.dtype)

    def __call__(self, params, pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, C, S, S] (HF layout) -> features
        [B, num_patches(+1), H] at feature_layer."""
        eps = self.layer_norm_eps
        act = _ACT[self.hidden_act]
        pv = jnp.transpose(pixel_values.astype(self.dtype), (0, 2, 3, 1))
        patches = jax.lax.conv_general_dilated(
            pv, params["patch_embedding"].astype(self.dtype),
            window_strides=(self.patch_size, self.patch_size),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        B = patches.shape[0]
        patches = patches.reshape(B, -1, self.hidden_size)
        cls = jnp.broadcast_to(
            params["class_embedding"].astype(self.dtype)[None, None, :],
            (B, 1, self.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        x = x + params["position_embedding"][None].astype(self.dtype)
        x = layer_norm(x, *params["pre_ln"], eps=eps)

        n_run = self.num_layers + 1 + self.feature_layer \
            if self.feature_layer < 0 else self.feature_layer
        for i in range(n_run):
            lp = params["layers"][i]
            h = layer_norm(x, *lp["ln1"], eps=eps)
            x = x + self._mha(lp, h)
            h = layer_norm(x, *lp["ln2"], eps=eps)
            h = act(jnp.einsum("bsh,hk->bsk", h, lp["fc1"][0].astype(h.dtype))
                    .astype(jnp.float32)
                    + lp["fc1"][1]).astype(h.dtype)
            h = jnp.einsum("bsh,hk->bsk", h, lp["fc2"][0].astype(h.dtype)) \
                + lp["fc2"][1].astype(h.dtype)
            x = x + h
        if self.drop_cls:
            x = x[:, 1:]
        return x
