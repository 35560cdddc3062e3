"""Phi-4-Multimodal — vision path (reference
`_torch/models/modeling_phi4mm.py`; HF `Phi4MultimodalForCausalLM`):
a Phi-3 language model whose image embedding runs the HD transform —
each image arrives as [global crop; sub-image tiles], all through a
SigLIP tower tapped at hidden-state index `feature_layer` (raw, no
post-LN), 2x2 avg-pool token compression, sub tiles re-assembled into
the full-resolution grid with a learned newline column per row, then
``[sub; global-separator token; global]`` through the
up -> gelu -> down projection and spliced at the image-token rows.

Round-1 scope: full (unpadded) crops — the common resized-tile path;
the audio conformer branch is a later round."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.phi import Phi3ForCausalLM
from tensorrt_llm_tpu.models.vision.siglip import SiglipVisionTower


@register_auto_model("Phi4MultimodalForCausalLM", "Phi4MMForCausalLM")
class Phi4MultimodalForCausalLM(Phi3ForCausalLM):
    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        vc = cfg.extra.get("vision_config") or {}
        self.image_token_index = vc.get(
            "image_token_id", cfg.extra.get("image_token_id", 200010))
        self.crop_size = vc.get("crop_size", 448)
        self.vision = SiglipVisionTower(
            hidden_size=vc.get("hidden_size", 1152),
            num_layers=vc.get("num_hidden_layers", 27),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4304),
            image_size=vc.get("image_size", 448),
            patch_size=vc.get("patch_size", 14),
            layer_norm_eps=vc.get("layer_norm_eps", 1e-6),
            feature_layer=vc.get("feature_layer", -2),
            dtype=cfg.dtype,
        )
        n_patches = self.vision.image_size // self.vision.patch_size
        assert n_patches % 2 == 0, \
            "odd patch grids (reflection pad) land later"
        self.base_feat = n_patches // 2
        self.vdim = self.vision.H

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1)
        params["vision"] = self.vision.init(k2)
        H, V = self.cfg.hidden_size, self.vdim
        ka, kb = jax.random.split(k3)
        params["image_embed"] = {
            "up": ((jax.random.normal(ka, (V, H), jnp.float32)
                    * (0.5 / V ** 0.5)).astype(self.cfg.dtype),
                   jnp.zeros((H,), jnp.float32)),
            "down": ((jax.random.normal(kb, (H, H), jnp.float32)
                      * (0.5 / H ** 0.5)).astype(self.cfg.dtype),
                     jnp.zeros((H,), jnp.float32)),
            "global_ext": jnp.zeros((V,), jnp.float32),
            "sub_ext": jnp.zeros((V,), jnp.float32),
        }
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init(jax.random.PRNGKey(0)))
        specs["image_embed"] = {"up": (P(None, None), P(None)),
                                "down": (P(None, None), P(None)),
                                "global_ext": P(None), "sub_ext": P(None)}
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = super().load_hf_weights(get_tensor, dtype=dtype)
        pre = "model.embed_tokens_extend.image_embed."
        params["vision"] = self.vision.load_hf_weights(
            get_tensor, pre + "img_processor.")
        params["image_embed"] = {
            "up": (arr(pre + "img_projection_up.weight").T.astype(
                self.cfg.dtype), arr(pre + "img_projection_up.bias")),
            "down": (arr(pre + "img_projection_down.weight").T.astype(
                self.cfg.dtype), arr(pre + "img_projection_down.bias")),
            "global_ext": arr(pre + "global_img_feature_extensor"
                              ).reshape(-1),
            "sub_ext": arr(pre + "sub_img_feature_extensor").reshape(-1),
        }
        return params

    # ---- HD transform -----------------------------------------------------------
    def _embed_image(self, params, crops: np.ndarray,
                     image_size) -> np.ndarray:
        """crops [1+n_sub, 3, S, S] (global first) + original (H, W) ->
        [n_tokens, hidden] projected features."""
        from scipy.special import erf
        bs, V = self.base_feat, self.vdim
        feats = np.asarray(self.vision(
            params["vision"], jnp.asarray(crops)).astype(jnp.float32))
        g = int(round(feats.shape[1] ** 0.5))
        # 2x2 avg-pool token compression
        f = feats.reshape(-1, g // 2, 2, g // 2, 2, V).mean((2, 4))
        f = f.reshape(-1, bs * bs, V)

        hr = int(image_size[0]) // self.crop_size
        wr = int(image_size[1]) // self.crop_size
        sub_ext = np.asarray(params["image_embed"]["sub_ext"], np.float32)
        glob_ext = np.asarray(params["image_embed"]["global_ext"],
                              np.float32)

        def with_newlines(grid):                 # [h, w, V] -> [h*(w+1), V]
            h = grid.shape[0]
            col = np.broadcast_to(sub_ext, (h, 1, V))
            return np.concatenate([grid, col], axis=1).reshape(-1, V)

        glob = with_newlines(f[0].reshape(bs, bs, V))
        sub = f[1:1 + hr * wr].reshape(hr, wr, bs, bs, V)
        sub = sub.transpose(0, 2, 1, 3, 4).reshape(hr * bs, wr * bs, V)
        sub = with_newlines(sub)
        x = np.concatenate([sub, glob_ext[None], glob], axis=0)

        up_w, up_b = params["image_embed"]["up"]
        x = x @ np.asarray(up_w, np.float32) + np.asarray(up_b, np.float32)
        x = x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))
        dn_w, dn_b = params["image_embed"]["down"]
        return x @ np.asarray(dn_w, np.float32) + np.asarray(dn_b,
                                                             np.float32)

    def preprocess_images(self, images):
        out = []
        for im in images:
            assert isinstance(im, dict) and "pixel_values" in im, \
                "Phi-4-MM needs {'pixel_values': [1+n_sub, 3, S, S], " \
                "'image_size': (H, W)} dicts"
            out.append({"pixel_values": np.asarray(im["pixel_values"],
                                                   np.float32),
                        "image_size": tuple(im["image_size"])})
        return out

    def process_multimodal(self, params, token_ids: List[int], images):
        packed = [self._embed_image(params, im["pixel_values"],
                                    im["image_size"]) for im in images]
        expanded: List[int] = []
        slots = []
        img = 0
        for t in token_ids:
            if t == self.image_token_index:
                slots.append((len(expanded), packed[img].shape[0]))
                expanded.extend([0] * packed[img].shape[0])
                img += 1
            else:
                expanded.append(int(t))
        assert img == len(images), (
            f"{img} image placeholders but {len(images)} images")
        ids = jnp.asarray(np.asarray(expanded, np.int32))
        emb = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        for j, (pos, cnt) in enumerate(slots):
            emb[pos:pos + cnt] = packed[j]
        return expanded, emb
