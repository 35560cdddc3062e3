"""VILA / NVILA (reference `_torch/models/modeling_vila.py`, arch
`LlavaLlamaModel`): a SigLIP vision tower feeding one of VILA's
spatial-downsample MLP projectors, spliced into a Llama/Qwen LM.

Checkpoints are split into `llm/`, `vision_tower/`, `mm_projector/`
sub-models (reference VilaConfig `llm_cfg`/`vision_tower_cfg`/
`mm_projector_cfg`); the loader reads those prefixes.

Projector types (reference VilaMultimodalProjector): `identity`,
`linear`, and the `mlp_downsample*` family — an mxm spatial patch-group
concat (row-major within each block) followed by LayerNorm/Linear/GELU
stacks.  `mlp_downsample` and `mlp_downsample_2x2_fix` share the same
2x2 regrouping semantics (the reference's flat_square == flat_square_2x2
when the grid is even)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.vision.siglip import SiglipVisionTower


def downsample_concat(feats: np.ndarray, m: int) -> np.ndarray:
    """[P, C] square grid -> [P/m^2, m*m*C]: each output token holds its
    mxm patch block's channels row-major (reference flat_square_2x2 /
    flat_square_3x3, zero-padding odd grids)."""
    P, C = feats.shape
    s = int(round(P ** 0.5))
    g = feats.reshape(s, s, C)
    pad = (-s) % m
    if pad:
        g = np.pad(g, ((0, pad), (0, pad), (0, 0)))
        s += pad
    g = g.reshape(s // m, m, s // m, m, C)
    g = g.transpose(0, 2, 1, 3, 4)                 # [R, Cb, i, j, C]
    return g.reshape((s // m) ** 2, m * m * C)


@register_auto_model("LlavaLlamaModel", "VilaForCausalLM")
class VilaForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        vc = cfg.extra.get("vision_tower_cfg") or \
            cfg.extra.get("vision_config") or {}
        pc = cfg.extra.get("mm_projector_cfg") or {}
        self.proj_type = pc.get("mm_projector_type", "mlp_downsample")
        self.image_token_index = cfg.extra.get("image_token_index", -200)
        self.mm_hidden = cfg.extra.get("mm_hidden_size",
                                       vc.get("hidden_size", 1152))
        self.vision = SiglipVisionTower(
            hidden_size=vc.get("hidden_size", 1152),
            num_layers=vc.get("num_hidden_layers", 27),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4304),
            image_size=vc.get("image_size", 448),
            patch_size=vc.get("patch_size", 14),
            layer_norm_eps=vc.get("layer_norm_eps", 1e-6),
            dtype=cfg.dtype,
        )
        self.ds = {"mlp_downsample": 2, "mlp_downsample_2x2_fix": 2,
                   "mlp_downsample_3x3_fix": 3}.get(self.proj_type, 1)
        side = self.vision.image_size // self.vision.patch_size
        out_side = -(-side // self.ds)
        self.num_image_tokens = out_side * out_side \
            if self.ds > 1 else self.vision.num_patches

    # ---- projector --------------------------------------------------------------
    def _proj_dims(self):
        H, V = self.cfg.hidden_size, self.mm_hidden
        m2 = self.ds * self.ds
        if self.proj_type in ("mlp_downsample", "mlp_downsample_2x2_fix"):
            # LN(4V) -> Linear(4V, H) -> GELU -> Linear(H, H)
            return [("ln", 4 * V), ("lin", 4 * V, H), ("gelu",),
                    ("lin", H, H)]
        if self.proj_type == "mlp_downsample_3x3_fix":
            return [("ln", 9 * V), ("lin", 9 * V, 3 * V), ("gelu",),
                    ("ln", 3 * V), ("lin", 3 * V, H), ("gelu",),
                    ("lin", H, H)]
        if self.proj_type == "linear":
            return [("lin", V, H)]
        return []   # identity

    def _init_projector(self, key) -> List:
        out = []
        ks = iter(jax.random.split(key, 8))
        for spec in self._proj_dims():
            if spec[0] == "ln":
                out.append({"w": jnp.ones((spec[1],), jnp.float32),
                            "b": jnp.zeros((spec[1],), jnp.float32)})
            elif spec[0] == "lin":
                out.append(((jax.random.normal(
                    next(ks), (spec[1], spec[2]), jnp.float32)
                    * (0.5 / spec[1] ** 0.5)).astype(self.cfg.dtype),
                    jnp.zeros((spec[2],), jnp.float32)))
            else:
                out.append(None)
        return out

    def _apply_projector(self, params: List, x: np.ndarray) -> np.ndarray:
        from scipy.special import erf  # exact gelu (HF nn.GELU default)
        for spec, p in zip(self._proj_dims(), params):
            if spec[0] == "ln":
                w = np.asarray(p["w"], np.float32)
                b = np.asarray(p["b"], np.float32)
                mu = x.mean(-1, keepdims=True)
                var = x.var(-1, keepdims=True)
                x = (x - mu) / np.sqrt(var + 1e-5) * w + b
            elif spec[0] == "lin":
                x = x @ np.asarray(p[0], np.float32) \
                    + np.asarray(p[1], np.float32)
            else:
                x = x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))
        return x

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1)
        params["vision"] = self.vision.init(k2)
        params["projector"] = self._init_projector(k3)
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init(jax.random.PRNGKey(0)))
        specs["projector"] = jax.tree.map(
            lambda _: P(), self._init_projector(jax.random.PRNGKey(0)))
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        def lm_get(name):
            a = get_tensor("llm." + name)
            return a if a is not None else get_tensor(name)

        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = super().load_hf_weights(lm_get, dtype=dtype)
        def vget(n):
            for pre in ("vision_tower.vision_tower.vision_model.",
                        "vision_tower.vision_model."):
                a = get_tensor(pre + n)
                if a is not None:
                    return a
            return None

        params["vision"] = self.vision.load_hf_weights(vget, prefix="")
        proj = []
        i = 0
        for spec in self._proj_dims():
            # HF Sequential indices skip the downsample block at 0
            while True:
                i += 1
                w = arr(f"mm_projector.layers.{i}.weight")
                if w is not None or i > 16:
                    break
            if spec[0] == "ln":
                proj.append({"w": w, "b": arr(
                    f"mm_projector.layers.{i}.bias")})
            elif spec[0] == "lin":
                proj.append((w.T.astype(self.cfg.dtype),
                             arr(f"mm_projector.layers.{i}.bias")))
            else:
                proj.append(None)
                i -= 1   # gelu has no weights; don't consume the found one
        params["projector"] = proj
        return params

    # ---- multimodal -------------------------------------------------------------
    def process_multimodal(self, params, token_ids: List[int], images):
        n_img = self.num_image_tokens
        expanded: List[int] = []
        slots: List[int] = []
        for t in token_ids:
            if t == self.image_token_index:
                slots.append(len(expanded))
                expanded.extend([0] * n_img)
            else:
                expanded.append(int(t))
        assert len(slots) == len(images), (
            f"{len(slots)} image placeholders but {len(images)} images")
        ids = jnp.asarray(np.asarray(expanded, np.int32))
        emb = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        if images:
            pv = jnp.asarray(np.stack([np.asarray(im, np.float32)
                                       for im in images]))
            feats = np.asarray(self.vision(
                params["vision"], pv).astype(jnp.float32))  # [B, P, V]
            for j, pos in enumerate(slots):
                f = feats[j]
                if self.ds > 1:
                    f = downsample_concat(f, self.ds)
                f = self._apply_projector(params["projector"], f)
                emb[pos:pos + n_img] = f
        return expanded, emb
