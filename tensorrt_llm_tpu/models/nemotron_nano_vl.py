"""Nemotron-H Nano VL v2 (reference
`_torch/models/modeling_nemotron_nano.py` `NemotronH_Nano_VL_V2`): the
NemotronH mamba/attention/MLP hybrid LM fed by a C-RADIO vision tower.
Patch features pixel-shuffle down (2x2 block-concat, the same regrouping
as VILA's flat_square — ps v2 swaps the grid back so tokens stay
row-major), then project through ``mlp1``:
RMSNorm -> Linear(no bias) -> ReLU^2 -> Linear(no bias).  The projected
features splice into the prompt embeddings at the image placeholder rows
(fused-embedding prefill)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.nemotron_h import NemotronHForCausalLM
from tensorrt_llm_tpu.models.vila import downsample_concat
from tensorrt_llm_tpu.models.vision.radio import RadioVisionTower


@register_auto_model("NemotronH_Nano_VL_V2")
class NemotronHNanoVLForCausalLM(NemotronHForCausalLM):
    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        vc = cfg.extra.get("vision_config") or {}
        self.image_token_index = cfg.extra.get(
            "image_token_index", cfg.extra.get("image_token_id", 131072))
        self.downsample = int(round(
            1 / float(cfg.extra.get("downsample_ratio", 0.5))))
        self.vit_hidden = cfg.extra.get("vit_hidden_size",
                                        vc.get("hidden_size", 1280))
        self.proj_hidden = cfg.extra.get("projector_hidden_size",
                                         cfg.hidden_size)
        args = vc.get("args") or {}
        self.vision = RadioVisionTower(
            embed_dim=self.vit_hidden,
            num_layers=vc.get("num_hidden_layers",
                              vc.get("depth", 32)),
            num_heads=vc.get("num_attention_heads",
                             vc.get("num_heads", 16)),
            image_size=cfg.extra.get("force_image_size",
                                     vc.get("image_size", 512)),
            patch_size=cfg.extra.get("patch_size",
                                     vc.get("patch_size", 16)),
            mlp_ratio=vc.get("mlp_ratio", 4.0),
            num_cls_tokens=args.get("num_cls_tokens", 1),
            num_registers=args.get("num_registers",
                                   vc.get("num_registers", 0)),
            dtype=cfg.dtype,
        )
        side = self.vision.side
        self.num_image_tokens = (side // self.downsample) ** 2

    # ---- params -----------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = super().init(k1)
        params["vision"] = self.vision.init(k2)
        m2 = self.downsample ** 2
        Vin = self.vit_hidden * m2
        ka, kb = jax.random.split(k3)
        params["mlp1"] = {
            "norm": jnp.ones((Vin,), jnp.float32),
            "fc1": (jax.random.normal(ka, (Vin, self.proj_hidden),
                                      jnp.float32)
                    * (0.5 / Vin ** 0.5)).astype(self.cfg.dtype),
            "fc2": (jax.random.normal(kb, (self.proj_hidden,
                                           self.cfg.hidden_size),
                                      jnp.float32)
                    * (0.5 / self.proj_hidden ** 0.5)).astype(
                self.cfg.dtype),
        }
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.init(jax.random.PRNGKey(0)))
        specs["mlp1"] = {"norm": P(None), "fc1": P(None, None),
                         "fc2": P(None, None)}
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        def arr(name):
            a = get_tensor(name)
            return None if a is None else jnp.asarray(
                np.asarray(a)).astype(jnp.float32)

        params = super().load_hf_weights(get_tensor, dtype=dtype)
        params["vision"] = self.vision.load_hf_weights(
            get_tensor, "vision_model.radio_model.")
        params["mlp1"] = {
            "norm": arr("mlp1.0.weight"),
            "fc1": arr("mlp1.1.weight").T.astype(self.cfg.dtype),
            "fc2": arr("mlp1.3.weight").T.astype(self.cfg.dtype),
        }
        return params

    # ---- multimodal -------------------------------------------------------------
    def _project(self, params, feats: np.ndarray) -> np.ndarray:
        """[P, V] patch features -> [P/ds^2, H] projected tokens."""
        x = downsample_concat(feats, self.downsample)
        w = np.asarray(params["mlp1"]["norm"], np.float32)
        rms = np.sqrt((x * x).mean(-1, keepdims=True) + self.cfg.rms_eps)
        x = x / rms * w
        x = x @ np.asarray(params["mlp1"]["fc1"], np.float32)
        x = np.square(np.maximum(x, 0.0))        # ReLU^2
        return x @ np.asarray(params["mlp1"]["fc2"], np.float32)

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
                params["vision"], pv).astype(jnp.float32))
            for j, pos in enumerate(slots):
                emb[pos:pos + n_img] = self._project(params, feats[j])
        return expanded, emb
