"""HyperCLOVA-X Vision (HCX-VLM) — SigLIP tower + C-Abstractor projector
on a Llama-class language model.

Counterpart of the reference's `HCXVisionForCausalLM`
(`/root/reference/tensorrt_llm/_torch/models/modeling_hyperclovax.py:802-1120`):

- SigLIP vision tower; ``use_nth_layer`` selects the feature tap
  (-1 = final layer output with the post-layernorm replaced by Identity,
  -2 = HF ``hidden_states[-2]``; reference lines 920-928).
- C-Abstractor (`models/vision/c_abstractor.py`) compresses each tile's
  patch grid to ``num_queries_vis_abstractor`` query tokens.
- anyres tiling: the best grid from ``possible_resolutions`` (all i x j
  with i*j <= max_num_grids, scaled by the tower image size; reference
  `_init_possible_resolutions` lines 840-855); tile features re-assemble
  into the full grid, optionally unpad back to the original aspect ratio,
  gain an ``image_newline`` column per row, and concatenate after the
  base-tile features (reference `anyres_postprocessing` /
  `reshape_and_unpad_image_features` lines 98-190).  NOTE: HCX image
  sizes are (width, height) ordered — the opposite of LLaVA-NeXT.
- fused-embedding prefill through the engine's ``prefill_embeds`` path;
  decode is the plain language model (the reference's inflight-batching
  VLM forward, lines 1077-1120).

Video fast/slow adaptive query paths (``num_queries_vis_abstractors``)
are not reproduced; videos can ride the uniform-frame image path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    DecoderModelForCausalLM,
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.vision.c_abstractor import CAbstractor
from tensorrt_llm_tpu.models.vision.siglip import SiglipVisionTower


@register_auto_model("HCXVisionForCausalLM")
class HCXVisionForCausalLM(DecoderModelForCausalLM):
    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        vc = cfg.extra.get("vision_config") or {}
        assert "siglip" in (vc.get("model_type") or "siglip"), \
            "HCX-VLM ships a SigLIP tower; CLIP towers are not wired"
        # out-of-vocab sentinel placeholder, like the reference's
        # tllm_multimodal_token_id = vocab_size + 1 (line 594)
        self.image_token_index = cfg.extra.get(
            "image_token_index", cfg.vocab_size + 1)
        use_nth_layer = cfg.extra.get("use_nth_layer", -1)
        self.vision = SiglipVisionTower(
            hidden_size=vc.get("hidden_size", 1152),
            num_layers=vc.get("num_hidden_layers", 27),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4304),
            image_size=vc.get("image_size", 378),
            patch_size=vc.get("patch_size", 14),
            layer_norm_eps=vc.get("layer_norm_eps", 1e-6),
            feature_layer=use_nth_layer,
            dtype=cfg.dtype,
        )
        self.num_queries = cfg.extra.get("num_queries_vis_abstractor", 81)
        self.projector = CAbstractor(
            num_queries=self.num_queries,
            num_input_tokens=self.vision.num_patches,
            encoder_hidden_size=self.vision.H,
            hidden_size=self.vision.H,
            output_hidden_size=cfg.hidden_size,
            pos_emb=bool(cfg.extra.get("proj_pos_emb", True)),
            prenorm=bool(cfg.extra.get("proj_prenorm", False)),
            dtype=cfg.dtype,
        )
        self.anyres = bool(cfg.extra.get("anyres", False))
        self.unpad = bool(cfg.extra.get("unpad", False))
        self.grid_size = self.vision.image_size
        self.possible_resolutions = self._init_possible_resolutions(
            cfg.extra.get("max_num_grids", 9),
            bool(cfg.extra.get("use_1x1_grid", False)))

    def _init_possible_resolutions(self, max_num_grids: int,
                                   use_1x1: bool) -> List[List[int]]:
        """[height, width] pixel grids, reference lines 840-855."""
        out = []
        if not self.anyres:
            return out
        for i in range(1, max_num_grids + 1):
            for j in range(1, max_num_grids + 1):
                if i == 1 and j == 1 and not use_1x1:
                    continue
                if i * j <= max_num_grids:
                    out.append([i * self.grid_size, j * self.grid_size])
        return out

    # ---- params -----------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = super().init(k1)
        params["vision"] = self.vision.init(k2)
        params["projector"] = self.projector.init(k3)
        params["image_newline"] = (jax.random.normal(
            k4, (self.cfg.hidden_size,), jnp.float32) * 0.02)
        return params

    def param_specs(self) -> Dict:
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        rep = lambda t: jax.tree.map(lambda _: P(), t)
        specs["vision"] = rep(self.vision.init(jax.random.PRNGKey(0)))
        specs["projector"] = rep(self.projector.init(jax.random.PRNGKey(0)))
        specs["image_newline"] = P(None)
        return specs

    def load_hf_weights(self, get_tensor, dtype=None) -> Dict:
        # LM keys live under "language_model." (reference load_weights
        # line 1062); lm_head.weight is "language_model.lm_head.weight"
        def lm_get(name):
            return get_tensor("language_model." + name)

        params = super().load_hf_weights(lm_get, dtype=dtype)
        # the reference SiglipVisionModel wraps a `vision_model` submodule
        for pre in ("vision_model.vision_model.", "vision_model."):
            if get_tensor(pre + "embeddings.patch_embedding.weight") \
                    is not None:
                params["vision"] = self.vision.load_hf_weights(
                    get_tensor, pre)
                break
        params["projector"] = self.projector.load_hf_weights(
            get_tensor, "mm_projector.")
        nl = get_tensor("image_newline")
        if nl is not None:
            params["image_newline"] = jnp.asarray(
                np.asarray(nl)).astype(jnp.float32)
        return params

    # ---- multimodal -------------------------------------------------------
    def preprocess_images(self, images):
        """Accept {"pixel_values": [n_tiles, 3, S, S], "image_size":
        (w, h)} dicts (anyres) or bare [3, S, S] arrays (single tile)."""
        out = []
        for im in images:
            if isinstance(im, dict):
                out.append({"pixel_values": np.asarray(
                    im["pixel_values"], np.float32),
                    "image_size": tuple(im["image_size"])})
            else:
                a = np.asarray(im, np.float32)
                if a.ndim == 3:
                    a = a[None]
                out.append({"pixel_values": a, "image_size": None})
        return out

    def encode_tiles(self, params, pixel_values: jax.Array) -> jax.Array:
        """[n_tiles, 3, S, S] -> [n_tiles, num_queries, H]."""
        feats = self.vision(params["vision"], pixel_values)
        return self.projector(params["projector"], feats)

    def _select_best_resolution(self, orig_hw: Tuple[int, int]):
        """(orig_h, orig_w) -> best (height, width) pixel grid
        (reference select_best_resolution, lines 36-59)."""
        oh, ow = orig_hw
        best, br = None, None
        for ph, pw in self.possible_resolutions:
            scale = min(pw / ow, ph / oh)
            eff = min(int(ow * scale) * int(oh * scale), ow * oh)
            waste = pw * ph - eff
            if best is None or eff > best[0] or (eff == best[0]
                                                 and waste < best[1]):
                best, br = (eff, waste), (ph, pw)
        return br

    def _pack_anyres(self, params, feats: np.ndarray,
                     image_size) -> np.ndarray:
        """feats [n_tiles, q, H] -> packed rows [n_feat, H].

        image_size is (width, height) — HCX ordering (reference
        get_anyres_image_grid_shape line 92 / unpad_image line 62).
        """
        newline = np.asarray(params["image_newline"], np.float32)
        if feats.shape[0] == 1:
            f = feats[0]
            return np.concatenate([f, newline[None]], 0) if self.unpad \
                else f
        base, tiles = feats[0], feats[1:]
        side = int(self.num_queries ** 0.5)
        H = feats.shape[-1]
        ow, oh = image_size
        bh, bw = self._select_best_resolution((oh, ow))
        npw, nph = bw // self.grid_size, bh // self.grid_size
        assert nph * npw == tiles.shape[0], (
            f"{nph}x{npw} grid but {tiles.shape[0]} tiles")
        grid = tiles.reshape(nph, npw, side, side, H)
        if self.unpad:
            # [H, nph*side, npw*side]
            g = grid.transpose(4, 0, 2, 1, 3).reshape(
                H, nph * side, npw * side)
            ch, cw = g.shape[1:]
            if ow / oh > cw / ch:
                nh = int(oh * (cw / ow))
                pad = (ch - nh) // 2
                g = g[:, pad:ch - pad, :]
            else:
                nw = int(ow * (ch / oh))
                pad = (cw - nw) // 2
                g = g[:, :, pad:cw - pad]
            nl = np.broadcast_to(newline[:, None, None],
                                 (H, g.shape[1], 1))
            g = np.concatenate([g, nl], axis=2)
            flat = g.reshape(H, -1).T
        else:
            flat = grid.transpose(0, 2, 1, 3, 4).reshape(-1, H)
        return np.concatenate([base, flat], 0)

    def process_multimodal(self, params, token_ids: List[int], images):
        images = self.preprocess_images(images)
        packed = []
        for im in images:
            pv = jnp.asarray(im["pixel_values"])
            feats = np.asarray(
                self.encode_tiles(params, pv).astype(jnp.float32))
            if self.anyres and im["image_size"] is not None \
                    and feats.shape[0] > 1:
                packed.append(self._pack_anyres(params, feats,
                                                im["image_size"]))
            elif feats.shape[0] == 1:
                f = feats[0]
                if self.anyres and self.unpad:
                    f = np.concatenate(
                        [f, np.asarray(params["image_newline"],
                                       np.float32)[None]], 0)
                packed.append(f)
            else:   # video-style frame stack: flatten (reference line 975)
                packed.append(feats.reshape(-1, feats.shape[-1]))

        expanded: List[int] = []
        slots: List[Tuple[int, int]] = []
        img = 0
        for t in token_ids:
            if t == self.image_token_index:
                slots.append((len(expanded), packed[img].shape[0]))
                expanded.extend([self.image_token_index]
                                * packed[img].shape[0])
                img += 1
            else:
                expanded.append(int(t))
        assert img == len(images), (
            f"{img} image placeholders but {len(images)} images")
        # the sentinel may be out-of-vocab (vocab_size + 1) — clamp for the
        # embedding lookup; those rows are overwritten with image features
        ids = jnp.asarray(np.minimum(np.asarray(expanded, np.int64),
                                     self.cfg.vocab_size - 1).astype(
                                         np.int32))
        emb = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        for j, (pos, cnt) in enumerate(slots):
            emb[pos:pos + cnt] = packed[j]
        return expanded, emb
