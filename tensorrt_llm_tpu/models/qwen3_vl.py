"""Qwen3-VL vision-language models (dense + MoE LM backbones).

Counterpart of the reference's `_torch/models/modeling_qwen3vl.py` /
`modeling_qwen3vl_moe.py`: a Qwen3 language model (per-head q/k RMSNorm)
with the INTERLEAVED multimodal rope (T/H/W frequency channels interleave
by stride 3 — `ops/rope.apply_mrope(interleaved=True)`), fed by the
Qwen3 vision tower whose DeepStack taps are injected into the first N
decoder layers.  The deepstack features ride the fused prompt embeddings
as N extra feature blocks of width hidden_size (zeros at text rows), so
the chunked-prefill path needs no new step plumbing."""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from tensorrt_llm_tpu.models.modeling_utils import (
    ModelConfig,
    register_auto_model,
)
from tensorrt_llm_tpu.models.qwen2_vl import (
    Qwen2VLForConditionalGeneration,
    build_mrope_positions,
)
from tensorrt_llm_tpu.models.vision.qwen3_vit import Qwen3VisionTower


@register_auto_model("Qwen3VLForConditionalGeneration")
class Qwen3VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    def __init__(self, cfg: ModelConfig):
        cfg.qk_norm = True                 # Qwen3 LM
        cfg.attention_bias = False
        vc = cfg.extra.get("vision_config") or {}
        cfg.deepstack_layers = len(vc.get("deepstack_visual_indexes") or ())
        # skip the Qwen2VL __init__ (it forces attention_bias True)
        ModelConfig_rope = cfg.rope
        assert ModelConfig_rope.mrope_sections, \
            "Qwen3-VL needs rope_scaling={'mrope_section': ..., " \
            "'mrope_interleaved': true}"
        from tensorrt_llm_tpu.models.modeling_utils import (
            DecoderModelForCausalLM)
        DecoderModelForCausalLM.__init__(self, cfg)
        self.image_token_index = (cfg.extra.get("image_token_id")
                                  or cfg.extra.get("image_token_index")
                                  or 151655)
        self.vision = self._make_vision(vc, cfg)

    def _make_vision(self, vc, cfg):
        return Qwen3VisionTower(
            embed_dim=vc.get("hidden_size", 1152),
            depth=vc.get("depth", 27),
            num_heads=vc.get("num_heads", 16),
            out_hidden=vc.get("out_hidden_size", cfg.hidden_size),
            intermediate=vc.get("intermediate_size", 4304),
            num_position_embeddings=vc.get("num_position_embeddings", 2304),
            patch_size=vc.get("patch_size", 16),
            temporal_patch=vc.get("temporal_patch_size", 2),
            in_channels=vc.get("in_channels", 3),
            spatial_merge=vc.get("spatial_merge_size", 2),
            deepstack_indexes=vc.get("deepstack_visual_indexes") or (),
            dtype=cfg.dtype,
        )

    def process_multimodal(self, params, token_ids: List[int], images):
        """Returns (expanded ids, fused [P, (1+n_ds)*H] embeddings,
        {"mrope_positions", "mrope_delta"}) — deepstack taps appended as
        extra feature blocks, zero at text rows."""
        import jax.numpy as jnp
        m2 = self.vision.merge ** 2
        grids = [g for _, g in images]
        n_tok = [t * h * w // m2 for t, h, w in grids]
        expanded: List[int] = []
        slots = []
        img = 0
        for t in token_ids:
            if t == self.image_token_index:
                slots.append((len(expanded), n_tok[img]))
                expanded.extend([self.image_token_index] * n_tok[img])
                img += 1
            else:
                expanded.append(int(t))
        assert img == len(images), (
            f"{img} image placeholders but {len(images)} images")

        ids = jnp.asarray(np.asarray(expanded, np.int32))
        H = self.cfg.hidden_size
        n_ds = self.cfg.deepstack_layers
        emb = np.zeros((len(expanded), (1 + n_ds) * H), np.float32)
        emb[:, :H] = np.array(
            self.embedding(params["embedding"], ids).astype(jnp.float32))
        if images:
            patches = jnp.asarray(np.concatenate([p for p, _ in images]))
            feats, ds = self.vision(params["vision"], patches, grids)
            feats = np.asarray(feats.astype(jnp.float32))
            ds = [np.asarray(d.astype(jnp.float32)) for d in ds]
            off = 0
            for (pos, cnt) in slots:
                emb[pos:pos + cnt, :H] = feats[off:off + cnt]
                for i in range(n_ds):
                    emb[pos:pos + cnt, (1 + i) * H:(2 + i) * H] = \
                        ds[i][off:off + cnt]
                off += cnt
        mrope, delta = build_mrope_positions(
            expanded, self.image_token_index, grids, self.vision.merge)
        return expanded, emb, {"mrope_positions": mrope,
                               "mrope_delta": int(delta)}


@register_auto_model("Qwen3VLMoeForConditionalGeneration")
class Qwen3VLMoeForConditionalGeneration(Qwen3VLForConditionalGeneration):
    """Qwen3-VL with the Qwen3-MoE language backbone (renormalized top-k
    softmax routing, no shared expert) — the vision/deepstack stack is
    identical.  HF stores the experts PACKED (`mlp.experts.gate_up_proj`
    [E, H, 2I] and `down_proj` [E, I, H]) rather than per-expert."""

    def __init__(self, cfg: ModelConfig):
        cfg.norm_topk_prob = True
        super().__init__(cfg)

    def _load_mlp(self, layer, get_tensor, pre, t):
        import jax.numpy as jnp
        from tensorrt_llm_tpu.layers.moe import MoE

        gu = (get_tensor(pre + "mlp.experts.gate_up_proj")
              if isinstance(layer.mlp, MoE) else None)
        if gu is None:
            return super()._load_mlp(layer, get_tensor, pre, t)
        gu = jnp.asarray(np.asarray(gu), jnp.float32)       # [E, H, 2I]
        down = jnp.asarray(np.asarray(
            get_tensor(pre + "mlp.experts.down_proj")), jnp.float32)
        half = gu.shape[-1] // 2
        return layer.mlp.from_float(
            t(pre + "mlp.gate.weight"), gu[..., :half], gu[..., half:],
            down)
