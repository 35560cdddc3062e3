"""LoRA adapter loading + merging.

Counterpart of the reference's `lora_manager.py` (HF/NeMo adapter loading
:250,372) — round 1 supports HF PEFT checkpoints merged into the base weights
at load time (before quantization, so W4A16 bases stay quantized):

    W' = W + (alpha / r) * B @ A

Runtime multi-LoRA (the reference's PeftCacheManager + grouped LoRA GEMM,
`kernels/lora/`) lands in round 2 — it needs per-row adapter selection inside
the batched engine step.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from tensorrt_llm_tpu.utils import logger


@dataclass
class LoraAdapter:
    rank: int
    alpha: float
    # PEFT use_rslora: scaling = alpha / sqrt(r) instead of alpha / r
    use_rslora: bool = False
    # module path (HF naming, e.g. "model.layers.0.self_attn.q_proj")
    #   -> (A [r, in], B [out, r])
    weights: Dict[str, tuple] = field(default_factory=dict)
    # DoRA (weight-decomposed LoRA): per-output-row magnitude vectors
    # (reference lora_manager.py norm_dora_magnitude / doraScaling.cu);
    # module path -> m [out]
    magnitudes: Dict[str, "np.ndarray"] = field(default_factory=dict)

    @property
    def scaling(self) -> float:
        return self.module_scaling(self.rank)

    def module_scaling(self, module_rank: int) -> float:
        """Per-MODULE scaling: PEFT rank_pattern gives modules their own
        rank (visible as A.shape[0]); scaling by the adapter-global r
        would mis-weight those deltas."""
        r = max(int(module_rank), 1)
        if self.use_rslora:
            return self.alpha / (r ** 0.5)
        return self.alpha / r

    @property
    def is_dora(self) -> bool:
        return bool(self.magnitudes)


def load_lora_adapter(path: str) -> LoraAdapter:
    """Load an HF PEFT adapter directory."""
    cfg_path = os.path.join(path, "adapter_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    tensors = {}
    st = os.path.join(path, "adapter_model.safetensors")
    if os.path.exists(st):
        from safetensors import safe_open
        with safe_open(st, framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    else:  # torch .bin fallback
        import torch
        bin_path = os.path.join(path, "adapter_model.bin")
        for k, v in torch.load(bin_path, map_location="cpu").items():
            tensors[k] = v.float().numpy()

    adapter = LoraAdapter(rank=cfg["r"],
                          alpha=cfg.get("lora_alpha", cfg["r"]),
                          use_rslora=bool(cfg.get("use_rslora", False)))
    pat = re.compile(r"^base_model\.model\.(.+)\.lora_(A|B)\.weight$")
    # DoRA (PEFT use_dora=True): per-module magnitude vectors
    mag_pat = re.compile(
        r"^base_model\.model\.(.+)\.lora_magnitude_vector(?:\.weight)?$")
    pairs: Dict[str, dict] = {}
    for name, arr in tensors.items():
        m = pat.match(name)
        if m:
            pairs.setdefault(m.group(1), {})[m.group(2)] = \
                np.asarray(arr, np.float32)
            continue
        m = mag_pat.match(name)
        if m:
            adapter.magnitudes[m.group(1)] = \
                np.asarray(arr, np.float32).reshape(-1)
    for mod, ab in pairs.items():
        if "A" in ab and "B" in ab:
            adapter.weights[mod] = (ab["A"], ab["B"])
    logger.info("loaded LoRA adapter: rank=%d alpha=%s modules=%d dora=%s",
                adapter.rank, adapter.alpha, len(adapter.weights),
                adapter.is_dora)
    return adapter


def merge_lora_into_state(get_tensor, adapter: LoraAdapter):
    """Wrap a checkpoint reader so targeted linear weights come back with the
    adapter delta merged in ([out, in] HF layout)."""
    def wrapped(name: str):
        arr = get_tensor(name)
        mod = name[:-len(".weight")] if name.endswith(".weight") else None
        if arr is not None and mod in adapter.weights:
            A, B = adapter.weights[mod]
            v = np.asarray(arr, np.float32) \
                + adapter.module_scaling(A.shape[0]) * (B @ A)
            m = adapter.magnitudes.get(mod)
            if m is not None:
                # DoRA: W' = m * V / ||V||_row (rows = output channels in
                # the HF [out, in] layout) — reference norm_dora_magnitude
                # (lora_manager.py:233)
                norm = np.linalg.norm(v, axis=1, keepdims=True)
                v = m[:, None] * v / np.maximum(norm, 1e-12)
            arr = v
        return arr
    return wrapped
