"""Quantization algorithm taxonomy.

TPU-native analog of the reference's `tensorrt_llm/quantization/mode.py`
(`QuantAlgo` enum, reference mode.py:23-48; KV algos mode.py:52) — trimmed to
the algorithms that map onto TPU hardware (no NVFP4: TPU MXU consumes bf16/int8;
4-bit weights are dequantized in-kernel).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional


class QuantAlgo(str, enum.Enum):
    """Weight/activation quantization algorithms."""

    # Weight-only (activation bf16) — the north-star family.
    W4A16 = "W4A16"                  # per-group int4 weights, symmetric
    W4A16_AWQ = "W4A16_AWQ"          # per-group int4, AWQ scales (+zeros)
    W4A16_GPTQ = "W4A16_GPTQ"        # per-group int4, GPTQ (zeros)
    W8A16 = "W8A16"                  # per-channel int8 weights
    # int4 weights + dynamic per-token int8 activations (reference
    # W4A8_AWQ; the TPU version rides the int8x int8 MXU instead of fp8)
    W4A8_AWQ = "W4A8_AWQ"
    # Activation+weight int8 (SmoothQuant-style).
    W8A8_SQ_PER_CHANNEL = "W8A8_SQ_PER_CHANNEL"
    # FP8 (on TPU: stored fp8, compute bf16 after upcast; v5p+ native paths TBD)
    FP8 = "FP8"
    FP8_PER_CHANNEL_PER_TOKEN = "FP8_PER_CHANNEL_PER_TOKEN"
    NO_QUANT = "NO_QUANT"


class KvCacheQuantAlgo(str, enum.Enum):
    NONE = "NONE"
    INT8 = "INT8"
    FP8 = "FP8"


WEIGHT_ONLY_W4 = (QuantAlgo.W4A16, QuantAlgo.W4A16_AWQ, QuantAlgo.W4A16_GPTQ)


@dataclass
class QuantConfig:
    """Quantization configuration attached to a model.

    Mirrors the role of the reference's `QuantConfig`
    (tensorrt_llm/quantization/__init__.py + llmapi), TPU-first fields only.
    """

    quant_algo: QuantAlgo = QuantAlgo.NO_QUANT
    kv_cache_quant_algo: KvCacheQuantAlgo = KvCacheQuantAlgo.NONE
    group_size: int = 128
    has_zero_point: bool = False
    # Module name substrings excluded from quantization (e.g. lm_head).
    exclude_modules: tuple = field(default_factory=lambda: ("lm_head", "embed"))
    # Checkpoint carries qweight/qzeros/scales tensors (HF AWQ/GPTQ); the
    # weight loader ingests them exactly instead of re-quantizing floats
    # (reference: _torch/modules/linear.py:1618-1692).
    pre_quantized: bool = False
    ckpt_format: Optional[str] = None   # "awq" | "gptq"
    ckpt_v2: bool = False               # gptq_v2 zeros convention
    # self-quantization calibration: per-group clip-ratio search minimizing
    # reconstruction error (quantization/calibrate.py; the built-in analog
    # of the reference's ModelOpt calibration, quantize_by_modelopt.py:114)
    clip_search: bool = False

    @property
    def is_weight_only_w4(self) -> bool:
        return self.quant_algo in WEIGHT_ONLY_W4

    def excludes(self, name: str) -> bool:
        return any(pat in name for pat in self.exclude_modules)
