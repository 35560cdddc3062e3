"""Pallas attention backend (TPU fast path).

The analog of the reference's `TrtllmAttention`
(`_torch/attention_backend/trtllm.py:1443`, dispatching to FMHA for context
and XQA/MMHA for generation).  Round 1: prefill uses the Pallas flash
attention kernel (`ops/flash_attention.py`); decode currently reuses the XLA
gather path (a dedicated scalar-prefetch paged kernel lands next —
`ops/paged_attention.py`).
"""

from __future__ import annotations

from typing import Tuple

import jax

from tensorrt_llm_tpu.attention_backend.interface import (
    AttentionBackend,
    AttentionMetadata,
    register_backend,
)
from tensorrt_llm_tpu.attention_backend.xla_backend import XlaAttention


@register_backend
class PallasAttention(XlaAttention):
    name = "pallas"
