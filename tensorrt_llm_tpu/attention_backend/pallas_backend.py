"""Pallas attention backend (TPU fast path).

The analog of the reference's `TrtllmAttention`
(`_torch/attention_backend/trtllm.py:1443`, dispatching to FMHA for context
and XQA/MMHA for generation):

  * decode — the Pallas scalar-prefetch paged kernel
    (`ops/paged_attention.py`) is the default.  Honest v5e measurements
    (cache mutated every iteration so the gather can't hoist out of the
    timing loop): at 8K context the kernel runs 1.35 ms vs XLA's
    materialized dynamic-gather at 2.25 ms (the gather also allocates the
    full padded-table intermediate, ~270 MB at MB=256), and the gap widens
    with table padding; at short context they are within ~15%.
    TLLM_PAGED_KERNEL=0 opts back to the XLA path.  Beware measuring the
    XLA path with a loop-invariant cache: XLA sometimes hoists the gather
    (reads >roofline) and sometimes lowers it pathologically (~3 s/call) —
    both artifacts.
  * prefill — Pallas flash kernel (FMHA analog) for the quadratic-memory-free
    path.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax

from tensorrt_llm_tpu.attention_backend.interface import (
    AttentionBackend,
    AttentionMetadata,
    register_backend,
)
from tensorrt_llm_tpu.attention_backend.xla_backend import XlaAttention
from tensorrt_llm_tpu.ops.attention_xla import write_kv_cache
from tensorrt_llm_tpu.ops.flash_prefill import flash_prefill_attention
from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention


@register_backend
class PallasAttention(XlaAttention):
    name = "pallas"

    # TLLM_PALLAS_INTERPRET=1 runs the kernels in Pallas interpret mode so
    # the REAL dispatch layer + kernels execute end-to-end on CPU (slow;
    # CI-grade integration coverage for the paths is_tpu_backend() hides)
    @staticmethod
    def _interp() -> bool:
        return os.environ.get("TLLM_PALLAS_INTERPRET") == "1"

    def __call__(self, q, k, v, k_cache, v_cache, meta: AttentionMetadata,
                 sinks=None) -> Tuple[jax.Array, jax.Array, jax.Array]:
        from tensorrt_llm_tpu.ops.attention_xla import pool_dims

        D = self.head_dim
        _, hkv, bs, _ = pool_dims(k_cache, D)
        # D % 128 == 0 pages DMA directly; smaller dims use the lane-packed
        # page view (r = 128 // D tokens per lane row), which needs D to
        # divide 128 and whole pages to be lane-aligned
        lane_ok = D % 128 == 0 or (128 % D == 0 and (bs * D) % 128 == 0)
        int8_ok = (
            isinstance(k_cache, tuple)
            and meta.mode in ("decode", "prefill")
            and D % 128 == 0 and not meta.cyclic
            and self.attention_chunk is None
            and os.environ.get("TLLM_PAGED_INT8", "1") == "1")
        if (isinstance(k_cache, tuple) and not int8_ok) \
                or not lane_ok \
                or meta.cyclic or self.attention_chunk is not None \
                or meta.pair_mask is not None:
            # INT8 KV pools run the dedicated int8 kernels (half the page
            # bytes, scales folded into logits/probabilities); odd head
            # dims use the XLA dequant-at-gather path.
            # cyclic VSWA rings: kernels don't carry ring positions yet.
            return super().__call__(q, k, v, k_cache, v_cache, meta,
                                    sinks=sinks)
        if meta.mode == "prefill" and os.environ.get("TLLM_FLASH_PREFILL", "1") == "1":
            k_cache, v_cache = write_kv_cache(k_cache, v_cache, k, v,
                                              meta.slot_mapping)
            out = flash_prefill_attention(
                q, k_cache, v_cache,
                block_table=meta.block_tables[0],
                kv_len=meta.kv_lens[0],
                q_offset=meta.q_offset,
                scale=self.scale,
                sliding_window=self.sliding_window,
                logit_cap=self.logit_cap,
                sinks=sinks,
                interpret=self._interp(),
            )
            return out, k_cache, v_cache
        if meta.mode != "decode" \
                or os.environ.get("TLLM_PAGED_KERNEL", "1") == "0":
            return super().__call__(q, k, v, k_cache, v_cache, meta,
                                    sinks=sinks)
        k_cache, v_cache = write_kv_cache(k_cache, v_cache, k, v,
                                          meta.slot_mapping)
        out = paged_decode_attention(
            q, k_cache, v_cache,
            block_tables=meta.block_tables,
            kv_lens=meta.kv_lens,
            scale=self.scale,
            sliding_window=self.sliding_window,
            logit_cap=self.logit_cap,
            sinks=sinks,
            interpret=self._interp(),
        )
        return out, k_cache, v_cache
