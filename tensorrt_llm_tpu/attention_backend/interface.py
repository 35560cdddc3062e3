"""Attention backend abstraction.

Mirrors the reference's `_torch/attention_backend/interface.py`
(`AttentionBackend` :644, `AttentionMetadata` :54) re-designed for JAX: the
metadata is a pytree of *static-shaped* device arrays prepared once per engine
step (the analog of the reference's block-offset tensors / kv_lens built in
`trtllm.py:628`), and the backend is a pure function so the whole step jits.

Two execution modes per step, like the reference's enqueueContext /
enqueueGeneration split (`common/attentionOp.h:206,237`):
  * "prefill"  — one sequence's chunk of T tokens vs its paged KV
  * "decode"   — B sequences, one token each, batched paged attention
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AttentionMetadata:
    """Per-step attention inputs (device arrays; static shapes per bucket)."""

    # [T] absolute position of each input token (for RoPE + causal masking)
    positions: jax.Array = None
    # [T] flat KV slot (block_id * block_size + offset); OOB => dropped
    slot_mapping: jax.Array = None
    # decode: [B, max_blocks]; prefill: [1, max_blocks]
    block_tables: jax.Array = None
    # [B] valid kv length per sequence (including tokens written this step)
    kv_lens: jax.Array = None
    # prefill only: scalar position of the first query token (chunked prefill)
    q_offset: jax.Array = None
    # slot index per sequence for slot-addressed state (SSM/Mamba layers);
    # decode: [B], prefill: [1] (reference MambaCacheManager seq slots)
    seq_slots: jax.Array = None
    # per-row LoRA adapter slot (0 = base model) for runtime multi-LoRA
    lora_ids: jax.Array = None
    # VSWA (separate per-window pools): sliding layers' cyclic-ring inputs;
    # None => sliding layers share the global pools (mask-only windows)
    local_slot_mapping: jax.Array = None
    local_block_tables: jax.Array = None
    # draft-tree verification: [T, T] in-chunk visibility (tree rows see
    # their ancestor chain; committed rows are causal); rows with pad slots
    # never write the cache.  kv_lens[0] is then the COMMITTED prefix length.
    pair_mask: jax.Array = None
    # Qwen2-VL multimodal 3D rope: [3, T] (temporal, height, width)
    # positions for the prefill rows; None => 1-D rope from `positions`
    mrope_positions: jax.Array = None

    # static (not traced): jax.tree_util.register_dataclass metadata
    mode: str = dataclasses.field(default="decode", metadata={"static": True})
    # pair-mask prefill: False => in-chunk visibility comes ONLY from
    # pair_mask (Gemma3-VL bidirectional image spans)
    chunk_causal: bool = dataclasses.field(default=True,
                                           metadata={"static": True})
    # set on the meta handed to a sliding layer when its KV lives in a
    # cyclic ring: slot s holds position s + floor((kv_len-1-s)/P)*P,
    # P = block_tables.shape[-1] * block_size
    cyclic: bool = dataclasses.field(default=False, metadata={"static": True})

    def __post_init__(self):
        assert self.mode in ("prefill", "decode")

    def for_sliding_layer(self) -> "AttentionMetadata":
        """The view a sliding layer should attend with: ring tables when
        separate window pools are active, the global ones otherwise."""
        if self.local_block_tables is None:
            return self
        return dataclasses.replace(
            self, slot_mapping=self.local_slot_mapping,
            block_tables=self.local_block_tables, cyclic=True)


class AttentionBackend:
    """Base: write new KV into the paged cache, then attend."""

    name = "base"

    def __init__(self, num_heads: int, num_kv_heads: int, head_dim: int,
                 scale: float, sliding_window: Optional[int] = None,
                 logit_cap: Optional[float] = None,
                 attention_chunk: Optional[int] = None):
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.scale = scale
        self.sliding_window = sliding_window
        self.logit_cap = logit_cap
        # Llama4 chunked attention: kv_pos // C == q_pos // C
        self.attention_chunk = attention_chunk

    def __call__(
        self,
        q: jax.Array,          # [T, Hq, D]
        k: jax.Array,          # [T, Hkv, D]
        v: jax.Array,          # [T, Hkv, D]
        k_cache: jax.Array,    # [NB, BS, Hkv, D]
        v_cache: jax.Array,
        meta: AttentionMetadata,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        raise NotImplementedError


_BACKENDS = {}


def register_backend(cls):
    _BACKENDS[cls.name] = cls
    return cls


def get_attention_backend(name: str = "auto"):
    # populate registry
    import tensorrt_llm_tpu.attention_backend.xla_backend  # noqa: F401
    import tensorrt_llm_tpu.attention_backend.pallas_backend  # noqa: F401
    import tensorrt_llm_tpu.attention_backend.sparse_backend  # noqa: F401
    if name == "auto":
        from tensorrt_llm_tpu.utils import is_tpu_backend
        name = "pallas" if is_tpu_backend() else "xla"
    return _BACKENDS[name]
