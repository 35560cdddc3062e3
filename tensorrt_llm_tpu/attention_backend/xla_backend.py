"""XLA attention backend (fallback / CPU-test path).

The analog of the reference's `VanillaAttention`
(`_torch/attention_backend/vanilla.py`) — gather-based paged attention in
pure jnp.
"""

from __future__ import annotations

from typing import Tuple

import jax

from tensorrt_llm_tpu.attention_backend.interface import (
    AttentionBackend,
    AttentionMetadata,
    register_backend,
)
from tensorrt_llm_tpu.ops.attention_xla import (
    cyclic_prefill_xla,
    paged_decode_xla,
    paged_prefill_xla,
    tree_verify_attention_xla,
    write_kv_cache,
)


@register_backend
class XlaAttention(AttentionBackend):
    name = "xla"

    def __call__(self, q, k, v, k_cache, v_cache, meta: AttentionMetadata,
                 sinks=None) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if meta.pair_mask is not None and meta.mode == "prefill":
            # draft-tree verification: prefix read pre-write, chunk K/V from
            # the inputs, host-built tree mask for in-chunk visibility
            out = tree_verify_attention_xla(
                q, k_cache, v_cache, k, v,
                block_table=meta.block_tables[0],
                prefix_len=meta.kv_lens[0],
                positions=meta.positions,
                tree_mask=meta.pair_mask,
                scale=self.scale,
                cyclic=meta.cyclic,
                sliding_window=self.sliding_window,
                logit_cap=self.logit_cap,
                sinks=sinks,
                attention_chunk=self.attention_chunk,
                in_chunk_causal=meta.chunk_causal,
            )
            k_cache, v_cache = write_kv_cache(k_cache, v_cache, k, v,
                                              meta.slot_mapping)
            return out, k_cache, v_cache
        if meta.cyclic and meta.mode == "prefill":
            # VSWA ring prefill: attend BEFORE this chunk's writes land (the
            # chunk may evict prefix positions early query rows still need);
            # the chunk's own K/V come straight from the inputs
            out = cyclic_prefill_xla(
                q, k_cache, v_cache, k, v,
                block_table=meta.block_tables[0],
                kv_len=meta.kv_lens[0],
                q_offset=meta.q_offset,
                scale=self.scale,
                sliding_window=self.sliding_window,
                logit_cap=self.logit_cap,
                sinks=sinks,
                attention_chunk=self.attention_chunk,
            )
            k_cache, v_cache = write_kv_cache(k_cache, v_cache, k, v,
                                              meta.slot_mapping)
            return out, k_cache, v_cache
        k_cache, v_cache = write_kv_cache(k_cache, v_cache, k, v,
                                          meta.slot_mapping)
        if meta.mode == "prefill":
            out = paged_prefill_xla(
                q, k_cache, v_cache,
                block_table=meta.block_tables[0],
                kv_len=meta.kv_lens[0],
                q_offset=meta.q_offset,
                scale=self.scale,
                sliding_window=self.sliding_window,
                logit_cap=self.logit_cap,
                sinks=sinks,
                attention_chunk=self.attention_chunk,
            )
        else:
            out = paged_decode_xla(
                q, k_cache, v_cache,
                block_tables=meta.block_tables,
                kv_lens=meta.kv_lens,
                scale=self.scale,
                sliding_window=self.sliding_window,
                logit_cap=self.logit_cap,
                sinks=sinks,
                cyclic=meta.cyclic,
                attention_chunk=self.attention_chunk,
            )
        return out, k_cache, v_cache
