"""Sparse long-context decode backend (RocketKV-style block top-k).

TPU-native counterpart of the reference's sparse attention backends
(`_torch/attention_backend/sparse/rocket.py` RocketTrtllmAttention,
`sparse/dsa.py`): decode keeps a compressed per-page key summary (the "KT
cache"), scores every page of a sequence against the query through the
summaries (block_size x less HBM traffic than reading keys), and attends
over only the top-k pages plus forced sink/recent pages.

Design notes (TPU-first):
  * the KT pool is a third leaf in each layer's cache pytree
    ``[NB, Hkv, D]`` — engine donation/sharding/copy machinery treats it
    like any other pool leaf (block axis first);
  * selection + selective gather run inside the jitted step — top_k and
    take_along_axis lower to XLA gather/sort, static shapes throughout;
  * prefill stays dense (the reference's Rocket prefill sparsification is
    a later round; decode is where long-context HBM reads dominate).
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
    paged_prefill_xla,
    select_blocks,
    sparse_paged_decode_xla,
    update_kt_cache,
    write_kv_cache,
)


@register_backend
class SparseAttention(AttentionBackend):
    """Block-top-k sparse decode; dense prefill."""

    name = "sparse"
    # class-level config (specialized via make_sparse_backend)
    topk_blocks = 64
    sink_blocks = 1
    recent_blocks = 2

    def __call__(self, q, k, v, k_cache, v_cache, meta: AttentionMetadata,
                 sinks=None, kt_cache=None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        assert kt_cache is not None, \
            "sparse backend needs the KT summary pool (KVCacheConfig" \
            ".sparse_kt=True)"
        # tree-verify / custom-visibility prefills carry a pair mask the
        # plain paged prefill cannot honor — reject them outright (the
        # chunk_causal loophole admitted draft-tree rows whose mask was
        # then silently dropped)
        assert not (meta.mode == "prefill" and meta.pair_mask is not None), \
            "sparse backend does not support masked (tree/custom) prefill"
        # decode ignores window/chunk limits entirely — prefill honoring
        # them while decode leaks outside would silently diverge
        assert self.sliding_window is None and self.attention_chunk is None, \
            "sparse backend does not support sliding-window/chunked layers"
        k_cache, v_cache = write_kv_cache(k_cache, v_cache, k, v,
                                          meta.slot_mapping)
        kt_cache = update_kt_cache(kt_cache, k_cache, meta.slot_mapping)
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
            return out, k_cache, v_cache, kt_cache
        from tensorrt_llm_tpu.ops.attention_xla import pool_dims
        bs = pool_dims(k_cache, self.head_dim)[2]
        sel = select_blocks(q, kt_cache, meta.block_tables, meta.kv_lens,
                            bs, self.topk_blocks, self.sink_blocks,
                            self.recent_blocks)
        out = sparse_paged_decode_xla(
            q, k_cache, v_cache, meta.block_tables, sel, meta.kv_lens,
            scale=self.scale, logit_cap=self.logit_cap, sinks=sinks)
        return out, k_cache, v_cache, kt_cache


def make_sparse_backend(cfg: dict) -> type:
    """Specialize SparseAttention with per-model sparse config
    ({"topk_blocks", "sink_blocks", "recent_blocks"})."""
    return type("SparseAttentionCfg", (SparseAttention,), {
        "topk_blocks": int(cfg.get("topk_blocks", 64)),
        "sink_blocks": int(cfg.get("sink_blocks", 1)),
        "recent_blocks": int(cfg.get("recent_blocks", 2)),
    })
