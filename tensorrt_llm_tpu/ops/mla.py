"""Multi-head Latent Attention (MLA) ops over a paged latent cache.

TPU-native counterpart of the reference's MLA kernel stack
(`cpp/tensorrt_llm/kernels/mlaKernels.h`, flashMLA, `thop/mlaPreprocessOp.cpp`,
`dsv3RopeOp.cpp`; Python `_torch/modules/attention.py:1217` MLA): DeepSeek
attention compresses KV into a per-token latent of ``kv_lora_rank`` channels
plus a shared ``qk_rope_head_dim`` rope key, and only that latent is cached
(the reference caches the same "compressed KV + k_pe" layout).

We run the *absorbed* formulation for both prefill and decode: the per-head
up-projections W_uk/W_uv are folded into the query and output sides, so
attention itself is MQA with K dim ``L+R`` and V dim ``L``:

    q_eff  = [q_nope @ W_uk, rope(q_pe)]          # [T, H, L+R]
    scores = q_eff · cache[s]                     # cache[s] = [c_kv, k_pe]
    out    = (softmax(scores) · cache[:, :L]) @ W_uv

Cache layout matches the standard pools: ``[num_blocks, 1, block_size, L+R]``
(one "head": the latent is shared across heads — that sharing is MLA's whole
memory win, 576 channels/token vs H*2*D).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.ops.attention_xla import NEG_INF, _scatter_pages


def write_latent_cache(
    cache: jax.Array,         # [NB, 1, BS, L+R]
    latents: jax.Array,       # [T, L+R]  (c_kv ‖ roped k_pe)
    slot_mapping: jax.Array,  # [T] flat slots; OOB dropped
) -> jax.Array:
    nb, _, bs, _ = cache.shape
    return _scatter_pages(cache, latents[:, None, :], slot_mapping, bs, nb)


def mla_prefill_xla(
    q_eff: jax.Array,        # [T, H, L+R] (absorbed nope ‖ roped pe)
    cache: jax.Array,        # [NB, 1, BS, L+R]
    block_table: jax.Array,  # [max_blocks] int32
    kv_len: jax.Array,       # scalar: total tokens incl. this chunk
    q_offset: jax.Array,     # scalar: position of q_eff[0]
    scale: float,
    kv_lora_rank: int,
    extra_mask: "jax.Array" = None,   # [T, S] bool — DSA top-k restriction
) -> jax.Array:
    """Chunked-prefill MLA for one sequence. Returns [T, H, L] latent out."""
    T = q_eff.shape[0]
    kv = cache[block_table][:, 0].reshape(-1, cache.shape[-1])  # [S, L+R]
    S = kv.shape[0]
    kvf = kv.astype(jnp.float32)
    qf = q_eff.astype(jnp.float32) * scale
    scores = jnp.einsum("thd,sd->hts", qf, kvf)
    kv_pos = jnp.arange(S)[None, :]
    q_pos = q_offset + jnp.arange(T)[:, None]
    mask = (kv_pos <= q_pos) & (kv_pos < kv_len)
    if extra_mask is not None:
        mask = mask & extra_mask
    scores = jnp.where(mask[None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hts,sl->thl", probs, kvf[:, :kv_lora_rank])
    return out.astype(q_eff.dtype)


def mla_decode_xla(
    q_eff: jax.Array,         # [B, H, L+R]
    cache: jax.Array,         # [NB, 1, BS, L+R]
    block_tables: jax.Array,  # [B, max_blocks] int32
    kv_lens: jax.Array,       # [B] int32 (incl. the new token)
    scale: float,
    kv_lora_rank: int,
) -> jax.Array:
    """Batched decode MLA over the paged latent cache. Returns [B, H, L]."""
    nb, _, bs, dk = cache.shape
    B = q_eff.shape[0]
    kv = cache[block_tables][:, :, 0].reshape(B, -1, dk)  # [B, S, L+R]
    S = kv.shape[1]
    kvf = kv.astype(jnp.float32)
    qf = q_eff.astype(jnp.float32) * scale
    scores = jnp.einsum("bhd,bsd->bhs", qf, kvf)
    mask = jnp.arange(S)[None, None, :] < kv_lens[:, None, None]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhs,bsl->bhl", probs, kvf[..., :kv_lora_rank])
    return out.astype(q_eff.dtype)
