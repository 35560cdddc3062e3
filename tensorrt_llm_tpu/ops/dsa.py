"""DSA (DeepSeek Sparse Attention) lightning-indexer ops.

TPU-native counterpart of the reference's DSA backend
(`_torch/attention_backend/sparse/dsa.py`: `Indexer`, `fp8_mqa_logits` /
`fp8_paged_mqa_logits` from DeepGEMM, `indexer_topk` thop ops): each MLA
layer carries a small per-token indexer key (``index_head_dim`` = 128
channels) in its own paged pool; at decode the indexer scores every
cached token

    score[t, s] = sum_h  w[t, h] * relu(q_idx[t, h] . k_idx[s])

(reference `Indexer.sparse_attn_indexer`, dsa.py:1328; weights carry the
``softmax_scale * n_heads**-0.5`` factor, dsa.py:908) and MLA attention
runs over only the top ``index_topk`` tokens.

TPU-first choices:
  * activations are Hadamard-rotated exactly as the reference
    (`rotate_activation`, dsa.py:68) but via an MXU matmul with the
    Sylvester matrix — at D=128 that is one [T,128]x[128,128] dot, far
    below DMA cost, instead of a butterfly network;
  * indexer keys stay bf16 (the reference's fp8+scale storage is a CUDA
    memory-format optimization; bf16 at 128 channels is already 4.5x
    smaller than the latent row it indexes);
  * selection + selective gather run inside the jitted step: top_k and
    take_along_axis lower to XLA sort/gather with static shapes.  When a
    sequence is shorter than ``index_topk`` the selected set covers every
    valid token, so sparse == dense attention exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.ops.attention_xla import NEG_INF


@functools.lru_cache(maxsize=8)
def _hadamard(n: int) -> np.ndarray:
    assert n & (n - 1) == 0, f"Hadamard dim must be a power of 2: {n}"
    h = np.ones((1, 1), np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def rotate_activation(x: jax.Array) -> jax.Array:
    """Scaled Hadamard transform over the trailing axis (reference
    dsa.py:68-83, scale = D**-0.5)."""
    n = x.shape[-1]
    hm = jnp.asarray(_hadamard(n) * (n ** -0.5)).astype(jnp.bfloat16)
    return jnp.einsum("...d,de->...e", x.astype(jnp.bfloat16), hm)


def write_indexer_cache(
    cache: jax.Array,         # [NB, 1, BS, Di]
    k_idx: jax.Array,         # [T, Di]
    slot_mapping: jax.Array,  # [T]
) -> jax.Array:
    from tensorrt_llm_tpu.ops.attention_xla import _scatter_pages
    nb, _, bs, _ = cache.shape
    return _scatter_pages(cache, k_idx[:, None, :].astype(cache.dtype),
                          slot_mapping, bs, nb)


def dsa_decode_select(
    q_idx: jax.Array,          # [B, Hi, Di] (roped + rotated)
    weights: jax.Array,        # [B, Hi] f32 (pre-scaled)
    idx_cache: jax.Array,      # [NB, 1, BS, Di]
    block_tables: jax.Array,   # [B, max_blocks] int32
    kv_lens: jax.Array,        # [B] int32
    index_topk: int,
) -> jax.Array:
    """Top-k token selection. Returns [B, K] int32 indices into each
    sequence's padded table space (invalid slots may appear when
    kv_len < K — the attention mask drops them)."""
    nb, _, bs, di = idx_cache.shape
    B = q_idx.shape[0]
    keys = idx_cache[block_tables][:, :, 0].reshape(B, -1, di)  # [B, S, Di]
    S = keys.shape[1]
    logits = jnp.einsum("bhd,bsd->bhs", q_idx.astype(jnp.float32),
                        keys.astype(jnp.float32))
    scores = jnp.einsum("bh,bhs->bs", weights.astype(jnp.float32),
                        jax.nn.relu(logits))
    valid = jnp.arange(S)[None, :] < kv_lens[:, None]
    scores = jnp.where(valid, scores, NEG_INF)
    k = min(index_topk, S)
    _, sel = jax.lax.top_k(scores, k)          # [B, K]
    return sel.astype(jnp.int32)


def mla_sparse_decode_xla(
    q_eff: jax.Array,          # [B, H, L+R]
    cache: jax.Array,          # [NB, 1, BS, L+R] latent pool
    block_tables: jax.Array,   # [B, max_blocks]
    kv_lens: jax.Array,        # [B]
    sel: jax.Array,            # [B, K] selected token indices
    scale: float,
    kv_lora_rank: int,
) -> jax.Array:
    """Absorbed MLA decode over only the selected latents.
    Returns [B, H, L]."""
    nb, _, bs, dk = cache.shape
    B, K = sel.shape
    page = sel // bs
    slot = sel % bs
    blk = jnp.take_along_axis(block_tables, page, axis=1)   # [B, K]
    lat = cache[blk, 0, slot]                               # [B, K, L+R]
    latf = lat.astype(jnp.float32)
    qf = q_eff.astype(jnp.float32) * scale
    scores = jnp.einsum("bhd,bkd->bhk", qf, latf)
    mask = sel < kv_lens[:, None]                           # [B, K]
    scores = jnp.where(mask[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhk,bkl->bhl", probs, latf[..., :kv_lora_rank])
    return out.astype(q_eff.dtype)
