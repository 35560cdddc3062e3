"""XLA (non-Pallas) attention implementations + paged KV cache ops.

These are the reference/fallback implementations of the framework's attention
backend (the analog of the reference's `VanillaAttention`,
`_torch/attention_backend/vanilla.py`): used on CPU in tests, for odd shapes,
and as the numerical baseline the Pallas kernels are validated against.

The paged layout matches `runtime/kv_cache_manager.py`: per layer,
``[num_blocks, block_size, num_kv_heads, head_dim]``; a token's flat *slot* is
``block_id * block_size + offset``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def pool_dims(cache, head_dim: int) -> Tuple[int, int, int, int]:
    """Logical (NB, Hkv, BS, D) of a pool that may be lane-packed
    ([NB, Hkv, BS*D//128, 128] when D < 128 — see
    `KVCacheManager.allocate_pools`)."""
    c = cache[0] if isinstance(cache, tuple) else cache
    nb, h, b, d = c.shape
    if d != head_dim:
        b = b * d // head_dim
    return nb, h, b, head_dim


def unpack_pages(g: jax.Array, head_dim: int) -> jax.Array:
    """[.., RP, 128] lane-packed page rows -> [.., BS, D] token rows (a
    row-major reshape: token order is preserved by the packing)."""
    if g.shape[-1] == head_dim:
        return g
    r = g.shape[-1] // head_dim
    return g.reshape(*g.shape[:-2], g.shape[-2] * r, head_dim)


def quantize_kv_token(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int8 quantization of [T, H, D]."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # [T, H]
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _scatter_pages(cache, new, slot_mapping, bs, nb):
    # Scatter on a flat [NB*H*BS, D] view: a 4-D scatter indexed on dims
    # (0, 2) has update-window dims (H, D), and XLA's layout assignment then
    # wants the pool physically [NB, BS, H, D] — materializing TWO full-pool
    # relayout copies per pool per call (one into the scatter, one back out
    # for the Pallas kernels' default-layout operands; see the r3 e2e OOM,
    # 6.92 GB of pool copies).  On the flat view the window dim is only D —
    # already minor — so the scatter is layout-neutral and the reshapes are
    # bitcasts.
    H = cache.shape[1]
    pages = slot_mapping // bs
    offs = slot_mapping % bs
    # OOB slots (padding rows / ring dedup use the PAD_SLOT sentinel)
    # remap to page 0, which is RESERVED in every pool: the block
    # allocator's free list starts at 1, and VSWA rings shift their slab
    # space by one block (local_block_table).  An in-bounds scribble into
    # a page no block table references.  mode="drop" alone is not enough:
    # OOB drop-scatters fault the real TPU runtime asynchronously (r5:
    # every k>1 warmup with sentinel tables wedged the device; the next
    # fetch died FAILED_PRECONDITION — tpu_return_logs/r5_benchmin_*).
    oob = slot_mapping >= nb * bs
    pages = jnp.where(oob, 0, pages)
    offs = jnp.where(oob, 0, offs)
    head_ids = jnp.arange(H, dtype=slot_mapping.dtype)[None, :]
    if cache.ndim == 3:                      # per-(token, head) scales
        rows = (pages[:, None] * H + head_ids) * bs + offs[:, None]
        return cache.reshape(-1).at[rows.reshape(-1)] \
            .set(new.astype(cache.dtype).reshape(-1), mode="drop") \
            .reshape(cache.shape)
    D = new.shape[-1]
    L = cache.shape[-1]
    if L == D:
        rows = (pages[:, None] * H + head_ids) * bs + offs[:, None]  # [T, H]
        return cache.reshape(-1, D).at[rows.reshape(-1)] \
            .set(new.astype(cache.dtype).reshape(-1, D), mode="drop") \
            .reshape(cache.shape)
    # Lane-packed pool: token (page, off) lives in packed row off // r at
    # lanes [(off % r) * D, +D).  Zero the target lanes (scatter-multiply)
    # then scatter-add the lane-shifted values — both combiners compose
    # correctly when several tokens land in the same packed row.
    r = L // D
    rp = cache.shape[2]                      # packed rows per (page, head)
    rows = (pages[:, None] * H + head_ids) * rp + (offs // r)[:, None]
    sub = (offs % r).astype(jnp.int32)       # [T]
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    writes = (lane >= sub[:, None] * D) & (lane < (sub[:, None] + 1) * D)
    keep = jnp.where(writes, 0, 1).astype(cache.dtype)          # [T, L]
    padded = jnp.pad(new.astype(cache.dtype),
                     ((0, 0), (0, 0), (0, L - D)))              # [T, H, L]
    shifted = jax.vmap(jnp.roll, in_axes=(0, 0, None))(
        padded, sub * D, -1)                                    # [T, H, L]
    T = new.shape[0]
    keep_u = jnp.broadcast_to(keep[:, None, :], (T, H, L)).reshape(-1, L)
    flat = cache.reshape(-1, L)
    flat = flat.at[rows.reshape(-1)].multiply(keep_u, mode="drop")
    flat = flat.at[rows.reshape(-1)].add(shifted.reshape(-1, L),
                                         mode="drop")
    return flat.reshape(cache.shape)


def write_kv_cache(
    k_cache,              # [NB, H, BS, D] array OR (int8 data, [NB,H,BS] scale)
    v_cache,
    k_new: jax.Array,     # [T, H, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [T] int32 flat slots; OOB slots are dropped
):
    """Append new KV; supports BF16 pools and INT8+per-token-scale pools
    (reference `KvCacheDataType::INT8`, unfusedAttentionKernels.h:63-69)."""
    if isinstance(k_cache, tuple):
        (kd, ks), (vd, vs) = k_cache, v_cache
        nb, h, bs, d = pool_dims(kd, k_new.shape[-1])
        kq, ksc = quantize_kv_token(k_new)
        vq, vsc = quantize_kv_token(v_new)
        kd = _scatter_pages(kd, kq, slot_mapping, bs, nb)
        vd = _scatter_pages(vd, vq, slot_mapping, bs, nb)
        ks = _scatter_pages(ks, ksc, slot_mapping, bs, nb)
        vs = _scatter_pages(vs, vsc, slot_mapping, bs, nb)
        return (kd, ks), (vd, vs)
    nb, h, bs, d = pool_dims(k_cache, k_new.shape[-1])
    k_cache = _scatter_pages(k_cache, k_new, slot_mapping, bs, nb)
    v_cache = _scatter_pages(v_cache, v_new, slot_mapping, bs, nb)
    return k_cache, v_cache


def gather_dequant(cache, idx, out_dtype=jnp.bfloat16, head_dim=None):
    """cache[idx] with int8->float dequant fused after the (half-size)
    gather; lane-packed pools unpack AFTER the gather (cheap: only the
    gathered pages relayout, never the pool)."""
    if isinstance(cache, tuple):
        data, scale = cache
        g = data[idx]
        if head_dim is not None:
            g = unpack_pages(g, head_dim)
        g = g.astype(jnp.float32) * scale[idx][..., None]
        return g.astype(out_dtype)
    g = cache[idx]
    return g if head_dim is None else unpack_pages(g, head_dim)


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[.., Hkv, D] -> [.., Hkv*n_rep, D]"""
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=-2)


def _masked_softmax(scores: jax.Array, mask: jax.Array,
                    sinks: Optional[jax.Array] = None) -> jax.Array:
    """Softmax over the last axis; `sinks` adds a per-head learned logit to
    the denominator only (GPT-OSS attention sinks — reference: sink handling
    in the attention kernels / HF GptOss eager_attention_forward)."""
    scores = jnp.where(mask, scores, NEG_INF)
    if sinks is None:
        return jax.nn.softmax(scores, axis=-1)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sinks)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sinks - m)
    return p / denom


def mha_xla(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [S, Hkv, D]
    v: jax.Array,  # [S, Hkv, D]
    scale: float,
    causal: bool = True,
    q_offset: int | jax.Array = 0,
    kv_len: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,   # [Hq] per-head sink logits
    kv_positions: Optional[jax.Array] = None,  # [S] per-slot positions
    attention_chunk: Optional[int] = None,
    q_positions: Optional[jax.Array] = None,   # [T] per-row positions
    pair_mask: Optional[jax.Array] = None,     # [T, S] extra bool mask
) -> jax.Array:
    """Dense attention for one sequence.

    q_offset: absolute position of q[0] (for chunked prefill, query token i
      sits at position q_offset + i and attends kv positions <= that).
    kv_len: number of valid kv tokens (<= S); rest masked.
    kv_positions: explicit position per kv slot (cyclic VSWA rings);
      negative positions are masked out.
    q_positions: explicit per-row query positions (tree verification rows
      share depth positions); overrides q_offset+arange.
    pair_mask: additional [T, S] mask ANDed in (tree ancestor masks).
    """
    T, Hq, D = q.shape
    S, Hkv, _ = k.shape
    n_rep = Hq // Hkv
    qf = (q.astype(jnp.float32) * scale).reshape(T, Hkv, n_rep, D)
    scores = jnp.einsum("thgd,shd->hgts", qf, k.astype(jnp.float32))
    if logit_cap:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    if kv_positions is not None:
        kv_pos = kv_positions[None, :]
    else:
        kv_pos = jnp.arange(S)[None, :]
    if q_positions is not None:
        q_pos = q_positions[:, None]
    else:
        q_pos = q_offset + jnp.arange(T)[:, None]
    mask = kv_pos >= 0
    if causal:
        mask &= kv_pos <= q_pos
    if kv_len is not None:
        mask &= kv_pos < kv_len
    if sliding_window is not None:
        mask &= kv_pos > q_pos - sliding_window
    if attention_chunk is not None:
        # Llama4 chunked attention: same-chunk keys only
        mask &= (kv_pos // attention_chunk) == (q_pos // attention_chunk)
    if pair_mask is not None:
        mask &= pair_mask
    sink_r = (sinks.reshape(Hkv, n_rep, 1, 1).astype(jnp.float32)
              if sinks is not None else None)
    probs = _masked_softmax(scores, mask[None, None], sink_r)
    out = jnp.einsum("hgts,shd->thgd", probs, v.astype(jnp.float32))
    return out.reshape(T, Hq, D).astype(q.dtype)


def paged_prefill_xla(
    q: jax.Array,            # [T, Hq, D] (current chunk, rope applied)
    k_cache: jax.Array,      # [NB, Hkv, BS, D] (chunk already written)
    v_cache: jax.Array,
    block_table: jax.Array,  # [max_blocks] int32
    kv_len: jax.Array,       # scalar: total tokens incl. this chunk
    q_offset: jax.Array,     # scalar: position of q[0]
    scale: float,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    attention_chunk: Optional[int] = None,
) -> jax.Array:
    """Chunked-prefill attention for one sequence against its paged KV."""
    nb, h, bs, d = pool_dims(k_cache, q.shape[-1])
    # [MB, H, BS, D] -> [MB*BS, H, D]
    k = gather_dequant(k_cache, block_table, q.dtype, d).transpose(0, 2, 1, 3).reshape(-1, h, d)
    v = gather_dequant(v_cache, block_table, q.dtype, d).transpose(0, 2, 1, 3).reshape(-1, h, d)
    return mha_xla(q, k, v, scale, causal=True, q_offset=q_offset,
                   kv_len=kv_len, sliding_window=sliding_window,
                   logit_cap=logit_cap, sinks=sinks,
                   attention_chunk=attention_chunk)


def cyclic_prefill_xla(
    q: jax.Array,            # [T, Hq, D] (current chunk, rope applied)
    k_cache: jax.Array,      # ring pool BEFORE this chunk's writes
    v_cache: jax.Array,
    k_new: jax.Array,        # [T, Hkv, D] this chunk's keys/values
    v_new: jax.Array,
    block_table: jax.Array,  # [R] fixed ring table
    kv_len: jax.Array,       # scalar: total tokens incl. this chunk
    q_offset: jax.Array,     # scalar: position of q[0] == prefix length
    scale: float,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    attention_chunk: Optional[int] = None,
) -> jax.Array:
    """Chunked prefill against a VSWA cyclic ring.

    The ring is read BEFORE the chunk's writes land (the chunk may evict
    prefix positions that early query rows still need), and the chunk's own
    K/V come straight from the inputs — so the ring only has to hold
    ``window + one block`` tokens, independent of chunk size.  Ring slot s
    holds prefix position s + floor((prefix-1-s)/P)*P (negative => empty)."""
    nb, h, bs, d = pool_dims(k_cache, q.shape[-1])
    kp = gather_dequant(k_cache, block_table, q.dtype, d) \
        .transpose(0, 2, 1, 3).reshape(-1, h, d)
    vp = gather_dequant(v_cache, block_table, q.dtype, d) \
        .transpose(0, 2, 1, 3).reshape(-1, h, d)
    P = block_table.shape[0] * bs
    s = jnp.arange(P, dtype=jnp.int32)
    prefix_pos = s + ((q_offset - 1 - s) // P) * P
    T = q.shape[0]
    chunk_pos = q_offset + jnp.arange(T, dtype=jnp.int32)
    k = jnp.concatenate([kp, k_new.astype(kp.dtype)], axis=0)
    v = jnp.concatenate([vp, v_new.astype(vp.dtype)], axis=0)
    kv_positions = jnp.concatenate([prefix_pos, chunk_pos])
    return mha_xla(q, k, v, scale, causal=True, q_offset=q_offset,
                   kv_len=kv_len, sliding_window=sliding_window,
                   logit_cap=logit_cap, sinks=sinks,
                   kv_positions=kv_positions,
                   attention_chunk=attention_chunk)


def paged_decode_xla(
    q: jax.Array,             # [B, Hq, D] (one new token per sequence)
    k_cache: jax.Array,       # [NB, Hkv, BS, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks] int32
    kv_lens: jax.Array,       # [B] int32 (incl. the new token)
    scale: float,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,   # [Hq]
    cyclic: bool = False,
    attention_chunk: Optional[int] = None,
) -> jax.Array:
    """Batched decode attention over paged KV.

    GQA is expressed as a grouped einsum ('g' = query heads per KV head) so
    the gathered KV is never materialized per query head.
    cyclic: tables are fixed VSWA rings (see paged_prefill_xla).
    """
    nb, hkv, bs, d = pool_dims(k_cache, q.shape[-1])
    B, Hq, _ = q.shape
    n_rep = Hq // hkv

    k = gather_dequant(k_cache, block_tables, q.dtype, d)  # [B, MB, Hkv, BS, D]
    v = gather_dequant(v_cache, block_tables, q.dtype, d)
    S = block_tables.shape[1] * bs
    k = k.transpose(0, 1, 3, 2, 4).reshape(B, S, hkv, d)
    v = v.transpose(0, 1, 3, 2, 4).reshape(B, S, hkv, d)

    qf = (q.astype(jnp.float32) * scale).reshape(B, hkv, n_rep, d)
    scores = jnp.einsum("bhgd,bshd->bhgs", qf, k.astype(jnp.float32))
    if logit_cap:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    if cyclic:
        s = jnp.arange(S, dtype=jnp.int32)[None, :]
        L = kv_lens[:, None]
        kv_pos = (s + ((L - 1 - s) // S) * S)[:, None, None, :]  # [B,1,1,S]
        mask = kv_pos >= 0
    else:
        kv_pos = jnp.arange(S)[None, None, None, :]
        mask = jnp.ones((), bool)
    mask &= kv_pos < kv_lens[:, None, None, None]
    if sliding_window is not None:
        mask &= kv_pos >= (kv_lens[:, None, None, None] - sliding_window)
    if attention_chunk is not None:
        # the query sits at position kv_len-1; same-chunk keys only
        q_pos = kv_lens[:, None, None, None] - 1
        mask &= kv_pos >= (q_pos // attention_chunk) * attention_chunk
    sink_r = (sinks.reshape(1, hkv, n_rep, 1).astype(jnp.float32)
              if sinks is not None else None)
    probs = _masked_softmax(scores, mask, sink_r)
    out = jnp.einsum("bhgs,bshd->bhgd", probs, v.astype(jnp.float32))
    return out.reshape(B, Hq, d).astype(q.dtype)


def tree_verify_attention_xla(
    q: jax.Array,            # [T, Hq, D] (pending-commit rows + tree rows)
    k_cache: jax.Array,      # paged pool (or VSWA ring) BEFORE chunk writes
    v_cache: jax.Array,
    k_new: jax.Array,        # [T, Hkv, D] this chunk's keys/values
    v_new: jax.Array,
    block_table: jax.Array,  # [MB] int32 (full table or ring)
    prefix_len: jax.Array,   # scalar: committed tokens already in the cache
    positions: jax.Array,    # [T] per-row positions (tree depths share one)
    tree_mask: jax.Array,    # [T, T] in-chunk visibility (ancestors etc.)
    scale: float,
    cyclic: bool = False,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    attention_chunk: Optional[int] = None,
    in_chunk_causal: bool = True,
) -> jax.Array:
    """Draft-tree verification attention (reference: packed-mask tree
    kernels, kernels/speculativeDecoding/ + convertSpecDecodingMaskToPacked-
    MaskOp): the cache prefix is read BEFORE this chunk's writes, the chunk's
    own K/V come from the inputs, and in-chunk visibility is the host-built
    tree mask (committed rows causal, tree rows see their ancestor chain).
    Tree rows carry pad slots so their KV never lands in the cache."""
    nb, h, bs, d = pool_dims(k_cache, q.shape[-1])
    kp = gather_dequant(k_cache, block_table, q.dtype, d) \
        .transpose(0, 2, 1, 3).reshape(-1, h, d)
    vp = gather_dequant(v_cache, block_table, q.dtype, d) \
        .transpose(0, 2, 1, 3).reshape(-1, h, d)
    S = block_table.shape[0] * bs
    s = jnp.arange(S, dtype=jnp.int32)
    if cyclic:
        prefix_pos = s + ((prefix_len - 1 - s) // S) * S
    else:
        prefix_pos = jnp.where(s < prefix_len, s, -1)
    T = q.shape[0]
    k = jnp.concatenate([kp, k_new.astype(kp.dtype)], axis=0)
    v = jnp.concatenate([vp, v_new.astype(vp.dtype)], axis=0)
    kv_positions = jnp.concatenate([prefix_pos, positions])
    pair = jnp.concatenate(
        [jnp.ones((T, S), bool), tree_mask.astype(bool)], axis=1)
    # in_chunk_causal=False: visibility comes ENTIRELY from the host-built
    # mask (Gemma3-VL bidirectional image spans widen past causal); the
    # prefix stays fully visible (its positions precede the chunk)
    return mha_xla(q, k, v, scale, causal=in_chunk_causal,
                   kv_len=None, sliding_window=sliding_window,
                   logit_cap=logit_cap, sinks=sinks,
                   kv_positions=kv_positions, q_positions=positions,
                   attention_chunk=attention_chunk, pair_mask=pair)


def _partial_mha(q, k, v, kv_pos, q_pos, scale, sliding_window=None,
                 logit_cap=None, attention_chunk=None):
    """Flash-style partial attention stats for cross-device combine
    (helix CP): returns (o_unnormalized [.., Hq, D] f32, l [.., Hq] f32,
    m [.., Hq] f32).  Fully-masked rows yield m = -inf, l = 0, o = 0.

    Shapes: prefill q [T, Hq, D] with shared k/v [S, Hkv, D],
    kv_pos [T-broadcastable, S], q_pos [T, 1]; decode q [B, Hq, D] with
    per-row k/v [B, S, Hkv, D], kv_pos [B, S], q_pos [B, 1]."""
    *lead, Hq, D = q.shape
    Hkv = k.shape[-2]
    n_rep = Hq // Hkv
    qf = (q.astype(jnp.float32) * scale).reshape(*lead, Hkv, n_rep, D)
    if k.ndim == 3:   # prefill: shared keys
        scores = jnp.einsum("thgd,shd->thgs", qf, k.astype(jnp.float32))
    else:             # decode: per-sequence keys
        scores = jnp.einsum("bhgd,bshd->bhgs", qf, k.astype(jnp.float32))
    if logit_cap:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    mask = (kv_pos >= 0) & (kv_pos <= q_pos)
    if sliding_window is not None:
        mask &= kv_pos > q_pos - sliding_window
    if attention_chunk is not None:
        mask &= (kv_pos // attention_chunk) == (q_pos // attention_chunk)
    # mask broadcasts to [rows, S]; insert head/group axes for the scores
    mask = jnp.broadcast_to(mask, (q.shape[0], k.shape[-3]))
    mask = mask[:, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1)                           # [.., Hkv, g]
    p = jnp.where(mask, jnp.exp(scores - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("...hgs,...shd->...hgd", p, v.astype(jnp.float32)) \
        if k.ndim == 4 else jnp.einsum("thgs,shd->thgd", p,
                                       v.astype(jnp.float32))
    return (o.reshape(*lead, Hq, D), l.reshape(*lead, Hq),
            m.reshape(*lead, Hq))


def helix_block_positions(S: int, bs: int, cp_rank, cp_size: int):
    """Global position of each local flat slot under block-cyclic placement
    (global block g lives on rank g % cp; local block j = global j*cp+r)."""
    s = jnp.arange(S, dtype=jnp.int32)
    return (s // bs * cp_size + cp_rank) * bs + s % bs


def helix_partial_prefill_xla(
    q, k_cache, v_cache, block_table, kv_len, positions, cp_rank,
    cp_size: int, scale, sliding_window=None, logit_cap=None,
    attention_chunk=None):
    """One sequence's chunk against this rank's KV shard (chunk rows already
    written to their owner ranks)."""
    nb, h, bs, d = pool_dims(k_cache, q.shape[-1])
    k = gather_dequant(k_cache, block_table, q.dtype, d) \
        .transpose(0, 2, 1, 3).reshape(-1, h, d)
    v = gather_dequant(v_cache, block_table, q.dtype, d) \
        .transpose(0, 2, 1, 3).reshape(-1, h, d)
    S = k.shape[0]
    pos = helix_block_positions(S, bs, cp_rank, cp_size)
    pos = jnp.where(pos < kv_len, pos, -1)
    return _partial_mha(q, k, v, pos[None, :], positions[:, None], scale,
                        sliding_window, logit_cap, attention_chunk)


def helix_partial_decode_xla(
    q, k_cache, v_cache, block_tables, kv_lens, cp_rank, cp_size: int,
    scale, sliding_window=None, logit_cap=None, attention_chunk=None):
    """Batched decode against this rank's KV shards."""
    nb, h, bs, d = pool_dims(k_cache, q.shape[-1])
    B = q.shape[0]
    k = gather_dequant(k_cache, block_tables, q.dtype, d)  # [B, MBl, H, BS, D]
    v = gather_dequant(v_cache, block_tables, q.dtype, d)
    S = block_tables.shape[1] * bs
    k = k.transpose(0, 1, 3, 2, 4).reshape(B, S, h, d)
    v = v.transpose(0, 1, 3, 2, 4).reshape(B, S, h, d)
    pos = helix_block_positions(S, bs, cp_rank, cp_size)[None, :]
    pos = jnp.where(pos < kv_lens[:, None], pos, -1)     # [B, S]
    q_pos = (kv_lens - 1)[:, None]                       # [B, 1]
    return _partial_mha(q, k, v, pos, q_pos, scale, sliding_window,
                        logit_cap, attention_chunk)


def star_local_prefill_xla(q, k, v, positions, n_valid, scale,
                           logit_cap=None, sinks=None):
    """Star-attention phase 1: LOCAL causal attention over this rank's
    [anchor; chunk] rows — no cross-rank communication (reference star
    attention context phase, attention_backend/star_flashinfer.py; paper
    arXiv:2411.17116).  positions are the rows' global positions; rows at
    index >= n_valid are padding (excluded as keys, garbage as queries).
    sinks: phase 1's softmax is purely local, so the sink logit simply
    joins the local denominator."""
    T = q.shape[0]
    valid = jnp.arange(T, dtype=jnp.int32) < n_valid
    kv_pos = jnp.where(valid, positions, -1)
    o, l, m = _partial_mha(q, k, v, kv_pos[None, :], positions[:, None],
                           scale, None, logit_cap, None)
    if sinks is not None:
        l = l + jnp.exp(sinks.astype(l.dtype) - m)
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def star_partial_decode_xla(q, k_cache, v_cache, block_tables, local_lens,
                            scale, logit_cap=None):
    """Star-attention phase 2 partials: batched decode against this rank's
    CONTIGUOUS KV chunk (every cached token precedes the query, so only
    valid-row masking applies); stats combine across "cp" via
    helix_combine."""
    nb, h, bs, d = pool_dims(k_cache, q.shape[-1])
    B = q.shape[0]
    k = gather_dequant(k_cache, block_tables, q.dtype, d)  # [B, MBl, H, BS, D]
    v = gather_dequant(v_cache, block_tables, q.dtype, d)
    S = block_tables.shape[1] * bs
    k = k.transpose(0, 1, 3, 2, 4).reshape(B, S, h, d)
    v = v.transpose(0, 1, 3, 2, 4).reshape(B, S, h, d)
    pos = jnp.where(jnp.arange(S, dtype=jnp.int32)[None, :]
                    < local_lens[:, None], 0, -1)        # [B, S]
    q_pos = jnp.zeros((B, 1), jnp.int32)
    return _partial_mha(q, k, v, pos, q_pos, scale, None, logit_cap, None)


def helix_combine(o, l, m, axis_name: str = "cp", sinks=None):
    """Combine per-rank partial attention stats over the mesh axis:
    out = sum_r exp(m_r - M) o_r / sum_r exp(m_r - M) l_r.
    sinks [H]: attention-sink logits (GPT-OSS) join the GLOBAL softmax
    denominator once — added after the cross-rank max/sum."""
    M = jax.lax.pmax(m, axis_name)
    w = jnp.where(jnp.isfinite(m), jnp.exp(m - M), 0.0)
    o = jax.lax.psum(o * w[..., None], axis_name)
    l = jax.lax.psum(l * w, axis_name)
    if sinks is not None:
        # stats are [..., H]; broadcast the per-head sink against them
        l = l + jnp.exp(sinks.astype(l.dtype) - M)
    return (o / jnp.maximum(l, 1e-30)[..., None])


# ---- sparse (RocketKV-style block-top-k) decode --------------------------------
def update_kt_cache(kt_cache: jax.Array, k_cache: jax.Array,
                    slot_mapping: jax.Array) -> jax.Array:
    """Refresh per-block key summaries for blocks the step just wrote.

    kt_cache [NB, Hkv, D] holds the mean key of each page — the compressed
    "KT cache" the block scorer reads instead of full keys (the TPU analog
    of the reference's Rocket KT cache,
    `_torch/attention_backend/sparse/rocket.py` triton_rocket_update_kt_*;
    one summary row per page = block_size x less HBM read at scoring time).
    Must run AFTER write_kv_cache so summaries include this step's keys.
    """
    assert not isinstance(k_cache, tuple), \
        "sparse KT summaries require unquantized KV pools"
    d = kt_cache.shape[-1]
    nb, hkv, bs, _ = pool_dims(k_cache, d)
    bids = slot_mapping // bs                       # [T]; OOB stays OOB
    safe = jnp.clip(bids, 0, nb - 1)
    summ = gather_dequant(k_cache, safe, kt_cache.dtype, d).mean(axis=2)
    bids = jnp.where(slot_mapping >= nb * bs, nb, bids)
    return kt_cache.at[bids].set(summ.astype(kt_cache.dtype), mode="drop")


def select_blocks(q: jax.Array, kt_cache: jax.Array,
                  block_tables: jax.Array, kv_lens: jax.Array,
                  block_size: int, topk: int, sink_blocks: int = 1,
                  recent_blocks: int = 2) -> jax.Array:
    """Score each sequence's pages against the query via the KT summaries
    and return the indices (into the block table, ascending) of the top-k
    pages.  Sink pages (prefix) and recent pages are always kept — the
    Rocket/SnapKV recipe."""
    B, Hq, D = q.shape
    MB = block_tables.shape[1]
    kt = jnp.take(kt_cache, block_tables, axis=0)   # [B, MB, Hkv, D]
    hkv = kt.shape[2]
    g = Hq // hkv
    qf = q.astype(jnp.float32).reshape(B, hkv, g, D)
    s = jnp.einsum("bhgd,bmhd->bhgm", qf, kt.astype(jnp.float32))
    s = jnp.max(s, axis=2).sum(axis=1)              # [B, MB]
    n_valid = (kv_lens[:, None] + block_size - 1) // block_size
    idx = jnp.arange(MB, dtype=jnp.int32)[None, :]
    s = jnp.where(idx < n_valid, s, -jnp.inf)
    force = (idx < sink_blocks) | (idx >= n_valid - recent_blocks)
    s = jnp.where(force & (idx < n_valid), jnp.inf, s)
    k = min(topk, MB)
    sel = jax.lax.top_k(s, k)[1]                    # [B, k]
    return jnp.sort(sel, axis=1).astype(jnp.int32)


def sparse_paged_decode_xla(
    q: jax.Array,             # [B, Hq, D]
    k_cache: jax.Array,       # [NB, Hkv, BS, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, MB]
    sel_idx: jax.Array,       # [B, K] selected block INDICES into the table
    kv_lens: jax.Array,       # [B]
    scale: float,
    logit_cap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode attention over only the selected pages.  Token positions are
    reconstructed from sel_idx (page index * block_size + offset) so causal
    validity is exact; unselected pages are simply never gathered — the
    HBM saving sparsity exists for."""
    B, Hq, _ = q.shape
    nb, hkv, bs, d = pool_dims(k_cache, q.shape[-1])
    n_rep = Hq // hkv
    sel_tables = jnp.take_along_axis(block_tables, sel_idx, axis=1)  # [B, K]
    k = gather_dequant(k_cache, sel_tables, q.dtype, d)  # [B, K, Hkv, BS, D]
    v = gather_dequant(v_cache, sel_tables, q.dtype, d)
    K = sel_idx.shape[1]
    S = K * bs
    k = k.transpose(0, 1, 3, 2, 4).reshape(B, S, hkv, d)
    v = v.transpose(0, 1, 3, 2, 4).reshape(B, S, hkv, d)
    qf = (q.astype(jnp.float32) * scale).reshape(B, hkv, n_rep, d)
    scores = jnp.einsum("bhgd,bshd->bhgs", qf, k.astype(jnp.float32))
    if logit_cap:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    kv_pos = (sel_idx[:, :, None] * bs
              + jnp.arange(bs, dtype=jnp.int32)[None, None, :]
              ).reshape(B, S)[:, None, None, :]     # [B, 1, 1, S]
    mask = kv_pos < kv_lens[:, None, None, None]
    sink_r = (sinks.reshape(1, hkv, n_rep, 1).astype(jnp.float32)
              if sinks is not None else None)
    probs = _masked_softmax(scores, mask, sink_r)
    out = jnp.einsum("bhgs,bshd->bhgd", probs, v.astype(jnp.float32))
    return out.reshape(B, Hq, d).astype(q.dtype)
