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
    backend: str = "xla",
) -> jax.Array:
    """Top-k token selection. Returns [B, K] int32 indices into each
    sequence's padded table space (invalid slots may appear when
    kv_len < K — the attention mask drops them)."""
    nb, _, bs, di = idx_cache.shape
    B = q_idx.shape[0]
    if backend.startswith("pallas"):
        scores = dsa_scores_pallas(
            q_idx, weights, idx_cache, block_tables, kv_lens,
            interpret=backend == "pallas_interpret")
        S = scores.shape[1]
    else:
        keys = idx_cache[block_tables][:, :, 0].reshape(B, -1, di)
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


# ------------------------------------------------- Pallas scoring kernel ----
#
# Decode-time indexer scoring is THE long-context HBM read (the latent
# attention that follows only touches index_topk tokens): stream indexer-key
# pages through double-buffered DMA exactly like the paged decode kernel
# (ops/paged_attention.py) instead of XLA's materialized [B, S, Di] gather.
# Top-k itself stays in XLA (sorting [B, S] f32 scores re-reads 4 B/token,
# 64x less than the 256 B/token key stream this kernel already paid).

def _dsa_score_kernel(
    # scalar prefetch
    bt_ref,       # [B, MB] int32 page ids
    kvlen_ref,    # [B] int32
    # inputs
    q_ref,        # [1, Hi, Di] VMEM
    w_ref,        # [B, Hi] f32 VMEM (full array: a (1, Hi) block violates
                  #   Mosaic's sublane-divisibility rule when B % 8 != 0 —
                  #   caught by the r5 on-chip compile sweep)
    k_hbm,        # [NB, 1, BS, Di] ANY/HBM
    # outputs
    s_out,        # [1, TS] f32
    # scratch
    k_buf,        # [2, TS, Di]
    k_sems,       # [2, PPT]
    *,
    tile_size: int,
    page_size: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    TS, BS = tile_size, page_size
    PPT = TS // BS
    kv_len = kvlen_ref[b]
    n_tiles = pl.cdiv(kv_len, TS)

    def tile_dma(tile, slot, wait):
        for p in range(PPT):
            page = bt_ref[b, tile * PPT + p]
            cp = pltpu.make_async_copy(
                k_hbm.at[page, 0],                    # [BS, Di]
                k_buf.at[slot, pl.ds(p * BS, BS), :],
                k_sems.at[slot, p],
            )
            cp.wait() if wait else cp.start()

    @pl.when(t == 0)
    def _first():
        tile_dma(0, 0, wait=False)

    @pl.when((t + 1 < n_tiles) & (t + 1 < pl.num_programs(1)))
    def _prefetch():
        tile_dma(t + 1, (t + 1) % 2, wait=False)

    @pl.when(t < n_tiles)
    def _compute():
        slot = t % 2
        tile_dma(t, slot, wait=True)
        q = q_ref[0].astype(jnp.bfloat16)                 # [Hi, Di]
        k = k_buf[slot]                                   # [TS, Di]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [Hi, TS]
        gated = jnp.maximum(logits, 0.0) * w_ref[b][:, None]
        scores = jnp.sum(gated, axis=0, keepdims=True)    # [1, TS]
        kv_pos = t * TS + jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)
        # the out block is 8 broadcast sublane rows (a 1-row block
        # violates Mosaic's sublane divisibility; the wrapper slices
        # row 0 of every group afterwards)
        s_out[:] = jnp.broadcast_to(
            jnp.where(kv_pos < kv_len, scores, NEG_INF), s_out.shape)

    @pl.when(t >= n_tiles)
    def _pad():
        s_out[:] = jnp.full_like(s_out, NEG_INF)


@functools.partial(jax.jit, static_argnames=("tile_size", "interpret"))
def dsa_scores_pallas(
    q_idx: jax.Array,          # [B, Hi, Di]
    weights: jax.Array,        # [B, Hi] f32
    idx_cache: jax.Array,      # [NB, 1, BS, Di]
    block_tables: jax.Array,   # [B, MB] int32
    kv_lens: jax.Array,        # [B] int32
    tile_size: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Paged-streaming indexer scores. Returns [B, MB*BS] f32 (invalid
    positions at NEG_INF)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, _, bs, di = idx_cache.shape
    B, mb = block_tables.shape
    S = mb * bs
    # largest page-multiple tile that divides the padded length
    TS = min(tile_size, S)
    while S % TS or TS % bs:
        TS -= bs
    n_t = S // TS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, q_idx.shape[1], di), lambda b, t, *_: (b, 0, 0)),
            pl.BlockSpec((B, weights.shape[1]), lambda b, t, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, TS), lambda b, t, *_: (b, t)),
        scratch_shapes=[
            pltpu.VMEM((2, TS, di), idx_cache.dtype),
            pltpu.SemaphoreType.DMA((2, TS // bs)),
        ],
    )
    kernel = functools.partial(_dsa_score_kernel, tile_size=TS,
                               page_size=bs)
    out8 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8 * B, S), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, kv_lens, q_idx.astype(jnp.bfloat16),
      weights.astype(jnp.float32), idx_cache)
    # one broadcast 8-row group per batch row (see kernel comment)
    return out8[::8]


def dsa_prefill_mask(
    q_idx: jax.Array,          # [T, Hi, Di] (roped + rotated)
    weights: jax.Array,        # [T, Hi] f32 (pre-scaled)
    idx_cache: jax.Array,      # [NB, 1, BS, Di]
    block_table: jax.Array,    # [max_blocks] int32 (ONE sequence)
    kv_len: jax.Array,         # scalar
    q_offset: jax.Array,       # scalar position of q_idx[0]
    index_topk: int,
) -> jax.Array:
    """Per-query top-k visibility mask for chunked prefill (reference
    prefill indexer, dsa.py:1355-1423 fp8_mqa_logits + indexer_topk).
    Returns bool [T, S].

    Each query row keeps its ``index_topk`` highest-scoring causal keys
    (ties at the threshold stay visible — a superset never smaller than
    the reference's exact-k cut, and identical to dense attention whenever
    the causal span fits in index_topk).
    """
    nb, _, bs, di = idx_cache.shape
    T = q_idx.shape[0]
    keys = idx_cache[block_table][:, 0].reshape(-1, di)    # [S, Di]
    S = keys.shape[0]
    logits = jnp.einsum("thd,sd->ths", q_idx.astype(jnp.float32),
                        keys.astype(jnp.float32))
    scores = jnp.einsum("th,ths->ts", weights.astype(jnp.float32),
                        jax.nn.relu(logits))
    kv_pos = jnp.arange(S)[None, :]
    q_pos = q_offset + jnp.arange(T)[:, None]
    causal = (kv_pos <= q_pos) & (kv_pos < kv_len)
    scores = jnp.where(causal, scores, NEG_INF)
    k = min(index_topk, S)
    kth = jax.lax.top_k(scores, k)[0][:, -1:]              # [T, 1]
    return causal & (scores >= kth)
