"""Pallas MLA decode kernel over the paged latent cache.

TPU-native counterpart of the reference's flashMLA / XQA-MLA decode path
(`cpp/tensorrt_llm/kernels/mlaKernels.h`, flashmla integration in
`_torch/attention_backend/trtllm.py` MLA branches): absorbed-formulation
decode is MQA whose single "KV head" is the 576-channel latent
(kv_lora_rank L + qk_rope_head_dim R), shared by all query heads.

That shape is a gift on TPU and this kernel exploits all of it:

  * ONE pooled operand — V is the first L channels of K, so each tile
    needs a single DMA stream (half the HBM traffic of split-pool MHA);
  * all H query heads form one MXU row block (H x DK @ DK x TS): no
    per-kv-head loop, the systolic array runs full;
  * block tables + kv lens ride as scalar-prefetch operands so page DMAs
    are issued from dynamic ids into a double-buffered VMEM scratch while
    the previous tile computes (same structure as ops/paged_attention.py);
  * online-softmax state (m, l, acc[H, L]) carried across the kv-tile grid
    dimension; tiles past kv_len are skipped (no DMA, no compute).

The kernel returns the LATENT output [B, H, L]; the caller applies the
absorbed W_uv exactly as in the XLA path (ops/mla.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _mla_decode_kernel(
    # scalar prefetch
    bt_ref,       # [B, MB] int32 page ids
    kvlen_ref,    # [B] int32
    # inputs
    q_ref,        # [1, H, DK] VMEM (this sequence's absorbed query)
    kv_hbm,       # [NB, BS, DK] ANY/HBM (latent pool, head dim squeezed)
    # outputs
    o_ref,        # [1, H, L] VMEM
    # scratch
    kv_buf,       # [2, TS, DK] VMEM
    m_buf,        # [H, 128] f32
    l_buf,        # [H, 128] f32
    acc_buf,      # [H, L] f32
    sems,         # DMA sems [2, PPT]
    *,
    tile_size: int,
    page_size: int,
    scale: float,
    lora_rank: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    TS, BS, L = tile_size, page_size, lora_rank
    PPT = TS // BS
    kv_len = kvlen_ref[b]
    n_tiles = pl.cdiv(kv_len, TS)  # dynamic

    def tile_dma(tile, slot, p):
        page = bt_ref[b, tile * PPT + p]
        return pltpu.make_async_copy(
            kv_hbm.at[page],                        # [BS, DK]
            kv_buf.at[slot, pl.ds(p * BS, BS), :],
            sems.at[slot, p],
        )

    def start_tile(tile, slot):
        for p in range(PPT):
            tile_dma(tile, slot, p).start()

    def wait_tile(tile, slot):
        for p in range(PPT):
            tile_dma(tile, slot, p).wait()

    @pl.when(t == 0)
    def _init():
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)
        acc_buf[:] = jnp.zeros_like(acc_buf)
        start_tile(0, 0)

    # prefetch next tile while this one computes
    @pl.when(t + 1 < n_tiles)
    def _prefetch():
        start_tile(t + 1, (t + 1) % 2)

    @pl.when(t < n_tiles)
    def _compute():
        slot = t % 2
        wait_tile(t, slot)

        # all H heads vs the shared latent: one [H, DK] x [DK, TS] matmul
        q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
        kv = kv_buf[slot]                                   # [TS, DK]
        s = jax.lax.dot_general(
            q, kv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [H, TS]

        kv_pos = t * TS + jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)
        s = jnp.where(kv_pos < kv_len, s, NEG_INF)

        m_prev = m_buf[:, :1]                               # [H, 1]
        l_prev = l_buf[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p_ = jnp.exp(s - m_new)                             # [H, TS]
        alpha = jnp.exp(m_prev - m_new)
        l_buf[:, :1] = l_prev * alpha + jnp.sum(p_, axis=1, keepdims=True)
        m_buf[:, :1] = m_new
        # V = the first L latent channels of the SAME tile buffer
        pv = jnp.dot(p_.astype(jnp.bfloat16), kv[:, :L],
                     preferred_element_type=jnp.float32)    # [H, L]
        acc_buf[:] = acc_buf[:] * alpha + pv

    @pl.when(t == n_t - 1)
    def _finalize():
        l = l_buf[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_buf[:] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "kv_lora_rank", "tile_size", "interpret"),
)
def mla_decode_pallas(
    q_eff: jax.Array,         # [B, H, L+R] (absorbed nope ‖ roped pe)
    cache: jax.Array,         # [NB, 1, BS, L+R] latent pool
    block_tables: jax.Array,  # [B, MB] int32
    kv_lens: jax.Array,       # [B] int32 (incl. the new token)
    scale: float,
    kv_lora_rank: int,
    tile_size: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Batched decode MLA over the paged latent cache. Returns [B, H, L]."""
    B, H, DK = q_eff.shape
    NB, _, BS, _ = cache.shape
    MB = block_tables.shape[1]
    TS = min(tile_size, MB * BS)
    TS = max(BS, (TS // BS) * BS)
    while (MB * BS) % TS:
        TS -= BS
    PPT = TS // BS
    n_tiles = (MB * BS) // TS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, H, DK), lambda b, t, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, kv_lora_rank),
                               lambda b, t, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TS, DK), cache.dtype),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, kv_lora_rank), jnp.float32),
            pltpu.SemaphoreType.DMA((2, PPT)),
        ],
    )
    kernel = functools.partial(
        _mla_decode_kernel,
        tile_size=TS,
        page_size=BS,
        scale=scale,
        lora_rank=kv_lora_rank,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, kv_lora_rank), q_eff.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, kv_lens, q_eff, cache[:, 0])


def _mla_prefill_kernel(
    # scalar prefetch
    bt_ref,       # [1, MB] int32
    meta_ref,     # [2] int32: (kv_len, q_offset)
    # inputs
    q_ref,        # [TQ, H, DK] VMEM
    kv_hbm,       # [NB, BS, DK] ANY
    # outputs
    o_ref,        # [TQ, H, L] VMEM
    # scratch
    kv_buf,       # [2, TS, DK]
    m_buf,        # [TQ*H, 128] f32
    l_buf,
    acc_buf,      # [TQ*H, L] f32
    sems,         # [2, PPT]
    *,
    tile_size: int,
    page_size: int,
    scale: float,
    lora_rank: int,
):
    qt = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    TS, BS, L = tile_size, page_size, lora_rank
    PPT = TS // BS
    TQ, H, DK = q_ref.shape
    R = TQ * H

    kv_len = meta_ref[0]
    q_off = meta_ref[1]
    # last kv position this q tile may attend (causal), bounded by kv_len
    q_end = jnp.minimum(q_off + (qt + 1) * TQ, kv_len)
    n_need = pl.cdiv(q_end, TS)

    def tile_dma(tile, slot, p):
        page = bt_ref[0, tile * PPT + p]
        return pltpu.make_async_copy(
            kv_hbm.at[page], kv_buf.at[slot, pl.ds(p * BS, BS), :],
            sems.at[slot, p])

    @pl.when(t == 0)
    def _init():
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)
        acc_buf[:] = jnp.zeros_like(acc_buf)
        for p in range(PPT):
            tile_dma(0, 0, p).start()

    @pl.when(t + 1 < n_need)
    def _prefetch():
        for p in range(PPT):
            tile_dma(t + 1, (t + 1) % 2, p).start()

    @pl.when(t < n_need)
    def _compute():
        slot = t % 2
        for p in range(PPT):
            tile_dma(t, slot, p).wait()

        # the whole q tile x all H heads is ONE MXU row block vs the
        # shared latent: [TQ*H, DK] @ [DK, TS]
        q = q_ref[...].reshape(R, DK).astype(jnp.bfloat16)
        kv = kv_buf[slot]                                   # [TS, DK]
        s = jax.lax.dot_general(
            q, kv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [R, TS]

        row = jax.lax.broadcasted_iota(jnp.int32, (R, TS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, TS), 1)
        q_pos = q_off + qt * TQ + row // H
        kv_pos = t * TS + col
        s = jnp.where((kv_pos <= q_pos) & (kv_pos < kv_len), s, NEG_INF)

        m_p = m_buf[:, :1]
        l_p = l_buf[:, :1]
        m_c = jnp.max(s, axis=1, keepdims=True)
        m_n = jnp.maximum(m_p, m_c)
        p_ = jnp.exp(s - m_n)
        alpha = jnp.exp(m_p - m_n)
        l_buf[:, :1] = l_p * alpha + jnp.sum(p_, axis=1, keepdims=True)
        m_buf[:, :1] = m_n
        pv = jnp.dot(p_.astype(jnp.bfloat16), kv[:, :L],
                     preferred_element_type=jnp.float32)    # [R, L]
        acc_buf[:] = acc_buf[:] * alpha + pv

    @pl.when(t == n_t - 1)
    def _finalize():
        l = l_buf[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[...] = (acc_buf[:] / safe_l).reshape(TQ, H, L).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "kv_lora_rank", "tile_size", "q_tile",
                     "interpret"),
)
def mla_prefill_pallas(
    q_eff: jax.Array,        # [T, H, DK] (one sequence's chunk)
    cache: jax.Array,        # [NB, 1, BS, DK] latent pool
    block_table: jax.Array,  # [MB] int32
    kv_len: jax.Array,       # scalar int32 (prefix + chunk)
    q_offset: jax.Array,     # scalar int32 (position of q_eff[0])
    scale: float,
    kv_lora_rank: int,
    tile_size: int = 512,   # device-tuned: 110 TF/s vs 104 at 256 (v5e)
    q_tile: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash-style chunked-prefill MLA. Returns [T, H, L] latent out."""
    T, H, DK = q_eff.shape
    NB, _, BS, _ = cache.shape
    MB = block_table.shape[0]

    TS = min(tile_size, MB * BS)
    TS = max(BS, (TS // BS) * BS)
    while (MB * BS) % TS:
        TS -= BS
    PPT = TS // BS
    n_kv_tiles = (MB * BS) // TS

    TQ = q_tile or max(1, min(T, 1024 // H))
    while T % TQ:
        TQ //= 2
    TQ = max(TQ, 1)
    n_q_tiles = T // TQ
    R = TQ * H

    meta = jnp.stack([kv_len.astype(jnp.int32), q_offset.astype(jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_q_tiles, n_kv_tiles),
        in_specs=[
            pl.BlockSpec((TQ, H, DK), lambda qt, t, *_: (qt, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TQ, H, kv_lora_rank),
                               lambda qt, t, *_: (qt, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, TS, DK), cache.dtype),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, kv_lora_rank), jnp.float32),
            pltpu.SemaphoreType.DMA((2, PPT)),
        ],
    )
    kernel = functools.partial(
        _mla_prefill_kernel,
        tile_size=TS,
        page_size=BS,
        scale=scale,
        lora_rank=kv_lora_rank,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, H, kv_lora_rank), q_eff.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_table.reshape(1, MB), meta, q_eff, cache[:, 0])
