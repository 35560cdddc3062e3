"""Pallas flash attention for (chunked) prefill over paged KV.

TPU-native replacement for the reference's context FMHA
(`cpp/.../kernels/contextFusedMultiHeadAttention/`, `FusedMHARunnerV2`):
one sequence's chunk of T query tokens attends its paged KV cache —
prefix + chunk — with online softmax (no O(T*S) materialization).

Structure:
  * grid (q_tiles, kv_tiles), kv innermost; the block table is a
    scalar-prefetch operand; each kv step DMAs `pages_per_tile` WHOLE pages
    (contiguous [Hkv, BS, D] chunks — head-major cache layout; per-head HBM
    slicing trips Mosaic when D < 128) into double-buffered VMEM;
  * all KV heads are processed inside the step, each head's G = Hq/Hkv query
    heads stacked with the q tile into one [TQ*G, D] MXU row block;
  * causal early-exit: kv tiles entirely after this q tile's last position
    are skipped (no DMA, no compute) — the triangular traffic shape the
    reference gets from its tiled masks.

Layouts: q and out ride as [Hkv, T, G, D] so per-head slices are contiguous;
the wrapper does the (cheap, XLA-fused) transposes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrt_llm_tpu.utils import cdiv

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _flash_prefill_kernel(
    # scalar prefetch
    bt_ref,       # [1, MB] int32
    meta_ref,     # [2] int32: (kv_len, q_offset)
    # inputs
    q_ref,        # [Hkv, TQ, G, D] VMEM
    k_hbm,        # [NB, Hkv, BS, D] ANY
    v_hbm,
    sinks_ref,    # [Hkv*TQ*G, 1] f32 (zeros when has_sinks=False)
    # outputs
    o_ref,        # [Hkv, TQ, G, D] VMEM
    # scratch
    k_buf,        # [2, Hkv, TS, D]
    v_buf,
    m_buf,        # [Hkv*TQ*G, 128] f32
    l_buf,
    acc_buf,      # [Hkv*TQ*G, D] f32
    k_sems,       # [2, PPT]
    v_sems,
    *,
    tile_size: int,
    page_size: int,
    scale: float,
    has_sinks: bool,
    sliding_window: Optional[int],
    logit_cap: Optional[float],
):
    qt = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    TS, BS = tile_size, page_size
    PPT = TS // BS
    Hkv, TQ, G, D = q_ref.shape
    R = TQ * G

    kv_len = meta_ref[0]
    q_off = meta_ref[1]
    # last kv position this q tile may attend (causal), bounded by kv_len
    q_end = jnp.minimum(q_off + (qt + 1) * TQ, kv_len)
    n_need = pl.cdiv(q_end, TS)

    def tile_dma(tile, slot):
        copies = []
        for p in range(PPT):
            page = bt_ref[0, tile * PPT + p]
            copies.append(pltpu.make_async_copy(
                k_hbm.at[page], k_buf.at[slot, :, pl.ds(p * BS, BS), :],
                k_sems.at[slot, p]))
            copies.append(pltpu.make_async_copy(
                v_hbm.at[page], v_buf.at[slot, :, pl.ds(p * BS, BS), :],
                v_sems.at[slot, p]))
        return copies

    @pl.when(t == 0)
    def _init():
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)
        acc_buf[:] = jnp.zeros_like(acc_buf)
        for c in tile_dma(0, 0):
            c.start()

    @pl.when(t + 1 < n_need)
    def _prefetch():
        for c in tile_dma(t + 1, (t + 1) % 2):
            c.start()

    @pl.when(t < n_need)
    def _compute():
        slot = t % 2
        for c in tile_dma(t, slot):
            c.wait()

        row = jax.lax.broadcasted_iota(jnp.int32, (R, TS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, TS), 1)
        q_pos = q_off + qt * TQ + row // G
        kv_pos = t * TS + col
        valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
        if sliding_window is not None:
            valid &= kv_pos > q_pos - sliding_window

        for h in range(Hkv):
            q_h = q_ref[h].reshape(R, D).astype(jnp.bfloat16)
            k_t = k_buf[slot, h]       # [TS, D]
            v_t = v_buf[slot, h]
            s = jax.lax.dot_general(
                q_h, k_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [R, TS]
            if logit_cap:
                s = logit_cap * jnp.tanh(s / logit_cap)
            s = jnp.where(valid, s, NEG_INF)

            rs = pl.ds(h * R, R)
            m_p = m_buf[rs, :1]
            l_p = l_buf[rs, :1]
            m_c = jnp.max(s, axis=1, keepdims=True)
            m_n = jnp.maximum(m_p, m_c)
            p_ = jnp.exp(s - m_n)
            alpha = jnp.exp(m_p - m_n)
            l_buf[rs, :1] = l_p * alpha + jnp.sum(p_, axis=1, keepdims=True)
            pv = jnp.dot(p_.astype(jnp.bfloat16), v_t,
                         preferred_element_type=jnp.float32)  # [R, D]
            acc_buf[rs, :] = acc_buf[rs, :] * alpha + pv
            m_buf[rs, :1] = m_n

    @pl.when(t == n_t - 1)
    def _finalize():
        for h in range(Hkv):
            rs = pl.ds(h * R, R)
            l = l_buf[rs, :1]
            if has_sinks:
                # GPT-OSS sinks: per-q-head learned logit joins the softmax
                # denominator once, against each row's global max
                l = l + jnp.exp(sinks_ref[rs, :1] - m_buf[rs, :1])
            safe_l = jnp.where(l > 0, l, 1.0)
            o_ref[h] = (acc_buf[rs, :] / safe_l).reshape(TQ, G, D).astype(
                o_ref.dtype)


def _flash_prefill_kernel_int8(
    # scalar prefetch
    bt_ref,       # [1, MB] int32
    meta_ref,     # [2] int32: (kv_len, q_offset)
    # inputs
    q_ref,        # [Hkv, TQ, G, D] VMEM
    k_hbm,        # [NB, Hkv, BS, D] int8 ANY
    v_hbm,
    ks_ref,       # [Hkv, TS] f32 VMEM (XLA pre-gathered, tile-sliced)
    vs_ref,
    sinks_ref,    # [Hkv*TQ*G, 1] f32
    # outputs
    o_ref,        # [Hkv, TQ, G, D] VMEM
    # scratch
    k_buf,        # [2, Hkv, TS, D] int8
    v_buf,
    m_buf,        # [Hkv*TQ*G, 128] f32
    l_buf,
    acc_buf,      # [Hkv*TQ*G, D] f32
    k_sems,       # [2, PPT]
    v_sems,
    *,
    tile_size: int,
    page_size: int,
    scale: float,
    has_sinks: bool,
    sliding_window: Optional[int],
    logit_cap: Optional[float],
):
    """INT8-KV flash prefill: int8 pages stream at half the bytes; the
    per-(token, head) K scale folds into the logits and the V scale into
    the probabilities (same trick as `_paged_decode_kernel_int8`).  Scales
    arrive pre-gathered by XLA in kv-position order (see the decode kernel:
    in-kernel assembly needs a Mosaic-rejected sublane->lane collapse)."""
    qt = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    TS, BS = tile_size, page_size
    PPT = TS // BS
    Hkv, TQ, G, D = q_ref.shape
    R = TQ * G

    kv_len = meta_ref[0]
    q_off = meta_ref[1]
    q_end = jnp.minimum(q_off + (qt + 1) * TQ, kv_len)
    n_need = pl.cdiv(q_end, TS)

    def tile_dma(tile, slot):
        copies = []
        for p in range(PPT):
            page = bt_ref[0, tile * PPT + p]
            copies.append(pltpu.make_async_copy(
                k_hbm.at[page], k_buf.at[slot, :, pl.ds(p * BS, BS), :],
                k_sems.at[slot, p]))
            copies.append(pltpu.make_async_copy(
                v_hbm.at[page], v_buf.at[slot, :, pl.ds(p * BS, BS), :],
                v_sems.at[slot, p]))
        return copies

    @pl.when(t == 0)
    def _init():
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)
        acc_buf[:] = jnp.zeros_like(acc_buf)
        for c in tile_dma(0, 0):
            c.start()

    @pl.when(t + 1 < n_need)
    def _prefetch():
        for c in tile_dma(t + 1, (t + 1) % 2):
            c.start()

    @pl.when(t < n_need)
    def _compute():
        slot = t % 2
        for c in tile_dma(t, slot):
            c.wait()

        row = jax.lax.broadcasted_iota(jnp.int32, (R, TS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, TS), 1)
        q_pos = q_off + qt * TQ + row // G
        kv_pos = t * TS + col
        valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
        if sliding_window is not None:
            valid &= kv_pos > q_pos - sliding_window

        for h in range(Hkv):
            q_h = q_ref[h].reshape(R, D).astype(jnp.bfloat16)
            k_t = k_buf[slot, h].astype(jnp.bfloat16)       # [TS, D]
            v_t = v_buf[slot, h].astype(jnp.bfloat16)
            ksv = ks_ref[h:h + 1, :]                        # [1, TS]
            vsv = vs_ref[h:h + 1, :]
            s = jax.lax.dot_general(
                q_h, k_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [R, TS]
            s = s * ksv
            if logit_cap:
                s = logit_cap * jnp.tanh(s / logit_cap)
            s = jnp.where(valid, s, NEG_INF)

            rs = pl.ds(h * R, R)
            m_p = m_buf[rs, :1]
            l_p = l_buf[rs, :1]
            m_c = jnp.max(s, axis=1, keepdims=True)
            m_n = jnp.maximum(m_p, m_c)
            p_ = jnp.exp(s - m_n)
            alpha = jnp.exp(m_p - m_n)
            l_buf[rs, :1] = l_p * alpha + jnp.sum(p_, axis=1, keepdims=True)
            pv = jnp.dot((p_ * vsv).astype(jnp.bfloat16), v_t,
                         preferred_element_type=jnp.float32)  # [R, D]
            acc_buf[rs, :] = acc_buf[rs, :] * alpha + pv
            m_buf[rs, :1] = m_n

    @pl.when(t == n_t - 1)
    def _finalize():
        for h in range(Hkv):
            rs = pl.ds(h * R, R)
            l = l_buf[rs, :1]
            if has_sinks:
                l = l + jnp.exp(sinks_ref[rs, :1] - m_buf[rs, :1])
            safe_l = jnp.where(l > 0, l, 1.0)
            o_ref[h] = (acc_buf[rs, :] / safe_l).reshape(TQ, G, D).astype(
                o_ref.dtype)


def _flash_prefill_kernel_packed(
    # scalar prefetch
    bt_ref,       # [1, MB] int32
    meta_ref,     # [2] int32: (kv_len, q_offset)
    # inputs
    q_ref,        # [Hkv, TQ, G, 128] VMEM (D lanes used, rest zero)
    k_hbm,        # [NB, Hkv, BS*D//128, 128] ANY (lane-packed page view)
    v_hbm,
    sinks_ref,    # [Hkv*TQ*G, 1] f32
    sel_ref,      # [r, 128, 128] bf16 lane-selection matrices
    # outputs
    o_ref,        # [Hkv, TQ, G, 128] VMEM
    # scratch
    k_buf,        # [2, Hkv, TS//r, 128]
    v_buf,
    m_buf,        # [Hkv*TQ*G, 128] f32
    l_buf,
    acc_buf,      # [Hkv*TQ*G, 128] f32
    k_sems,       # [2, PPT]
    v_sems,
    *,
    tile_size: int,
    page_size: int,
    head_dim: int,
    scale: float,
    has_sinks: bool,
    sliding_window: Optional[int],
    logit_cap: Optional[float],
):
    """Sub-128 head dims (GPT-OSS/TinyLlama D=64): pages pack r = 128//D
    consecutive tokens per lane row, so DMAs stay lane-aligned and the
    kernel runs r lane-shifted sub-dots per tile (same FLOPs) — the same
    trick as `_paged_decode_kernel_packed` with q tiles + causal early
    exit on top."""
    qt = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    TS, BS, D = tile_size, page_size, head_dim
    r = 128 // D
    rows_per_page = BS // r
    TSp = TS // r
    PPT = TS // BS
    Hkv, TQ, G, _ = q_ref.shape
    R = TQ * G

    kv_len = meta_ref[0]
    q_off = meta_ref[1]
    q_end = jnp.minimum(q_off + (qt + 1) * TQ, kv_len)
    n_need = pl.cdiv(q_end, TS)

    def tile_dma(tile, slot):
        copies = []
        for p in range(PPT):
            page = bt_ref[0, tile * PPT + p]
            copies.append(pltpu.make_async_copy(
                k_hbm.at[page],
                k_buf.at[slot, :, pl.ds(p * rows_per_page, rows_per_page), :],
                k_sems.at[slot, p]))
            copies.append(pltpu.make_async_copy(
                v_hbm.at[page],
                v_buf.at[slot, :, pl.ds(p * rows_per_page, rows_per_page), :],
                v_sems.at[slot, p]))
        return copies

    @pl.when(t == 0)
    def _init():
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)
        acc_buf[:] = jnp.zeros_like(acc_buf)
        for c in tile_dma(0, 0):
            c.start()

    @pl.when(t + 1 < n_need)
    def _prefetch():
        for c in tile_dma(t + 1, (t + 1) % 2):
            c.start()

    @pl.when(t < n_need)
    def _compute():
        slot = t % 2
        for c in tile_dma(t, slot):
            c.wait()

        sels = [sel_ref[i] for i in range(r)]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, TSp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, TSp), 1)
        q_pos = q_off + qt * TQ + row // G

        for h in range(Hkv):
            q_h = q_ref[h].reshape(R, 128).astype(jnp.bfloat16)
            k_t = k_buf[slot, h]        # [TSp, 128], r tokens per row
            v_t = v_buf[slot, h]
            rs = pl.ds(h * R, R)
            m_p = m_buf[rs, :1]
            l_p = l_buf[rs, :1]

            subs = []
            m_c = m_p
            for i in range(r):
                k_i = jnp.dot(k_t, sels[i],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)       # [TSp, 128]
                s = jax.lax.dot_general(
                    q_h, k_i, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # [R, TSp]
                if logit_cap:
                    s = logit_cap * jnp.tanh(s / logit_cap)
                kv_pos = t * TS + i + r * col
                valid = (kv_pos <= q_pos) & (kv_pos < kv_len)
                if sliding_window is not None:
                    valid &= kv_pos > q_pos - sliding_window
                s = jnp.where(valid, s, NEG_INF)
                subs.append(s)
                m_c = jnp.maximum(m_c, jnp.max(s, axis=1, keepdims=True))

            alpha = jnp.exp(m_p - m_c)
            l_n = l_p * alpha
            acc_buf[rs, :] = acc_buf[rs, :] * alpha
            for i in range(r):
                p_ = jnp.exp(subs[i] - m_c)                # [R, TSp]
                l_n = l_n + jnp.sum(p_, axis=1, keepdims=True)
                v_i = jnp.dot(v_t, sels[i],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)       # [TSp, 128]
                pv = jnp.dot(p_.astype(jnp.bfloat16), v_i,
                             preferred_element_type=jnp.float32)  # [R, 128]
                acc_buf[rs, :] = acc_buf[rs, :] + pv
            m_buf[rs, :1] = m_c
            l_buf[rs, :1] = l_n

    @pl.when(t == n_t - 1)
    def _finalize():
        for h in range(Hkv):
            rs = pl.ds(h * R, R)
            l = l_buf[rs, :1]
            if has_sinks:
                l = l + jnp.exp(sinks_ref[rs, :1] - m_buf[rs, :1])
            safe_l = jnp.where(l > 0, l, 1.0)
            o_ref[h] = (acc_buf[rs, :] / safe_l).reshape(TQ, G, 128).astype(
                o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_cap", "tile_size",
                     "q_tile", "interpret"),
)
def flash_prefill_attention(
    q: jax.Array,             # [T, Hq, D] (one sequence's chunk)
    k_cache: jax.Array,       # [NB, Hkv, BS, D]
    v_cache: jax.Array,
    block_table: jax.Array,   # [MB] int32
    kv_len: jax.Array,        # scalar int32 (prefix + chunk)
    q_offset: jax.Array,      # scalar int32 (position of q[0])
    scale: float,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    tile_size: int = 256,
    q_tile: Optional[int] = None,
    interpret: bool = False,
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    from tensorrt_llm_tpu.ops.attention_xla import pool_dims

    T, Hq, D = q.shape
    is_int8 = isinstance(k_cache, tuple)
    NB, Hkv, BS, _ = pool_dims(k_cache, D)
    G = Hq // Hkv
    MB = block_table.shape[0]

    TS = min(tile_size, MB * BS)
    TS = max(BS, (TS // BS) * BS)
    while (MB * BS) % TS:
        TS -= BS
    if TS % 128 or TS < 128:
        # awkward table widths (e.g. MB=129 -> the only dividing tile is
        # 48) leave an unaligned tile: Mosaic rejects <128-lane scale
        # blocks (int8 path) and tiny tiles mean one DMA per page.  Pad
        # the tile space instead: tail table entries point at RESERVED
        # block 0 (safe garbage, masked off by kv_len in-kernel).
        TS = min(tile_size, 256)
        TS = max(128, (TS // 128) * 128)
        while TS % BS:
            TS += 128   # BS is a power of two <= 128 in practice
        MB_pad = -(-(MB * BS) // TS) * TS // BS
        block_table = jnp.pad(block_table, (0, MB_pad - MB))
        MB = MB_pad
    PPT = TS // BS
    n_kv_tiles = (MB * BS) // TS

    TQ = q_tile or max(8, min(T, 512 // G))
    while T % TQ:
        TQ //= 2
    TQ = max(TQ, 1)
    n_q_tiles = T // TQ
    R = TQ * G

    # [T, Hq, D] -> [Hkv, T, G, D]: contiguous per-head slices in the kernel
    q4 = q.reshape(T, Hkv, G, D).transpose(1, 0, 2, 3)
    meta = jnp.stack([kv_len.astype(jnp.int32), q_offset.astype(jnp.int32)])
    # per-head sink logits expanded to the kernel's [Hkv*R, 1] row layout
    # (row = h*R + tq*G + g)
    if sinks is None:
        sinks_rows = jnp.zeros((Hkv * TQ * G, 1), jnp.float32)
    else:
        sinks_rows = jnp.tile(
            jnp.asarray(sinks, jnp.float32).reshape(Hkv, 1, G),
            (1, TQ, 1)).reshape(Hkv * TQ * G, 1)

    if is_int8:
        assert D % 128 == 0, (
            "int8 flash prefill requires D % 128 == 0; the dispatch layer "
            "routes smaller head dims to the XLA path")
        (kd, ks), (vd, vs) = k_cache, v_cache
        # pre-gather scale rows into kv-position order [Hkv, MB*BS] (see the
        # decode kernel's docstring for why this can't assemble in-kernel)
        ksg = jnp.transpose(ks[block_table], (1, 0, 2)).reshape(Hkv, MB * BS)
        vsg = jnp.transpose(vs[block_table], (1, 0, 2)).reshape(Hkv, MB * BS)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_q_tiles, n_kv_tiles),
            in_specs=[
                pl.BlockSpec((Hkv, TQ, G, D),
                             lambda qt, t, *_: (0, qt, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((Hkv, TS), lambda qt, t, *_: (0, t)),
                pl.BlockSpec((Hkv, TS), lambda qt, t, *_: (0, t)),
                pl.BlockSpec((Hkv * R, 1), lambda qt, t, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((Hkv, TQ, G, D),
                                   lambda qt, t, *_: (0, qt, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, Hkv, TS, D), jnp.int8),
                pltpu.VMEM((2, Hkv, TS, D), jnp.int8),
                pltpu.VMEM((Hkv * R, 128), jnp.float32),
                pltpu.VMEM((Hkv * R, 128), jnp.float32),
                pltpu.VMEM((Hkv * R, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, PPT)),
                pltpu.SemaphoreType.DMA((2, PPT)),
            ],
        )
        kernel = functools.partial(
            _flash_prefill_kernel_int8,
            tile_size=TS, page_size=BS, scale=scale,
            has_sinks=sinks is not None,
            sliding_window=sliding_window, logit_cap=logit_cap)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Hkv, T, G, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(block_table.reshape(1, MB), meta, q4, kd, vd, ksg, vsg,
          sinks_rows)
        return out.transpose(1, 0, 2, 3).reshape(T, Hq, D)

    if D < 128:
        assert 128 % D == 0 and (BS * D) % 128 == 0, (D, BS)
        r = 128 // D
        q4p = jnp.pad(q4, ((0, 0), (0, 0), (0, 0), (0, 128 - D)))
        if k_cache.shape[-1] == 128:
            # manager-allocated pools arrive already lane-packed
            kv_view = (k_cache, v_cache)
        else:
            kv_view = (k_cache.reshape(NB, Hkv, BS * D // 128, 128),
                       v_cache.reshape(NB, Hkv, BS * D // 128, 128))
        sel_np = np.zeros((r, 128, 128), np.float32)
        for i in range(r):
            for d in range(D):
                sel_np[i, i * D + d, d] = 1.0
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_q_tiles, n_kv_tiles),
            in_specs=[
                pl.BlockSpec((Hkv, TQ, G, 128),
                             lambda qt, t, *_: (0, qt, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((Hkv * R, 1), lambda qt, t, *_: (0, 0)),
                pl.BlockSpec((r, 128, 128), lambda qt, t, *_: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((Hkv, TQ, G, 128),
                                   lambda qt, t, *_: (0, qt, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, Hkv, TS // r, 128), k_cache.dtype),
                pltpu.VMEM((2, Hkv, TS // r, 128), v_cache.dtype),
                pltpu.VMEM((Hkv * R, 128), jnp.float32),
                pltpu.VMEM((Hkv * R, 128), jnp.float32),
                pltpu.VMEM((Hkv * R, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, PPT)),
                pltpu.SemaphoreType.DMA((2, PPT)),
            ],
        )
        kernel = functools.partial(
            _flash_prefill_kernel_packed,
            tile_size=TS, page_size=BS, head_dim=D, scale=scale,
            has_sinks=sinks is not None,
            sliding_window=sliding_window, logit_cap=logit_cap)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Hkv, T, G, 128), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(block_table.reshape(1, MB), meta, q4p, kv_view[0], kv_view[1],
          sinks_rows, jnp.asarray(sel_np, jnp.bfloat16))
        return out[..., :D].transpose(1, 0, 2, 3).reshape(T, Hq, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_q_tiles, n_kv_tiles),
        in_specs=[
            pl.BlockSpec((Hkv, TQ, G, D), lambda qt, t, *_: (0, qt, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Hkv * R, 1), lambda qt, t, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Hkv, TQ, G, D), lambda qt, t, *_: (0, qt, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, TS, D), k_cache.dtype),
            pltpu.VMEM((2, Hkv, TS, D), v_cache.dtype),
            pltpu.VMEM((Hkv * R, 128), jnp.float32),
            pltpu.VMEM((Hkv * R, 128), jnp.float32),
            pltpu.VMEM((Hkv * R, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2, PPT)),
            pltpu.SemaphoreType.DMA((2, PPT)),
        ],
    )
    kernel = functools.partial(
        _flash_prefill_kernel,
        tile_size=TS,
        page_size=BS,
        scale=scale,
        has_sinks=sinks is not None,
        sliding_window=sliding_window,
        logit_cap=logit_cap,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, T, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_table.reshape(1, MB), meta, q4, k_cache, v_cache, sinks_rows)
    return out.transpose(1, 0, 2, 3).reshape(T, Hq, D)
