"""Pallas paged decode attention.

TPU-native replacement for the reference's decode-time masked MHA / XQA
kernels (`cpp/.../kernels/decoderMaskedMultiheadAttention/`,
`DecoderXQARunner` decoderXQARunner.h): one query token per sequence attends
its paged KV cache.

Design (the Pallas analog of the reference's block-offset tensors):
  * block tables + kv lens ride as SCALAR-PREFETCH operands, available before
    the kernel body, so page DMAs are issued from dynamic page ids;
  * the grid is (batch, kv_tiles); each step DMAs `pages_per_tile` pages
    (contiguous [Hkv, BS, D] chunks — the cache is stored head-major) into a
    double-buffered VMEM scratch while the previous tile computes;
  * online-softmax state (m, l, acc) lives in VMEM scratch and is carried
    across the kv_tile grid dimension (same revisiting trick as the W4A16
    accumulator);
  * GQA: all `G = Hq/Hkv` query heads of a KV head are one MXU row-block.

Tail handling: tiles past a sequence's kv_len are skipped entirely (no DMA,
no compute); the partial tile masks by absolute kv position.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from tensorrt_llm_tpu.utils import cdiv

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _paged_decode_kernel(
    # scalar prefetch
    bt_ref,       # [B, MB] int32 page ids
    kvlen_ref,    # [B] int32
    # inputs
    q_ref,        # [1, Hq, D] VMEM (this sequence's query)
    k_hbm,        # [NB, Hkv, BS, D] ANY/HBM
    v_hbm,
    sinks_ref,    # [Hq, 1] f32 VMEM (zeros when has_sinks=False)
    # outputs
    o_ref,        # [1, Hq, D] VMEM
    # scratch
    k_buf,        # [2, Hkv, TS, D] VMEM
    v_buf,
    m_buf,        # [Hq, 128] f32
    l_buf,        # [Hq, 128] f32
    acc_buf,      # [Hq, D] f32
    k_sems,       # DMA sems [2, PPT]
    v_sems,
    *,
    tile_size: int,
    page_size: int,
    n_kv_heads: int,
    scale: float,
    sliding_window: Optional[int],
    logit_cap: Optional[float],
    has_sinks: bool,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    TS, BS = tile_size, page_size
    PPT = TS // BS
    kv_len = kvlen_ref[b]
    n_tiles = pl.cdiv(kv_len, TS)  # dynamic

    def start_tile_dma(tile, slot):
        """Issue PPT page DMAs for `tile` into buffer `slot`."""
        for p in range(PPT):
            page = bt_ref[b, tile * PPT + p]
            pltpu.make_async_copy(
                k_hbm.at[page],                       # [Hkv, BS, D]
                k_buf.at[slot, :, pl.ds(p * BS, BS), :],
                k_sems.at[slot, p],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[page],
                v_buf.at[slot, :, pl.ds(p * BS, BS), :],
                v_sems.at[slot, p],
            ).start()

    def wait_tile_dma(tile, slot):
        for p in range(PPT):
            page = bt_ref[b, tile * PPT + p]
            pltpu.make_async_copy(
                k_hbm.at[page], k_buf.at[slot, :, pl.ds(p * BS, BS), :],
                k_sems.at[slot, p]).wait()
            pltpu.make_async_copy(
                v_hbm.at[page], v_buf.at[slot, :, pl.ds(p * BS, BS), :],
                v_sems.at[slot, p]).wait()

    @pl.when(t == 0)
    def _init():
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)
        acc_buf[:] = jnp.zeros_like(acc_buf)
        start_tile_dma(0, 0)

    # prefetch next tile while this one computes
    @pl.when(t + 1 < n_tiles)
    def _prefetch():
        start_tile_dma(t + 1, (t + 1) % 2)

    @pl.when(t < n_tiles)
    def _compute():
        slot = t % 2
        wait_tile_dma(t, slot)

        Hq = q_ref.shape[1]
        D = q_ref.shape[2]
        G = Hq // n_kv_heads
        q = q_ref[0].astype(jnp.float32) * scale  # [Hq, D]

        kv_pos = t * TS + jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)
        valid = kv_pos < kv_len
        if sliding_window is not None:
            valid &= kv_pos >= kv_len - sliding_window

        m_prev = m_buf[:, :1]          # [Hq, 1]
        l_prev = l_buf[:, :1]
        acc_prev = acc_buf[:]

        m_rows, l_rows, acc_rows = [], [], []
        for h in range(n_kv_heads):
            k_h = k_buf[slot, h]       # [TS, D]
            v_h = v_buf[slot, h]
            q_h = q[h * G:(h + 1) * G, :].astype(jnp.bfloat16)  # [G, D]
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, TS]
            if logit_cap:
                s = logit_cap * jnp.tanh(s / logit_cap)
            s = jnp.where(valid, s, NEG_INF)

            m_p = m_prev[h * G:(h + 1) * G]
            l_p = l_prev[h * G:(h + 1) * G]
            a_p = acc_prev[h * G:(h + 1) * G]
            m_c = jnp.max(s, axis=1, keepdims=True)          # [G, 1]
            m_n = jnp.maximum(m_p, m_c)
            p_ = jnp.exp(s - m_n)                            # [G, TS]
            alpha = jnp.exp(m_p - m_n)
            l_n = l_p * alpha + jnp.sum(p_, axis=1, keepdims=True)
            pv = jnp.dot(p_.astype(jnp.bfloat16), v_h,
                         preferred_element_type=jnp.float32)  # [G, D]
            a_n = a_p * alpha + pv
            m_rows.append(m_n)
            l_rows.append(l_n)
            acc_rows.append(a_n)

        m_buf[:, :1] = jnp.concatenate(m_rows, axis=0)
        l_buf[:, :1] = jnp.concatenate(l_rows, axis=0)
        acc_buf[:] = jnp.concatenate(acc_rows, axis=0)

    @pl.when(t == n_t - 1)
    def _finalize():
        l = l_buf[:, :1]
        if has_sinks:
            # GPT-OSS attention sinks: the per-head learned logit joins
            # the softmax denominator once, against the global max
            l = l + jnp.exp(sinks_ref[:, :1] - m_buf[:, :1])
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_buf[:] / safe_l).astype(o_ref.dtype)


def _paged_decode_kernel_int8(
    # scalar prefetch
    bt_ref,       # [B, MB] int32 page ids
    kvlen_ref,    # [B] int32
    # inputs
    q_ref,        # [1, Hq, D] VMEM
    k_hbm,        # [NB, Hkv, BS, D] int8 ANY
    v_hbm,        # [NB, Hkv, BS, D] int8 ANY
    ks_ref,       # [1, Hkv, TS] f32 VMEM (XLA pre-gathered, tile-sliced)
    vs_ref,
    sinks_ref,    # [Hq, 1] f32 VMEM
    # outputs
    o_ref,        # [1, Hq, D] VMEM
    # scratch
    k_buf,        # [2, Hkv, TS, D] int8
    v_buf,
    m_buf,        # [Hq, 128] f32
    l_buf,
    acc_buf,      # [Hq, D] f32
    k_sems,       # [2, PPT]
    v_sems,
    *,
    tile_size: int,
    page_size: int,
    n_kv_heads: int,
    scale: float,
    sliding_window: Optional[int],
    logit_cap: Optional[float],
    has_sinks: bool,
):
    """INT8-KV paged decode: int8 pages stream at half the HBM bytes and the
    per-(token, head) scales fold into the logits (K) and probabilities (V)
    instead of the [TS, D] tiles — the dequant itself is a single int8->bf16
    upcast feeding the MXU (reference `KvCacheDataType::INT8` decode path,
    `unfusedAttentionKernels.h:63-69` + MMHA dequant).

    Scales arrive pre-gathered by XLA in kv-position order (`[B, Hkv, MB*BS]`,
    tile-sliced by the BlockSpec pipeline): building the per-head ``[1, TS]``
    scale row from per-page DMA'd rows needs a sublane->lane collapse that
    Mosaic rejects on hardware (``tpu.reshape vector<1x3x16> -> vector<1x48>``
    in the r2 probe logs), and the gather is tiny next to the page stream."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    TS, BS = tile_size, page_size
    PPT = TS // BS
    kv_len = kvlen_ref[b]
    n_tiles = pl.cdiv(kv_len, TS)

    def start_tile_dma(tile, slot):
        for p in range(PPT):
            page = bt_ref[b, tile * PPT + p]
            pltpu.make_async_copy(
                k_hbm.at[page], k_buf.at[slot, :, pl.ds(p * BS, BS), :],
                k_sems.at[slot, p]).start()
            pltpu.make_async_copy(
                v_hbm.at[page], v_buf.at[slot, :, pl.ds(p * BS, BS), :],
                v_sems.at[slot, p]).start()

    def wait_tile_dma(tile, slot):
        for p in range(PPT):
            page = bt_ref[b, tile * PPT + p]
            pltpu.make_async_copy(
                k_hbm.at[page], k_buf.at[slot, :, pl.ds(p * BS, BS), :],
                k_sems.at[slot, p]).wait()
            pltpu.make_async_copy(
                v_hbm.at[page], v_buf.at[slot, :, pl.ds(p * BS, BS), :],
                v_sems.at[slot, p]).wait()

    @pl.when(t == 0)
    def _init():
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)
        acc_buf[:] = jnp.zeros_like(acc_buf)
        start_tile_dma(0, 0)

    @pl.when(t + 1 < n_tiles)
    def _prefetch():
        start_tile_dma(t + 1, (t + 1) % 2)

    @pl.when(t < n_tiles)
    def _compute():
        slot = t % 2
        wait_tile_dma(t, slot)

        Hq = q_ref.shape[1]
        G = Hq // n_kv_heads
        q = q_ref[0].astype(jnp.float32) * scale  # [Hq, D]

        kv_pos = t * TS + jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)
        valid = kv_pos < kv_len
        if sliding_window is not None:
            valid &= kv_pos >= kv_len - sliding_window

        m_prev = m_buf[:, :1]
        l_prev = l_buf[:, :1]
        acc_prev = acc_buf[:]

        m_rows, l_rows, acc_rows = [], [], []
        for h in range(n_kv_heads):
            k_h = k_buf[slot, h].astype(jnp.bfloat16)   # [TS, D]
            v_h = v_buf[slot, h].astype(jnp.bfloat16)
            # pre-gathered per-token scales, already in kv-position order
            ksv = ks_ref[0, h:h + 1, :]                 # [1, TS]
            vsv = vs_ref[0, h:h + 1, :]
            q_h = q[h * G:(h + 1) * G, :].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, TS]
            s = s * ksv
            if logit_cap:
                s = logit_cap * jnp.tanh(s / logit_cap)
            s = jnp.where(valid, s, NEG_INF)

            m_p = m_prev[h * G:(h + 1) * G]
            l_p = l_prev[h * G:(h + 1) * G]
            a_p = acc_prev[h * G:(h + 1) * G]
            m_c = jnp.max(s, axis=1, keepdims=True)
            m_n = jnp.maximum(m_p, m_c)
            p_ = jnp.exp(s - m_n)
            alpha = jnp.exp(m_p - m_n)
            l_n = l_p * alpha + jnp.sum(p_, axis=1, keepdims=True)
            pv = jnp.dot((p_ * vsv).astype(jnp.bfloat16), v_h,
                         preferred_element_type=jnp.float32)  # [G, D]
            a_n = a_p * alpha + pv
            m_rows.append(m_n)
            l_rows.append(l_n)
            acc_rows.append(a_n)

        m_buf[:, :1] = jnp.concatenate(m_rows, axis=0)
        l_buf[:, :1] = jnp.concatenate(l_rows, axis=0)
        acc_buf[:] = jnp.concatenate(acc_rows, axis=0)

    @pl.when(t == n_t - 1)
    def _finalize():
        l = l_buf[:, :1]
        if has_sinks:
            l = l + jnp.exp(sinks_ref[:, :1] - m_buf[:, :1])
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_buf[:] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_cap", "tile_size",
                     "interpret"),
)
def paged_decode_attention(
    q: jax.Array,             # [B, Hq, D]
    k_cache: jax.Array,       # [NB, Hkv, BS, D]
    v_cache: jax.Array,
    block_tables: jax.Array,  # [B, MB] int32
    kv_lens: jax.Array,       # [B] int32
    scale: float,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
    tile_size: int = 512,   # device-tuned: 177 GB/s valid KV vs 155 at 256
    interpret: bool = False,
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    from tensorrt_llm_tpu.ops.attention_xla import pool_dims

    B, Hq, D = q.shape
    is_int8 = isinstance(k_cache, tuple)
    NB, Hkv, BS, _ = pool_dims(k_cache, D)
    MB = block_tables.shape[1]
    TS = min(tile_size, MB * BS)
    # tile must be a whole number of pages and divide the table
    TS = max(BS, (TS // BS) * BS)
    while (MB * BS) % TS:
        TS -= BS
    if TS % 128 or TS < 128:
        # awkward table widths (MB=129 at a 2064-token max_seq_len):
        # the only dividing tile is unaligned — Mosaic rejects <128-lane
        # scale blocks (int8 path) and tiny tiles DMA one page at a
        # time.  Pad the tile space: tail entries point at RESERVED
        # block 0, masked by kv_len in-kernel (same fix as
        # flash_prefill_attention).
        TS = min(tile_size, 256)
        TS = max(128, (TS // 128) * 128)
        while TS % BS:
            TS += 128
        MB_pad = -(-(MB * BS) // TS) * TS // BS
        block_tables = jnp.pad(block_tables,
                               ((0, 0), (0, MB_pad - MB)))
        MB = MB_pad
    PPT = TS // BS
    n_tiles = (MB * BS) // TS

    if is_int8:
        assert D % 128 == 0, (
            "int8 paged kernel requires D % 128 == 0; dispatch layer must "
            "route smaller head dims to the XLA path")
        (kd, ks), (vd, vs) = k_cache, v_cache
        # Pre-gather the (small) per-(token, head) scale rows in XLA into
        # kv-position order [B, Hkv, MB*BS]; the pipeline tile-slices them.
        # In-kernel assembly from per-page rows would need a sublane->lane
        # collapse Mosaic rejects on hardware.
        ksg = jnp.transpose(ks[block_tables], (0, 2, 1, 3)) \
            .reshape(B, Hkv, MB * BS)
        vsg = jnp.transpose(vs[block_tables], (0, 2, 1, 3)) \
            .reshape(B, Hkv, MB * BS)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, Hq, D), lambda b, t, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, Hkv, TS), lambda b, t, *_: (b, 0, t)),
                pl.BlockSpec((1, Hkv, TS), lambda b, t, *_: (b, 0, t)),
                pl.BlockSpec((Hq, 1), lambda b, t, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Hq, D), lambda b, t, *_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, Hkv, TS, D), jnp.int8),
                pltpu.VMEM((2, Hkv, TS, D), jnp.int8),
                pltpu.VMEM((Hq, 128), jnp.float32),
                pltpu.VMEM((Hq, 128), jnp.float32),
                pltpu.VMEM((Hq, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, PPT)),
                pltpu.SemaphoreType.DMA((2, PPT)),
            ],
        )
        kernel = functools.partial(
            _paged_decode_kernel_int8,
            tile_size=TS, page_size=BS, n_kv_heads=Hkv,
            scale=scale, sliding_window=sliding_window,
            logit_cap=logit_cap, has_sinks=sinks is not None)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(block_tables, kv_lens, q, kd, vd, ksg, vsg,
          (jnp.zeros((Hq, 1), jnp.float32) if sinks is None
           else jnp.asarray(sinks, jnp.float32).reshape(Hq, 1)))

    if D < 128:
        # sub-128 head dims can't DMA pages directly (Mosaic lane tiling);
        # run the lane-packed variant.  The manager allocates such pools
        # ALREADY packed ([NB, Hkv, BS*D//128, 128]) so no relayout happens
        # here; the reshape fallback covers directly-passed logical pools
        # (unit tests) at the cost of a full-pool copy.
        assert 128 % D == 0 and (BS * D) % 128 == 0, (D, BS)
        r = 128 // D
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, 128 - D)))
        if k_cache.shape[-1] == 128:
            kv_view = (k_cache, v_cache)
        else:
            kv_view = (k_cache.reshape(NB, Hkv, BS * D // 128, 128),
                       v_cache.reshape(NB, Hkv, BS * D // 128, 128))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, Hq, 128), lambda b, t, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((Hq, 1), lambda b, t, *_: (0, 0)),
                pl.BlockSpec((r, 128, 128), lambda b, t, *_: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Hq, 128), lambda b, t, *_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, Hkv, TS // r, 128), k_cache.dtype),
                pltpu.VMEM((2, Hkv, TS // r, 128), v_cache.dtype),
                pltpu.VMEM((Hq, 128), jnp.float32),
                pltpu.VMEM((Hq, 128), jnp.float32),
                pltpu.VMEM((Hq, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, PPT)),
                pltpu.SemaphoreType.DMA((2, PPT)),
            ],
        )
        kernel = functools.partial(
            _paged_decode_kernel_packed,
            tile_size=TS, page_size=BS, n_kv_heads=Hkv, head_dim=D,
            scale=scale, sliding_window=sliding_window,
            logit_cap=logit_cap, has_sinks=sinks is not None)
        sel_np = np.zeros((r, 128, 128), np.float32)
        for i in range(r):
            for d in range(D):
                sel_np[i, i * D + d, d] = 1.0
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, Hq, 128), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(block_tables, kv_lens, qp, kv_view[0], kv_view[1],
          (jnp.zeros((Hq, 1), jnp.float32) if sinks is None
           else jnp.asarray(sinks, jnp.float32).reshape(Hq, 1)),
          jnp.asarray(sel_np, jnp.bfloat16))
        return out[..., :D]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b, t, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Hq, 1), lambda b, t, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, t, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, TS, D), k_cache.dtype),
            pltpu.VMEM((2, Hkv, TS, D), v_cache.dtype),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2, PPT)),
            pltpu.SemaphoreType.DMA((2, PPT)),
        ],
    )
    kernel = functools.partial(
        _paged_decode_kernel,
        tile_size=TS,
        page_size=BS,
        n_kv_heads=Hkv,
        scale=scale,
        sliding_window=sliding_window,
        logit_cap=logit_cap,
        has_sinks=sinks is not None,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, kv_lens, q, k_cache, v_cache,
      (jnp.zeros((Hq, 1), jnp.float32) if sinks is None
       else jnp.asarray(sinks, jnp.float32).reshape(Hq, 1)))


def _paged_decode_kernel_packed(
    # scalar prefetch
    bt_ref,       # [B, MB] int32 page ids
    kvlen_ref,    # [B] int32
    # inputs
    q_ref,        # [1, Hq, 128] VMEM (query in lane slot 0, zero elsewhere)
    k_hbm,        # [NB, Hkv, BS*D//128, 128] ANY (lane-packed page view)
    v_hbm,
    sinks_ref,    # [Hq, 1] f32
    sel_ref,      # [r, 128, 128] bf16 lane-selection matrices
    # outputs
    o_ref,        # [1, Hq, 128] VMEM (result in lane slot 0)
    # scratch
    k_buf,        # [2, Hkv, TS//r, 128]
    v_buf,
    m_buf,        # [Hq, 128] f32
    l_buf,
    acc_buf,      # [Hq, 128] f32
    k_sems,
    v_sems,
    *,
    tile_size: int,
    page_size: int,
    n_kv_heads: int,
    head_dim: int,
    scale: float,
    sliding_window: Optional[int],
    logit_cap: Optional[float],
    has_sinks: bool,
):
    """Sub-128 head dims: Mosaic can't DMA pages whose trailing dim is
    below the 128-lane tile, so the page view packs r = 128//D consecutive
    tokens per lane row and the kernel runs r lane-shifted q dots per tile
    (same FLOPs, aligned DMAs)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    TS, BS, D = tile_size, page_size, head_dim
    r = 128 // D
    rows_per_page = BS // r
    PPT = TS // BS
    kv_len = kvlen_ref[b]
    n_tiles = pl.cdiv(kv_len, TS)

    def start_tile_dma(tile, slot):
        for p in range(PPT):
            page = bt_ref[b, tile * PPT + p]
            pltpu.make_async_copy(
                k_hbm.at[page],
                k_buf.at[slot, :, pl.ds(p * rows_per_page, rows_per_page),
                         :],
                k_sems.at[slot, p]).start()
            pltpu.make_async_copy(
                v_hbm.at[page],
                v_buf.at[slot, :, pl.ds(p * rows_per_page, rows_per_page),
                         :],
                v_sems.at[slot, p]).start()

    def wait_tile_dma(tile, slot):
        for p in range(PPT):
            page = bt_ref[b, tile * PPT + p]
            pltpu.make_async_copy(
                k_hbm.at[page],
                k_buf.at[slot, :, pl.ds(p * rows_per_page, rows_per_page),
                         :],
                k_sems.at[slot, p]).wait()
            pltpu.make_async_copy(
                v_hbm.at[page],
                v_buf.at[slot, :, pl.ds(p * rows_per_page, rows_per_page),
                         :],
                v_sems.at[slot, p]).wait()

    @pl.when(t == 0)
    def _init():
        m_buf[:] = jnp.full_like(m_buf, NEG_INF)
        l_buf[:] = jnp.zeros_like(l_buf)
        acc_buf[:] = jnp.zeros_like(acc_buf)
        start_tile_dma(0, 0)

    @pl.when(t + 1 < n_tiles)
    def _prefetch():
        start_tile_dma(t + 1, (t + 1) % 2)

    @pl.when(t < n_tiles)
    def _compute():
        slot = t % 2
        wait_tile_dma(t, slot)

        Hq = q_ref.shape[1]
        G = Hq // n_kv_heads
        TSp = TS // r
        qfull = q_ref[0].astype(jnp.float32) * scale      # [Hq, 128]

        # lane-selection matrices (input sel_ref): P_i[l, d] = 1 iff
        # l == i*D + d (d < D) — moving sub-slot i's lanes down to [0, D)
        # is a matmul, which Mosaic handles where lane rolls/slices don't
        sels = [sel_ref[i] for i in range(r)]

        m_prev = m_buf[:, :1]
        l_prev = l_buf[:, :1]
        acc_prev = acc_buf[:]

        m_rows, l_rows, acc_rows = [], [], []
        for h in range(n_kv_heads):
            k_h = k_buf[slot, h]        # [TSp, 128] (r tokens per row)
            v_h = v_buf[slot, h]
            m_p = m_prev[h * G:(h + 1) * G]
            l_p = l_prev[h * G:(h + 1) * G]
            a_p = acc_prev[h * G:(h + 1) * G]
            qs = qfull[h * G:(h + 1) * G].astype(jnp.bfloat16)

            subs = []
            m_c = m_p
            for i in range(r):
                k_i = jnp.dot(k_h, sels[i],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)      # [TSp, 128]
                s = jax.lax.dot_general(
                    qs, k_i, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [G, TSp]
                if logit_cap:
                    s = logit_cap * jnp.tanh(s / logit_cap)
                kv_pos = (t * TS + i
                          + r * jax.lax.broadcasted_iota(jnp.int32, (1, TSp),
                                                         1))
                valid = kv_pos < kv_len
                if sliding_window is not None:
                    valid &= kv_pos >= kv_len - sliding_window
                s = jnp.where(valid, s, NEG_INF)
                subs.append(s)
                m_c = jnp.maximum(m_c, jnp.max(s, axis=1, keepdims=True))

            alpha = jnp.exp(m_p - m_c)
            l_n = l_p * alpha
            a_n = a_p * alpha
            for i in range(r):
                p_ = jnp.exp(subs[i] - m_c)               # [G, TSp]
                l_n = l_n + jnp.sum(p_, axis=1, keepdims=True)
                v_i = jnp.dot(v_h, sels[i],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)      # [TSp, 128]
                pv = jnp.dot(p_.astype(jnp.bfloat16), v_i,
                             preferred_element_type=jnp.float32)  # [G, 128]
                a_n = a_n + pv
            m_rows.append(m_c)
            l_rows.append(l_n)
            acc_rows.append(a_n)

        m_buf[:, :1] = jnp.concatenate(m_rows, axis=0)
        l_buf[:, :1] = jnp.concatenate(l_rows, axis=0)
        acc_buf[:] = jnp.concatenate(acc_rows, axis=0)

    @pl.when(t == n_t - 1)
    def _finalize():
        l = l_buf[:, :1]
        if has_sinks:
            l = l + jnp.exp(sinks_ref[:, :1] - m_buf[:, :1])
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_buf[:] / safe_l).astype(o_ref.dtype)
