"""Grouped (ragged) W4A16 GEMM for quantized MoE experts.

TPU-native counterpart of the reference's mixed-input MoE GEMMs
(`cpp/tensorrt_llm/kernels/cutlass_kernels/moe_gemm/` —
`moe_gemm_kernels_bf16_uint4.cu` etc., runner
`cutlass_kernels/include/moe_gemm_kernels.h:262`): expert weights stay int4
in HBM and are dequantized in VMEM on the way to the MXU, fused into a
megablox-style grouped matmul over tokens sorted by expert.

Work decomposition: rows (tokens) are contiguous per expert group; the M axis
is cut into `tm`-row tiles, and each *work unit* is a (group, m-tile) overlap.
With E groups there are at most `ceil(M/tm) + E - 1` work units (static), so
the grid is static under jit; per-work-unit row ranges, expert ids and
first-visit flags are computed on device from `group_sizes` and handed to the
kernel through scalar prefetch (the Pallas analog of the reference's
grouped-GEMM pointer arrays).

Key property for decode: with one m-tile (small batches), each local expert's
packed weights stream HBM->VMEM exactly once — the same
weights-bytes-bound roofline as the dense W4A16 kernel (`ops/w4a16_gemm.py`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrt_llm_tpu.quantization.quantize import (
    choose_block_n, dequantize_w4_any, pack_group_for, pack_w4_tiled,
    unpack_w4_tiled)
from tensorrt_llm_tpu.utils import cdiv, is_tpu_backend, round_up

# meta rows (scalar-prefetch int32 [5, W])
_MT, _G, _LO, _HI, _FIRST = range(5)


def make_group_metadata(group_sizes: jax.Array, m_tiles: int, tm: int,
                        num_groups: int) -> jax.Array:
    """Per-work-unit metadata [5, W]: m-tile id, group id, row range within
    the tile, and whether this unit is the first to touch its m-tile.

    W = m_tiles + num_groups - 1 is a static upper bound; padding units get
    an empty row range (contribute zero) and first=0 (accumulate)."""
    E = num_groups
    W = m_tiles + E - 1
    sizes = group_sizes.astype(jnp.int32)
    ends = jnp.cumsum(sizes)
    starts = ends - sizes
    nonempty = sizes > 0
    ft = jnp.where(nonempty, starts // tm, 0)
    lt = jnp.where(nonempty, (ends - 1) // tm, -1)
    tiles_per = jnp.where(nonempty, lt - ft + 1, 0)
    wend = jnp.cumsum(tiles_per)
    wstart = wend - tiles_per
    num_work = wend[-1]

    w_idx = jnp.arange(W, dtype=jnp.int32)
    g = jnp.clip(jnp.searchsorted(wend, w_idx, side="right"), 0, E - 1)
    g = g.astype(jnp.int32)
    valid = w_idx < num_work
    j = w_idx - wstart[g]
    mt = jnp.where(valid, ft[g] + j, m_tiles - 1).astype(jnp.int32)
    row_lo = jnp.where(valid, jnp.maximum(starts[g] - mt * tm, 0), 0)
    row_hi = jnp.where(valid, jnp.minimum(ends[g] - mt * tm, tm), 0)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (mt[1:] != mt[:-1]).astype(jnp.int32)])
    first = jnp.where(valid, first, 0)
    return jnp.stack([mt, g, row_lo.astype(jnp.int32),
                      row_hi.astype(jnp.int32), first])


def _gmm_kernel(
    meta_ref,     # SMEM [5, W] int32
    x_ref,        # [TM, BK] bf16
    p_ref,        # [1, 1, BK//2, BN] int8 (row-interleaved tiled nibbles)
    s_ref,        # [1, 1, n_scale_groups, BN] f32
    *rest,        # optional z_ref, then out_ref, acc_ref, w_ref
    n_chunks: int,
    pack_group: int,
    per_channel: bool,
    has_zeros: bool,
    mixed: bool = False,
):
    it = iter(rest)
    z_ref = next(it) if has_zeros else None
    out_ref = next(it)
    acc_ref = next(it)

    w = pl.program_id(1)
    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo_row = meta_ref[_LO, w]
    hi_row = meta_ref[_HI, w]
    TM = x_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    rmask = (rows >= lo_row) & (rows < hi_row)

    # Per scale group: dequant the weight sub-tile and either scale the
    # converted B-fragment in bf16 (the reference CUTLASS
    # FINEGRAINED_SCALE_ONLY contract; VPU cost ~ Gp*BN) or scale the f32
    # accumulator (VPU cost ~ 2*TM*BN) — whichever is cheaper for this TM.
    Gp, Gh = pack_group, pack_group // 2
    xm = jnp.where(rmask, x_ref[:], 0)
    acc = acc_ref[:]
    # mixed feeds the s4 view straight to the MXU (no bf16 weight tile
    # exists to scale), so it implies accumulator-side scaling.
    scale_on_weights = (not mixed) and 2 * x_ref.shape[0] >= Gp
    for c in range(n_chunks):
        pblk = p_ref[0, 0, c * Gh:(c + 1) * Gh, :]
        w4 = pltpu.bitcast(pblk, jnp.int4)
        w_c = w4 if mixed else w4.astype(jnp.bfloat16)            # [Gp, BN]
        row = 0 if per_channel else k_idx * n_chunks + c
        s_g = s_ref[0, 0, pl.ds(row, 1), :]                       # [1, BN]
        x_c = xm[:, c * Gp:(c + 1) * Gp]
        if scale_on_weights:
            acc = acc + jnp.dot(x_c, w_c * s_g.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(
                x_c, w_c, preferred_element_type=jnp.float32) * s_g + acc
    if has_zeros:
        # rank-1 per group folded into one small f32 dot:
        #   acc -= sum_g rowsum(x_g) * (s_g * z_g)  ==  XS @ SZ
        if per_channel:
            xsum = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)
            sz = s_ref[0, 0, pl.ds(0, 1), :] * z_ref[0, 0, pl.ds(0, 1), :]
            acc = acc - xsum * sz
        else:
            xsum = jnp.sum(
                xm.astype(jnp.float32).reshape(TM, n_chunks, Gp), axis=2)
            r0 = k_idx * n_chunks
            sz = (s_ref[0, 0, pl.ds(r0, n_chunks), :]
                  * z_ref[0, 0, pl.ds(r0, n_chunks), :])  # [n_chunks, BN]
            acc = acc - jnp.dot(xsum, sz,
                                preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k_idx == n_k - 1)
    def _writeback():
        first = meta_ref[_FIRST, w]

        @pl.when(first == 1)
        def _set():
            out_ref[:] = acc_ref[:]

        @pl.when(first == 0)
        def _add():
            out_ref[:] = out_ref[:] + acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_k", "mixed", "interpret"))
def _w4a16_gmm_pallas(
    xs: jax.Array,          # [Mp, K] bf16 (rows sorted by group, padded)
    packed: jax.Array,      # [E, n_n, K//2, BN] int8
    scales: jax.Array,      # [E, n_scale_groups, N] f32
    zeros: Optional[jax.Array],
    group_sizes: jax.Array,  # [E] int32
    block_m: int,
    block_k: int,
    interpret: bool,
    mixed: bool = False,
):
    Mp, K = xs.shape
    E, n_n, half, BN = packed.shape
    N = n_n * BN
    n_scale_groups = scales.shape[1]
    G = K // n_scale_groups
    TM, BK = block_m, block_k
    # pairing in pack_w4_tiled is row-adjacent, so the chunk size is free for
    # per-channel scales: use one chunk per k-block
    Gp = BK if G >= K else G
    assert Mp % TM == 0 and K % BK == 0 and BK % Gp == 0, (Mp, TM, K, BK, Gp)
    n_chunks = BK // Gp
    m_tiles = Mp // TM
    n_k = K // BK
    W = m_tiles + E - 1

    meta = make_group_metadata(group_sizes, m_tiles, TM, E)

    s3 = scales.reshape(E, n_scale_groups, n_n, BN).transpose(0, 2, 1, 3)
    in_specs = [
        pl.BlockSpec((TM, BK), lambda n, w, k, meta: (meta[_MT, w], k)),
        pl.BlockSpec((1, 1, BK // 2, BN),
                     lambda n, w, k, meta: (meta[_G, w], n, k, 0)),
        pl.BlockSpec((1, 1, n_scale_groups, BN),
                     lambda n, w, k, meta: (meta[_G, w], n, 0, 0)),
    ]
    operands = [xs.astype(jnp.bfloat16), packed, s3.astype(jnp.float32)]
    if zeros is not None:
        z3 = zeros.reshape(E, n_scale_groups, n_n, BN).transpose(0, 2, 1, 3)
        in_specs.append(pl.BlockSpec(
            (1, 1, n_scale_groups, BN),
            lambda n, w, k, meta: (meta[_G, w], n, 0, 0)))
        operands.append(z3.astype(jnp.float32))

    kernel = functools.partial(
        _gmm_kernel,
        n_chunks=n_chunks,
        pack_group=Gp,
        per_channel=G >= K,
        has_zeros=zeros is not None,
        mixed=mixed,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_n, W, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TM, BN),
                               lambda n, w, k, meta: (meta[_MT, w], n)),
        scratch_shapes=[pltpu.VMEM((TM, BN), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=W * K * N // 2 // m_tiles * m_tiles
            + Mp * K * 2 + Mp * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(meta, *operands)


def w4a16_grouped_matmul_xla(
    xs: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    group_sizes: jax.Array,
    zeros: Optional[jax.Array] = None,
    expert_chunk: int = 4,
) -> jax.Array:
    """Fallback: per-expert dequant + ragged_dot (CPU tests / odd shapes
    the Pallas kernel cannot block, e.g. GPT-OSS K=2880 % 128 != 0).

    Dequantizes CHUNKS of experts inside an accumulating scan instead of
    all at once: the all-expert dequant materialized 2x f32[E, K, N]
    (~4 GB for GPT-OSS-20B) and made the 20B prefill program need 5 GB
    of HLO temps — past single-chip HBM (r5 OOM dump).  Rows outside a
    chunk ride zero-weight border groups, so each partial ragged_dot
    contributes exactly its chunk's rows."""
    E = packed.shape[0]
    C = min(expert_chunk, E)
    while E % C:
        C -= 1
    nc = E // C
    if nc == 1:
        deq = jax.vmap(lambda p, s, z=None: dequantize_w4_any(p, s, z))
        w = deq(packed, scales, zeros) if zeros is not None \
            else deq(packed, scales)
        return jax.lax.ragged_dot(
            xs.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            group_sizes).astype(jnp.float32)
    M = xs.shape[0]
    xb = xs.astype(jnp.bfloat16)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(group_sizes).astype(jnp.int32)])

    def body(acc, c):
        a = c * C
        pk = jax.lax.dynamic_slice_in_dim(packed, a, C, 0)
        sc = jax.lax.dynamic_slice_in_dim(scales, a, C, 0)
        deq = jax.vmap(lambda p, s, z=None: dequantize_w4_any(p, s, z))
        if zeros is not None:
            zr = jax.lax.dynamic_slice_in_dim(zeros, a, C, 0)
            w = deq(pk, sc, zr)
        else:
            w = deq(pk, sc)
        w = w.astype(jnp.bfloat16)
        K, N = w.shape[1], w.shape[2]
        zpad = jnp.zeros((1, K, N), w.dtype)
        w_ext = jnp.concatenate([zpad, w, zpad])
        gs = jax.lax.dynamic_slice_in_dim(group_sizes, a, C, 0) \
            .astype(jnp.int32)
        pre = jax.lax.dynamic_index_in_dim(starts, a, keepdims=True)
        post = jnp.int32(M)[None] - pre - jnp.sum(gs)[None]
        sizes = jnp.concatenate([pre, gs, post])
        return acc + jax.lax.ragged_dot(xb, w_ext, sizes), None

    out, _ = jax.lax.scan(body, jnp.zeros((M, packed.shape[1]
                                           * packed.shape[3]
                                           if packed.ndim == 4
                                           else packed.shape[-1]),
                                          jnp.float32),
                          jnp.arange(nc))
    return out


def w4a16_grouped_matmul(
    xs: jax.Array,           # [M, K] rows sorted by group
    packed: jax.Array,       # [E, n_n, K//2, BN] int8 (pack_w4_experts)
    scales: jax.Array,       # [E, K//G, N] f32
    group_sizes: jax.Array,  # [E] int32, sums to M
    zeros: Optional[jax.Array] = None,
    block_m: Optional[int] = None,
    block_k: Optional[int] = None,
    mixed: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Grouped ``out[i] = xs[i] @ deq(W[g(i)])`` with rows grouped by expert.

    Returns f32 [M, N]."""
    M, K = xs.shape
    E, n_n, half, BN = packed.shape
    N = n_n * BN
    n_scale_groups = scales.shape[1]
    G = K // n_scale_groups
    unit = 128 if G >= K else G  # minimum k-block granularity

    use_pallas = is_tpu_backend() if interpret is None else True
    import os as _os
    if interpret is None and _os.environ.get("TLLM_W4A16_INTERPRET") == "1":
        use_pallas, interpret = True, True
    if K % max(unit, 128) != 0 or unit % 2 != 0 or BN % 128 != 0:
        use_pallas = False
    if not use_pallas:
        return w4a16_grouped_matmul_xla(xs, packed, scales, group_sizes,
                                        zeros)
    from tensorrt_llm_tpu.ops.w4a16_gemm import _pick_block_k
    if block_m is None and block_k is None:
        from tensorrt_llm_tpu.autotuner import AutoTuner
        tactic = AutoTuner.get().lookup("w4a16_gmm", (K, N, E)) or {}
        block_m, block_k = tactic.get("block_m"), tactic.get("block_k")
        mixed = tactic.get("mixed", mixed)
    # VMEM budget (16MB scoped): 2x packed [BK/2,BN] + 2x x [TM,BK]bf16
    # + out/acc [TM,BN]f32 must fit.
    max_bk = K
    while max_bk * BN + 512 * max_bk * 4 > 6 * 1024 * 1024 \
            and max_bk > unit:
        max_bk //= 2
    bk = block_k or _pick_block_k(K, unit, max_bk)
    # measured on v5e: small m-tiles win (the accumulator-side scale multiply
    # scales with TM; extra boundary work units are cheap next to it)
    tm = block_m or min(256, max(32, round_up(M // 8, 32)))
    Mp = round_up(M, tm)
    if Mp != M:
        xs = jnp.pad(xs, ((0, Mp - M), (0, 0)))
    out = _w4a16_gmm_pallas(xs, packed, scales, zeros, group_sizes,
                            tm, bk, bool(interpret), mixed)
    return out[:M]


def w4a16_gmm_tactic_candidates(K: int, N: int, E: int,
                                group: int = 128) -> list:
    """Autotuner candidates for a grouped expert-weight shape (mirrors
    w4a16_tactic_candidates for the dense kernel)."""
    from tensorrt_llm_tpu.ops.w4a16_gemm import _pick_block_k
    unit = max(group, 128)
    bk_max = _pick_block_k(K, unit)
    bks = sorted({bk_max, max(bk_max // 2, unit)}, reverse=True)
    cands = []
    for bk in bks:
        if K % bk:
            continue
        for tm in (32, 64, 128):
            cands.append({"block_m": tm, "block_k": bk})
    # native-s4 MXU feed (accumulator-scaled) — dropped by the tuner if
    # Mosaic rejects the mixed dot on this device
    cands += [dict(c, mixed=True) for c in list(cands)]
    return cands


def quantize_experts_w4(
    w: jax.Array,            # [E, K, N] float
    group_size: int = 128,
    symmetric: bool = True,
    block_n: Optional[int] = None,
    shards: int = 1,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array], int]:
    """Quantize + tile-pack a stack of expert weights.

    Returns (packed [E, n_n, K//2, BN], scales [E, K//G, N], zeros?, BN)."""
    from tensorrt_llm_tpu.quantization.quantize import quantize_w4
    E, K, N = w.shape
    G = K if group_size in (-1, 0) or group_size > K else group_size
    # small N (< 128 lanes): single tile; the matmul wrapper routes such
    # shapes to the XLA fallback
    bn = block_n or choose_block_n(N, shards) or (N // shards)
    qf = jax.vmap(lambda m: quantize_w4(m, G, symmetric))
    q, scales, zeros = qf(w)
    packed = jax.vmap(lambda qe: pack_w4_tiled(qe, bn))(q)
    return packed, scales, zeros, bn


def dequantize_experts_w4(packed: jax.Array, scales: jax.Array,
                          zeros: Optional[jax.Array] = None) -> jax.Array:
    """[E, n_n, K//2, BN] -> [E, K, N] f32 (tests / fallbacks)."""
    if zeros is not None:
        return jax.vmap(dequantize_w4_any)(packed, scales, zeros)
    return jax.vmap(lambda p, s: dequantize_w4_any(p, s))(packed, scales)
