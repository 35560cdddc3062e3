"""Fused W4A16 (bf16-act x int4-weight) GEMM as a Pallas MXU kernel.

TPU-native replacement for the reference's CUTLASS ``fpA_intB`` runner
(`cpp/.../cutlass_kernels/fpA_intB_gemm/fpA_intB_gemm.h:47-89`, SM90 launcher
`launchers/fpA_intB_launcher_sm90.inl:126-171`) and its small-M companion
(`cpp/.../kernels/weightOnlyBatchedGemv/`).  Instead of TMA + warp-specialized
WGMMA with an interleaved-B layout, we:

  * stream int8 nibble-packed weights HBM→VMEM through the Pallas grid
    pipeline (the TMA analog — double-buffered block DMA),
  * sign-extend nibbles with two arithmetic shifts on the VPU (the packing in
    `quantization/quantize.py` is chosen so no interleave/permute is needed),
  * feed the MXU with bf16 ``x_g @ q_g`` sub-matmuls per scale group and apply
    the f32 per-group scale to the *accumulator* — the scale never touches the
    [K, N] weight tile, and zero points fold into a rank-1 correction:

        out = sum_g  s_g * (x_g @ q_g)  -  rowsum(x_g) * (s_g * z_g)

  * fuse bias add + activation (SiLU/GELU) into the epilogue, mirroring the
    reference's epilogue fusion (`fpA_intB_launcher_sm90.inl:142-148`).

The kernel is decode-shape friendly: for M<=64 it is purely HBM-bandwidth
bound (reads K*N/2 weight bytes once), which is the speed-of-light target from
BASELINE.md.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrt_llm_tpu.quantization.quantize import (
    dequantize_w4_any, pack_group_for)
from tensorrt_llm_tpu.utils import cdiv, is_tpu_backend, round_up

BLOCK_N = 256  # default/fallback output-column block

_ACTIVATIONS = {
    None: lambda x: x,
    "silu": jax.nn.silu,
    "gelu": functools.partial(jax.nn.gelu, approximate=True),
    "relu": jax.nn.relu,
    # Nemotron squared ReLU
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
}


def _w4a16_kernel(
    x_ref,        # [BM, BK] bf16
    p_ref,        # [BK//2, BN] int8 (K-paired packed nibbles)
    s_ref,        # [total_groups, BN] f32 scales (full group dim)
    *rest,        # optional z_ref, optional b_ref, then out_ref, acc_ref
    n_chunks: int,
    pack_group: int,
    per_channel: bool,
    has_zeros: bool,
    has_bias: bool,
    activation: Optional[str],
    out_dtype,
):
    it = iter(rest)
    z_ref = next(it) if has_zeros else None
    b_ref = next(it) if has_bias else None
    out_ref = next(it)
    acc_ref = next(it)

    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    Gp, Gh = pack_group, pack_group // 2
    for c in range(n_chunks):
        # Sign-extend nibbles: low = (b << 28) >> 28, high = (b << 24) >> 28
        # (arithmetic shifts on int32 lanes).  lo covers the chunk's first
        # half rows, hi the second half (see quantize.pack_w4) — feeding two
        # half-K dots avoids the cross-sublane concat relayout (a measurable
        # VPU saving; the tiled+bitcast kernel below is faster still).
        p32 = p_ref[c * Gh:(c + 1) * Gh, :].astype(jnp.int32)
        lo = (jnp.left_shift(p32, 28) >> 28).astype(jnp.bfloat16)
        hi = (jnp.left_shift(p32, 24) >> 28).astype(jnp.bfloat16)
        x_c = x_ref[:, c * Gp:(c + 1) * Gp]
        partial = (
            jnp.dot(x_c[:, :Gh], lo, preferred_element_type=jnp.float32)
            + jnp.dot(x_c[:, Gh:], hi, preferred_element_type=jnp.float32))
        row = 0 if per_channel else k_idx * n_chunks + c
        s_g = s_ref[pl.ds(row, 1), :]  # [1, BN]
        acc = acc + partial * s_g
        if has_zeros:
            xsum = jnp.sum(x_c.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc - xsum * (s_g * z_ref[pl.ds(row, 1), :])
    acc_ref[:] = acc

    @pl.when(k_idx == n_k - 1)
    def _epilogue():
        r = acc_ref[:]
        if has_bias:
            r = r + b_ref[0, :][None, :].astype(jnp.float32)
        r = _ACTIVATIONS[activation](r)
        out_ref[:] = r.astype(out_dtype)


def _pick_block_k(K: int, G: int, max_block_k: int = 4096) -> int:
    """Largest multiple of G that divides K, capped at max_block_k."""
    if G >= K:
        # per-channel: any divisor of K that is lane-tile friendly
        for bk in (512, 256, 128, 64, 32, 16, 8):
            if K % bk == 0 and bk <= max(K, 8):
                return min(bk, K)
        return K
    best = G
    for mult in range(max_block_k // G, 0, -1):
        if K % (mult * G) == 0:
            best = mult * G
            break
    return best


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "block_k",
                     "block_n", "interpret"),
)
def _w4a16_matmul_pallas(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    zeros: Optional[jax.Array],
    bias: Optional[jax.Array],
    activation: Optional[str],
    out_dtype,
    block_m: int,
    block_k: int,
    block_n: int,
    interpret: bool,
):
    M, K = x.shape
    N = packed.shape[1]
    n_scale_groups = scales.shape[0]
    G = K // n_scale_groups
    Gp = pack_group_for(K, n_scale_groups)

    BM, BK, BN = block_m, block_k, block_n
    assert BK % Gp == 0 and K % BK == 0 and N % BN == 0, (BK, Gp, K, N, BN)
    n_chunks = BK // Gp
    n_m, n_n, n_k = cdiv(M, BM), N // BN, K // BK

    in_specs = [
        pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
        pl.BlockSpec((BK // 2, BN), lambda i, j, k: (k, j)),
    ]
    # Scales/zeros: TPU blocks need sublane multiples of 8 (or the full dim),
    # so we hand the kernel the *entire* group dim for this column block (it
    # is tiny vs. the packed weights) and index rows dynamically.
    sblock = (n_scale_groups, BN)
    smap = lambda i, j, k: (0, j)
    in_specs.append(pl.BlockSpec(sblock, smap))
    operands = [x.astype(jnp.bfloat16), packed, scales.astype(jnp.float32)]
    if zeros is not None:
        in_specs.append(pl.BlockSpec(sblock, smap))
        operands.append(zeros.astype(jnp.float32))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, BN), lambda i, j, k: (0, j)))
        operands.append(bias.reshape(1, N).astype(jnp.float32))

    kernel = functools.partial(
        _w4a16_kernel,
        n_chunks=n_chunks,
        pack_group=Gp,
        per_channel=G >= K,
        has_zeros=zeros is not None,
        has_bias=bias is not None,
        activation=activation,
        out_dtype=out_dtype,
    )

    flops = 2 * M * N * K
    bytes_accessed = K * N // 2 + M * K * 2 + M * N * 2 + scales.size * 4

    return pl.pallas_call(
        kernel,
        grid=(n_m, n_n, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((round_up(M, BM), N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(*operands)


def _w4a16_kernel_tiled(
    x_ref,        # [BM, BK] bf16
    p_ref,        # [1, BK//2, BN] int8 (row-interleaved nibbles, tiled)
    s_ref,        # s_kmapped: [n_chunks, BN] bf16 (this k-step's groups,
                  #            static row per chunk — no dynamic sublane
                  #            index, which Mosaic rejects for bf16)
                  # else:      [total_groups, BN] f32 (full dim, dynamic ds)
    *rest,
    n_chunks: int,
    pack_group: int,
    per_channel: bool,
    has_zeros: bool,
    has_bias: bool,
    activation: Optional[str],
    out_dtype,
    mixed: bool = False,
    s_kmapped: bool = False,
):
    it = iter(rest)
    z_ref = next(it) if has_zeros else None
    b_ref = next(it) if has_bias else None
    out_ref = next(it)
    acc_ref = next(it)

    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    Gp, Gh = pack_group, pack_group // 2
    for c in range(n_chunks):
        # Mosaic's native int4 view: one upcast per weight element, no
        # shift/mask VPU work.  Measured on v5e (K=4096, N=28672, M=16):
        # 535 GB/s (shift unpack, strided pages) -> 638-677 GB/s (this
        # path), ~80% of the 819 GB/s roofline; smaller shapes are capped
        # by the grid-pipeline ramp (first weight DMA not overlapped).
        # Bottleneck analysis (v5e probes): dequant+dot WITHOUT the group
        # scale sustains 719 GB/s (88%) and XLA's own int8->bf16 fused dot
        # 746 GB/s (91%) — the remaining ~8% is the per-chunk f32
        # scale-FMA on the accumulator, which Mosaic rejects in bf16
        # (matmul acc must be 32-bit) and which multi-accumulator splits
        # made worse; weight-tile scaling costs 2x more (439 GB/s).
        # XLA cannot replace this kernel: int4 arrays reach 91% only as
        # native S4 storage, and the int8->nibble bitcast relayout
        # de-fuses into a materialized transpose (35 GB/s).
        pblk = p_ref[0, c * Gh:(c + 1) * Gh, :]
        w4 = pltpu.bitcast(pblk, jnp.int4)
        # mixed: hand the s4 view straight to the dot and let Mosaic fold
        # the upcast into the MXU feed (tactic-gated; measured on device)
        w_c = w4 if mixed else w4.astype(jnp.bfloat16)  # [Gp, BN]
        x_c = x_ref[:, c * Gp:(c + 1) * Gp]
        partial = jnp.dot(x_c, w_c, preferred_element_type=jnp.float32)
        if s_kmapped:
            s_g = s_ref[c:c + 1, :].astype(jnp.float32)
            z_g = (z_ref[c:c + 1, :].astype(jnp.float32)
                   if has_zeros else None)
        else:
            row = 0 if per_channel else k_idx * n_chunks + c
            s_g = s_ref[pl.ds(row, 1), :]
            z_g = z_ref[pl.ds(row, 1), :] if has_zeros else None
        acc = partial * s_g + acc
        if has_zeros:
            xsum = jnp.sum(x_c.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc - xsum * (s_g * z_g)
    acc_ref[:] = acc

    @pl.when(k_idx == n_k - 1)
    def _epilogue():
        r = acc_ref[:]
        if has_bias:
            r = r + b_ref[0, :][None, :].astype(jnp.float32)
        r = _ACTIVATIONS[activation](r)
        out_ref[:] = r.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "block_k",
                     "mixed", "interpret"),
)
def _w4a16_matmul_pallas_tiled(
    x: jax.Array,
    packed3: jax.Array,     # [N//BN, K//2, BN]
    scales: jax.Array,
    zeros: Optional[jax.Array],
    bias: Optional[jax.Array],
    activation: Optional[str],
    out_dtype,
    block_m: int,
    block_k: int,
    interpret: bool,
    mixed: bool = False,
):
    M, K = x.shape
    n_n, half, BN = packed3.shape
    N = n_n * BN
    n_scale_groups = scales.shape[0]
    G = K // n_scale_groups
    Gp = pack_group_for(K, n_scale_groups)

    BM, BK = block_m, block_k
    assert BK % Gp == 0 and K % BK == 0, (BK, Gp, K)
    n_chunks = BK // Gp
    n_m, n_k = cdiv(M, BM), K // BK

    # Scales/zeros stream as bf16 when the per-k-step group rows tile
    # cleanly (half the HBM bytes; the reference's CUTLASS fpA_intB stores
    # half-precision scales too): the block is k-mapped so every in-kernel
    # row index is STATIC — Mosaic rejects dynamic sublane indices on bf16.
    # Otherwise fall back to the full-group-dim f32 block + dynamic ds.
    s_kmapped = (not (G >= K)) and n_chunks % 16 == 0
    if s_kmapped:
        s_spec = pl.BlockSpec((n_chunks, BN), lambda i, j, k: (k, j))
        s_dtype = jnp.bfloat16
    else:
        s_spec = pl.BlockSpec((n_scale_groups, BN), lambda i, j, k: (0, j))
        s_dtype = jnp.float32
    in_specs = [
        pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
        pl.BlockSpec((1, BK // 2, BN), lambda i, j, k: (j, k, 0)),
        s_spec,
    ]
    operands = [x.astype(jnp.bfloat16), packed3, scales.astype(s_dtype)]
    if zeros is not None:
        in_specs.append(s_spec)
        operands.append(zeros.astype(s_dtype))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, BN), lambda i, j, k: (0, j)))
        operands.append(bias.reshape(1, N).astype(jnp.float32))

    kernel = functools.partial(
        _w4a16_kernel_tiled,
        n_chunks=n_chunks,
        pack_group=Gp,
        per_channel=G >= K,
        has_zeros=zeros is not None,
        has_bias=bias is not None,
        activation=activation,
        out_dtype=out_dtype,
        mixed=mixed,
        s_kmapped=s_kmapped,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_m, n_n, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((round_up(M, BM), N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N // 2 + M * K * 2 + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands)


RAMP_SLAB = 1024  # K rows per manual-DMA slab (512 packed rows)


def _w4a16_kernel_ramp(
    x_ref,        # [BM, K] bf16 (whole K resident)
    s_ref,        # [total_groups, BN] f32
    *rest,        # opt z_ref, opt b_ref, p_hbm(ANY), out_ref, w_buf, acc, sem
    steps_per_j: int,
    slabs_at: tuple,
    slab_off: tuple,
    pack_group: int,
    per_channel: bool,
    n_j: int,
    has_zeros: bool,
    has_bias: bool,
    activation: Optional[str],
    out_dtype,
    mixed: bool = False,
):
    """Manual-DMA W4A16 kernel with a non-uniform k schedule.

    The grid-pipelined tiled kernel pays one un-overlapped weight DMA per
    (i, j) block — ~20% of a (16,4096,4096) call at bk=4096.  Here the
    kernel drives its own double-buffered slab copies over a FLAT (j, k)
    step sequence, so the whole call has exactly ONE cold DMA, and the ramp
    schedule makes that first chunk a single slab while steady-state steps
    stay large.  The scale FMA is ordered `partial * s + acc` so Mosaic can
    emit a fused multiply-add.  (The CUTLASS analog is the persistent tile
    scheduler in `launchers/fpA_intB_launcher_sm90.inl` — same goal: no
    per-tile pipeline restart.)"""
    it = iter(rest)
    z_ref = next(it) if has_zeros else None
    b_ref = next(it) if has_bias else None
    p_hbm = next(it)      # [n_n, n_slabs, SLAB//2, BN] int8 ANY
    out_ref = next(it)
    w_buf = next(it)      # [2, big, SLAB//2, BN] int8 VMEM
    acc_ref = next(it)
    sems = next(it)
    t = pl.program_id(1)
    S = steps_per_j
    n_t = S * n_j
    Gp = pack_group

    def dma(flat, slot, wait):
        j = flat // S
        k = flat % S
        for step in range(S):
            @pl.when(k == step)
            def _():
                ns = slabs_at[step]
                cp = pltpu.make_async_copy(
                    p_hbm.at[j, pl.ds(slab_off[step], ns)],
                    w_buf.at[slot, pl.ds(0, ns)],
                    sems.at[slot],
                )
                cp.wait() if wait else cp.start()

    @pl.when(t == 0)
    def _first():
        dma(0, 0, wait=False)

    @pl.when((t % S) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(t + 1 < n_t)
    def _prefetch():
        dma(t + 1, (t + 1) % 2, wait=False)

    dma(t, t % 2, wait=True)
    slot = t % 2
    k = t % S

    acc = acc_ref[:]
    for step in range(S):
        @pl.when(k == step)
        def _():
            ns = slabs_at[step]
            k_base = slab_off[step] * RAMP_SLAB
            cps = RAMP_SLAB // Gp
            a = acc
            for sl in range(ns):
                for c in range(cps):
                    pblk = w_buf[slot, sl,
                                 c * (Gp // 2):(c + 1) * (Gp // 2), :]
                    w4 = pltpu.bitcast(pblk, jnp.int4)
                    w_c = w4 if mixed else w4.astype(jnp.bfloat16)
                    k0 = k_base + sl * RAMP_SLAB + c * Gp
                    x_c = x_ref[:, k0:k0 + Gp]
                    partial = jnp.dot(x_c, w_c,
                                      preferred_element_type=jnp.float32)
                    row = 0 if per_channel else k0 // Gp
                    s_g = s_ref[pl.ds(row, 1), :]
                    a = partial * s_g + a
                    if has_zeros:
                        xsum = jnp.sum(x_c.astype(jnp.float32), axis=1,
                                       keepdims=True)
                        a = a - xsum * (s_g * z_ref[pl.ds(row, 1), :])
            acc_ref[:] = a

    @pl.when((t % S) == S - 1)
    def _epilogue():
        r = acc_ref[:]
        if has_bias:
            r = r + b_ref[0, :][None, :].astype(jnp.float32)
        r = _ACTIVATIONS[activation](r)
        out_ref[:] = r.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "schedule",
                     "mixed", "interpret"),
)
def _w4a16_matmul_ramp(
    x: jax.Array,
    packed4: jax.Array,     # [n_n, n_slabs, SLAB//2, BN]
    scales: jax.Array,
    zeros: Optional[jax.Array],
    bias: Optional[jax.Array],
    activation: Optional[str],
    out_dtype,
    block_m: int,
    schedule: tuple,        # slabs per k step, sum == n_slabs
    interpret: bool,
    mixed: bool = False,
):
    M, K = x.shape
    n_n, n_slabs, half_slab, BN = packed4.shape
    N = n_n * BN
    n_scale_groups = scales.shape[0]
    G = K // n_scale_groups
    Gp = pack_group_for(K, n_scale_groups)
    S = len(schedule)
    big = max(schedule)
    offs = []
    o = 0
    for v in schedule:
        offs.append(o)
        o += v

    in_specs = [
        pl.BlockSpec((block_m, K), lambda i, t: (0, 0)),
        pl.BlockSpec((n_scale_groups, BN), lambda i, t, S=S: (0, t // S)),
    ]
    operands = [x.astype(jnp.bfloat16), scales.astype(jnp.float32)]
    if zeros is not None:
        in_specs.append(pl.BlockSpec((n_scale_groups, BN),
                                     lambda i, t, S=S: (0, t // S)))
        operands.append(zeros.astype(jnp.float32))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, BN), lambda i, t, S=S: (0, t // S)))
        operands.append(bias.reshape(1, N).astype(jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands.append(packed4)

    kernel = functools.partial(
        _w4a16_kernel_ramp,
        steps_per_j=S,
        slabs_at=tuple(schedule),
        slab_off=tuple(offs),
        pack_group=Gp,
        per_channel=G >= K,
        n_j=n_n,
        has_zeros=zeros is not None,
        has_bias=bias is not None,
        activation=activation,
        out_dtype=out_dtype,
        mixed=mixed,
    )
    return pl.pallas_call(
        kernel,
        grid=(1, n_n * S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, BN), lambda i, t, S=S: (0, t // S)),
        out_shape=jax.ShapeDtypeStruct((round_up(M, block_m), N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, big, RAMP_SLAB // 2, BN), jnp.int8),
            pltpu.VMEM((block_m, BN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N // 2 + M * K * 2 + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands)


def _w4a16_kernel_stream(
    x_ref,        # [BM, K] bf16 (whole K resident; single m block)
    s_ref,        # [total_groups, BN] f32 (j-mapped full group dim)
    *rest,        # opt z_ref, opt b_ref, p_hbm(ANY), out_ref, w_buf, acc, sem
    n_k: int,
    slab: int,            # K rows per DMA slab
    lookahead: int,
    n_t: int,
    pack_group: int,
    per_channel: bool,
    has_zeros: bool,
    has_bias: bool,
    activation: Optional[str],
    out_dtype,
    mixed: bool = False,
):
    """Flat-grid W4A16 kernel: ONE sequential weight stream, uniform
    manual-DMA slabs, lookahead >= 2 (the r2-verdict plan).

    The grid-pipelined tiled kernel restarts its pipeline per call and the
    r2 ramp kernel's non-uniform pl.when schedule defeated Mosaic; here
    the flat (j*k) step sequence walks the [n_n, K//2, BN] weight tiles in
    HBM storage order with `lookahead` uniform slab copies in flight, so
    the only cold DMA is one SLAB (slab/2 * BN bytes) rather than a whole
    [BK//2, BN] block, and HBM stays saturated across j boundaries.  x is
    VMEM-resident for the whole call (decode shapes: M <= 64);
    the accumulator lives in VMEM scratch and the scale FMA keeps the
    `partial * s + acc` ordering Mosaic fuses."""
    it = iter(rest)
    z_ref = next(it) if has_zeros else None
    b_ref = next(it) if has_bias else None
    p_hbm = next(it)      # [n_n, K//2, BN] int8 ANY
    out_ref = next(it)
    w_buf = next(it)      # [L, slab//2, BN] int8 VMEM
    acc_ref = next(it)
    sems = next(it)

    t = pl.program_id(0)
    L = lookahead
    half = slab // 2
    Gp, Gh = pack_group, pack_group // 2
    cps = slab // Gp

    def copy_for(tt, slot):
        jj = tt // n_k
        kk = tt - jj * n_k
        return pltpu.make_async_copy(
            p_hbm.at[jj, pl.ds(kk * half, half)],
            w_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _prologue():
        for l in range(min(L, n_t)):
            copy_for(l, l).start()

    @pl.when((t > 0) & (t + L - 1 < n_t))
    def _prefetch():
        copy_for(t + L - 1, (t + L - 1) % L).start()

    slot = t % L
    copy_for(t, slot).wait()

    k = t % n_k

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    for c in range(cps):
        pblk = w_buf[slot, c * Gh:(c + 1) * Gh, :]
        w4 = pltpu.bitcast(pblk, jnp.int4)
        w_c = w4 if mixed else w4.astype(jnp.bfloat16)     # [Gp, BN]
        x_c = x_ref[:, pl.ds(k * slab + c * Gp, Gp)]       # traced k: ds
        partial = jnp.dot(x_c, w_c, preferred_element_type=jnp.float32)
        if per_channel:
            s_g = s_ref[pl.ds(0, 1), :]
        else:
            s_g = s_ref[pl.ds(k * cps + c, 1), :]
        acc = partial * s_g + acc
        if has_zeros:
            z_g = (z_ref[pl.ds(0, 1), :] if per_channel
                   else z_ref[pl.ds(k * cps + c, 1), :])
            xsum = jnp.sum(x_c.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc - xsum * (s_g * z_g)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _epilogue():
        r = acc_ref[:]
        if has_bias:
            r = r + b_ref[0, :][None, :].astype(jnp.float32)
        r = _ACTIVATIONS[activation](r)
        out_ref[:] = r.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "slab",
                     "lookahead", "mixed", "interpret"),
)
def _w4a16_matmul_stream(
    x: jax.Array,
    packed3: jax.Array,     # [n_n, K//2, BN]
    scales: jax.Array,
    zeros: Optional[jax.Array],
    bias: Optional[jax.Array],
    activation: Optional[str],
    out_dtype,
    block_m: int,
    slab: int,
    lookahead: int,
    interpret: bool,
    mixed: bool = False,
):
    M, K = x.shape
    n_n, half, BN = packed3.shape
    N = n_n * BN
    n_scale_groups = scales.shape[0]
    G = K // n_scale_groups
    Gp = pack_group_for(K, n_scale_groups)
    n_k = K // slab
    n_t = n_n * n_k

    in_specs = [
        pl.BlockSpec((block_m, K), lambda t: (0, 0)),
        pl.BlockSpec((n_scale_groups, BN), lambda t, nk=n_k: (0, t // nk)),
    ]
    operands = [x.astype(jnp.bfloat16), scales.astype(jnp.float32)]
    if zeros is not None:
        in_specs.append(pl.BlockSpec((n_scale_groups, BN),
                                     lambda t, nk=n_k: (0, t // nk)))
        operands.append(zeros.astype(jnp.float32))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, BN),
                                     lambda t, nk=n_k: (0, t // nk)))
        operands.append(bias.reshape(1, N).astype(jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands.append(packed3)

    kernel = functools.partial(
        _w4a16_kernel_stream,
        n_k=n_k,
        slab=slab,
        lookahead=lookahead,
        n_t=n_t,
        pack_group=Gp,
        per_channel=G >= K,
        has_zeros=zeros is not None,
        has_bias=bias is not None,
        activation=activation,
        out_dtype=out_dtype,
        mixed=mixed,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, BN),
                               lambda t, nk=n_k: (0, t // nk)),
        out_shape=jax.ShapeDtypeStruct((round_up(M, block_m), N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((lookahead, slab // 2, BN), jnp.int8),
            pltpu.VMEM((block_m, BN), jnp.float32),
            pltpu.SemaphoreType.DMA((lookahead,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N // 2 + M * K * 2 + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands)


def ramp_schedule(K: int, bk0: int = RAMP_SLAB,
                  bk_big: int = 4 * RAMP_SLAB) -> tuple:
    """First step one small slab (the only cold DMA), then big steps."""
    n_slabs = K // RAMP_SLAB
    sched = [min(max(1, bk0 // RAMP_SLAB), n_slabs)]
    rest = n_slabs - sched[0]
    big = max(1, bk_big // RAMP_SLAB)
    while rest > 0:
        take = min(big, rest)
        sched.append(take)
        rest -= take
    return tuple(sched)


def w4a16_tactic_candidates(K: int, N: int, tiled: bool,
                            group: int = 128) -> list:
    """Autotuner candidate tactics for a W4A16 weight shape — shared by
    engine warmup (ModelEngine.autotune_kernels) and bench.py so both
    always time the same tactic set.

    v5e measurements (benchmarks/probe_r2{b,c,d}.py, M=16 decode shapes):
    the LARGEST blocks win — per-k-step splits re-DMA the x tile and the
    cold-DMA saving never pays for it (bk=4096: 72.3%, bk=2048: 66.6%,
    bk=1024: 54.5% of roofline at bn=1024), the native-s4 MXU feed
    ("mixed") is worth ~+3% over an explicit VPU upcast, and the
    manual-DMA ramp variant loses everywhere (41-53%) — its S-way
    pl.when-unrolled body defeats Mosaic's pipeliner.  Candidates are
    best-first so a partially-warmed autotune cache is already good."""
    G = max(group, 128)
    bk_max = _pick_block_k(K, G)
    if tiled:
        # native-s4 MXU feed first (measured winner); explicit-upcast
        # fallback kept for devices where Mosaic rejects the mixed dot
        cands = [{"block_k": bk_max, "mixed": True},
                 {"block_k": bk_max}]
        half = max(bk_max // 2, G)
        if K % half == 0 and half != bk_max:
            cands.append({"block_k": half, "mixed": True})
        if K % RAMP_SLAB == 0 and RAMP_SLAB % max(G, 128) == 0:
            # flat-grid manual-DMA stream (single cold SLAB per call):
            # the r2-verdict pipeline plan.  r5 on-chip tactic probe
            # (tpu_return_logs/r5_tactics.log): the 2K-slab stream beats
            # the tiled grid by ~5 points at the small decode shapes
            # (73.1% vs 67.8% at 16x4096x4096), so it leads.
            if K % (2 * RAMP_SLAB) == 0:
                cands.insert(0, {"variant": "stream", "mixed": True,
                                 "ramp_bk0": 2 * RAMP_SLAB})
            cands.append({"variant": "stream", "mixed": True})
            cands.append({"variant": "stream", "mixed": True,
                          "lookahead": 8})
        return cands
    return [{"block_k": bk} for bk in
            {bk_max, max(bk_max // 2, G)} if K % bk == 0]


def w4a16_matmul_xla(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    zeros: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = None,
    out_dtype=None,
) -> jax.Array:
    """Pure-XLA fallback (CPU tests / shapes the kernel doesn't cover)."""
    out_dtype = out_dtype or x.dtype
    # bf16 scale rounding matches the Pallas kernels' half-precision scale
    # storage (reference parity: CUTLASS fpA_intB uses half scales)
    scales = scales.astype(jnp.bfloat16)
    zeros = zeros.astype(jnp.bfloat16) if zeros is not None else None
    w = dequantize_w4_any(packed, scales, zeros)
    out = jnp.dot(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    out = _ACTIVATIONS[activation](out)
    return out.astype(out_dtype)


def w4a16_matmul(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    zeros: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = None,
    out_dtype=None,
    block_m: Optional[int] = None,
    block_k: Optional[int] = None,
    block_n: Optional[int] = None,
    variant: Optional[str] = None,
    ramp_bk0: Optional[int] = None,
    ramp_bk_big: Optional[int] = None,
    lookahead: int = 4,
    mixed: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused dequant-GEMM: ``act(x @ deq(packed, scales, zeros) + bias)``.

    Args:
      x: ``[..., K]`` activations (any float dtype; computed in bf16).
      packed: ``[K//2, N]`` int8 K-paired int4 weights (see pack_w4).
      scales: ``[K//G, N]`` f32 per-group scales (G may equal K: per-channel).
      zeros: optional ``[K//G, N]`` f32 zero points (same signed domain as q).
      bias: optional ``[N]``.
      activation: None | 'silu' | 'gelu' | 'relu' (fused epilogue).
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    tiled = packed.ndim == 3
    N = packed.shape[0] * packed.shape[2] if tiled else packed.shape[1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    # Half-precision scale/zero storage on every path (see w4a16_matmul_xla)
    scales = scales.astype(jnp.bfloat16)
    zeros = zeros.astype(jnp.bfloat16) if zeros is not None else None

    n_scale_groups = scales.shape[0]
    G = K // n_scale_groups
    Gp = pack_group_for(K, n_scale_groups)
    use_pallas = is_tpu_backend() if interpret is None else True
    if interpret is None and os.environ.get("TLLM_W4A16_INTERPRET") == "1":
        # CI hook: run the real Pallas kernel in interpret mode on CPU
        use_pallas, interpret = True, True
    if N % 128 != 0 or K % max(Gp, 128) != 0 or Gp % 2 != 0:
        use_pallas = False
    if not use_pallas:
        out = w4a16_matmul_xla(x2, packed, scales, zeros, bias, activation,
                               out_dtype)
        return out.reshape(*lead, N)
    if tiled:
        if block_k is None and variant is None:
            from tensorrt_llm_tpu.autotuner import AutoTuner
            tactic = AutoTuner.get().lookup("w4a16", (K, N, 1)) or {}
            block_k = tactic.get("block_k")
            variant = tactic.get("variant")
            ramp_bk0 = tactic.get("ramp_bk0", ramp_bk0)
            ramp_bk_big = tactic.get("ramp_bk_big", ramp_bk_big)
            lookahead = tactic.get("lookahead", lookahead)
            mixed = tactic.get("mixed", mixed)
        bm = block_m or min(256, max(16, round_up(M, 16)))
        ramp_ok = (
            variant == "ramp"
            and K % RAMP_SLAB == 0 and RAMP_SLAB % Gp == 0
            and round_up(M, bm) == bm    # single M block (decode shapes)
            and bm * K * 2 <= (8 << 20))  # whole-K x tile must fit VMEM
        Mp = round_up(M, bm)
        slab = ramp_bk0 or RAMP_SLAB
        stream_ok = (
            variant == "stream"
            and K % slab == 0 and slab % Gp == 0
            and round_up(M, bm) == bm    # single M block (decode shapes)
            and bm * K * 2 <= (8 << 20))
        if Mp != M:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        if stream_ok:
            out = _w4a16_matmul_stream(
                x2, packed, scales, zeros, bias, activation, out_dtype,
                bm, slab, max(2, int(lookahead)), bool(interpret), mixed)
        elif ramp_ok:
            n_n, half, BN = packed.shape
            sched = ramp_schedule(K, ramp_bk0 or RAMP_SLAB,
                                  ramp_bk_big or 4 * RAMP_SLAB)
            out = _w4a16_matmul_ramp(
                x2, packed.reshape(n_n, K // RAMP_SLAB, RAMP_SLAB // 2, BN),
                scales, zeros, bias, activation, out_dtype,
                bm, sched, bool(interpret), mixed)
        else:
            bk = block_k or _pick_block_k(K, max(G if G < K else Gp, 128))
            out = _w4a16_matmul_pallas_tiled(
                x2, packed, scales, zeros, bias, activation, out_dtype,
                bm, bk, bool(interpret), mixed)
        if Mp != M:
            out = out[:M]
        return out.reshape(*lead, N)

    if block_k is None:
        from tensorrt_llm_tpu.autotuner import AutoTuner
        tactic = AutoTuner.get().lookup("w4a16", (K, N, 0))
        block_k = (tactic or {}).get("block_k")
    bk = block_k or _pick_block_k(K, max(G if G < K else Gp, 128))
    bn = block_n or 1024  # 1024 saturates HBM on v5e (99% roofline at K=4096)
    while N % bn:  # fall back to the next dividing width
        bn -= 128
    bn = max(bn, 128)
    bm = block_m or min(256, max(16, round_up(M, 16)))
    Mp = round_up(M, bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _w4a16_matmul_pallas(
        x2, packed, scales, zeros, bias, activation, out_dtype,
        bm, bk, bn, bool(interpret))
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, N)


# --------------------------------------------------------------- W4A8 ------
#
# int4 weights x dynamic per-token INT8 activations (reference W4A8_AWQ,
# `_torch/modules/linear.py` W4A8 method over the same CutlassFpAIntBGemmRunner
# family).  TPU-first twist: the reference's W4A8 feeds FP8 activations into
# SM90 tensor cores; v5e has no fp8 MXU but int8xint8->int32 runs at 2x the
# bf16 MXU rate, so the TPU-native W4A8 is int8-act SmoothQuant-style:
#
#   out = s_act[m] * sum_g [ s_g * (xq_g @ q_g) - rowsum(xq_g) * s_g * z_g ]
#
# Per-group weight scales ride the int32 accumulator exactly as in the bf16
# kernel; the per-token activation scale folds into the epilogue.

def _w4a8_kernel_tiled(
    x_ref,        # [BM, BK] int8 (dynamic per-token quantized)
    p_ref,        # [1, BK//2, BN] int8 (row-interleaved nibbles, tiled)
    s_ref,        # [total_groups, BN] f32
    sa_ref,       # [BM, 1] f32 per-token activation scales
    *rest,
    n_chunks: int,
    pack_group: int,
    per_channel: bool,
    has_zeros: bool,
    has_bias: bool,
    activation: Optional[str],
    out_dtype,
):
    it = iter(rest)
    z_ref = next(it) if has_zeros else None
    b_ref = next(it) if has_bias else None
    out_ref = next(it)
    acc_ref = next(it)

    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    Gp, Gh = pack_group, pack_group // 2
    for c in range(n_chunks):
        pblk = p_ref[0, c * Gh:(c + 1) * Gh, :]
        w8 = pltpu.bitcast(pblk, jnp.int4).astype(jnp.int8)  # [Gp, BN]
        x_c = x_ref[:, c * Gp:(c + 1) * Gp]
        partial = jnp.dot(x_c, w8, preferred_element_type=jnp.int32)
        row = 0 if per_channel else k_idx * n_chunks + c
        s_g = s_ref[pl.ds(row, 1), :]
        acc = acc + partial.astype(jnp.float32) * s_g
        if has_zeros:
            xsum = jnp.sum(x_c.astype(jnp.int32), axis=1,
                           keepdims=True).astype(jnp.float32)
            acc = acc - xsum * (s_g * z_ref[pl.ds(row, 1), :])
    acc_ref[:] = acc

    @pl.when(k_idx == n_k - 1)
    def _epilogue():
        r = acc_ref[:] * sa_ref[:]
        if has_bias:
            r = r + b_ref[0, :][None, :].astype(jnp.float32)
        r = _ACTIVATIONS[activation](r)
        out_ref[:] = r.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "block_k",
                     "interpret"),
)
def _w4a8_matmul_pallas_tiled(
    xq: jax.Array,          # [M, K] int8
    s_act: jax.Array,       # [M, 1] f32
    packed3: jax.Array,     # [N//BN, K//2, BN]
    scales: jax.Array,
    zeros: Optional[jax.Array],
    bias: Optional[jax.Array],
    activation: Optional[str],
    out_dtype,
    block_m: int,
    block_k: int,
    interpret: bool,
):
    M, K = xq.shape
    n_n, half, BN = packed3.shape
    N = n_n * BN
    n_scale_groups = scales.shape[0]
    G = K // n_scale_groups
    Gp = pack_group_for(K, n_scale_groups)

    BM, BK = block_m, block_k
    assert BK % Gp == 0 and K % BK == 0, (BK, Gp, K)
    n_chunks = BK // Gp
    n_m, n_k = cdiv(M, BM), K // BK

    in_specs = [
        pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
        pl.BlockSpec((1, BK // 2, BN), lambda i, j, k: (j, k, 0)),
        pl.BlockSpec((n_scale_groups, BN), lambda i, j, k: (0, j)),
        pl.BlockSpec((BM, 1), lambda i, j, k: (i, 0)),
    ]
    operands = [xq, packed3, scales.astype(jnp.float32),
                s_act.astype(jnp.float32)]
    if zeros is not None:
        in_specs.append(pl.BlockSpec((n_scale_groups, BN),
                                     lambda i, j, k: (0, j)))
        operands.append(zeros.astype(jnp.float32))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, BN), lambda i, j, k: (0, j)))
        operands.append(bias.reshape(1, N).astype(jnp.float32))

    kernel = functools.partial(
        _w4a8_kernel_tiled,
        n_chunks=n_chunks,
        pack_group=Gp,
        per_channel=G >= K,
        has_zeros=zeros is not None,
        has_bias=bias is not None,
        activation=activation,
        out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_m, n_n, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((round_up(M, BM), N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N // 2 + M * K + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(*operands)


def quantize_act_int8(x: jax.Array):
    """Dynamic per-token symmetric int8 quantization.
    Returns (xq int8 [M, K], s_act f32 [M, 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    s_act = amax / 127.0
    xq = jnp.clip(jnp.round(xf / s_act), -127, 127).astype(jnp.int8)
    return xq, s_act


def w4a8_matmul(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    zeros: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = None,
    out_dtype=None,
    block_m: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``act(s_act * (int8(x) @ deq_int(packed)) + bias)`` — int8-act W4
    GEMM (int8xint8 MXU; per-group scales on the int32 accumulator)."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    xq, s_act = quantize_act_int8(x2)

    tiled = packed.ndim == 3
    N = packed.shape[0] * packed.shape[2] if tiled else packed.shape[1]
    n_scale_groups = scales.shape[0]
    G = K // n_scale_groups
    Gp = pack_group_for(K, n_scale_groups)
    use_pallas = is_tpu_backend() if interpret is None else True
    if interpret is None and os.environ.get("TLLM_W4A16_INTERPRET") == "1":
        use_pallas, interpret = True, True
    if not tiled or N % 128 != 0 or K % max(Gp, 128) != 0 or Gp % 2 != 0:
        use_pallas = False
    if not use_pallas:
        # XLA fallback with IDENTICAL math (int8-quantized acts)
        w = dequantize_w4_any(packed, scales, zeros)
        out = jnp.dot(xq.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * s_act
        if bias is not None:
            out = out + bias.astype(jnp.float32)[None, :]
        out = _ACTIVATIONS[activation](out)
        return out.astype(out_dtype).reshape(*lead, N)

    bm = block_m or min(256, max(16, round_up(M, 16)))
    bk = block_k or _pick_block_k(K, max(G if G < K else Gp, 128))
    Mp = round_up(M, bm)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        s_act = jnp.pad(s_act, ((0, Mp - M), (0, 0)))
    out = _w4a8_matmul_pallas_tiled(
        xq, s_act, packed, scales, zeros, bias, activation, out_dtype,
        bm, bk, bool(interpret))
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, N)
