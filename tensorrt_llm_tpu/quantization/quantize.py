"""Weight quantization + TPU-lane-friendly packing.

TPU-native counterpart of the reference's offline weight preprocessor
(`cpp/.../cutlass_kernels/cutlass_preprocessors.h:33-76` —
`preprocess_weights_for_mixed_gemm`, `add_bias_and_interleave_…`): where the
reference permutes rows and interleaves nibbles to match tensor-core `ldmatrix`
fetch patterns, we pick a packing whose *unpack* is pure lane-local shift/mask
on int8 and whose unpacked row order is already correct for the MXU:

  Rows are paired ALONG K within each quantization group: for a group of G
  rows, packed byte ``[g*G/2 + r, n]`` holds row ``g*G + r`` of W in its LOW
  nibble and row ``g*G + G/2 + r`` in its HIGH nibble.  A kernel reading a
  ``[G/2, BN]`` int8 tile recovers the ``[G, BN]`` weight tile as
  ``concat([lo, hi], axis=0)`` — rows land in natural order, no interleave.

Why K-pairing (not N-pairing): tensor-parallel sharding slices weights along
N (column-parallel) at arbitrary 128-column granularity and along K
(row-parallel) at group granularity — K-pairing inside a group survives both
without repacking.

Values are stored as *signed* int4 in int8 nibbles (two's complement), so
in-kernel extraction is ``(b << 4) >> 4`` (low) and ``b >> 4`` (high) with
arithmetic shifts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Pairing chunk for per-channel (group == K) quantization.
W4_DEFAULT_PACK_GROUP = 256


def pack_group_for(K: int, n_scale_groups: int) -> int:
    """Row-pairing chunk: the scale group when per-group, else the largest
    power of two <= 256 dividing K (per-channel)."""
    G = K // n_scale_groups
    if G < K:
        return G
    gp = W4_DEFAULT_PACK_GROUP
    while gp > 2 and K % gp:
        gp //= 2
    return gp


def quantize_w4(
    w: jax.Array,
    group_size: int = 128,
    symmetric: bool = True,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Per-group int4 quantization of a ``[K, N]`` weight matrix.

    Args:
      w: float weights, shape ``[K, N]`` (K = reduction dim).
      group_size: rows per scale group along K (or -1 for per-channel).
      symmetric: if False, use asymmetric quantization with zero points.

    Returns:
      (q, scales, zeros):
        q      int8 ``[K, N]`` with values in [-8, 7]
        scales f32  ``[K//G, N]``
        zeros  f32  ``[K//G, N]`` (None when symmetric) — stored in the same
               signed domain as q, i.e. dequant = (q - zero) * scale.
    """
    K, N = w.shape
    G = K if group_size in (-1, 0) else group_size
    assert K % G == 0, f"K={K} not divisible by group_size={G}"
    wg = w.astype(jnp.float32).reshape(K // G, G, N)
    if symmetric:
        absmax = jnp.max(jnp.abs(wg), axis=1)  # [K//G, N]
        scales = jnp.maximum(absmax / 7.0, 1e-8)
        q = jnp.clip(jnp.round(wg / scales[:, None, :]), -8, 7)
        zeros = None
    else:
        wmax = jnp.max(wg, axis=1)
        wmin = jnp.min(wg, axis=1)
        scales = jnp.maximum((wmax - wmin) / 15.0, 1e-8)
        # zero point in unsigned [0,15] domain, then shift to signed.
        zu = jnp.clip(jnp.round(-wmin / scales), 0, 15)
        q = jnp.clip(jnp.round(wg / scales[:, None, :]) + zu[:, None, :], 0, 15) - 8
        zeros = (zu - 8).astype(jnp.float32)
    return q.reshape(K, N).astype(jnp.int8), scales.astype(jnp.float32), zeros


def quantize_w8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (per-output-column) int8 quantization of ``[K, N]``."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)  # [N]
    scales = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scales[None, :]), -128, 127).astype(jnp.int8)
    return q, scales.astype(jnp.float32)


def pack_w4(q: jax.Array, pack_group: int = 128) -> jax.Array:
    """Pack signed-int4 values ``[K, N]`` into int8 nibbles ``[K//2, N]``.

    Row pairing per chunk of `pack_group` rows (see module docstring):
    packed[c*Gp/2 + r, n] = (q[c*Gp + r, n] & 0xF) | (q[c*Gp + Gp/2 + r, n] << 4).
    """
    K, N = q.shape
    Gp = pack_group
    assert K % Gp == 0 and Gp % 2 == 0, (K, Gp)
    qc = q.reshape(K // Gp, 2, Gp // 2, N)
    lo = qc[:, 0].astype(jnp.int32) & 0xF
    hi = qc[:, 1].astype(jnp.int32) & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8).astype(jnp.int8)
    return packed.reshape(K // 2, N)


def unpack_w4(packed: jax.Array, pack_group: int = 128) -> jax.Array:
    """Inverse of :func:`pack_w4` → signed int8 values in [-8, 7], ``[K, N]``."""
    half, N = packed.shape
    Gp = pack_group
    assert half % (Gp // 2) == 0
    p32 = packed.astype(jnp.int32).reshape(half // (Gp // 2), Gp // 2, N)
    lo = jnp.left_shift(p32, 28) >> 28  # arithmetic: sign-extend low nibble
    hi = jnp.left_shift(p32, 24) >> 28  # sign-extend high nibble
    out = jnp.concatenate([lo, hi], axis=1)  # [chunks, Gp, N]
    return out.reshape(2 * half, N).astype(jnp.int8)


def dequantize_w4(
    packed: jax.Array,
    scales: jax.Array,
    zeros: Optional[jax.Array] = None,
    pack_group: Optional[int] = None,
) -> jax.Array:
    """Full dequantization to f32 ``[K, N]`` (reference path for tests)."""
    K = packed.shape[0] * 2
    Gp = pack_group or pack_group_for(K, scales.shape[0])
    q = unpack_w4(packed, Gp).astype(jnp.float32)
    N = q.shape[1]
    G = K // scales.shape[0]
    qg = q.reshape(K // G, G, N)
    if zeros is not None:
        qg = qg - zeros[:, None, :]
    return (qg * scales[:, None, :]).reshape(K, N)


# ---- block-major tiled packing (TPU fast path) ---------------------------------
def choose_block_n(N: int, shards: int = 1) -> int:
    """Largest output-column tile in {1024..128} such that tiles divide N and
    shard evenly over `shards` TP ranks; 0 if none fits (legacy packing)."""
    for bn in (1024, 512, 256, 128):
        if N % bn == 0 and (N // bn) % shards == 0:
            return bn
    return 0


def pack_w4_tiled(q: jax.Array, block_n: int) -> jax.Array:
    """Row-interleaved nibble packing in block-major tiles.

    byte[r, n] = (q[2r+1, n] << 4) | (q[2r, n] & 0xF), tiled to
    ``[N//block_n, K//2, block_n]`` so each (k, j) kernel block is one
    contiguous HBM chunk (the TMA-analog layout — strided page walks cost
    ~10% of HBM roofline on v5e).  In-kernel ``pltpu.bitcast(int4)`` views a
    ``[rows, bn]`` int8 tile as ``[2*rows, bn]`` int4 with byte row r
    expanding to rows (2r: low nibble, 2r+1: high nibble) — i.e. natural
    weight-row order, zero shift/mask work on the VPU.
    """
    K, N = q.shape
    assert K % 2 == 0 and N % block_n == 0
    lo = q[0::2].astype(jnp.int32) & 0xF
    hi = q[1::2].astype(jnp.int32) & 0xF
    pk = (lo | (hi << 4)).astype(jnp.uint8).astype(jnp.int8)  # [K/2, N]
    return jnp.transpose(pk.reshape(K // 2, N // block_n, block_n), (1, 0, 2))


def unpack_w4_tiled(packed3: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_w4_tiled` → signed int8 [-8, 7], ``[K, N]``."""
    n_n, half, bn = packed3.shape
    pk = jnp.transpose(packed3, (1, 0, 2)).reshape(half, n_n * bn)
    p32 = pk.astype(jnp.int32)
    lo = jnp.left_shift(p32, 28) >> 28
    hi = jnp.left_shift(p32, 24) >> 28
    out = jnp.stack([lo, hi], axis=1)            # [half, 2, N]
    return out.reshape(2 * half, n_n * bn).astype(jnp.int8)


def dequantize_w4_any(packed, scales, zeros=None):
    """Dequantize either packing format (2D legacy K-paired or 3D tiled)."""
    if packed.ndim == 3:
        q = unpack_w4_tiled(packed).astype(jnp.float32)
        K, N = q.shape
        G = K // scales.shape[0]
        qg = q.reshape(K // G, G, N)
        if zeros is not None:
            qg = qg - zeros[:, None, :]
        return (qg * scales[:, None, :]).reshape(K, N)
    return dequantize_w4(packed, scales, zeros)
