"""Weight quantization + TPU-lane-friendly packing.

TPU-native counterpart of the reference's offline weight preprocessor
(`cpp/.../cutlass_kernels/cutlass_preprocessors.h:33-76` —
`preprocess_weights_for_mixed_gemm`, `add_bias_and_interleave_…`): where the
reference permutes rows and interleaves nibbles to match tensor-core `ldmatrix`
fetch patterns, we pick a packing whose *unpack* is pure lane-local shift/mask
on int8 and whose unpacked column order is already correct for the MXU:

  For every chunk of ``2*P`` logical output columns (P = 128, one lane tile),
  packed byte ``[k, c]`` holds column ``base+c`` of W in its LOW nibble and
  column ``base+P+c`` in its HIGH nibble.  A kernel block that reads a
  ``[BK, P]`` int8 tile recovers the ``[BK, 2P]`` weight tile as
  ``concat([lo, hi], axis=1)`` — no interleave, no permutation.

Values are stored as *signed* int4 in int8 nibbles (two's complement), so
in-kernel extraction is ``(b << 4) >> 4`` (low) and ``b >> 4`` (high) with
arithmetic shifts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Lane-pair width: columns (c, c+P) within each 2P chunk share a byte.
W4_PAIR_WIDTH = 128


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


def pack_w4(q: jax.Array, pair_width: int = W4_PAIR_WIDTH) -> jax.Array:
    """Pack signed-int4 values ``[K, N]`` into int8 nibbles ``[K, N//2]``.

    Column pairing is block-local (see module docstring): within each chunk of
    ``2*pair_width`` columns, byte c = (col base+c) | (col base+P+c) << 4.
    """
    K, N = q.shape
    P = pair_width
    assert N % (2 * P) == 0, f"N={N} must be a multiple of {2*P}"
    qc = q.reshape(K, N // (2 * P), 2, P)
    lo = qc[:, :, 0, :].astype(jnp.int32) & 0xF
    hi = qc[:, :, 1, :].astype(jnp.int32) & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8).astype(jnp.int8)
    return packed.reshape(K, N // 2)


def unpack_w4(packed: jax.Array, pair_width: int = W4_PAIR_WIDTH) -> jax.Array:
    """Inverse of :func:`pack_w4` → signed int8 values in [-8, 7], ``[K, N]``."""
    K, half = packed.shape
    P = pair_width
    assert half % P == 0
    p32 = packed.astype(jnp.int32).reshape(K, half // P, P)
    lo = jnp.left_shift(p32, 28) >> 28  # arithmetic: sign-extend low nibble
    hi = jnp.left_shift(p32, 24) >> 28  # sign-extend high nibble
    out = jnp.stack([lo, hi], axis=2)  # [K, chunks, 2, P]
    return out.reshape(K, 2 * half).astype(jnp.int8)


def dequantize_w4(
    packed: jax.Array,
    scales: jax.Array,
    zeros: Optional[jax.Array] = None,
    pair_width: int = W4_PAIR_WIDTH,
) -> jax.Array:
    """Full dequantization to f32 ``[K, N]`` (reference path for tests)."""
    q = unpack_w4(packed, pair_width).astype(jnp.float32)
    K, N = q.shape
    G = K // scales.shape[0]
    qg = q.reshape(K // G, G, N)
    if zeros is not None:
        qg = qg - zeros[:, None, :]
    return (qg * scales[:, None, :]).reshape(K, N)
