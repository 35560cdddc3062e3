"""Quantization calibration: clip-ratio search for int4 groups.

Counterpart capability of the reference's calibration flow
(`quantization/quantize_by_modelopt.py:114`): plain absmax RTN wastes the
int4 grid on outliers; searching a per-group clip ratio that minimizes the
(optionally activation-weighted) reconstruction error recovers most of the
AWQ/ModelOpt accuracy gap without external tooling.  Pure JAX, vectorized
over every group at once — calibration of a full layer is one jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# candidate clip ratios (1.0 == plain RTN absmax)
CLIP_GRID = (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7)


def quantize_w4_calibrated(
    w: jax.Array,
    group_size: int = 128,
    symmetric: bool = True,
    act_scales: Optional[jax.Array] = None,
    clip_grid: Tuple[float, ...] = CLIP_GRID,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Per-group int4 quantization with clip-ratio search.

    For every group the scale absmax*r is tried over `clip_grid` and the r
    minimizing  sum_k a_k * (w_k - deq(q_k))^2  wins, where a_k is an
    optional per-input-channel activation weight (AWQ-style: channels that
    see large activations must be reconstructed accurately).

    Returns (q, scales, zeros) exactly like quantize_w4 — drop-in.
    """
    K, N = w.shape
    G = K if group_size in (-1, 0) else group_size
    assert K % G == 0
    wg = w.astype(jnp.float32).reshape(K // G, G, N)
    aw = None
    if act_scales is not None:
        aw = jnp.asarray(act_scales, jnp.float32).reshape(K // G, G, 1)
        aw = aw / jnp.maximum(aw.mean(), 1e-8)

    def err_for(scales, zeros):
        q = jnp.round(wg / scales[:, None, :])
        if zeros is not None:
            q = jnp.clip(q + zeros[:, None, :], 0, 15)
            deq = (q - zeros[:, None, :]) * scales[:, None, :]
        else:
            q = jnp.clip(q, -8, 7)
            deq = q * scales[:, None, :]
        e = jnp.square(wg - deq)
        if aw is not None:
            e = e * aw
        return e.sum(axis=1)  # [K//G, N]

    if symmetric:
        absmax = jnp.max(jnp.abs(wg), axis=1)  # [K//G, N]
        best_err = None
        best_r = jnp.ones_like(absmax)
        for r in clip_grid:
            s = jnp.maximum(absmax * r / 7.0, 1e-8)
            e = err_for(s, None)
            if best_err is None:
                best_err, best_r = e, jnp.full_like(absmax, r)
            else:
                take = e < best_err
                best_err = jnp.where(take, e, best_err)
                best_r = jnp.where(take, r, best_r)
        scales = jnp.maximum(absmax * best_r / 7.0, 1e-8)
        q = jnp.clip(jnp.round(wg / scales[:, None, :]), -8, 7)
        return (q.reshape(K, N).astype(jnp.int8),
                scales.astype(jnp.float32), None)

    wmax = jnp.max(wg, axis=1)
    wmin = jnp.min(wg, axis=1)
    best = None
    for r in clip_grid:
        span = jnp.maximum((wmax - wmin) * r / 15.0, 1e-8)
        zu = jnp.clip(jnp.round(-wmin * r / span), 0, 15)
        e = err_for(span, zu)
        if best is None:
            best = (e, span, zu)
        else:
            take = e < best[0]
            best = (jnp.where(take, e, best[0]),
                    jnp.where(take, span, best[1]),
                    jnp.where(take, zu, best[2]))
    _, scales, zu = best
    q = jnp.clip(jnp.round(wg / scales[:, None, :]) + zu[:, None, :],
                 0, 15) - 8
    return (q.reshape(K, N).astype(jnp.int8), scales.astype(jnp.float32),
            (zu - 8).astype(jnp.float32))


def weight_mse(w: jax.Array, q: jax.Array, scales: jax.Array,
               zeros: Optional[jax.Array], group_size: int) -> float:
    """Reconstruction MSE of a quantization (diagnostic)."""
    K, N = w.shape
    G = K if group_size in (-1, 0) else group_size
    qg = q.astype(jnp.float32).reshape(K // G, G, N)
    if zeros is not None:
        qg = qg - zeros[:, None, :]
    deq = (qg * scales[:, None, :]).reshape(K, N)
    return float(jnp.mean(jnp.square(w.astype(jnp.float32) - deq)))
