"""Normalization ops.

Counterpart of the reference's fused layernorm/RMSNorm kernels
(`cpp/.../kernels/` fused layernorm 1,909 LoC, `fusedAddRMSNormQuant.cpp`).
On TPU these are bandwidth-trivial elementwise+reduce patterns that XLA fuses
into neighbors, so they are expressed in jnp; the residual-add fusion is kept
at this level so a single HLO fusion covers add+normalize.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def add_rms_norm(
    x: jax.Array,
    residual: Optional[jax.Array],
    weight: jax.Array,
    eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """Fused residual-add + RMSNorm. Returns (normed, new_residual)."""
    if residual is not None:
        x = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(x, weight, eps), x


def layer_norm(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array],
               eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
