"""Mamba2 state-space ops: chunked SSD scan + causal conv1d.

TPU-native counterpart of the reference's SSM kernel stack
(`cpp/tensorrt_llm/kernels/selectiveScan/` 9,373 LoC CUDA,
`causalConv1d`, thop `selectiveScanOp.cpp`/`mambaConv1dOp.cpp`): the SSD
(state-space duality) chunked algorithm expresses the selective scan as
dense chunk-local matmuls (MXU work) plus a tiny inter-chunk recurrence —
the same math as HF Mamba2's `torch_forward`, kept in einsum form so XLA
tiles the chunk contractions onto the MXU.

State layout is slot-indexed (reference `MambaCacheManager` /
`rnnStateManager.cpp`): per layer a conv history pool
``[slots, K-1, conv_dim]`` and an SSM state pool ``[slots, H, P, N]``;
a request keeps one slot for its lifetime.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def segsum(a: jax.Array) -> jax.Array:
    """Segment sums: out[..., i, j] = sum a[..., j+1:i+1] for j < i, 0 on the
    diagonal, -inf above (HF mamba2 segment_sum)."""
    Q = a.shape[-1]
    rep = jnp.repeat(a[..., None], Q, axis=-1)            # [..., Q, Q]
    mask1 = jnp.tril(jnp.ones((Q, Q), bool), k=-1)
    rep = jnp.where(mask1, rep, 0.0)
    out = jnp.cumsum(rep, axis=-2)
    mask2 = jnp.tril(jnp.ones((Q, Q), bool), k=0)
    return jnp.where(mask2, out, -jnp.inf)


def causal_conv1d_chunk(
    x: jax.Array,           # [T, C] chunk inputs (pre-activation)
    weight: jax.Array,      # [K, C] depthwise taps
    bias: Optional[jax.Array],
    history: jax.Array,     # [K-1, C] inputs before this chunk
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv over one chunk with carried history.
    Returns (out [T, C], new_history [K-1, C])."""
    K = weight.shape[0]
    full = jnp.concatenate([history.astype(x.dtype), x], axis=0)  # [K-1+T, C]
    T = x.shape[0]
    # out[t] = sum_j w[j] * full[t + j]
    out = jnp.zeros((T, x.shape[1]), jnp.float32)
    for j in range(K):  # K is tiny (4); unrolled taps fuse into one kernel
        out = out + weight[j][None, :].astype(jnp.float32) * \
            jax.lax.dynamic_slice_in_dim(full, j, T, axis=0).astype(jnp.float32)
    if bias is not None:
        out = out + bias[None, :]
    new_history = full[T:]  # last K-1 rows
    return out.astype(x.dtype), new_history


def causal_conv1d_step(
    x: jax.Array,           # [B, C] one token per sequence
    weight: jax.Array,      # [K, C]
    bias: Optional[jax.Array],
    history: jax.Array,     # [B, K-1, C]
) -> Tuple[jax.Array, jax.Array]:
    K = weight.shape[0]
    full = jnp.concatenate([history.astype(x.dtype), x[:, None, :]], axis=1)
    out = jnp.einsum("kc,bkc->bc", weight.astype(jnp.float32),
                     full.astype(jnp.float32))
    if bias is not None:
        out = out + bias[None, :]
    return out.astype(x.dtype), full[:, 1:]


def ssd_chunked(
    x: jax.Array,        # [T, H, P] (pre-dt values)
    dt: jax.Array,       # [T, H]    (post softplus+clamp)
    A: jax.Array,        # [H]       (negative reals)
    B: jax.Array,        # [T, H, N] (group-expanded)
    C: jax.Array,        # [T, H, N]
    D: jax.Array,        # [H]
    prev_state: jax.Array,  # [H, P, N] f32
    chunk: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked SSD scan for one sequence (HF mamba2 torch_forward math).
    Returns (y [T, H, P] f32, final_state [H, P, N] f32)."""
    T, H, Pd = x.shape
    pad = (-T) % chunk
    if pad:
        zpad = lambda t: jnp.pad(t, [(0, pad)] + [(0, 0)] * (t.ndim - 1))
        x, dt, B, C = zpad(x), zpad(dt), zpad(B), zpad(C)
    Tp = T + pad
    c = Tp // chunk

    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Bf = B.astype(jnp.float32).reshape(c, chunk, H, -1)
    Cf = C.astype(jnp.float32).reshape(c, chunk, H, -1)
    xdt = (xf * dtf[..., None]).reshape(c, chunk, H, Pd)
    a = (dtf * A[None, :].astype(jnp.float32)).reshape(c, chunk, H)
    a = jnp.transpose(a, (0, 2, 1))                      # [c, H, Q]
    acum = jnp.cumsum(a, axis=-1)                        # [c, H, Q]

    # intra-chunk (diagonal blocks)
    L = jnp.exp(segsum(a))                               # [c, H, Q, Q]
    Y_diag = jnp.einsum("clhn,cshn,chls,cshp->clhp", Cf, Bf, L, xdt)

    # per-chunk end states
    decay_states = jnp.exp(acum[:, :, -1:] - acum)       # [c, H, Q]
    states = jnp.einsum("clhn,chl,clhp->chpn", Bf, decay_states, xdt)

    # inter-chunk recurrence over chunk boundaries
    a_last = acum[:, :, -1]                              # [c, H]
    dc = jnp.exp(segsum(jnp.pad(a_last.T, ((0, 0), (1, 0)))))  # [H, c+1, c+1]
    states_all = jnp.concatenate(
        [prev_state.astype(jnp.float32)[None], states], axis=0)  # [c+1,H,P,N]
    new_states = jnp.einsum("hzc,chpn->zhpn", dc, states_all)
    states_in, final_state = new_states[:-1], new_states[-1]

    # off-diagonal contribution from carried states
    Y_off = jnp.einsum("clhn,chpn,chl->clhp", Cf, states_in, jnp.exp(acum))

    y = (Y_diag + Y_off).reshape(Tp, H, Pd)[:T]
    y = y + D[None, :, None].astype(jnp.float32) * xf[:T]
    return y, final_state


def ssd_decode_step(
    x: jax.Array,        # [B, H, P]
    dt: jax.Array,       # [B, H] (post softplus+clamp)
    A: jax.Array,        # [H]
    B: jax.Array,        # [B, H, N]
    C: jax.Array,        # [B, H, N]
    D: jax.Array,        # [H]
    state: jax.Array,    # [B, H, P, N] f32
) -> Tuple[jax.Array, jax.Array]:
    """Single-token SSM recurrence (HF mamba2 cached decode path)."""
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    dA = jnp.exp(dtf * A[None, :].astype(jnp.float32))   # [B, H]
    dBx = (dtf[..., None, None] * B.astype(jnp.float32)[:, :, None, :]
           * xf[..., None])                              # [B, H, P, N]
    new_state = state * dA[..., None, None] + dBx
    y = jnp.einsum("bhpn,bhn->bhp", new_state, C.astype(jnp.float32))
    y = y + D[None, :, None].astype(jnp.float32) * xf
    return y, new_state
