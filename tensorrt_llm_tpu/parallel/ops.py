"""Collective helpers used inside shard_map'd model code.

Counterpart of the reference's `_torch/distributed/ops.py` (`AllReduce`
:636, `allgather` :267, `reducescatter` :444) — except we don't implement
NCCL-style kernels: `jax.lax.psum`/`all_gather` lower to XLA ICI collectives,
and fusion with neighboring ops is the compiler's job.  Fused
AR+residual+RMSNorm (reference `allReduceFusionKernels.cu`) is expressed at the
layer level and fused by XLA; a Pallas custom collective remains a perf escape
hatch.

All helpers are no-ops when the axis is absent (single-chip path).

Dense tensor parallelism spans the COMBINED ("ep", "tp") mesh axes (see
parallel/mapping.py); TP_AXES is the canonical axis tuple.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# dense-TP = expert-parallel x per-expert-TP axes combined
TP_AXES = ("ep", "tp")


def tp_all_reduce(x, axis_name=TP_AXES, enabled: bool = True):
    if not enabled:
        return x
    if os.environ.get("TLLM_LOW_PRECISION_ALLREDUCE") == "1":
        # opt-in wire-bandwidth saver for DCN-bound topologies (reference
        # low-precision AR strategy flag); read at trace time
        return tp_all_reduce_int8(x, axis_name)
    return jax.lax.psum(x, axis_name)


def tp_all_gather(x, axis_name=TP_AXES, axis: int = -1, *, tiled: bool = True,
                  enabled: bool = True):
    if not enabled:
        return x
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def tp_reduce_scatter(x, axis_name=TP_AXES, axis: int = -1, *, enabled: bool = True):
    if not enabled:
        return x
    # psum_scatter never canonicalizes a negative scatter_dimension (it
    # reaches the HLO attribute verbatim and fails MLIR verification)
    return jax.lax.psum_scatter(x, axis_name,
                                scatter_dimension=axis % x.ndim, tiled=True)


def tp_all_to_all(x, axis_name=TP_AXES, split_axis: int = 0,
                  concat_axis: int = 0, *, enabled: bool = True):
    if not enabled:
        return x
    return jax.lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis, tiled=True)


def tp_all_reduce_int8(x, axis_name=TP_AXES, *, enabled: bool = True):
    """Bandwidth-halved all-reduce: per-(row, shard) int8-quantized
    reduce-scatter + all-gather.

    TPU-native analog of the reference's low-precision allreduce
    (`cpp/.../communicationKernels/customLowPrecisionAllReduceKernels.cu`),
    which trades activation precision for wire bytes when the fabric — for
    us DCN between slices, PCIe-attached hosts, or long ICI routes — is
    the bottleneck.  Decomposition (the reference's two-shot scheme):

        1. quantize x per last-axis row to int8 (scale rides as f32/row),
        2. all_to_all the shard rows + scales (each rank collects its
           output shard from every peer at 1/2 the bf16 bytes),
        3. dequantize + sum partials in f32,
        4. re-quantize the reduced shard and all_gather it (again int8).

    Rounding error is bounded by 1 LSB per partial (~0.8% of each rank's
    row absmax); use for DCN-bound deployments, not as the default ICI
    path (XLA's bf16 psum already saturates ICI there).
    """
    if not enabled:
        return x
    n = jax.lax.axis_size(axis_name)
    orig_shape = x.shape
    L = x.shape[-1]
    if n == 1 or L % n:
        return jax.lax.psum(x, axis_name)

    flat = x.reshape(-1, L)

    def quant(v):  # per-row symmetric int8
        amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        scale = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-20)
        q = jnp.clip(jnp.round(v.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        return q, scale

    # ---- reduce_scatter leg (int8 wire) -----------------------------------
    shards = flat.reshape(flat.shape[0], n, L // n)
    q, s = quant(shards)                             # [R, n, L/n], [R, n, 1]
    q = jax.lax.all_to_all(q, axis_name, split_axis=1, concat_axis=1,
                           tiled=False)              # wait: keep dims
    s = jax.lax.all_to_all(s, axis_name, split_axis=1, concat_axis=1,
                           tiled=False)
    part = jnp.sum(q.astype(jnp.float32) * s, axis=1)  # [R, L/n] reduced
    # ---- all_gather leg (int8 wire) ---------------------------------------
    qr, sr = quant(part)                             # [R, L/n], [R, 1]
    qg = jax.lax.all_gather(qr, axis_name, axis=1, tiled=True)  # [R, L]
    sg = jax.lax.all_gather(sr, axis_name, axis=1, tiled=False) \
        .reshape(flat.shape[0], n, 1)                # [R, n, 1]
    out = (qg.reshape(flat.shape[0], n, L // n).astype(jnp.float32)
           * sg).reshape(flat.shape[0], L)
    return out.astype(x.dtype).reshape(orig_shape)
