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

import jax
import jax.numpy as jnp

# dense-TP = expert-parallel x per-expert-TP axes combined
TP_AXES = ("ep", "tp")


def tp_all_reduce(x, axis_name=TP_AXES, enabled: bool = True):
    if not enabled:
        return x
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
