"""Collective helpers used inside shard_map'd model code.

Counterpart of the reference's `_torch/distributed/ops.py` (`AllReduce`
:636, `allgather` :267, `reducescatter` :444) — except we don't implement
NCCL-style kernels: `jax.lax.psum`/`all_gather` lower to XLA ICI collectives,
and fusion with neighboring ops is the compiler's job.  Fused
AR+residual+RMSNorm (reference `allReduceFusionKernels.cu`) is expressed at the
layer level and fused by XLA; a Pallas custom collective remains a perf escape
hatch.

All helpers are no-ops when the axis is absent (single-chip path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_present(axis_name: str) -> bool:
    try:
        jax.lax.axis_index(axis_name)
        return True
    except NameError:
        return False
    except Exception:
        return False


def tp_all_reduce(x, axis_name: str = "tp", enabled: bool = True):
    if not enabled:
        return x
    return jax.lax.psum(x, axis_name)


def tp_all_gather(x, axis_name: str = "tp", axis: int = -1, *, tiled: bool = True,
                  enabled: bool = True):
    if not enabled:
        return x
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def tp_reduce_scatter(x, axis_name: str = "tp", axis: int = -1, *, enabled: bool = True):
    if not enabled:
        return x
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=axis, tiled=True)


def tp_all_to_all(x, axis_name: str = "tp", split_axis: int = 0,
                  concat_axis: int = 0, *, enabled: bool = True):
    if not enabled:
        return x
    return jax.lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis, tiled=True)
