"""Collective fusion / overlap benchmarks (reference: fused
allReduceFusionKernels.cu + UserBuffers TP-overlap).

Measures, on whatever mesh is available (real multi-chip ICI, or the
virtual CPU mesh for plumbing checks — CPU numbers are NOT perf-meaningful):

  1. allreduce vs allreduce+residual+RMSNorm (XLA's fusion of the adjacent
     elementwise work — the capability the reference fuses by hand),
  2. XLA gather-then-matmul vs the ring-overlap collective matmuls
     (parallel/collective_matmul.py).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
benchmarks/bench_collectives.py [tp]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tensorrt_llm_tpu.ops.norms import add_rms_norm
from tensorrt_llm_tpu.parallel.collective_matmul import (
    allgather_matmul,
    matmul_reducescatter,
)


def _time(f, *args, iters=30):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(tp: int = 0):
    tp = tp or min(len(jax.devices()), 8)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:tp]), ("tp",))
    print(f"# mesh: {tp}x {jax.devices()[0].device_kind}")

    T, H = 512, 4096
    x = jnp.ones((T, H), jnp.bfloat16)
    res = jnp.ones((T, H), jnp.bfloat16)
    w = jnp.ones((H,), jnp.float32)

    def ar(xs, r, w):
        return jax.lax.psum(xs, "tp")

    def ar_norm(xs, r, w):
        y = jax.lax.psum(xs, "tp")
        out, _ = add_rms_norm(y, r, w)
        return out

    sm = lambda f: jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_vma=False))
    t_ar = _time(sm(ar), x, res, w)
    t_arn = _time(sm(ar_norm), x, res, w)
    print(f"allreduce [{T}x{H}]: {t_ar*1e6:.1f} us; "
          f"+residual+rmsnorm: {t_arn*1e6:.1f} us "
          f"(fusion overhead {100*(t_arn/t_ar-1):.1f}%)")

    K, N = 4096, 4096
    xs = jnp.ones((T // tp, K), jnp.bfloat16)
    ws = jnp.ones((K, N), jnp.bfloat16)

    def xla_agmm(a, b):
        return jnp.dot(jax.lax.all_gather(a, "tp", axis=0, tiled=True), b,
                       preferred_element_type=jnp.float32)

    def ring_agmm(a, b):
        return allgather_matmul(a, b, "tp")

    sm2 = lambda f: jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("tp", None), P()), out_specs=P(),
        check_vma=False))
    t_x = _time(sm2(xla_agmm), xs, ws)
    t_r = _time(sm2(ring_agmm), xs, ws)
    print(f"allgather-matmul [{T}x{K}x{N}]: xla {t_x*1e6:.1f} us, "
          f"ring-overlap {t_r*1e6:.1f} us")

    xr = jnp.ones((T, K // tp), jnp.bfloat16)
    wr = jnp.ones((K // tp, N), jnp.bfloat16)

    def xla_mmrs(a, b):
        return jax.lax.psum_scatter(
            jnp.dot(a, b, preferred_element_type=jnp.float32), "tp",
            scatter_dimension=1, tiled=True)

    def ring_mmrs(a, b):
        return matmul_reducescatter(a, b, "tp")

    sm3 = lambda f: jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
        out_specs=P(None, "tp"), check_vma=False))
    t_x = _time(sm3(xla_mmrs), xr, wr)
    t_r = _time(sm3(ring_mmrs), xr, wr)
    print(f"matmul-reducescatter [{T}x{K}x{N}]: xla {t_x*1e6:.1f} us, "
          f"ring-overlap {t_r*1e6:.1f} us")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
