"""W4A16 ramp-free kernel prototype (manual-DMA, non-uniform k schedule).

Attacks the two measured losses of the shipped tiled kernel
(`ops/w4a16_gemm.py`, 74.3% aggregate vs the >=85% target):

  1. *Pipeline ramp*: the grid pipeline's first weight DMA is not
     overlapped.  With uniform blocks the cold chunk is bk*bn/2 bytes
     (~20% of a (16,4096,4096) call).  Here the kernel drives its own
     double-buffered DMAs over a FLAT (j,k) step sequence, so the whole
     call has exactly ONE cold DMA — and a `ramp` schedule makes that
     first chunk small (one slab) while steady-state chunks stay large.
  2. *Scale-FMA cost*: optional `fma` ordering (partial * s + acc) so
     Mosaic can emit a fused multiply-add against the accumulator.

Weights are viewed as [n_n, n_slabs, SLAB//2, BN] so every DMA is a
whole-slab copy at a traced slab index (the paged-attention trick).

Usage:
  python -m benchmarks.probe_w4a16_ramp --check      # CPU interpret mode
  python -m benchmarks.probe_w4a16_ramp              # real-TPU bench
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrt_llm_tpu.quantization import pack_w4_tiled, quantize_w4
from tensorrt_llm_tpu.quantization.quantize import dequantize_w4_any
from tensorrt_llm_tpu.utils import cdiv, round_up

SLAB = 1024          # K rows per DMA slab (512 packed rows)


def _ramp_kernel(
    x_ref,        # [BM, K] bf16 (whole K resident in VMEM)
    s_ref,        # [n_groups, BN] f32 (this j block's scales)
    p_hbm,        # [n_n, n_slabs, SLAB//2, BN] int8 ANY
    out_ref,      # [BM, BN]
    w_buf,        # [2, big, SLAB//2, BN] int8 VMEM
    acc_ref,      # [BM, BN] f32
    sems,         # DMA [2]
    *,
    steps_per_j: int,
    slabs_at: tuple,     # python tuple: slabs copied at each k step
    slab_off: tuple,     # python tuple: first slab index of each k step
    group: int,
    n_j: int,
    fma: bool,
    out_dtype,
):
    t = pl.program_id(1)
    S = steps_per_j
    n_t = S * n_j

    def dma(flat, slot):
        """Issue the whole-step copy for flat step `flat` into `slot`."""
        j = flat // S
        k = flat % S
        for step in range(S):          # static dispatch on k
            @pl.when(k == step)
            def _():
                ns = slabs_at[step]
                pltpu.make_async_copy(
                    p_hbm.at[j, pl.ds(slab_off[step], ns)],
                    w_buf.at[slot, pl.ds(0, ns)],
                    sems.at[slot],
                ).start()

    def dma_wait(flat, slot):
        j = flat // S
        k = flat % S
        for step in range(S):
            @pl.when(k == step)
            def _():
                ns = slabs_at[step]
                pltpu.make_async_copy(
                    p_hbm.at[j, pl.ds(slab_off[step], ns)],
                    w_buf.at[slot, pl.ds(0, ns)],
                    sems.at[slot],
                ).wait()

    @pl.when(t == 0)
    def _first():
        dma(0, 0)

    @pl.when((t % S) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(t + 1 < n_t)
    def _prefetch():
        dma(t + 1, (t + 1) % 2)

    dma_wait(t, t % 2)
    slot = t % 2
    k = t % S

    acc = acc_ref[:]
    for step in range(S):
        @pl.when(k == step)
        def _():
            ns = slabs_at[step]
            k_base = slab_off[step] * SLAB
            cps = SLAB // group          # chunks per slab
            a = acc
            for sl in range(ns):
                for c in range(cps):
                    pblk = w_buf[slot, sl,
                                 c * (group // 2):(c + 1) * (group // 2), :]
                    w_c = pltpu.bitcast(pblk, jnp.int4).astype(jnp.bfloat16)
                    k0 = k_base + sl * SLAB + c * group
                    x_c = x_ref[:, k0:k0 + group]
                    partial = jnp.dot(x_c, w_c,
                                      preferred_element_type=jnp.float32)
                    row = k0 // group
                    s_g = s_ref[pl.ds(row, 1), :]
                    if fma:
                        a = partial * s_g + a
                    else:
                        a = a + partial * s_g
            acc_ref[:] = a

    @pl.when((t % S) == S - 1)
    def _epilogue():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("schedule", "fma", "interpret"))
def ramp_matmul(x, packed4, scales, schedule, fma=True, interpret=False):
    """packed4: [n_n, n_slabs, SLAB//2, BN]; schedule: slabs per k step."""
    M, K = x.shape
    n_n, n_slabs, half_slab, BN = packed4.shape
    assert sum(schedule) == n_slabs, (schedule, n_slabs)
    S = len(schedule)
    n_groups = scales.shape[0]
    group = K // n_groups
    big = max(schedule)
    offs = tuple(int(v) for v in np.cumsum((0,) + schedule[:-1]))
    BM = round_up(M, 16)
    if BM != M:
        x = jnp.pad(x, ((0, BM - M), (0, 0)))

    kernel = functools.partial(
        _ramp_kernel,
        steps_per_j=S,
        slabs_at=tuple(schedule),
        slab_off=offs,
        group=group,
        n_j=n_n,
        fma=fma,
        out_dtype=jnp.bfloat16,
    )
    out = pl.pallas_call(
        kernel,
        grid=(1, n_n * S),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i, t: (0, 0)),
            pl.BlockSpec((n_groups, BN), lambda i, t, S=S: (0, t // S)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, t, S=S: (0, t // S)),
        out_shape=jax.ShapeDtypeStruct((BM, n_n * BN), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, big, SLAB // 2, BN), jnp.int8),
            pltpu.VMEM((BM, BN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (n_n * BN) * K,
            bytes_accessed=K * n_n * BN // 2,
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), scales.astype(jnp.float32), packed4)
    return out[:M]


def make_schedule(K: int, bk0: int = SLAB, bk_big: int = 4 * SLAB):
    """First step one small slab, then as-big-as-possible steps."""
    n_slabs = K // SLAB
    sched = [bk0 // SLAB]
    rest = n_slabs - sched[0]
    big = bk_big // SLAB
    while rest > 0:
        take = min(big, rest)
        sched.append(take)
        rest -= take
    return tuple(sched)


def pack_slabs(q: np.ndarray, bn: int):
    """[K, N] int4-valued -> [n_n, n_slabs, SLAB//2, BN]."""
    p3 = np.asarray(pack_w4_tiled(q, bn))          # [n_n, K//2, BN]
    n_n, half, BN = p3.shape
    K = half * 2
    return jnp.asarray(
        p3.reshape(n_n, K // SLAB, SLAB // 2, BN))


def _rtt() -> float:
    t = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    float(jnp.sum(f(t)))
    s = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(f(t)))
        s.append(time.perf_counter() - t0)
    return sorted(s)[len(s) // 2]


def check(interpret=True):
    rng = np.random.default_rng(0)
    M, K, N, bn = 5, 2048, 512, 256
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    q, s, _ = quantize_w4(jnp.asarray(w), 128, True)
    p4 = pack_slabs(np.asarray(q), bn)
    p3 = pack_w4_tiled(q, bn)
    ref = np.asarray(
        jnp.dot(x, dequantize_w4_any(p3, s).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32))
    for sched in [make_schedule(K), (1, 1), (2,), (1, 1, 1, 1)]:
        if sum(sched) != K // SLAB:
            continue
        for fma in (False, True):
            out = np.asarray(
                ramp_matmul(x, p4, s, sched, fma, interpret), np.float32)
            err = np.abs(out - ref).max()
            tol = np.abs(ref).max() / 8 * 3
            stat = "OK" if err <= tol else f"BAD err={err}"
            print(f"sched={sched} fma={fma}: {stat}", flush=True)


def bench_main(args):
    from benchmarks.bench_w4a16 import detect_hbm_roofline
    roofline = detect_hbm_roofline()
    rtt = _rtt()
    print(f"roofline={roofline/1e9:.0f}GB/s rtt={rtt*1e3:.1f}ms", flush=True)
    results = {}
    for shp in args.shapes.split(";"):
        M, K, N = (int(v) for v in shp.split(","))
        bn = min(1024, N)
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(0), (K, N),
                              jnp.float32) * 0.1
        q, s, _ = quantize_w4(w, 128, True)
        p4 = pack_slabs(np.asarray(q), bn)
        p3 = pack_w4_tiled(q, bn)
        wb = K * N / 2
        inner = max(100, int(12 * max(rtt, 0.005) * 819e9 / wb))
        ref = np.asarray(
            jnp.dot(x, dequantize_w4_any(p3, s).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32))
        scheds = {
            "uniform4k": make_schedule(K, bk0=4 * SLAB, bk_big=4 * SLAB),
            "ramp1-4k": make_schedule(K, bk0=SLAB, bk_big=4 * SLAB),
            "ramp1-8k": make_schedule(K, bk0=SLAB, bk_big=8 * SLAB),
        }
        for name, sched in scheds.items():
            try:
                out = ramp_matmul(x, p4, s, sched, True)
                err = np.abs(np.asarray(out, np.float32) - ref).max()
                tol = float(np.abs(ref).max()) / 8 * 3
                ok = "OK" if err <= tol else f"BAD(err={err:.3g})"

                @jax.jit
                def chained(x0, p, sc, sched=sched):
                    def body(i, xx):
                        o = ramp_matmul(xx, p, sc, sched, True)
                        return xx + (jnp.max(jnp.abs(o)) * 1e-30
                                     ).astype(xx.dtype)
                    return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

                float(chained(x, p4, s))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(chained(x, p4, s))
                    ts.append((time.perf_counter() - t0 - rtt) / inner)
                dt = sorted(ts)[1]
                pct = 100 * (wb / dt) / roofline
                results[f"{shp}/{name}"] = round(pct, 1)
                print(f"{shp} {name:10s}: {wb/dt/1e9:6.1f} GB/s "
                      f"({pct:.1f}%) {ok}", flush=True)
            except Exception as e:  # noqa
                print(f"{shp} {name:10s}: FAIL {type(e).__name__} {e}",
                      flush=True)
    print(json.dumps(results))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--shapes",
                    default="16,4096,4096;16,4096,6144;16,4096,28672;"
                            "16,14336,4096")
    args = ap.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        check()
    else:
        bench_main(args)


if __name__ == "__main__":
    main()
