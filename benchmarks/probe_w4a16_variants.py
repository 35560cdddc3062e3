"""W4A16 kernel variants probe (run on real TPU).

Tests candidate optimizations against the shipped tiled kernel to close
74.3% -> >=85% HBM roofline (VERDICT item #1):

  base      — shipped kernel (`_w4a16_matmul_pallas_tiled`)
  mixed     — feed the MXU the int4 view directly (no explicit
              .astype(bf16)): if Mosaic lowers a mixed bf16 x s4 dot with
              the convert in the MXU datapath, the VPU upcast cost vanishes
  relscale  — chained relative-scale accumulation
              acc = acc * r_c + partial, r_c = s_{c-1}/s_c (one FMA that
              touches acc once; final scale folded at epilogue)

Plus a block_n sweep (pipeline-ramp amortization for short grids).

Usage: python benchmarks/probe_w4a16_variants.py [--inner N]
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

from benchmarks.bench_w4a16 import detect_hbm_roofline
from tensorrt_llm_tpu.quantization import pack_w4_tiled, quantize_w4
from tensorrt_llm_tpu.utils import cdiv, round_up


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


# ---- variant kernels ----------------------------------------------------------
def _kernel_variant(x_ref, p_ref, s_ref, out_ref, acc_ref, *,
                    n_chunks, pack_group, variant, out_dtype):
    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    Gp, Gh = pack_group, pack_group // 2
    for c in range(n_chunks):
        pblk = p_ref[0, c * Gh:(c + 1) * Gh, :]
        w4 = pltpu.bitcast(pblk, jnp.int4)
        x_c = x_ref[:, c * Gp:(c + 1) * Gp]
        if variant == "mixed":
            partial = jnp.dot(x_c, w4,
                              preferred_element_type=jnp.float32)
        else:
            partial = jnp.dot(x_c, w4.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        row = k_idx * n_chunks + c
        if variant == "relscale":
            # r[c] = s[c-1]/s[c] (r[0] folds the first group's scale);
            # final multiply by s[last] happens in the epilogue
            r_c = s_ref[pl.ds(row, 1), :]
            acc = acc * r_c + partial
        else:
            s_g = s_ref[pl.ds(row, 1), :]
            acc = acc + partial * s_g
    acc_ref[:] = acc

    @pl.when(k_idx == n_k - 1)
    def _done():
        r = acc_ref[:]
        if variant == "relscale":
            r = r * s_ref[pl.ds(n_k * n_chunks, 1), :]
        out_ref[:] = r.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("variant", "block_m", "block_k",
                                             "interpret"))
def run_variant(x, packed3, scales, variant, block_m, block_k,
                interpret=False):
    M, K = x.shape
    n_n, half, BN = packed3.shape
    # relscale carries one extra row (the final scale)
    n_groups = scales.shape[0] - (1 if variant == "relscale" else 0)
    Gp = K // n_groups
    BM, BK = block_m, block_k
    n_chunks = BK // Gp
    grid = (cdiv(M, BM), n_n, K // BK)
    kern = functools.partial(
        _kernel_variant, n_chunks=n_chunks, pack_group=Gp,
        variant=variant, out_dtype=jnp.bfloat16)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
            pl.BlockSpec((1, BK // 2, BN), lambda i, j, k: (j, k, 0)),
            pl.BlockSpec((scales.shape[0], BN), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((round_up(M, BM), n_n * BN),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (n_n * BN) * K,
            bytes_accessed=K * n_n * BN // 2, transcendentals=0),
        interpret=interpret,
    )(x, packed3, scales)


def rel_scales(scales):
    """[G+1, N]: r[0]=s[0], r[c]=s[c]/s[c-1]... wait — relscale applies
    acc = acc*r_c + partial_c, then epilogue * s_last.  Expanding:
    out = sum_c partial_c * (prod_{j>c} r_j) * s_last^{-1}... we need
    prod_{j>c} r_j * s_fin = s_c, i.e. r_c = s_{c-1}/s_c and s_fin =
    s_last.  r[0] arbitrary (acc is 0): use 1."""
    g, n = scales.shape
    r = np.ones((g + 1, n), np.float32)
    s = np.asarray(scales)
    r[1:g] = s[:-1] / s[1:]
    r[g] = s[-1]
    # row 0 unused (acc==0); rows 1..g-1 are ratios; row g = final scale
    out = np.ones((g + 1, n), np.float32)
    out[0] = 1.0
    out[1:] = r[1:]
    return jnp.asarray(out)


def bench(fn, weight_bytes, rtt, inner):
    @jax.jit
    def chained(x0, *args):
        def body(i, xx):
            o = fn(xx, *args)
            return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

    return chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="16,4096,4096;16,4096,28672")
    ap.add_argument("--variants", default="base,mixed,relscale")
    ap.add_argument("--bn", type=int, default=1024)
    args = ap.parse_args()

    roofline = detect_hbm_roofline()
    rtt = _rtt()
    print(f"roofline={roofline/1e9:.0f}GB/s rtt={rtt*1e3:.1f}ms", flush=True)
    results = {}
    for shp in args.shapes.split(";"):
        M, K, N = (int(v) for v in shp.split(","))
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.1
        q, s, _ = quantize_w4(w, 128, True)
        p3 = pack_w4_tiled(q, args.bn)
        wb = K * N / 2
        inner = max(100, int(12 * max(rtt, 0.005) * 819e9 / wb))
        # correctness reference
        from tensorrt_llm_tpu.quantization.quantize import dequantize_w4_any
        ref = np.asarray(
            jnp.dot(x, dequantize_w4_any(p3, s).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32))
        for variant in args.variants.split(","):
            sv = rel_scales(s) if variant == "relscale" else s
            try:
                out = run_variant(x, p3, sv, variant, 16, K)
                err = np.abs(np.asarray(out[:M], np.float32) - ref).max()
                tol = float(np.abs(ref).max()) / 8 * 3
                okstr = "OK " if err <= tol else f"BAD(err={err:.3g}) "

                @jax.jit
                def chained(x0, p, sc, v=variant):
                    def body(i, xx):
                        o = run_variant(xx, p, sc, v, 16, K)
                        return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(
                            xx.dtype)
                    return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

                float(chained(x, p3, sv))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(chained(x, p3, sv))
                    ts.append((time.perf_counter() - t0 - rtt) / inner)
                dt = sorted(ts)[1]
                pct = 100 * (wb / dt) / roofline
                results[f"{shp}/{variant}"] = round(pct, 1)
                print(f"{shp} {variant:9s}: {wb/dt/1e9:6.1f} GB/s "
                      f"({pct:.1f}%) {okstr}", flush=True)
            except Exception as e:  # noqa
                print(f"{shp} {variant:9s}: FAIL {type(e).__name__} {e}",
                      flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
