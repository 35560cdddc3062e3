"""Per-shape W4A16 kernel tuning probe (real TPU, tunneled).

Breaks the bench.py aggregate into per-shape achieved weight-stream GB/s and
sweeps (block_n, block_k) so we can see where the 74.3% aggregate loses to the
85% target: pipeline ramp on short grids (small N) vs. kernel-core efficiency
(scale-FMA).  RTT-corrected chained methodology (see bench.py).

Usage: python benchmarks/probe_w4a16_tuning.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
from tensorrt_llm_tpu.quantization import pack_w4_tiled, quantize_w4
from benchmarks.bench_w4a16 import detect_hbm_roofline


def _rtt() -> float:
    t = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    float(jnp.sum(f(t)))
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(f(t)))
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def bench_cfg(M, K, N, bn, bk, rtt, group=128, reps=3):
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.1
    q, s, _ = quantize_w4(w, group, True)
    p = pack_w4_tiled(q, bn)
    inner = max(100, int(12 * max(rtt, 0.005) * 819e9 / (K * N / 2)))

    @jax.jit
    def chained(x0, p, s):
        def body(i, xx):
            o = w4a16_matmul(xx, p, s, block_k=bk)
            return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

    float(chained(x, p, s))  # compile+warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(x, p, s))
        times.append((time.perf_counter() - t0 - rtt) / inner)
    dt = sorted(times)[len(times) // 2]
    return (K * N / 2) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--shapes", type=str, default=None,
                    help="semicolon list M,K,N")
    ap.add_argument("--bns", type=str, default="256,512,1024")
    ap.add_argument("--bks", type=str, default="")
    args = ap.parse_args()

    roofline = detect_hbm_roofline()
    rtt = _rtt()
    print(f"roofline={roofline/1e9:.0f} GB/s rtt={rtt*1e3:.1f}ms", flush=True)

    if args.shapes:
        shapes = [tuple(int(v) for v in s.split(","))
                  for s in args.shapes.split(";")]
    else:
        shapes = [(16, 4096, 6144), (16, 4096, 4096),
                  (16, 4096, 28672), (16, 14336, 4096)]
    bns = [int(v) for v in args.bns.split(",")]
    results = {}
    for (M, K, N) in shapes:
        for bn in bns:
            if N % bn:
                continue
            bks = ([int(v) for v in args.bks.split(",") if v]
                   or [None])
            for bk in bks:
                if bk is not None and (K % bk or bk % 128):
                    continue
                try:
                    bps = bench_cfg(M, K, N, bn, bk, rtt)
                except Exception as e:  # noqa
                    print(f"M={M} K={K} N={N} bn={bn} bk={bk}: FAIL {e}",
                          flush=True)
                    continue
                pct = 100 * bps / roofline
                key = f"{M}x{K}x{N}/bn{bn}/bk{bk}"
                results[key] = round(pct, 1)
                print(f"M={M:4d} K={K:5d} N={N:5d} bn={bn:4d} bk={bk}: "
                      f"{bps/1e9:6.1f} GB/s ({pct:.1f}%)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
