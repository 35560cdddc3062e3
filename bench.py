"""Driver benchmark: prints ONE JSON line.

Metric: achieved HBM bandwidth of the fused W4A16 dequant-GEMM across the
Llama-8B decode GEMM shapes, as a fraction of the chip's HBM roofline.
Baseline target (BASELINE.md): >=85% of roofline => vs_baseline = pct/85.

Methodology (this machine's TPU is behind a high-latency tunnel — see
.claude/skills/verify/SKILL.md): dependency-chained kernel calls inside one
jit, scalar fetch, RTT-subtracted.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


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


def _loop_overhead(rtt: float, M: int = 16, K: int = 4096) -> float:
    """Per-iteration cost of the measurement harness itself: the
    fori_loop + data-dependency bump WITHOUT the kernel (~1.2us/iter on
    v5e — material against 10-20us decode-shape kernels).  Subtracted
    like the RTT: it measures the harness, not the GEMM."""
    inner = 4000
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

    @jax.jit
    def chained(x0):
        def body(i, xx):
            return xx + (jnp.max(jnp.abs(xx)) * 1e-30).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

    float(chained(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(x))
        ts.append((time.perf_counter() - t0 - rtt) / inner)
    return max(sorted(ts)[len(ts) // 2], 0.0)


def bench_w4a16_shape(M, K, N, rtt, inner=None, overhead=0.0):
    from tensorrt_llm_tpu.autotuner import AutoTuner, autotune
    from tensorrt_llm_tpu.ops.w4a16_gemm import (w4a16_matmul,
                                                 w4a16_tactic_candidates)
    from tensorrt_llm_tpu.quantization import (choose_block_n, pack_w4,
                                               pack_w4_tiled, quantize_w4)

    if inner is None:
        # scale the chained work to ~20x the tunnel RTT so jitter washes out
        inner = max(200, int(20 * max(rtt, 0.005) * 819e9 / (K * N / 2)))
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.1
    q, s, _ = quantize_w4(w, 128, True)
    # block-major tiled packing + device-timed tactic pick: exactly what the
    # engine runs (LinearMethod packing + startup autotune)
    bn = choose_block_n(N)
    p = pack_w4_tiled(q, bn) if bn else pack_w4(q)

    # device-timed tactic selection, mirroring ModelEngine.autotune_kernels
    tuner = AutoTuner.get()
    key = (K, N, int(bn is not None))
    if not tuner.lookup("w4a16", key):
        cands = w4a16_tactic_candidates(K, N, tiled=bn is not None)

        def run(tactic):
            def body(i, xx):
                o = w4a16_matmul(xx, p, s, **tactic)
                return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
            return jax.lax.fori_loop(0, tuner.chain_len, body, x)

        with autotune():
            tuner.maybe_tune("w4a16", key, cands, run)

    @jax.jit
    def chained(x0, p, s):
        def body(i, xx):
            o = w4a16_matmul(xx, p, s)
            # data dependency on EVERY output element: max() cannot be
            # rewritten into a sliced or summed matmul by XLA (a sliced
            # bump lets slice-of-dot read one weight column and fake >100%
            # of roofline)
            return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

    float(chained(x, p, s))  # compile+warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(x, p, s))
        times.append((time.perf_counter() - t0 - rtt) / inner - overhead)
    dt = sorted(times)[len(times) // 2]  # median (the tunnel adds jitter)
    spread = (max(times) - min(times)) / dt
    return (K * N / 2) / dt, spread  # weight-stream bytes/sec, rel spread


def main():
    from benchmarks.bench_w4a16 import detect_hbm_roofline

    roofline = detect_hbm_roofline()
    rtt = _rtt()
    overhead = _loop_overhead(rtt)
    # Llama-8B decode GEMMs: qkv, o, gate_up, down
    shapes = [(16, 4096, 6144), (16, 4096, 4096),
              (16, 4096, 28672), (16, 14336, 4096)]
    total_bytes = 0
    total_time = 0.0
    per_shape = {}
    spreads = []
    for (M, K, N) in shapes:
        bps, spread = bench_w4a16_shape(M, K, N, rtt, overhead=overhead)
        wb = K * N / 2
        total_bytes += wb
        total_time += wb / bps
        per_shape[f"{M}x{K}x{N}"] = round(100.0 * bps / roofline, 2)
        spreads.append(spread)
    agg_bps = total_bytes / total_time
    pct = 100.0 * agg_bps / roofline
    print(json.dumps({
        "metric": "w4a16_gemm_hbm_roofline_pct",
        "value": round(pct, 2),
        "unit": "%",
        "vs_baseline": round(pct / 85.0, 4),
        # median-of-5 per sample; spread = (max-min)/median across the 5
        # repeats, so tunnel noise is distinguishable from real regressions
        "max_rel_spread": round(max(spreads), 3),
        "per_shape_pct": per_shape,
        # harness per-iter cost (fori_loop + dependency bump, no kernel),
        # measured and subtracted like the RTT
        "harness_overhead_us": round(overhead * 1e6, 2),
    }))


if __name__ == "__main__":
    main()
