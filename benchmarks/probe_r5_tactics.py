"""Per-tactic W4A16 timing with bench.py's exact methodology (long
dependency-chained fori_loop, RTT-subtracted, median-of-5) — the r4
stream probe's short chains report >100% of roofline and cannot rank.

Usage: python -m benchmarks.probe_r5_tactics [shapes...]
"""

import time

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.utils.common import enable_compilation_cache


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


def bench_tactic(M, K, N, tactic, rtt):
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
    from tensorrt_llm_tpu.quantization import (choose_block_n, pack_w4_tiled,
                                               quantize_w4)
    inner = max(200, int(20 * max(rtt, 0.005) * 819e9 / (K * N / 2)))
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.1
    q, s, _ = quantize_w4(w, 128, True)
    p = pack_w4_tiled(q, choose_block_n(N))

    @jax.jit
    def chained(x0, p, s):
        def body(i, xx):
            o = w4a16_matmul(xx, p, s, **tactic)
            return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

    float(chained(x, p, s))  # compile+warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(x, p, s))
        times.append((time.perf_counter() - t0 - rtt) / inner)
    dt = sorted(times)[len(times) // 2]
    spread = (max(times) - min(times)) / dt
    return (K * N / 2) / dt, spread


def main():
    enable_compilation_cache()
    rtt = _rtt()
    print(f"rtt={rtt*1e3:.1f}ms", flush=True)
    ROOF = 819e9
    shapes = [(16, 4096, 4096), (16, 4096, 6144)]
    tactics = [
        ("tiled-bkmax", {"block_k": 4096, "mixed": True}),
        ("tiled-bk2048", {"block_k": 2048, "mixed": True}),
        ("stream-1k-la4", {"variant": "stream", "mixed": True}),
        ("stream-2k-la4", {"variant": "stream", "mixed": True,
                           "ramp_bk0": 2048}),
        ("stream-1k-la8", {"variant": "stream", "mixed": True,
                           "lookahead": 8}),
        ("stream-0.5k-la8", {"variant": "stream", "mixed": True,
                             "ramp_bk0": 512, "lookahead": 8}),
        ("stream-2k-la2", {"variant": "stream", "mixed": True,
                           "ramp_bk0": 2048, "lookahead": 2}),
        ("stream-4k-la2", {"variant": "stream", "mixed": True,
                           "ramp_bk0": 4096, "lookahead": 2}),
        ("stream-4k-la4", {"variant": "stream", "mixed": True,
                           "ramp_bk0": 4096, "lookahead": 4}),
    ]
    for (M, K, N) in shapes:
        ideal_us = (K * N / 2) / ROOF * 1e6
        print(f"-- ({M},{K},{N}) ideal {ideal_us:.1f}us", flush=True)
        for name, tac in tactics:
            try:
                bps, spread = bench_tactic(M, K, N, dict(tac), rtt)
                us = (K * N / 2) / bps * 1e6
                print(f"  {name}: {us:.2f}us = {100*bps/ROOF:.1f}% "
                      f"(spread {100*spread:.0f}%)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()


def loop_overhead(rtt, M=16, K=4096):
    """Per-iteration cost of the chain harness itself (fori_loop + bump),
    no matmul — the part of bench.py's per-iter time that is NOT kernel."""
    import jax
    import jax.numpy as jnp
    inner = 4000
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

    @jax.jit
    def chained(x0):
        def body(i, xx):
            return xx + (jnp.max(jnp.abs(xx)) * 1e-30).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

    float(chained(x))
    import time as _t
    ts = []
    for _ in range(5):
        t0 = _t.perf_counter()
        float(chained(x))
        ts.append((_t.perf_counter() - t0 - rtt) / inner)
    return sorted(ts)[len(ts) // 2]
