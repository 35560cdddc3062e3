"""Round-2 per-shape, per-tactic W4A16 probe on the real chip.

Times every autotuner tactic explicitly (GB/s of the weight stream) plus an
XLA native-S4 ceiling reference, so we can see exactly which variant wins on
each Llama-8B decode shape and how far the kernel sits from the 85% target.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from benchmarks.bench_w4a16 import detect_hbm_roofline  # noqa: E402


def _rtt() -> float:
    t = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    float(jnp.sum(f(t)))
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(jnp.sum(f(t)))
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def time_call(fn, x, rtt, reps=5):
    jax.block_until_ready(fn(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts.append(time.perf_counter() - t0 - rtt)
    return sorted(ts)[len(ts) // 2]


def main():
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
    from tensorrt_llm_tpu.quantization import (choose_block_n, pack_w4_tiled,
                                               quantize_w4)

    roofline = detect_hbm_roofline()
    rtt = _rtt()
    print(f"roofline={roofline/1e9:.1f}GB/s rtt={rtt*1e3:.1f}ms", flush=True)

    shapes = [(16, 4096, 4096),
              (16, 4096, 28672), (16, 14336, 4096)]
    for (M, K, N) in shapes:
        wbytes = K * N // 2
        inner = max(300, int(0.4 / (wbytes / 700e9)))
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * .1
        q, s, _ = quantize_w4(w, 128, True)
        bn = choose_block_n(N)
        p = pack_w4_tiled(q, bn)

        def chained(tactic):
            @jax.jit
            def f(x0):
                def body(i, xx):
                    o = w4a16_matmul(xx, p, s, **tactic)
                    return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
                return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))
            return f

        tactics = [
            {"block_k": 4096 if K % 4096 == 0 else 2048},
            {"block_k": 4096 if K % 4096 == 0 else 2048, "mixed": True},
            {"variant": "ramp"},
            {"variant": "ramp", "mixed": True},
            {"variant": "ramp", "ramp_bk_big": 8192},
        ]
        rows = {}
        for t in tactics:
            name = json.dumps(t, sort_keys=True)
            try:
                dt = time_call(chained(t), x, rtt) / inner
                rows[name] = round(100 * (wbytes / dt) / roofline, 1)
            except Exception as e:  # noqa: BLE001
                rows[name] = f"FAIL {type(e).__name__}"
            print(f"  {(M,K,N)} {name}: {rows[name]}", flush=True)


if __name__ == "__main__":
    main()
