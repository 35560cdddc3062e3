"""Round-2 probe C: (bn, bk) sweep for the tiled W4A16 kernel (mixed s4
feed) on the qkv decode shape, then best-2 policies on the other bench
shapes.  NOTE: native jnp.int4 arrays are UNIMPLEMENTED on this backend —
never create them outside pltpu.bitcast."""
import json
import time

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
from tensorrt_llm_tpu.quantization import pack_w4_tiled, quantize_w4


def rtt():
    t = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    float(jnp.sum(f(t)))
    s = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(f(t)))
        s.append(time.perf_counter() - t0)
    return sorted(s)[len(s) // 2]


ROOF = 819e9


def bench(M, K, N, bn, bk, mixed, r, q=None, s=None, x=None):
    wb = K * N / 2
    inner = max(100, int(10 * max(r, 0.005) * ROOF / wb))
    p3 = pack_w4_tiled(q, bn)

    @jax.jit
    def chained(x0):
        def body(i, xx):
            o = w4a16_matmul(xx, p3, s, block_k=bk, mixed=mixed)
            return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))

    float(chained(x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chained(x))
        ts.append((time.perf_counter() - t0 - r) / inner)
    dt = sorted(ts)[len(ts) // 2]
    return wb / dt


def main():
    r = rtt()
    print(f"rtt={r*1e3:.2f} ms", flush=True)

    def data(M, K, N):
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(0), (K, N),
                              jnp.float32) * .1
        q, s, _ = quantize_w4(w, 128, True)
        return x, q, s

    M, K, N = 16, 4096, 6144
    x, q, s = data(M, K, N)
    results = []
    for bn in (512, 256, 1024):
        for bk in (2048, 1024, 4096):
            try:
                bps = bench(M, K, N, bn, bk, True, r, q=q, s=s, x=x)
                row = {"shape": [M, K, N], "bn": bn, "bk": bk,
                       "gbps": round(bps / 1e9, 1),
                       "pct": round(100 * bps / ROOF, 1)}
                results.append(row)
                print(json.dumps(row), flush=True)
            except Exception as e:
                print(json.dumps({"bn": bn, "bk": bk,
                                  "err": repr(e)[:120]}), flush=True)
    results.sort(key=lambda d: -d["gbps"])
    best = [(d["bn"], d["bk"]) for d in results[:2]]
    print("best2:", best, flush=True)

    for (M, K, N) in [(16, 4096, 4096), (16, 4096, 28672),
                      (16, 14336, 4096)]:
        x, q, s = data(M, K, N)
        for bn, bk in best:
            if K % bk:
                continue
            try:
                bps = bench(M, K, N, bn, bk, True, r, q=q, s=s, x=x)
                print(json.dumps({"shape": [M, K, N], "bn": bn, "bk": bk,
                                  "gbps": round(bps / 1e9, 1),
                                  "pct": round(100 * bps / ROOF, 1)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"shape": [M, K, N], "bn": bn, "bk": bk,
                                  "err": repr(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
