"""Round-2 kernel probe: time every W4A16 tactic per bench shape on the
real chip, plus XLA native-S4 references.  Robust: each variant wrapped in
try/except so one Mosaic rejection doesn't kill the sweep."""
import json
import time
import traceback

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
from tensorrt_llm_tpu.quantization import (choose_block_n, pack_w4,
                                           pack_w4_tiled, quantize_w4)
from benchmarks.bench_w4a16 import detect_hbm_roofline


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


def time_fn(make_chained, x, inner, r):
    chained = make_chained(inner)
    float(chained(x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chained(x))
        ts.append((time.perf_counter() - t0 - r) / inner)
    return sorted(ts)[len(ts) // 2]


def main():
    roof = detect_hbm_roofline()
    r = rtt()
    print(f"roofline={roof/1e9:.1f} GB/s rtt={r*1e3:.2f} ms", flush=True)
    shapes = [(16, 4096, 6144), (16, 4096, 4096),
              (16, 4096, 28672), (16, 14336, 4096)]
    for (M, K, N) in shapes:
        wb = K * N / 2
        inner = max(100, int(10 * max(r, 0.005) * 819e9 / wb))
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * .1
        q, s, _ = quantize_w4(w, 128, True)
        bn = choose_block_n(N)
        p3 = pack_w4_tiled(q, bn)

        tactics = [
            {"block_k": 4096},
            {"block_k": 4096, "mixed": True},
            {"variant": "ramp"},
            {"variant": "ramp", "ramp_bk_big": 8192},
            {"variant": "ramp", "mixed": True},
            {"variant": "ramp", "ramp_bk_big": 8192, "mixed": True},
        ]
        for tac in tactics:
            try:
                def mk(inner, tac=tac):
                    @jax.jit
                    def chained(x0):
                        def body(i, xx):
                            o = w4a16_matmul(xx, p3, s, **tac)
                            return xx + (jnp.max(jnp.abs(o)) * 1e-30
                                         ).astype(xx.dtype)
                        return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))
                    return chained
                dt = time_fn(mk, x, inner, r)
                print(json.dumps({"shape": [M, K, N], "tactic": tac,
                                  "gbps": round(wb / dt / 1e9, 1),
                                  "pct": round(100 * wb / dt / roof, 1)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"shape": [M, K, N], "tactic": tac,
                                  "err": repr(e)[:160]}), flush=True)

        # XLA native-S4 references: unscaled dot, and dot with group scales
        try:
            w4s4 = q.astype(jnp.int4)  # [K, N] native s4 storage

            def mk_xla(inner):
                @jax.jit
                def chained(x0):
                    def body(i, xx):
                        o = jnp.dot(xx, w4s4.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                        return xx + (jnp.max(jnp.abs(o)) * 1e-30
                                     ).astype(xx.dtype)
                    return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))
                return chained
            dt = time_fn(mk_xla, x, inner, r)
            print(json.dumps({"shape": [M, K, N], "tactic": "xla_s4_noscale",
                              "gbps": round(wb / dt / 1e9, 1),
                              "pct": round(100 * wb / dt / roof, 1)}),
                  flush=True)

            G = K // s.shape[0]

            def mk_xla_s(inner):
                @jax.jit
                def chained(x0):
                    def body(i, xx):
                        wd = (w4s4.astype(jnp.bfloat16)
                              .reshape(s.shape[0], G, N)
                              * s[:, None, :].astype(jnp.bfloat16)
                              ).reshape(K, N)
                        o = jnp.dot(xx, wd,
                                    preferred_element_type=jnp.float32)
                        return xx + (jnp.max(jnp.abs(o)) * 1e-30
                                     ).astype(xx.dtype)
                    return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))
                return chained
            dt = time_fn(mk_xla_s, x, inner, r)
            print(json.dumps({"shape": [M, K, N], "tactic": "xla_s4_scaled",
                              "gbps": round(wb / dt / 1e9, 1),
                              "pct": round(100 * wb / dt / roof, 1)}),
                  flush=True)
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()
