"""Per-shape W4A16 roofline probe: tiled grid pipeline vs flat-grid
manual-DMA stream variant (r4; the r2-verdict lookahead plan).

Prints GB/s and % of roofline per (shape, tactic) on the real chip.
"""

import time

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.utils.common import enable_compilation_cache


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


def bench(M, K, N, tactic, r, inner=None):
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
    from tensorrt_llm_tpu.quantization import (choose_block_n, pack_w4_tiled,
                                               quantize_w4)
    if inner is None:
        inner = max(30, int(20 * max(r, 0.005) * 819e9 / (K * N / 2)))
        inner = min(inner, 400)
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

    float(chained(x, p, s))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(x, p, s))
        times.append((time.perf_counter() - t0 - r) / inner)
    dt = sorted(times)[len(times) // 2]
    spread = (max(times) - min(times)) / dt * 100
    return (K * N / 2) / dt, spread


def check_numerics():
    """Real-Mosaic stream-vs-dequant-reference check (verify-skill rule:
    kernel changes need an on-chip numerics pass, interpret mode is not
    Mosaic)."""
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
    from tensorrt_llm_tpu.quantization import (choose_block_n, dequantize_w4,
                                               pack_w4, pack_w4_tiled,
                                               quantize_w4)
    import numpy as np
    M, K, N = 16, 4096, 4096
    w = jnp.asarray(np.random.RandomState(0).randn(K, N)
                    .astype(np.float32) * 0.1)
    q, s, _ = quantize_w4(w, 128, True)
    p3 = pack_w4_tiled(q, choose_block_n(N))
    x = jnp.asarray(np.random.RandomState(1).randn(M, K)
                    .astype(np.float32) * 0.5, jnp.bfloat16)
    ref = x.astype(jnp.float32) @ dequantize_w4(pack_w4(q), s)
    tol = float(jnp.max(jnp.abs(ref))) / 8 * 3
    for name, tac in [("stream", {"variant": "stream", "mixed": True}),
                      ("stream-2k", {"variant": "stream", "mixed": True,
                                     "ramp_bk0": 2048})]:
        out = w4a16_matmul(x, p3, s, **tac)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        status = "OK" if err <= tol else "NUMERICS FAIL"
        print(f"  numerics {name}: err={err:.4f} tol={tol:.4f} {status}",
              flush=True)
        assert err <= tol, (name, err, tol)


def main():
    enable_compilation_cache()
    r = rtt()
    print(f"rtt={r*1e3:.1f}ms", flush=True)
    check_numerics()
    ROOF = 819e9
    shapes = [(16, 4096, 6144), (16, 4096, 4096),
              (16, 4096, 28672), (16, 14336, 4096)]
    tactics = [
        ("tiled-bkmax-mixed", {"mixed": True}),          # current default
        ("stream-1k", {"variant": "stream", "mixed": True}),
        ("stream-2k", {"variant": "stream", "mixed": True,
                       "ramp_bk0": 2048}),
        ("stream-0.5k", {"variant": "stream", "mixed": True,
                         "ramp_bk0": 512}),
        ("stream-1k-la8", {"variant": "stream", "mixed": True,
                           "lookahead": 8}),
        ("stream-0.5k-la8", {"variant": "stream", "mixed": True,
                             "ramp_bk0": 512, "lookahead": 8}),
        ("stream-0.5k-la12", {"variant": "stream", "mixed": True,
                              "ramp_bk0": 512, "lookahead": 12}),
        ("tiled-bk2048-mixed", {"block_k": 2048, "mixed": True}),
    ]
    for (M, K, N) in shapes:
        for name, tac in tactics:
            try:
                bps, spread = bench(M, K, N, dict(tac), r)
                print(f"  ({M},{K},{N}) {name}: {bps/1e9:.0f} GB/s = "
                      f"{100*bps/ROOF:.1f}% (spread {spread:.0f}%)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  ({M},{K},{N}) {name}: FAIL "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
