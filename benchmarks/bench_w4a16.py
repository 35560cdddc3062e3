"""W4A16 GEMM micro-benchmark (roofline-relative).

Methodology: N_INNER dependency-chained kernel calls inside one jit (each
call's input derives from the previous output) so per-call dispatch and the
axon tunnel latency amortize away and XLA cannot CSE the chain.  The metric is
achieved HBM bandwidth from the packed-weight read (K*N/2 bytes) vs the chip
roofline — the reference's weight-only GEMM is measured the same way in
spirit (`weightOnlyKernelTest.cpp:394-397` prints per-kernel latency).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
from tensorrt_llm_tpu.quantization import pack_w4, quantize_w4

HBM_BYTES_PER_SEC = {
    # per-chip HBM bandwidth
    "v5e": 819e9,
    "v5p": 2765e9,
    "v6e": 1640e9,
}


def detect_hbm_roofline() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return HBM_BYTES_PER_SEC["v5e"]
    if "v6" in kind:
        return HBM_BYTES_PER_SEC["v6e"]
    if "v5" in kind:
        return HBM_BYTES_PER_SEC["v5p"]
    return HBM_BYTES_PER_SEC["v5e"]


def bench_shape(M: int, K: int, N: int, group: int = 128, inner: int = 20,
                iters: int = 5, **kw):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.1
    q, s, _ = quantize_w4(w, group, symmetric=True)
    p = pack_w4(q)

    @jax.jit
    def chained(x0):
        def body(i, x):
            out = w4a16_matmul(x, p, s, **kw)
            # data dependency on EVERY output element (slice bumps let XLA's
            # slice-of-dot optimization fake the bandwidth)
            bump = (jnp.max(jnp.abs(out)) * 1e-30).astype(x.dtype)
            return x + bump
        return jax.lax.fori_loop(0, inner, body, x0)

    chained(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = chained(x)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / (iters * inner)
    weight_bytes = K * N / 2
    total_bytes = weight_bytes + M * K * 2 + M * N * 2 + s.size * 4
    return {
        "M": M, "K": K, "N": N,
        "us": dt * 1e6,
        "gbps": total_bytes / dt / 1e9,
        "weight_gbps": weight_bytes / dt / 1e9,
        "tflops": 2 * M * N * K / dt / 1e12,
    }


DEFAULT_SHAPES = [
    # decode GEMMs (Llama-8B-ish): qkv, o, gate_up, down
    (16, 4096, 6144), (16, 4096, 4096), (16, 4096, 28672), (16, 14336, 4096),
    # bigger-batch decode
    (64, 4096, 28672),
    # prefill
    (256, 4096, 11008),
]


def run(shapes=None, verbose=True):
    roofline = detect_hbm_roofline()
    results = []
    for (M, K, N) in shapes or DEFAULT_SHAPES:
        r = bench_shape(M, K, N)
        r["pct_roofline"] = 100.0 * r["gbps"] / (roofline / 1e9)
        results.append(r)
        if verbose:
            print(f"M={M:4d} K={K:5d} N={N:5d}: {r['us']:7.1f}us "
                  f"{r['gbps']:6.0f} GB/s ({r['pct_roofline']:.0f}% roofline) "
                  f"{r['tflops']:.1f} TFLOP/s")
    return results


if __name__ == "__main__":
    run()
