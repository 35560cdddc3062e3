import time
import jax, jax.numpy as jnp
from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul, _pick_block_k
from tensorrt_llm_tpu.quantization import choose_block_n, pack_w4_tiled, quantize_w4

def rtt():
    t = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    float(jnp.sum(f(t)))
    s = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(f(t))); s.append(time.perf_counter()-t0)
    return sorted(s)[2]

R = rtt()
shapes = [(16, 4096, 6144), (16, 4096, 4096), (16, 4096, 28672), (16, 14336, 4096)]
for (M, K, N) in shapes:
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.1
    q, s, _ = quantize_w4(w, 128, True)
    p = pack_w4_tiled(q, choose_block_n(N))
    bk_max = _pick_block_k(K, 128)
    inner = max(200, int(20 * max(R, 0.005) * 819e9 / (K * N / 2)))
    res = {}
    for bk in sorted({bk_max, bk_max//2, bk_max//4, 512, 1024, 2048}):
        if bk < 128 or K % bk or bk % 128: continue
        @jax.jit
        def chained(x0, p, s, bk=bk):
            def body(i, xx):
                o = w4a16_matmul(xx, p, s, block_k=bk)
                return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
            return jnp.sum(jax.lax.fori_loop(0, inner, body, x0))
        float(chained(x, p, s))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(chained(x, p, s))
            ts.append((time.perf_counter() - t0 - R) / inner)
        dt = sorted(ts)[1]
        res[bk] = (K*N/2)/dt/1e9
    print(M, K, N, {k: round(v,1) for k, v in sorted(res.items())}, flush=True)
