"""Round-2 probe D: structural kernel variants at the best tiling
(bn=1024, bk=4096) on the qkv shape.  Isolates: scale-FMA cost, chunked-
dot cost vs one big dot, batched dot_general, weight-side scaled upcast,
and a bn=2048 pack (fewer grid steps)."""
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrt_llm_tpu.quantization import pack_w4_tiled, quantize_w4
from tensorrt_llm_tpu.utils import round_up

ROOF = 819e9
M, K, N = 16, 4096, 6144
G = 128


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


def make_kernel(mode):
    def kern(x_ref, p_ref, s_ref, out_ref, acc_ref):
        k_idx = pl.program_id(2)
        n_k = pl.num_programs(2)

        @pl.when(k_idx == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        BKh = p_ref.shape[1]          # BK//2
        BK = BKh * 2
        nch = BK // G
        acc = acc_ref[:]
        if mode in ("chunk_scale", "chunk_noscale"):
            for c in range(nch):
                pblk = p_ref[0, c * (G // 2):(c + 1) * (G // 2), :]
                w = pltpu.bitcast(pblk, jnp.int4)
                x_c = x_ref[:, c * G:(c + 1) * G]
                partial = jnp.dot(x_c, w, preferred_element_type=jnp.float32)
                if mode == "chunk_scale":
                    s_g = s_ref[pl.ds(k_idx * nch + c, 1), :]
                    acc = partial * s_g + acc
                else:
                    acc = partial + acc
        elif mode == "bigdot_noscale":
            w = pltpu.bitcast(p_ref[0], jnp.int4)          # [BK, BN]
            acc = acc + jnp.dot(x_ref[:, :], w,
                                preferred_element_type=jnp.float32)
        elif mode == "bigdot_wscale":
            w = pltpu.bitcast(p_ref[0], jnp.int4).astype(jnp.bfloat16)
            BN = w.shape[1]
            sw = s_ref[:, :].astype(jnp.bfloat16)          # [groups, BN]
            w = (w.reshape(nch, G, BN)
                 * sw[k_idx * nch:(k_idx + 1) * nch, None, :]
                 ).reshape(BK, BN)
            acc = acc + jnp.dot(x_ref[:, :], w,
                                preferred_element_type=jnp.float32)
        elif mode == "batched_scale":
            w = pltpu.bitcast(p_ref[0], jnp.int4)          # [BK, BN]
            BN = w.shape[1]
            xg = x_ref[:, :].reshape(M, nch, G)
            y = jax.lax.dot_general(
                xg.transpose(1, 0, 2), w.reshape(nch, G, BN),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [nch, M, BN]
            sw = s_ref[k_idx * nch:(k_idx + 1) * nch, :]   # [nch, BN]
            acc = acc + jnp.sum(y * sw[:, None, :], axis=0)
        acc_ref[:] = acc

        @pl.when(k_idx == n_k - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(jnp.bfloat16)
    return kern


@functools.partial(jax.jit, static_argnames=("mode", "bn", "bk"))
def run_variant(x, p3, s, mode, bn, bk, inner):
    n_n = N // bn
    n_k = K // bk
    f = pl.pallas_call(
        make_kernel(mode),
        grid=(1, n_n, n_k),
        in_specs=[
            pl.BlockSpec((M, bk), lambda i, j, k: (0, k)),
            pl.BlockSpec((1, bk // 2, bn), lambda i, j, k: (j, k, 0)),
            pl.BlockSpec((K // G, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda i, j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=K * N // 2,
            transcendentals=0),
    )

    def body(i, xx):
        o = f(xx, p3, s)
        return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
    return jnp.sum(jax.lax.fori_loop(0, inner, body, x))


def main():
    r = rtt()
    print(f"rtt={r*1e3:.2f} ms", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * .1
    q, s, _ = quantize_w4(w, G, True)
    s = s.astype(jnp.float32)
    wb = K * N / 2
    inner = max(100, int(10 * max(r, 0.005) * ROOF / wb))

    cases = [
        ("chunk_scale", 1024, 4096),
        ("chunk_noscale", 1024, 4096),
        ("bigdot_noscale", 1024, 4096),
        ("bigdot_wscale", 1024, 4096),
        ("batched_scale", 1024, 4096),
        ("bigdot_noscale", 2048, 4096),
        ("bigdot_wscale", 2048, 4096),
        ("chunk_scale", 2048, 4096),
        ("batched_scale", 2048, 4096),
    ]
    for mode, bn, bk in cases:
        try:
            p3 = pack_w4_tiled(q, bn)
            fcall = lambda x0: run_variant(x0, p3, s, mode, bn, bk, inner)
            float(fcall(x))
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(fcall(x))
                ts.append((time.perf_counter() - t0 - r) / inner)
            dt = sorted(ts)[len(ts) // 2]
            print(json.dumps({"mode": mode, "bn": bn, "bk": bk,
                              "gbps": round(wb / dt / 1e9, 1),
                              "pct": round(100 * wb / dt / ROOF, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"mode": mode, "bn": bn, "bk": bk,
                              "err": repr(e)[:150]}), flush=True)


if __name__ == "__main__":
    main()
