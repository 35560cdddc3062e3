"""Minimal repro hunt for the multi-step (lax.scan) decode hang on v5e.

Variants, each a tiny jit with a 2-step scan (compile seconds, not
minutes):
  a) paged_decode_attention alone in the scan body
  b) write_kv_cache (XLA scatter append) alone, caches donated
  c) scatter + kernel together (the real decode body shape)
  d) on-device sample_tokens alone
Run each under a watchdog: if one never returns, it is the trigger.
"""

import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from tensorrt_llm_tpu.utils.common import enable_compilation_cache

B, HQ, HKV, D = 2, 32, 4, 64          # TinyLlama decode shapes
NB, BS, MB = 64, 16, 16


def timed(name, fn):
    done = [False]
    def run():
        try:
            fn()
            done[0] = True
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            done[0] = None
    th = threading.Thread(target=run, daemon=True)
    t0 = time.time()
    th.start()
    th.join(timeout=420)
    if th.is_alive():
        print(f"  {name}: HANG (> 420s)", flush=True)
        return False
    if done[0]:
        print(f"  {name}: OK ({time.time()-t0:.0f}s)", flush=True)
    return done[0]


def pools():
    k = jnp.zeros((NB, HKV, BS * D // 128, 128), jnp.bfloat16)
    v = jnp.zeros((NB, HKV, BS * D // 128, 128), jnp.bfloat16)
    return k, v


def tables():
    bt = jnp.asarray(np.tile(np.arange(MB, dtype=np.int32), (B, 1)))
    lens = jnp.asarray(np.full(B, 30, np.int32))
    return bt, lens


def case_kernel_only():
    from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
    k, v = pools()
    bt, lens = tables()
    q = jnp.ones((B, HQ, D), jnp.bfloat16)

    @jax.jit
    def f(q, k, v, bt, lens):
        def body(carry, _):
            qq, ln = carry
            o = paged_decode_attention(qq, k, v, bt, ln, scale=0.125)
            return (o, ln + 1), jnp.sum(o)
        (_, _), outs = jax.lax.scan(body, (q, lens), None, length=2)
        return outs
    jax.block_until_ready(f(q, k, v, bt, lens))


def case_scatter_only():
    from tensorrt_llm_tpu.ops.attention_xla import write_kv_cache
    k, v = pools()
    slots = jnp.asarray(np.arange(B, dtype=np.int32) + 30)

    @jax.jit
    def f(k, v, slots):
        def body(carry, _):
            kk, vv, sl = carry
            kn = jnp.ones((B, HKV, D), jnp.bfloat16)
            kk, vv = write_kv_cache(kk, vv, kn, kn, sl)
            return (kk, vv, sl + 1), jnp.sum(kn)
        (kk, vv, _), outs = jax.lax.scan(body, (k, v, slots), None, length=2)
        return outs, kk, vv
    jax.block_until_ready(jax.jit(f, donate_argnums=(0, 1))(k, v, slots))


def case_both():
    from tensorrt_llm_tpu.ops.attention_xla import write_kv_cache
    from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
    k, v = pools()
    bt, lens = tables()
    slots = jnp.asarray(np.arange(B, dtype=np.int32) + 30)
    q = jnp.ones((B, HQ, D), jnp.bfloat16)

    def f(q, k, v, bt, lens, slots):
        def body(carry, _):
            kk, vv, ln, sl, qq = carry
            kn = jnp.mean(qq.reshape(B, HKV, HQ // HKV, D), axis=2)
            kk, vv = write_kv_cache(kk, vv, kn, kn, sl)
            o = paged_decode_attention(qq, kk, vv, bt, ln + 1, scale=0.125)
            return (kk, vv, ln + 1, sl + 1, o), jnp.sum(o)
        (kk, vv, *_), outs = jax.lax.scan(
            body, (k, v, lens, slots, q), None, length=2)
        return outs, kk, vv
    jax.block_until_ready(
        jax.jit(f, donate_argnums=(1, 2))(q, k, v, bt, lens, slots))


def case_sampler_only():
    from tensorrt_llm_tpu.runtime.sampler import SamplingState, sample_tokens
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    state = SamplingState.from_params([SamplingParams()] * B, step=0,
                                      pad_to=B)
    logits = jnp.ones((B, 32000), jnp.float32)

    @jax.jit
    def f(logits, state):
        def body(carry, _):
            lg, ks = carry
            toks, logp = sample_tokens(lg, state, step_offset=ks)
            return (lg + toks.sum() * 0.0, ks + 1), toks
        (_, _), outs = jax.lax.scan(body, (logits, jnp.int32(0)), None,
                                    length=2)
        return outs
    jax.block_until_ready(f(logits, state))




def case_w4a16_scan():
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
    from tensorrt_llm_tpu.quantization import (choose_block_n, pack_w4_tiled,
                                               quantize_w4)
    import numpy as _np
    K, N = 2048, 2048
    w = jnp.asarray(_np.random.RandomState(0).randn(K, N)
                    .astype(_np.float32) * 0.1)
    q, s, _ = quantize_w4(w, 128, True)
    p = pack_w4_tiled(q, choose_block_n(N))
    x = jnp.ones((16, K), jnp.bfloat16)

    @jax.jit
    def f(x, p, s):
        def body(carry, _):
            xx = carry
            o = w4a16_matmul(xx, p, s, block_k=2048, mixed=True)
            return xx + o.astype(xx.dtype) * 1e-30, jnp.sum(o)
        _, outs = jax.lax.scan(body, x, None, length=2)
        return outs
    jax.block_until_ready(f(x, p, s))


def case_w4a16_5632():
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
    from tensorrt_llm_tpu.quantization import (choose_block_n, pack_w4_tiled,
                                               quantize_w4)
    import numpy as _np
    K, N = 5632, 2048
    w = jnp.asarray(_np.random.RandomState(0).randn(K, N)
                    .astype(_np.float32) * 0.1)
    q, s, _ = quantize_w4(w, 128, True)
    p = pack_w4_tiled(q, choose_block_n(N))
    x = jnp.ones((16, K), jnp.bfloat16)

    @jax.jit
    def f(x, p, s):
        def body(carry, _):
            xx = carry
            o = w4a16_matmul(xx, p, s, block_k=1408, mixed=True)
            return xx, jnp.sum(o)
        _, outs = jax.lax.scan(body, x, None, length=2)
        return outs
    jax.block_until_ready(f(x, p, s))




def case_attn_plus_gemm():
    """Paged-attention Pallas kernel + W4A16 Pallas kernel in ONE scan
    body (two different manual-DMA kernels sharing a while-loop body)."""
    from tensorrt_llm_tpu.ops.attention_xla import write_kv_cache
    from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul
    from tensorrt_llm_tpu.quantization import (choose_block_n, pack_w4_tiled,
                                               quantize_w4)
    K, N = 2048, 2048
    w = jnp.asarray(np.random.RandomState(0).randn(K, N)
                    .astype(np.float32) * 0.1)
    qw, s, _ = quantize_w4(w, 128, True)
    p = pack_w4_tiled(qw, choose_block_n(N))
    k, v = pools()
    bt, lens = tables()
    slots = jnp.asarray(np.arange(B, dtype=np.int32) + 30)
    x = jnp.ones((B, K), jnp.bfloat16)

    def f(x, p, s, k, v, bt, lens, slots):
        def body(carry, _):
            kk, vv, ln, sl, xx = carry
            h = w4a16_matmul(xx, p, s, block_k=2048, mixed=True)  # [B, N]
            qq = h[:, :HQ * D].reshape(B, HQ, D).astype(jnp.bfloat16)
            kn = jnp.mean(qq.reshape(B, HKV, HQ // HKV, D), axis=2)
            kk, vv = write_kv_cache(kk, vv, kn, kn, sl)
            o = paged_decode_attention(qq, kk, vv, bt, ln + 1, scale=0.125)
            xn = xx + jnp.pad(o.reshape(B, -1),
                              ((0, 0), (0, K - HQ * D))).astype(xx.dtype)
            return (kk, vv, ln + 1, sl + 1, xn), jnp.sum(o)
        (kk, vv, *_), outs = jax.lax.scan(
            body, (k, v, lens, slots, x), None, length=2)
        return outs, kk, vv
    jax.block_until_ready(
        jax.jit(f, donate_argnums=(3, 4))(x, p, s, k, v, bt, lens, slots))


def main():
    enable_compilation_cache()
    only = sys.argv[1] if len(sys.argv) > 1 else None
    cases = {"kernel": case_kernel_only, "scatter": case_scatter_only,
             "both": case_both, "sampler": case_sampler_only,
             "w4a16": case_w4a16_scan, "w4a16_5632": case_w4a16_5632,
             "attn_plus_gemm": case_attn_plus_gemm}
    for name, fn in cases.items():
        if only and only != name:
            continue
        ok = timed(name, fn)
        if ok is False:
            break  # a hang wedges the device; stop here


if __name__ == "__main__":
    main()
