"""Mosaic compile-only sweep: AOT-compile every Pallas kernel variant for
the real TPU target (VERDICT r3 #2).

Interpret-mode CPU tests exercise kernel *semantics* but not Mosaic
lowering; the r3 int8-KV decode kernel failed `tpu.reshape` only on
hardware.  This sweep closes that blind spot: it `jit(...).lower(...)
.compile()`s each kernel variant against the live TPU backend (no
execution, no HBM needed beyond compile scratch) and records pass/fail.

Usage:  python benchmarks/mosaic_sweep.py [--only SUBSTR] [--out PATH]
Output: one line per variant + benchmarks/MOSAIC_SWEEP.json
"""

from __future__ import annotations

import argparse
import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.utils.common import enable_compilation_cache

S = jax.ShapeDtypeStruct
BF16, F32, I8, I32 = jnp.bfloat16, jnp.float32, jnp.int8, jnp.int32


def _pool(nb, h, bs, d, dtype=BF16):
    """bf16 pool, lane-packing D<128 like KVCacheManager.allocate_pools."""
    if d < 128:
        return S((nb, h, bs * d // 128, 128), dtype)
    return S((nb, h, bs, d), dtype)


def _int8_pool(nb, h, bs, d):
    return (S((nb, h, bs, d), I8), S((nb, h, bs), F32))


def cases():
    """Yield (name, closure, arg_specs). Closures capture static config;
    specs are ShapeDtypeStructs so nothing materializes on device."""
    from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
    from tensorrt_llm_tpu.ops.flash_prefill import flash_prefill_attention
    from tensorrt_llm_tpu.ops.w4a16_gemm import w4a16_matmul, w4a8_matmul
    from tensorrt_llm_tpu.ops.w4a16_fused import (w4a16_fused_mlp,
                                                  prep_scale_stream)
    from tensorrt_llm_tpu.ops.moe_w4a16 import w4a16_grouped_matmul
    from tensorrt_llm_tpu.ops.mla_pallas import (mla_decode_pallas,
                                                 mla_prefill_pallas)
    from tensorrt_llm_tpu.ops.dsa import dsa_scores_pallas

    # ---- paged decode attention -------------------------------------------------
    # (name-suffix, Hq, Hkv, D, sinks, window)
    attn_shapes = [
        ("llama8b", 32, 8, 128, False, None),
        ("tinyllama_d64", 32, 4, 64, False, None),       # lane-packed pool
        ("gptoss_sinks_swa", 64, 8, 64, True, 128),      # lane-packed + sinks
        ("mha_d128", 16, 16, 128, False, None),
    ]
    NB, BS, MB, B = 128, 16, 16, 8
    for tag, hq, hkv, d, has_sinks, win in attn_shapes:
        def f(q, kc, vc, bt, lens, sinks, hq=hq, d=d, win=win,
              has_sinks=has_sinks):
            return paged_decode_attention(
                q, kc, vc, bt, lens, scale=d ** -0.5, sliding_window=win,
                sinks=sinks if has_sinks else None)
        yield (f"paged_decode/bf16/{tag}", f, [
            S((B, hq, d), BF16), _pool(NB, hkv, BS, d), _pool(NB, hkv, BS, d),
            S((B, MB), I32), S((B,), I32), S((hq,), F32)])

        def fp(q, kc, vc, bt, lens, sinks, hq=hq, d=d, win=win,
               has_sinks=has_sinks):
            return flash_prefill_attention(
                q, kc, vc, bt, lens, jnp.int32(0), scale=d ** -0.5,
                sliding_window=win, sinks=sinks if has_sinks else None)
        yield (f"flash_prefill/bf16/{tag}", fp, [
            S((256, hq, d), BF16), _pool(NB, hkv, BS, d),
            _pool(NB, hkv, BS, d), S((MB,), I32), S((), I32),
            S((hq,), F32)])

    # int8 KV (the r3 Mosaic failure): D=128 only (smaller D routes to XLA)
    for tag, hq, hkv, d in [("llama8b", 32, 8, 128)]:
        def fi(q, kd, ks, vd, vs, bt, lens, d=d):
            return paged_decode_attention(
                q, (kd, ks), (vd, vs), bt, lens, scale=d ** -0.5)
        (kd, ks), (vd, vs) = _int8_pool(NB, hkv, BS, d), _int8_pool(
            NB, hkv, BS, d)
        yield (f"paged_decode/int8kv/{tag}", fi,
               [S((B, hq, d), BF16), kd, ks, vd, vs,
                S((B, MB), I32), S((B,), I32)])

        def fip(q, kd, ks, vd, vs, bt, lens, d=d):
            return flash_prefill_attention(
                q, (kd, ks), (vd, vs), bt, lens, jnp.int32(0),
                scale=d ** -0.5)
        yield (f"flash_prefill/int8kv/{tag}", fip,
               [S((256, hq, d), BF16), kd, ks, vd, vs,
                S((MB,), I32), S((), I32)])

    # awkward table width (129 blocks = 2064-token max_seq_len): no
    # aligned dividing tile exists, the kernel must pad the tile space
    # (r5: the int8 scale BlockSpec shrank to 48 lanes and Mosaic
    # rejected it — the int8kv bench config died in warmup)
    def fpa(q, kc, vc, bt, lens):
        return flash_prefill_attention(q, kc, vc, bt, lens, jnp.int32(0),
                                       scale=128 ** -0.5)
    yield ("flash_prefill/bf16/mb129", fpa, [
        S((256, 32, 128), BF16), _pool(160, 8, BS, 128),
        _pool(160, 8, BS, 128), S((129,), I32), S((), I32)])

    def fpa8(q, kd, ks, vd, vs, bt, lens):
        return flash_prefill_attention(q, (kd, ks), (vd, vs), bt, lens,
                                       jnp.int32(0), scale=128 ** -0.5)
    (kd_, ks_), (vd_, vs_) = _int8_pool(160, 8, BS, 128), _int8_pool(
        160, 8, BS, 128)
    yield ("flash_prefill/int8kv/mb129", fpa8, [
        S((256, 32, 128), BF16), kd_, ks_, vd_, vs_,
        S((129,), I32), S((), I32)])

    def pda(q, kc, vc, bt, lens):
        return paged_decode_attention(q, kc, vc, bt, lens,
                                      scale=128 ** -0.5)
    yield ("paged_decode/bf16/mb129", pda, [
        S((B, 32, 128), BF16), _pool(160, 8, BS, 128),
        _pool(160, 8, BS, 128), S((B, 129), I32), S((B,), I32)])

    def pda8(q, kd, ks, vd, vs, bt, lens):
        return paged_decode_attention(q, (kd, ks), (vd, vs), bt, lens,
                                      scale=128 ** -0.5)
    yield ("paged_decode/int8kv/mb129", pda8, [
        S((B, 32, 128), BF16), kd_, ks_, vd_, vs_,
        S((B, 129), I32), S((B,), I32)])

    # ---- W4A16 GEMM variants ----------------------------------------------------
    K, N, BN, G = 4096, 4096, 512, 128
    pk3 = S((N // BN, K // 2, BN), I8)
    sc = S((K // G, N), F32)
    for m, variant in [(8, "ramp"), (8, "tiled"), (256, "tiled"),
                       (1024, "tiled")]:
        def g(x, p, s, variant=variant):
            return w4a16_matmul(x, p, s, variant=variant,
                                block_k=None if variant == "ramp" else 1024)
        yield (f"w4a16/{variant}/M{m}", g, [S((m, K), BF16), pk3, sc])
    # flat-grid manual-DMA stream variant (r4 — absent from the r4 sweep,
    # and it silently dropped out of every on-chip autotune: DEBUG-level
    # failure logging).  These cases answer whether it lowers at all.
    for m, kw in [(8, {}), (16, {}), (64, {}),
                  (16, {"mixed": True}),
                  (16, {"ramp_bk0": 2048}),
                  (16, {"mixed": True, "ramp_bk0": 2048})]:
        def gst(x, p, s, kw=kw):
            return w4a16_matmul(x, p, s, variant="stream", **kw)
        tag = "_".join([f"M{m}"] + [f"{k}{v}" for k, v in kw.items()])
        yield (f"w4a16/stream/{tag}", gst, [S((m, K), BF16), pk3, sc])

    # zeros + bias + silu epilogue; per-channel scales
    def gz(x, p, s, z, b):
        return w4a16_matmul(x, p, s, zeros=z, bias=b, activation="silu",
                            variant="tiled", block_k=1024)
    yield ("w4a16/tiled/zeros_bias_silu", gz,
           [S((64, K), BF16), pk3, sc, S((K // G, N), F32), S((N,), F32)])
    def gpc(x, p, s):
        return w4a16_matmul(x, p, s, variant="tiled", block_k=1024)
    yield ("w4a16/tiled/per_channel", gpc,
           [S((64, K), BF16), pk3, S((1, N), F32)])
    # mixed-precision accumulation path
    def gmx(x, p, s):
        return w4a16_matmul(x, p, s, variant="tiled", block_k=1024,
                            mixed=True)
    yield ("w4a16/tiled/mixed", gmx, [S((256, K), BF16), pk3, sc])

    # W4A8 (int8 activations on the MXU int8 path; quantizes internally)
    def g8(x, p, s):
        return w4a8_matmul(x, p, s)
    yield ("w4a8/tiled/M256", g8, [S((256, K), BF16), pk3, sc])

    # fused gated MLP (three weight streams, one grid)
    I_ = 11008 // 128 * 128  # 10880, BN-divisible
    BNd = 128
    def gm(x, gp, gs, dp, ds):
        return w4a16_fused_mlp(x, gp, gs, dp, ds)
    yield ("w4a16_fused_mlp/silu", gm, [
        S((8, K), BF16), S((2 * I_ // BN, K // 2, BN), I8),
        S((K // G, 2 * I_), F32), S((K // BNd, I_ // 2, BNd), I8),
        S((I_ // G, K), F32)])

    # grouped MoE GEMM
    E, Km, Nm = 8, 2048, 1408
    def gg(xs, p, s, gsz):
        return w4a16_grouped_matmul(xs, p, s, gsz)
    yield ("w4a16_gmm/E8", gg, [
        S((512, Km), BF16), S((E, Nm // 128, Km // 2, 128), I8),
        S((E, Km // G, Nm), F32), S((E,), I32)])

    # ---- MLA ---------------------------------------------------------------------
    # production latent pools are LANE-TILE PADDED (ModelConfig.kv_pool_dim
    # rounds L+R up to 128; layers/mla.py zero-pads latents + queries) —
    # an unpadded 576-lane pool cannot even be DMA-sliced by Mosaic
    # ("Slice shape ... must be aligned to tiling (128)", r5 sweep)
    L, R, H = 512, 64, 128
    DKP = -(-(L + R) // 128) * 128
    def md(q, c, bt, lens):
        return mla_decode_pallas(q, c, bt, lens, scale=(L + R) ** -0.5,
                                 kv_lora_rank=L)
    yield ("mla_decode/B8", md, [
        S((8, H, DKP), BF16), S((NB, 1, BS, DKP), BF16),
        S((8, MB), I32), S((8,), I32)])
    def mp(q, c, bt, lens):
        return mla_prefill_pallas(q, c, bt, lens, jnp.int32(0),
                                  scale=(L + R) ** -0.5, kv_lora_rank=L)
    yield ("mla_prefill/T256", mp, [
        S((256, H, DKP), BF16), S((NB, 1, BS, DKP), BF16),
        S((MB,), I32), S((), I32)])

    # ---- DSA indexer -------------------------------------------------------------
    def ds(q, w, c, bt, lens):
        return dsa_scores_pallas(q, w, c, bt, lens)
    yield ("dsa_scores/B8", ds, [
        S((8, 64, 128), BF16), S((8, 64), F32), S((NB, 1, BS, 128), BF16),
        S((8, MB), I32), S((8,), I32)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="benchmarks/MOSAIC_SWEEP.json")
    args = ap.parse_args()

    enable_compilation_cache()
    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", flush=True)

    results = []
    for name, fn, specs in cases():
        if args.only and args.only not in name:
            continue
        t0 = time.time()
        try:
            jax.jit(fn).lower(*specs).compile()
            ok, err = True, None
        except Exception as e:  # noqa: BLE001 — record and continue
            ok = False
            err = "".join(traceback.format_exception_only(type(e), e))[-2000:]
        dt = time.time() - t0
        print(f"[{'PASS' if ok else 'FAIL'}] {name} ({dt:.1f}s)", flush=True)
        if err:
            print("       " + err.strip().replace("\n", "\n       "),
                  flush=True)
        results.append({"name": name, "ok": ok, "compile_s": round(dt, 1),
                        "error": err})
        with open(args.out, "w") as f:
            json.dump({"backend": backend, "results": results}, f, indent=2)
    n_fail = sum(not r["ok"] for r in results)
    print(f"{len(results) - n_fail}/{len(results)} variants compile",
          flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
