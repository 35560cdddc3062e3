"""Probe: where do the full-pool copies in the llama-3-8b e2e step come from?

The e2e OOM (`tpu_return_logs/e2e_r3_quick.log`) shows one pool-shaped
bf16[3481,8,16,128] copy per K/V pool per layer, layout {3,1,2,0} — someone
wants pools physically [NB, BS, Hkv, D].  Suspect: the `write_kv_cache`
scatter (update window dims = (Hkv, D) prefer minor).  This AOT-compiles
small variants chiplessly and prints HLO-temp bytes + largest allocations.

Usage: python benchmarks/probe_r3_layout.py
"""
import functools

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.ops.attention_xla import write_kv_cache
from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention

NB, HKV, BS, D = 512, 8, 16, 128     # ~16 MB pool: big enough to spot copies
B, HQ, MB = 8, 32, 16


def report(name, fn, *args, donate=()):
    try:
        lowered = jax.jit(fn, donate_argnums=donate).lower(*args)
        comp = lowered.compile()
        ma = comp.memory_analysis()
        print(f"[{name}] temp={ma.temp_size_in_bytes/1e6:.1f}MB "
              f"args={ma.argument_size_in_bytes/1e6:.1f}MB "
              f"out={ma.output_size_in_bytes/1e6:.1f}MB "
              f"alias={ma.alias_size_in_bytes/1e6:.1f}MB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] ERR {type(e).__name__}: {str(e)[:500]}", flush=True)


def mk():
    kc = jnp.zeros((NB, HKV, BS, D), jnp.bfloat16)
    vc = jnp.zeros((NB, HKV, BS, D), jnp.bfloat16)
    q = jnp.zeros((B, HQ, D), jnp.bfloat16)
    kn = jnp.zeros((B, HKV, D), jnp.bfloat16)
    vn = jnp.zeros((B, HKV, D), jnp.bfloat16)
    slots = jnp.arange(B, dtype=jnp.int32) * BS
    bt = jnp.zeros((B, MB), jnp.int32)
    lens = jnp.full((B,), 64, jnp.int32)
    return kc, vc, q, kn, vn, slots, bt, lens


def scatter_only(kc, vc, kn, vn, slots):
    return write_kv_cache(kc, vc, kn, vn, slots)


def scatter_then_kernel(kc, vc, q, kn, vn, slots, bt, lens):
    kc, vc = write_kv_cache(kc, vc, kn, vn, slots)
    o = paged_decode_attention(q, kc, vc, block_tables=bt, kv_lens=lens,
                               scale=0.1)
    return o, kc, vc


def kernel_only(kc, vc, q, bt, lens):
    o = paged_decode_attention(q, kc, vc, block_tables=bt, kv_lens=lens,
                               scale=0.1)
    return o, kc, vc


if __name__ == "__main__":
    kc, vc, q, kn, vn, slots, bt, lens = mk()
    print("pool MB:", kc.nbytes / 1e6, flush=True)
    report("scatter_only_donated", scatter_only, kc, vc, kn, vn, slots,
           donate=(0, 1))
    report("kernel_only_donated", kernel_only, kc, vc, q, bt, lens,
           donate=(0, 1))
    report("scatter_then_kernel_donated", scatter_then_kernel,
           kc, vc, q, kn, vn, slots, bt, lens, donate=(0, 1))


def with_shardmap():
    from jax.sharding import Mesh, PartitionSpec as P
    import numpy as np
    mesh = Mesh(np.array(jax.devices()[:1]), ("tp",))
    f = jax.shard_map(
        scatter_then_kernel, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False)
    return f


if __name__ == "__main__" and True:
    kc, vc, q, kn, vn, slots, bt, lens = mk()
    report("shardmap_scatter_kernel_donated", with_shardmap(),
           kc, vc, q, kn, vn, slots, bt, lens, donate=(0, 1))
