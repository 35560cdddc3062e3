import jax, jax.numpy as jnp, numpy as np
from tensorrt_llm_tpu.ops.attention_xla import paged_decode_xla
from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
from tensorrt_llm_tpu.ops.flash_prefill import flash_prefill_attention
from tensorrt_llm_tpu.ops.attention_xla import paged_prefill_xla

rng = np.random.default_rng(0)
for D in (64,):
    B, Hq, Hkv, BS, MB = 4, 8, 4, 16, 16
    NB = B * MB + 1
    k_cache = jnp.asarray(rng.standard_normal((NB, Hkv, BS, D)), jnp.bfloat16)
    v_cache = jnp.asarray(rng.standard_normal((NB, Hkv, BS, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(NB - 1)[:B*MB].reshape(B, MB) + 1, jnp.int32)
    kv_lens = jnp.asarray(rng.integers(10, MB*BS, size=B), jnp.int32)
    try:
        ref = jax.jit(paged_decode_xla, static_argnames=("scale",))(q, k_cache, v_cache, bt, kv_lens, scale=0.1)
        out = paged_decode_attention(q, k_cache, v_cache, bt, kv_lens, scale=0.1)
        err = np.abs(np.asarray(ref, np.float32) - np.asarray(out, np.float32)).max()
        print(f"decode D={D}: err {err}", flush=True)
    except Exception as e:
        print(f"decode D={D}: FAIL {str(e)[:160]}", flush=True)
    try:
        T = 32
        qq = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.bfloat16)
        ref = jax.jit(paged_prefill_xla, static_argnames=("scale",))(
            qq, k_cache, v_cache, bt[0], kv_lens[0], jnp.int32(0), scale=0.1)
        out = flash_prefill_attention(qq, k_cache, v_cache, bt[0], kv_lens[0], jnp.int32(0), scale=0.1)
        err = np.abs(np.asarray(ref, np.float32)[:int(kv_lens[0])] - np.asarray(out, np.float32)[:int(kv_lens[0])]).max()
        print(f"prefill D={D}: err {err}", flush=True)
    except Exception as e:
        print(f"prefill D={D}: FAIL {str(e)[:160]}", flush=True)
