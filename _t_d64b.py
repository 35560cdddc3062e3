import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_traceback_filtering", "off")
from tensorrt_llm_tpu.ops.attention_xla import paged_decode_xla
from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention

rng = np.random.default_rng(0)
D = 64
B, Hq, Hkv, BS, MB = 4, 8, 4, 16, 16
NB = B * MB + 1
k_cache = jnp.asarray(rng.standard_normal((NB, Hkv, BS, D)), jnp.bfloat16)
v_cache = jnp.asarray(rng.standard_normal((NB, Hkv, BS, D)), jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
bt = jnp.asarray(rng.permutation(NB - 1)[:B*MB].reshape(B, MB) + 1, jnp.int32)
kv_lens = jnp.asarray(rng.integers(10, MB*BS, size=B), jnp.int32)
try:
    out = paged_decode_attention(q, k_cache, v_cache, bt, kv_lens, scale=0.1)
    ref = jax.jit(paged_decode_xla, static_argnames=("scale",))(q, k_cache, v_cache, bt, kv_lens, scale=0.1)
    err = np.abs(np.asarray(ref, np.float32) - np.asarray(out, np.float32)).max()
    print("decode D=64 err", err, flush=True)
except Exception as e:
    import traceback; traceback.print_exc()
