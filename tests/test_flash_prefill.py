"""Pallas flash prefill vs the XLA gather reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.ops.attention_xla import paged_prefill_xla, write_kv_cache
from tensorrt_llm_tpu.ops.flash_prefill import flash_prefill_attention


def build_seq(key, T_prefix, T_chunk, Hq, Hkv, D, BS, MB):
    """Fill a paged cache with a prefix + chunk, return q for the chunk."""
    NB = MB + 1
    keys = jax.random.split(key, 4)
    k_cache = jnp.zeros((NB, Hkv, BS, D), jnp.bfloat16)
    v_cache = jnp.zeros((NB, Hkv, BS, D), jnp.bfloat16)
    total = T_prefix + T_chunk
    k_all = jax.random.normal(keys[0], (total, Hkv, D), jnp.bfloat16)
    v_all = jax.random.normal(keys[1], (total, Hkv, D), jnp.bfloat16)
    block_table = jnp.arange(1, NB, dtype=jnp.int32)
    slots = block_table[jnp.arange(total) // BS] * BS + jnp.arange(total) % BS
    k_cache, v_cache = write_kv_cache(k_cache, v_cache, k_all, v_all, slots)
    q = jax.random.normal(keys[2], (T_chunk, Hq, D), jnp.bfloat16)
    return q, k_cache, v_cache, block_table


@pytest.mark.parametrize("T_prefix,T_chunk,Hq,Hkv,D,BS,MB", [
    (0, 32, 8, 2, 64, 16, 4),      # plain prefill, GQA
    (24, 16, 4, 4, 128, 8, 8),     # chunked continuation, MHA
    (16, 48, 8, 1, 64, 16, 8),     # MQA
])
def test_flash_prefill_matches_xla(T_prefix, T_chunk, Hq, Hkv, D, BS, MB):
    q, k_cache, v_cache, bt = build_seq(
        jax.random.PRNGKey(0), T_prefix, T_chunk, Hq, Hkv, D, BS, MB)
    kv_len = jnp.int32(T_prefix + T_chunk)
    q_off = jnp.int32(T_prefix)
    ref = paged_prefill_xla(q, k_cache, v_cache, bt, kv_len, q_off,
                            scale=D ** -0.5)
    out = flash_prefill_attention(q, k_cache, v_cache, bt, kv_len, q_off,
                                  scale=D ** -0.5, tile_size=2 * BS,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_flash_prefill_sliding_window():
    q, k_cache, v_cache, bt = build_seq(
        jax.random.PRNGKey(1), 32, 32, 4, 2, 64, 16, 4)
    kv_len, q_off = jnp.int32(64), jnp.int32(32)
    ref = paged_prefill_xla(q, k_cache, v_cache, bt, kv_len, q_off,
                            scale=0.125, sliding_window=24)
    out = flash_prefill_attention(q, k_cache, v_cache, bt, kv_len, q_off,
                                  scale=0.125, sliding_window=24,
                                  tile_size=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("D,win", [(64, None), (128, None), (64, 24)])
def test_flash_prefill_sinks(D, win):
    """In-kernel attention sinks (GPT-OSS): denominator-only logit vs XLA."""
    from tensorrt_llm_tpu.ops.attention_xla import mha_xla, gather_dequant
    Hq, Hkv, BS, MB = 8, 2, 16, 4
    T = 32
    q, k_cache, v_cache, bt = build_seq(
        jax.random.PRNGKey(3), 0, T, Hq, Hkv, D, BS, MB)
    kv_len = jnp.int32(T)
    sinks = jax.random.normal(jax.random.PRNGKey(9), (Hq,), jnp.float32)
    flat = gather_dequant(k_cache, bt).transpose(0, 2, 1, 3).reshape(-1, Hkv, D)[:T]
    flatv = gather_dequant(v_cache, bt).transpose(0, 2, 1, 3).reshape(-1, Hkv, D)[:T]
    ref = mha_xla(q, flat, flatv, scale=D ** -0.5, causal=True,
                  sliding_window=win, sinks=sinks)
    out = flash_prefill_attention(q, k_cache, v_cache, bt, kv_len,
                                  jnp.int32(0), scale=D ** -0.5,
                                  sliding_window=win, tile_size=2 * BS,
                                  interpret=True, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("T_prefix,T_chunk,win,sinks", [
    (0, 32, None, False),
    (24, 16, None, False),
    (0, 32, 24, True),
])
def test_flash_prefill_int8(T_prefix, T_chunk, win, sinks):
    """INT8-KV flash prefill (scales folded into logits/probs) vs the XLA
    dequant-at-gather path over identical per-token-quantized pools."""
    Hq, Hkv, D, BS, MB = 8, 2, 128, 16, 4
    NB = MB + 1
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    kc = ((jnp.zeros((NB, Hkv, BS, D), jnp.int8),
           jnp.ones((NB, Hkv, BS), jnp.float32)))
    vc = ((jnp.zeros((NB, Hkv, BS, D), jnp.int8),
           jnp.ones((NB, Hkv, BS), jnp.float32)))
    total = T_prefix + T_chunk
    k_all = jax.random.normal(keys[0], (total, Hkv, D), jnp.bfloat16)
    v_all = jax.random.normal(keys[1], (total, Hkv, D), jnp.bfloat16)
    bt = jnp.arange(1, NB, dtype=jnp.int32)
    slots = bt[jnp.arange(total) // BS] * BS + jnp.arange(total) % BS
    kc, vc = write_kv_cache(kc, vc, k_all, v_all, slots)
    q = jax.random.normal(keys[2], (T_chunk, Hq, D), jnp.bfloat16)
    kv_len = jnp.int32(total)
    q_off = jnp.int32(T_prefix)
    sk = (jax.random.normal(keys[3], (Hq,), jnp.float32) if sinks else None)

    ref = paged_prefill_xla(q, kc, vc, bt, kv_len, q_off, scale=D ** -0.5,
                            sliding_window=win, sinks=sk)
    out = flash_prefill_attention(q, kc, vc, bt, kv_len, q_off,
                                  scale=D ** -0.5, sliding_window=win,
                                  tile_size=2 * BS, interpret=True,
                                  sinks=sk)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_flash_prefill_awkward_table_width_pads_tiles():
    """MB with no 128-lane-aligned dividing tile (e.g. 129 blocks for a
    2064-token max_seq_len) must pad the tile space with reserved-block-0
    entries instead of shrinking TS to an unaligned width — Mosaic
    rejects <128-lane scale blocks and the r5 int8kv bench died on it.
    Exactness vs the XLA reference proves the padded tail is masked."""
    Hq, Hkv, D, BS, MB = 8, 2, 128, 16, 9   # 9*16=144: tiles pad to 256
    T_prefix, T_chunk = 96, 32
    q, k_cache, v_cache, bt = build_seq(
        jax.random.PRNGKey(3), T_prefix, T_chunk, Hq, Hkv, D, BS, MB)
    kv_len = jnp.int32(T_prefix + T_chunk)
    q_off = jnp.int32(T_prefix)
    ref = paged_prefill_xla(q, k_cache, v_cache, bt, kv_len, q_off,
                            scale=D ** -0.5)
    out = flash_prefill_attention(q, k_cache, v_cache, bt, kv_len, q_off,
                                  scale=D ** -0.5, tile_size=256,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)

    # int8 pools through the same awkward width
    from tensorrt_llm_tpu.ops.attention_xla import quantize_kv_token
    kq, ksc = quantize_kv_token(
        jnp.transpose(k_cache, (0, 2, 1, 3)).reshape(-1, Hkv, D))
    vq, vsc = quantize_kv_token(
        jnp.transpose(v_cache, (0, 2, 1, 3)).reshape(-1, Hkv, D))
    NB = MB + 1
    k8 = (jnp.transpose(kq.reshape(NB, BS, Hkv, D), (0, 2, 1, 3)),
          jnp.transpose(ksc.reshape(NB, BS, Hkv), (0, 2, 1)))
    v8 = (jnp.transpose(vq.reshape(NB, BS, Hkv, D), (0, 2, 1, 3)),
          jnp.transpose(vsc.reshape(NB, BS, Hkv), (0, 2, 1)))
    out8 = flash_prefill_attention(q, k8, v8, bt, kv_len, q_off,
                                   scale=D ** -0.5, tile_size=256,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out8, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=8e-2, atol=8e-2)
