"""Pallas paged decode attention vs the XLA gather reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.ops.attention_xla import paged_decode_xla, write_kv_cache
from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention


def make_cache(key, NB, Hkv, BS, D, dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(key)
    k = jax.random.normal(k1, (NB, Hkv, BS, D), dtype)
    v = jax.random.normal(k2, (NB, Hkv, BS, D), dtype)
    return k, v


@pytest.mark.parametrize("B,Hq,Hkv,D,BS,MB", [
    (2, 8, 2, 64, 16, 8),
    (4, 4, 4, 128, 16, 4),
    (1, 8, 1, 128, 8, 16),
])
def test_paged_decode_matches_xla(B, Hq, Hkv, D, BS, MB):
    key = jax.random.PRNGKey(0)
    NB = B * MB + 1
    k_cache, v_cache = make_cache(key, NB, Hkv, BS, D)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Hq, D), jnp.bfloat16)
    # each sequence gets its own pages, variable kv lens
    rng = np.random.RandomState(0)
    tables = np.zeros((B, MB), np.int32)
    used = list(range(1, NB))
    rng.shuffle(used)
    for b in range(B):
        tables[b] = used[b * MB:(b + 1) * MB]
    kv_lens = np.array([rng.randint(1, MB * BS + 1) for _ in range(B)],
                       np.int32)
    tables = jnp.asarray(tables)
    kv_lens_j = jnp.asarray(kv_lens)

    ref = paged_decode_xla(q, k_cache, v_cache, tables, kv_lens_j, scale=0.125)
    out = paged_decode_attention(q, k_cache, v_cache, tables, kv_lens_j,
                                 scale=0.125, tile_size=2 * BS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_paged_decode_sliding_window():
    key = jax.random.PRNGKey(2)
    B, Hq, Hkv, D, BS, MB = 2, 4, 2, 64, 8, 8
    NB = B * MB + 1
    k_cache, v_cache = make_cache(key, NB, Hkv, BS, D)
    q = jax.random.normal(jax.random.PRNGKey(3), (B, Hq, D), jnp.bfloat16)
    tables = jnp.asarray(
        np.arange(1, NB).reshape(B, MB).astype(np.int32))
    kv_lens = jnp.asarray(np.array([40, 64], np.int32))
    ref = paged_decode_xla(q, k_cache, v_cache, tables, kv_lens, scale=0.125,
                           sliding_window=16)
    out = paged_decode_attention(q, k_cache, v_cache, tables, kv_lens,
                                 scale=0.125, sliding_window=16,
                                 tile_size=2 * BS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("B,H,L,R,BS,MB", [
    (3, 16, 128, 64, 8, 8),
    (1, 8, 256, 64, 16, 4),
])
def test_mla_decode_pallas_matches_xla(B, H, L, R, BS, MB):
    from tensorrt_llm_tpu.ops.mla import mla_decode_xla
    from tensorrt_llm_tpu.ops.mla_pallas import mla_decode_pallas

    rng = np.random.RandomState(0)
    # pool rows are lane-tile padded (ModelConfig.kv_pool_dim); the pad
    # channels are zero in q so they cancel out of the scores
    DK = -(-(L + R) // 128) * 128
    NB = B * MB + 1
    q = jnp.asarray(rng.standard_normal((B, H, L + R)), jnp.bfloat16)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, DK - L - R)))
    cache = jnp.asarray(rng.standard_normal((NB, 1, BS, DK)), jnp.bfloat16)
    tables = jnp.asarray(
        rng.permutation(NB - 1)[:B * MB].reshape(B, MB) + 1).astype(jnp.int32)
    kv_lens = jnp.asarray(
        [rng.randint(1, MB * BS + 1) for _ in range(B)], dtype=jnp.int32)
    scale = (L + R) ** -0.5
    ref = mla_decode_xla(q, cache, tables, kv_lens, scale, L)
    out = mla_decode_pallas(q, cache, tables, kv_lens, scale, L,
                            tile_size=2 * BS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("T,S", [(16, 48), (24, 24)])
def test_mla_prefill_pallas_matches_xla(T, S):
    from tensorrt_llm_tpu.ops.mla import mla_prefill_xla
    from tensorrt_llm_tpu.ops.mla_pallas import mla_prefill_pallas

    rng = np.random.RandomState(1)
    H, L, R, DK, BS, MB = 8, 128, 64, 256, 8, 8
    NB = MB + 1
    q = jnp.asarray(rng.standard_normal((T, H, DK)), jnp.bfloat16)
    q = q.at[:, :, L + R:].set(0)          # lane-tile pad channels
    cache = jnp.asarray(rng.standard_normal((NB, 1, BS, DK)), jnp.bfloat16)
    bt = jnp.asarray(np.arange(1, NB), jnp.int32)
    kv_len = jnp.asarray(S, jnp.int32)
    q_off = jnp.asarray(S - T, jnp.int32)
    scale = (L + R) ** -0.5
    ref = mla_prefill_xla(q, cache, bt, kv_len, q_off, scale, L)
    out = mla_prefill_pallas(q, cache, bt, kv_len, q_off, scale, L,
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_paged_decode_sinks():
    """GPT-OSS attention sinks in the Pallas decode kernel: the learned
    per-head logit joins the softmax denominator once."""
    from tensorrt_llm_tpu.ops.attention_xla import paged_decode_xla

    key = jax.random.PRNGKey(5)
    B, Hq, Hkv, D, BS, MB = 2, 4, 2, 128, 8, 8
    NB = B * MB + 1
    k_cache, v_cache = make_cache(key, NB, Hkv, BS, D)
    q = jax.random.normal(jax.random.PRNGKey(6), (B, Hq, D), jnp.bfloat16)
    sinks = jax.random.normal(jax.random.PRNGKey(7), (Hq,), jnp.float32)
    tables = jnp.asarray(np.arange(1, NB).reshape(B, MB).astype(np.int32))
    kv_lens = jnp.asarray(np.array([23, 64], np.int32))
    ref = paged_decode_xla(q, k_cache, v_cache, tables, kv_lens,
                           scale=0.1, sinks=sinks)
    out = paged_decode_attention(q, k_cache, v_cache, tables, kv_lens,
                                 scale=0.1, sinks=sinks,
                                 tile_size=2 * BS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("D", [64, 32])
def test_paged_decode_packed_subtile_head_dim(D):
    """Sub-128 head dims run the lane-packed kernel (r tokens per lane
    row, r shifted dots) — parity vs the XLA gather path."""
    from tensorrt_llm_tpu.ops.attention_xla import paged_decode_xla

    rng = np.random.RandomState(3)
    B, Hq, Hkv, BS, MB = 2, 8, 2, 8, 8
    NB = B * MB + 1
    key = jax.random.PRNGKey(4)
    k_cache, v_cache = make_cache(key, NB, Hkv, BS, D)
    q = jax.random.normal(jax.random.PRNGKey(5), (B, Hq, D), jnp.bfloat16)
    sinks = jax.random.normal(jax.random.PRNGKey(8), (Hq,), jnp.float32)
    tables = jnp.asarray(np.arange(1, NB).reshape(B, MB).astype(np.int32))
    kv_lens = jnp.asarray(np.array([13, 64], np.int32))
    for sk in (None, sinks):
        ref = paged_decode_xla(q, k_cache, v_cache, tables, kv_lens,
                               scale=0.1, sliding_window=24, sinks=sk)
        out = paged_decode_attention(q, k_cache, v_cache, tables, kv_lens,
                                     scale=0.1, sliding_window=24,
                                     sinks=sk, tile_size=2 * BS,
                                     interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("B,Hq,Hkv,D,BS,MB,sinks,win", [
    (2, 8, 2, 128, 16, 8, False, None),
    (4, 4, 4, 128, 16, 4, False, None),
    (2, 8, 4, 128, 8, 8, True, None),
    (2, 4, 2, 128, 16, 8, False, 48),
    (1, 8, 2, 256, 16, 8, False, None),
])
def test_paged_decode_int8_matches_xla(B, Hq, Hkv, D, BS, MB, sinks, win):
    """INT8-KV Pallas decode kernel (scales folded into logits/probs) vs the
    XLA dequant-at-gather path on identical int8 pools."""
    NB = B * MB + 1
    kd = jnp.zeros((NB, Hkv, BS, D), jnp.int8)
    ks = jnp.ones((NB, Hkv, BS), jnp.float32)
    vd = jnp.zeros((NB, Hkv, BS, D), jnp.int8)
    vs = jnp.ones((NB, Hkv, BS), jnp.float32)
    k_cache, v_cache = (kd, ks), (vd, vs)
    rng = np.random.RandomState(0)
    tables = np.zeros((B, MB), np.int32)
    used = list(range(1, NB))
    rng.shuffle(used)
    for b in range(B):
        tables[b] = used[b * MB:(b + 1) * MB]
    kv_lens = np.array([rng.randint(1, MB * BS + 1) for _ in range(B)],
                       np.int32)
    # fill via the real append path so data/scales are per-token quantized
    for b in range(B):
        T = int(kv_lens[b])
        k_new = jax.random.normal(jax.random.PRNGKey(10 + b), (T, Hkv, D),
                                  jnp.bfloat16) * (1 + b)
        v_new = jax.random.normal(jax.random.PRNGKey(20 + b), (T, Hkv, D),
                                  jnp.bfloat16)
        slots = jnp.asarray(
            [tables[b][t // BS] * BS + t % BS for t in range(T)], jnp.int32)
        k_cache, v_cache = write_kv_cache(k_cache, v_cache, k_new, v_new,
                                          slots)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Hq, D), jnp.bfloat16)
    tables = jnp.asarray(tables)
    kv_lens_j = jnp.asarray(kv_lens)
    sk = (jax.random.normal(jax.random.PRNGKey(7), (Hq,), jnp.float32)
          if sinks else None)

    ref = paged_decode_xla(q, k_cache, v_cache, tables, kv_lens_j,
                           scale=0.125, sliding_window=win, sinks=sk)
    out = paged_decode_attention(q, k_cache, v_cache, tables, kv_lens_j,
                                 scale=0.125, sliding_window=win,
                                 tile_size=2 * BS, interpret=True, sinks=sk)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_paged_decode_awkward_table_width_pads_tiles():
    """129-block tables (2064-token max_seq_len) have no 128-aligned
    dividing tile; the kernel must pad the tile space with reserved-
    block-0 entries (r5: the int8 scale BlockSpec shrank to 48 lanes
    and Mosaic rejected it at serving time)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tensorrt_llm_tpu.ops.attention_xla import (paged_decode_xla,
                                                    write_kv_cache)
    from tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention

    B, Hq, Hkv, D, BS, MB = 2, 8, 2, 128, 16, 9
    NB = B * MB + 1
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    total = 120
    k_cache = jnp.zeros((NB, Hkv, BS, D), jnp.bfloat16)
    v_cache = jnp.zeros((NB, Hkv, BS, D), jnp.bfloat16)
    bt = np.zeros((B, MB), np.int32)
    lens = np.array([total, total - 17], np.int32)
    for b in range(B):
        bt[b] = 1 + b * MB + np.arange(MB)
        toks = int(lens[b])
        k_all = jax.random.normal(keys[0], (toks, Hkv, D), jnp.bfloat16)
        v_all = jax.random.normal(keys[1], (toks, Hkv, D), jnp.bfloat16)
        slots = (bt[b][np.arange(toks) // BS] * BS
                 + np.arange(toks) % BS).astype(np.int32)
        k_cache, v_cache = write_kv_cache(k_cache, v_cache, k_all, v_all,
                                          jnp.asarray(slots))
    q = jax.random.normal(keys[2], (B, Hq, D), jnp.bfloat16)
    ref = paged_decode_xla(q, k_cache, v_cache, jnp.asarray(bt),
                           jnp.asarray(lens), scale=D ** -0.5)
    out = paged_decode_attention(q, k_cache, v_cache, jnp.asarray(bt),
                                 jnp.asarray(lens), scale=D ** -0.5,
                                 tile_size=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)
