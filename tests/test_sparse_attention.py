"""Sparse (RocketKV-style block-top-k) attention backend
(reference _torch/attention_backend/sparse/rocket.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_llm_tpu.ops.attention_xla import (
    paged_decode_xla, select_blocks, sparse_paged_decode_xla,
    update_kt_cache, write_kv_cache)

BS, HKV, HQ, D = 8, 2, 4, 32


def _fill_cache(rng, n_blocks, kv_len):
    """Paged K/V pools with kv_len real tokens in blocks [0..)."""
    k_cache = jnp.zeros((n_blocks, HKV, BS, D), jnp.float32)
    v_cache = jnp.zeros((n_blocks, HKV, BS, D), jnp.float32)
    kt = jnp.zeros((n_blocks, HKV, D), jnp.float32)
    k_new = jnp.asarray(rng.randn(kv_len, HKV, D), jnp.float32)
    v_new = jnp.asarray(rng.randn(kv_len, HKV, D), jnp.float32)
    slots = jnp.arange(kv_len, dtype=jnp.int32)  # blocks 0..; identity table
    k_cache, v_cache = write_kv_cache(k_cache, v_cache, k_new, v_new, slots)
    kt = update_kt_cache(kt, k_cache, slots)
    return k_cache, v_cache, kt


def test_kt_summary_is_block_mean():
    rng = np.random.RandomState(0)
    k_cache, _, kt = _fill_cache(rng, n_blocks=4, kv_len=3 * BS)
    np.testing.assert_allclose(np.asarray(kt[:3]),
                               np.asarray(k_cache[:3]).mean(axis=2),
                               rtol=1e-6)


def test_sparse_equals_dense_when_topk_covers_all():
    """With topk >= n_valid blocks the sparse decode must match the dense
    paged decode bit-for-bit in float32."""
    rng = np.random.RandomState(1)
    n_blocks, kv_len = 6, 5 * BS - 3
    k_cache, v_cache, kt = _fill_cache(rng, n_blocks, kv_len)
    q = jnp.asarray(rng.randn(1, HQ, D), jnp.float32)
    tables = jnp.arange(n_blocks, dtype=jnp.int32)[None, :]
    kv_lens = jnp.array([kv_len], jnp.int32)
    scale = D ** -0.5
    dense = paged_decode_xla(q, k_cache, v_cache, tables, kv_lens, scale)
    sel = select_blocks(q, kt, tables, kv_lens, BS, topk=n_blocks)
    sparse = sparse_paged_decode_xla(q, k_cache, v_cache, tables, sel,
                                     kv_lens, scale)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse),
                               rtol=1e-5, atol=1e-5)


def test_select_blocks_keeps_sink_and_recent():
    rng = np.random.RandomState(2)
    n_blocks, kv_len = 16, 16 * BS
    _, _, kt = _fill_cache(rng, n_blocks, kv_len)
    q = jnp.asarray(rng.randn(1, HQ, D), jnp.float32)
    tables = jnp.arange(n_blocks, dtype=jnp.int32)[None, :]
    sel = np.asarray(select_blocks(q, kt, tables,
                                   jnp.array([kv_len], jnp.int32), BS,
                                   topk=6, sink_blocks=1, recent_blocks=2))
    assert 0 in sel[0], "sink block dropped"
    assert 15 in sel[0] and 14 in sel[0], "recent blocks dropped"
    assert len(set(sel[0].tolist())) == 6


def test_sparse_high_recall_on_needle():
    """A 'needle' block whose keys align with the query must be selected
    and dominate the output like it does under dense attention."""
    rng = np.random.RandomState(3)
    n_blocks, kv_len = 32, 32 * BS
    k_cache, v_cache, kt = _fill_cache(rng, n_blocks, kv_len)
    q = jnp.asarray(rng.randn(1, HQ, D), jnp.float32)
    # plant the needle: block 13's keys point strongly along q so its
    # softmax weight dwarfs every unselected block's
    qk = np.asarray(q).reshape(HKV, HQ // HKV, D).mean(axis=1)  # [HKV, D]
    needle = np.array(k_cache)
    needle[13] = np.tile(qk[:, None, :] * 10.0, (1, BS, 1))
    k_cache = jnp.asarray(needle)
    kt = update_kt_cache(kt, k_cache,
                         jnp.arange(13 * BS, 14 * BS, dtype=jnp.int32))
    tables = jnp.arange(n_blocks, dtype=jnp.int32)[None, :]
    kv_lens = jnp.array([kv_len], jnp.int32)
    scale = D ** -0.5
    sel = select_blocks(q, kt, tables, kv_lens, BS, topk=8)
    assert 13 in np.asarray(sel)[0], "needle block not selected"
    dense = paged_decode_xla(q, k_cache, v_cache, tables, kv_lens, scale)
    sparse = sparse_paged_decode_xla(q, k_cache, v_cache, tables, sel,
                                     kv_lens, scale)
    # the needle dominates the softmax, so 8/32 blocks reproduce dense
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse),
                               rtol=0.05, atol=0.05)


def test_e2e_sparse_backend_matches_dense_greedy():
    """LLM(attention_backend="sparse") with topk covering every block must
    reproduce the dense engine's greedy tokens exactly."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                max_position=256)
    sp = tllm.SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    prompt = [(11 * i + 5) % 256 for i in range(20)]

    dense = tllm.LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
                     max_seq_len=128, max_batch_size=4, kv_num_blocks=64,
                     kv_block_size=8, seed=0)
    ref = dense.generate([prompt], sp)[0].outputs[0].token_ids
    dense.shutdown()

    sparse = tllm.LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
                      max_seq_len=128, max_batch_size=4, kv_num_blocks=64,
                      kv_block_size=8, seed=0, attention_backend="sparse",
                      sparse_attention_topk_blocks=64)
    out = sparse.generate([prompt], sp)[0].outputs[0].token_ids
    st = sparse.executor.kv.stats()
    sparse.shutdown()
    assert out == ref, (out, ref)
    assert st is not None


def test_e2e_sparse_restricted_topk_decodes():
    """Aggressively small topk still decodes coherently (no crash, right
    lengths) — numerics differ from dense by design."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                max_position=256)
    llm = tllm.LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
                   max_seq_len=256, max_batch_size=2, kv_num_blocks=64,
                   kv_block_size=8, attention_backend="sparse",
                   sparse_attention_topk_blocks=4)
    sp = tllm.SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    out = llm.generate([[(3 * i + 1) % 256 for i in range(100)]], sp)
    assert len(out[0].outputs[0].token_ids) == 6
    llm.shutdown()


# ---------------- DSA lightning indexer (DeepSeek V3.2) ----------------

def test_dsa_hadamard_oracle():
    """rotate_activation == scaled Sylvester-Hadamard transform (reference
    dsa.py:68-83 fast-hadamard-transform with scale D**-0.5)."""
    from scipy.linalg import hadamard
    from tensorrt_llm_tpu.ops.dsa import rotate_activation

    x = np.random.RandomState(0).randn(5, 64).astype(np.float32)
    got = np.asarray(rotate_activation(jnp.asarray(x)), np.float32)
    want = x.astype(np.float32) @ (hadamard(64) / np.sqrt(64))
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.02)  # bf16
    # involution check: rotating twice recovers the input
    back = np.asarray(rotate_activation(
        rotate_activation(jnp.asarray(x))), np.float32)
    np.testing.assert_allclose(back, x, atol=0.3, rtol=0.05)


def test_dsa_sparse_decode_equals_dense_when_covering():
    """When index_topk >= table capacity the selected set holds every
    valid token, so sparse MLA decode == dense MLA decode."""
    from tensorrt_llm_tpu.ops.dsa import (
        dsa_decode_select, mla_sparse_decode_xla)
    from tensorrt_llm_tpu.ops.mla import mla_decode_xla

    rng = np.random.RandomState(0)
    B, H, L, R, BS, NB, T = 2, 3, 16, 8, 4, 8, 3   # T pages per seq
    Dk = L + R
    cache = jnp.asarray(rng.randn(NB, 1, BS, Dk).astype(np.float32))
    tables = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    kv_lens = jnp.asarray(np.array([9, 5], np.int32))
    q = jnp.asarray(rng.randn(B, H, Dk).astype(np.float32))

    idx_cache = jnp.asarray(rng.randn(NB, 1, BS, 32).astype(np.float32))
    q_idx = jnp.asarray(rng.randn(B, 4, 32).astype(np.float32))
    w = jnp.asarray(rng.rand(B, 4).astype(np.float32))

    sel = dsa_decode_select(q_idx, w, idx_cache, tables, kv_lens,
                            index_topk=64)   # covers T*BS=12
    got = mla_sparse_decode_xla(q, cache, tables, kv_lens, sel, 0.25, L)
    want = mla_decode_xla(q, cache, tables, kv_lens, 0.25, L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_dsa_select_restricts_and_relu_gates():
    """Top-k selection keeps the highest-scoring tokens; negatively
    correlated keys contribute nothing through the ReLU."""
    from tensorrt_llm_tpu.ops.dsa import dsa_decode_select

    B, Hi, Di, BS, NB = 1, 2, 16, 4, 4
    idx_cache = np.zeros((NB, 1, BS, Di), np.float32)
    # plant strong keys at tokens 1, 6, 9 (aligned with q direction) and
    # an anti-aligned key at token 3 (relu-gated to zero)
    unit = np.zeros(Di, np.float32); unit[0] = 1.0
    for tok, sgn in ((1, 1.0), (6, 1.0), (9, 1.0), (3, -5.0)):
        idx_cache[tok // BS, 0, tok % BS] = sgn * unit
    tables = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    kv_lens = jnp.asarray(np.array([11], np.int32))
    q_idx = jnp.asarray(np.stack([np.stack([unit, unit])]))   # [1, 2, 16]
    w = jnp.ones((1, 2), jnp.float32)

    sel = np.asarray(dsa_decode_select(q_idx, w, jnp.asarray(idx_cache),
                                       tables, kv_lens, index_topk=3))[0]
    assert set(sel.tolist()) == {1, 6, 9}, sel
    # anti-aligned key scores 0 (relu), ties with the zero keys — never
    # ranked above the three aligned tokens
    assert 3 not in sel.tolist()


def test_dsa_e2e_matches_dense_and_restricts():
    """Tiny DeepSeek-shaped model with the DSA indexer: greedy decode
    matches the dense model while contexts fit in index_topk, and long
    contexts run through the restricted path deterministically."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    def make(sparse):
        return ModelConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=4,
            max_position=256, architecture="DeepseekV3ForCausalLM",
            q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16,
            sparse_attention=sparse)

    sp = tllm.SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    prompt = [3, 14, 15, 9, 2, 6]

    dsa_cfg = {"algo": "dsa", "index_n_heads": 4, "index_head_dim": 32,
               "index_topk": 64}
    llm = tllm.LLM(model=make(dsa_cfg), skip_tokenizer_init=True,
                   max_seq_len=64, max_batch_size=2, kv_num_blocks=32,
                   kv_block_size=8, seed=0)
    try:
        got = llm.generate([prompt], sp)[0].outputs[0].token_ids
        got2 = llm.generate([prompt], sp)[0].outputs[0].token_ids
        assert got == got2 and len(got) == 6
    finally:
        llm.shutdown()

    dense = tllm.LLM(model=make(None), skip_tokenizer_init=True,
                     max_seq_len=64, max_batch_size=2, kv_num_blocks=32,
                     kv_block_size=8, seed=0)
    try:
        want = dense.generate([prompt], sp)[0].outputs[0].token_ids
    finally:
        dense.shutdown()
    # covering top-k (64 >= any ctx here) => same greedy continuation
    assert got == want, (got, want)

    # restricted: topk smaller than the context still decodes sanely
    tight = {"algo": "dsa", "index_n_heads": 4, "index_head_dim": 32,
             "index_topk": 8}
    llm2 = tllm.LLM(model=make(tight), skip_tokenizer_init=True,
                    max_seq_len=64, max_batch_size=2, kv_num_blocks=32,
                    kv_block_size=8, seed=0)
    try:
        long_prompt = list(np.random.RandomState(0).randint(
            2, 100, size=30))
        a = llm2.generate([long_prompt], sp)[0].outputs[0].token_ids
        b = llm2.generate([long_prompt], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 6
    finally:
        llm2.shutdown()


def test_dsa_scores_pallas_matches_xla():
    """Interpret-mode paged scoring kernel vs the XLA gather path, and
    identical selection at covering top-k."""
    from tensorrt_llm_tpu.ops.dsa import (
        dsa_decode_select, dsa_scores_pallas)

    rng = np.random.RandomState(3)
    B, Hi, Di, BS, NB, MB = 2, 4, 32, 8, 12, 4
    idx_cache = jnp.asarray(
        rng.randn(NB, 1, BS, Di).astype(np.float32) * 0.3)
    tables = jnp.asarray(rng.permutation(NB)[:B * MB]
                         .reshape(B, MB).astype(np.int32))
    kv_lens = jnp.asarray(np.array([27, 10], np.int32))
    q = jnp.asarray(rng.randn(B, Hi, Di).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.rand(B, Hi).astype(np.float32))

    scores = np.asarray(dsa_scores_pallas(q, w, idx_cache, tables,
                                          kv_lens, interpret=True))
    # XLA reference scores
    keys = np.asarray(idx_cache)[np.asarray(tables)][:, :, 0].reshape(
        B, -1, Di)
    logits = np.einsum("bhd,bsd->bhs", np.asarray(q), keys)
    ref = np.einsum("bh,bhs->bs", np.asarray(w), np.maximum(logits, 0))
    S = MB * BS
    valid = np.arange(S)[None, :] < np.asarray(kv_lens)[:, None]
    ref = np.where(valid, ref, np.finfo(np.float32).min)

    # bf16 q/k in the kernel: compare where valid with a loose bound
    ok = np.abs(scores[valid] - ref[valid]) <= \
        0.05 * max(np.abs(ref[valid]).max(), 1.0)
    assert ok.all(), np.abs(scores[valid] - ref[valid]).max()
    assert (scores[~valid] == np.finfo(np.float32).min).all()

    # covering top-k: kernel-backed and XLA-backed selection sets agree
    sel_k = np.asarray(dsa_decode_select(q, w, idx_cache, tables, kv_lens,
                                         index_topk=S,
                                         backend="pallas_interpret"))
    sel_x = np.asarray(dsa_decode_select(q, w, idx_cache, tables, kv_lens,
                                         index_topk=S, backend="xla"))
    for b, n in enumerate(np.asarray(kv_lens)):
        assert (set(sel_k[b].tolist()) & set(range(n))) == set(range(n))
        assert set(sel_k[b][:n].tolist()) == set(sel_x[b][:n].tolist())


def test_dsa_e2e_pallas_interpret_matches_xla(monkeypatch):
    """Engine decode through the Pallas DSA scoring + Pallas MLA kernels
    (interpret) matches the XLA path exactly at covering top-k."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    def make():
        return ModelConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=4, max_position=256,
            architecture="DeepseekV3ForCausalLM", q_lora_rank=32,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16,
            sparse_attention={"algo": "dsa", "index_n_heads": 4,
                              "index_head_dim": 32, "index_topk": 64})

    sp = tllm.SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    prompt = [3, 14, 15, 9, 2, 6]
    outs = {}
    for mode in ("xla", "interpret"):
        if mode == "interpret":
            monkeypatch.setenv("TLLM_PALLAS_INTERPRET", "1")
        else:
            monkeypatch.delenv("TLLM_PALLAS_INTERPRET", raising=False)
        llm = tllm.LLM(model=make(), skip_tokenizer_init=True,
                       max_seq_len=64, max_batch_size=2, kv_num_blocks=32,
                       kv_block_size=8, seed=0)
        try:
            outs[mode] = llm.generate([prompt], sp)[0].outputs[0].token_ids
        finally:
            llm.shutdown()
    assert outs["xla"] == outs["interpret"], outs


def test_dsa_prefill_mask_topk_and_covering():
    """Per-query prefill mask: causal, exactly min(span, k) visible keys
    (no ties with random scores), and full-causal when k covers."""
    from tensorrt_llm_tpu.ops.dsa import dsa_prefill_mask

    rng = np.random.RandomState(5)
    T, Hi, Di, BS, NB, MB = 6, 2, 16, 4, 8, 3
    idx_cache = jnp.asarray(rng.randn(NB, 1, BS, Di).astype(np.float32))
    table = jnp.asarray(np.array([2, 5, 1], np.int32))
    kv_len = jnp.asarray(10, jnp.int32)    # 4 cached + 6 current
    q_off = jnp.asarray(4, jnp.int32)
    q = jnp.asarray(rng.randn(T, Hi, Di).astype(np.float32))
    w = jnp.asarray(rng.rand(T, Hi).astype(np.float32))

    m = np.asarray(dsa_prefill_mask(q, w, idx_cache, table, kv_len, q_off,
                                    index_topk=3))
    S = MB * BS
    assert m.shape == (T, S)
    for t in range(T):
        span = min(4 + t + 1, 10)
        assert m[t].sum() == min(span, 3)
        assert not m[t, 4 + t + 1:].any()      # causal
    cover = np.asarray(dsa_prefill_mask(q, w, idx_cache, table, kv_len,
                                        q_off, index_topk=S))
    for t in range(T):
        span = min(4 + t + 1, 10)
        assert cover[t, :span].all() and cover[t].sum() == span


def test_dsa_tight_prefill_decode_deterministic():
    """index_topk smaller than the prompt: restricted prefill + decode
    still greedy-deterministic end to end."""
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, max_position=256,
        architecture="DeepseekV3ForCausalLM", q_lora_rank=32,
        kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
        v_head_dim=16,
        sparse_attention={"algo": "dsa", "index_n_heads": 4,
                          "index_head_dim": 32, "index_topk": 8})
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   max_batch_size=2, kv_num_blocks=32, kv_block_size=8,
                   seed=0)
    try:
        sp = tllm.SamplingParams(max_tokens=5, temperature=0.0,
                                 ignore_eos=True)
        prompt = list(np.random.RandomState(1).randint(2, 100, size=25))
        a = llm.generate([prompt], sp)[0].outputs[0].token_ids
        b = llm.generate([prompt], sp)[0].outputs[0].token_ids
        assert a == b and len(a) == 5
    finally:
        llm.shutdown()
