"""Partial tail-block KV reuse (reference KvCacheConfig enable_partial_reuse
/ copy_on_partial_reuse, BlockManager::loadOrAllocateBlocks): after
full-block prefix matching, a cached block sharing a token prefix with the
request's next tokens is reused for those head tokens — via a page copy
into a fresh block (source stays cached) or by adopting the source block
in place when it is unreferenced.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
from tensorrt_llm_tpu.native import load_native
from tensorrt_llm_tpu.runtime.kv_cache_manager import (
    KVCacheConfig,
    KVCacheManager,
    _NativeBookkeeping,
    _PyBookkeeping,
)

BS = 4


def backends():
    out = [_PyBookkeeping(64, BS, True)]
    lib = load_native()
    if lib is not None:
        out.append(_NativeBookkeeping(lib, 64, BS, True))
    return out


def seed_chain(bk, seq_id, toks):
    bk.add_sequence(seq_id, toks)
    bk.grow_sequence(seq_id, len(toks))
    bk.seal_full_blocks(seq_id, toks)


def test_partial_match_copy():
    """Full match on block 0, partial (2 of 4 tokens) on block 1, into a
    FRESH block with a (src, dst) copy pair; stats count it."""
    for bk in backends():
        base = [1, 2, 3, 4, 10, 11, 12, 13]
        seed_chain(bk, 1, base)
        src_b1 = bk.block_table(1, 2)[1]
        # same block 0, block 1 shares only the first 2 tokens
        probe = [1, 2, 3, 4, 10, 11, 99, 98, 97]
        matched = bk.add_sequence(2, probe)
        assert matched == BS, matched  # full blocks only at this layer
        k, src, dst = bk.try_partial_match(2, probe)
        assert (k, src) == (2, src_b1), (k, src, bk)
        assert dst != src and dst > 0
        assert bk.block_table(2, 2)[1] == dst
        # num_tokens advanced: slot mapping for position 6 (first recompute)
        assert bk.slot_mapping(2, 6, 1) == [dst * BS + 2]
        assert bk.stats()["partial_reused_blocks"] == 1
        # source stays in the reuse index: a third identical-prefix request
        # still fully matches both blocks
        assert bk.add_sequence(3, base + [7]) == 2 * BS


def test_partial_match_picks_longest_candidate():
    for bk in backends():
        seed_chain(bk, 1, [1, 2, 3, 4, 10, 11, 12, 13])
        seed_chain(bk, 2, [1, 2, 3, 4, 10, 99, 98, 97])
        probe = [1, 2, 3, 4, 10, 11, 12, 50, 51]
        bk.add_sequence(3, probe)
        k, src, _ = bk.try_partial_match(3, probe)
        assert k == 3  # [10, 11, 12] beats [10]
        assert src == bk.block_table(1, 2)[1]


def test_partial_match_keeps_one_token_uncached():
    """The last prompt token is always recomputed (logits source), so a
    full-tail overlap is capped at remaining-1."""
    for bk in backends():
        seed_chain(bk, 1, [1, 2, 3, 4, 10, 11, 12, 13])
        probe = [1, 2, 3, 4, 10, 11, 12]  # 3 remaining tokens
        bk.add_sequence(2, probe)
        k, _, _ = bk.try_partial_match(2, probe)
        assert k == 2  # not 3: token 12 must be recomputed


def test_partial_adopt_in_place():
    """copy_on_partial=False adopts the unreferenced source block directly
    (dst == src) and removes it from the reuse index."""
    for bk in backends():
        base = [1, 2, 3, 4, 10, 11, 12, 13]
        seed_chain(bk, 1, base)
        src_b1 = bk.block_table(1, 2)[1]
        bk.free_sequence(1)  # ref 0: evictable, adoptable
        probe = [1, 2, 3, 4, 10, 11, 99, 98]
        bk.add_sequence(2, probe)
        k, src, dst = bk.try_partial_match(2, probe, copy_on_partial=False)
        assert (k, src, dst) == (2, src_b1, src_b1)
        # the adopted block left the index: same-prefix request only
        # full-matches block 0 now
        assert bk.add_sequence(3, base + [7]) == BS


def test_partial_adopt_refuses_referenced_source():
    for bk in backends():
        seed_chain(bk, 1, [1, 2, 3, 4, 10, 11, 12, 13])  # seq 1 keeps refs
        probe = [1, 2, 3, 4, 10, 11, 99, 98]
        bk.add_sequence(2, probe)
        k, src, dst = bk.try_partial_match(2, probe, copy_on_partial=False)
        assert (k, src, dst) == (0, -1, -1)


def test_partial_eviction_forgets_candidate():
    """An evicted block must leave the partial-match side index too."""
    for bk in backends():
        seed_chain(bk, 1, [1, 2, 3, 4, 10, 11, 12, 13])
        bk.free_sequence(1)
        # pool is 64-1 blocks; seq 1 freed 2 evictable cached blocks and 61
        # stay free — 63 single-block sequences evict both cached blocks
        for i in range(63):
            sid = 100 + i
            bk.add_sequence(sid, [1000 + i])
            bk.grow_sequence(sid, 1)
        probe = [1, 2, 3, 4, 10, 11, 99, 98]
        bk.add_sequence(2, probe)
        k, _, _ = bk.try_partial_match(2, probe)
        assert k == 0


def test_match_prefix_partial_dry_run():
    for bk in backends():
        seed_chain(bk, 1, [1, 2, 3, 4, 10, 11, 12, 13])
        probe = [1, 2, 3, 4, 10, 11, 99, 98]
        assert bk.match_prefix(probe) == BS
        assert bk.match_prefix(probe, partial=True) == BS + 2
        # no side effects
        assert bk.match_prefix(probe, partial=True) == BS + 2


def test_native_python_parity_randomized():
    lib = load_native()
    if lib is None:
        pytest.skip("no C++ toolchain")
    import random
    rng = random.Random(11)
    py = _PyBookkeeping(32, BS, True)
    nat = _NativeBookkeeping(lib, 32, BS, True)
    live = []
    next_id = 1
    for step in range(300):
        op = rng.random()
        if (op < 0.5 and len(live) < 6) or not live:
            toks = [rng.randrange(4) for _ in range(rng.randrange(1, 14))]
            rp, rn = (py.add_sequence(next_id, toks),
                      nat.add_sequence(next_id, toks))
            assert rp == rn
            cop = rng.random() < 0.7
            pp = py.try_partial_match(next_id, toks, copy_on_partial=cop)
            pn = nat.try_partial_match(next_id, toks, copy_on_partial=cop)
            assert pp == pn, (step, pp, pn)
            total = len(toks)
            py.grow_sequence(next_id, total)
            nat.grow_sequence(next_id, total)
            py.seal_full_blocks(next_id, toks)
            nat.seal_full_blocks(next_id, toks)
            live.append((next_id, toks))
            next_id += 1
        else:
            sid, toks = live.pop(rng.randrange(len(live)))
            py.free_sequence(sid)
            nat.free_sequence(sid)
        assert py.stats() == nat.stats(), step
    for sid, _ in live:
        assert py.block_table(sid, 8) == nat.block_table(sid, 8)


def test_wrapper_records_copy_pairs():
    cfg = KVCacheConfig(block_size=BS, num_blocks=32)
    kv = KVCacheManager(cfg, num_layers=1, num_kv_heads=1, head_dim=8,
                        num_blocks=32)
    base = [1, 2, 3, 4, 10, 11, 12, 13, 9]
    kv.add_sequence(1, base)
    kv.grow_sequence(1, len(base))
    kv.seal_full_blocks(1, base)
    probe = [1, 2, 3, 4, 10, 11, 99, 98]
    matched = kv.add_sequence(2, probe)
    assert matched == BS + 2
    pairs = kv.drain_partial_copies(2)
    assert len(pairs) == 1 and pairs[0][0] != pairs[0][1]
    assert kv.drain_partial_copies(2) == []  # drained
    assert kv.stats()["partial_reused_blocks"] == 1


def test_wrapper_partial_disabled():
    cfg = KVCacheConfig(block_size=BS, num_blocks=32,
                        enable_partial_reuse=False)
    kv = KVCacheManager(cfg, num_layers=1, num_kv_heads=1, head_dim=8,
                        num_blocks=32)
    base = [1, 2, 3, 4, 10, 11, 12, 13, 9]
    kv.add_sequence(1, base)
    kv.grow_sequence(1, len(base))
    kv.seal_full_blocks(1, base)
    assert kv.add_sequence(2, [1, 2, 3, 4, 10, 11, 99, 98]) == BS
    assert kv.drain_partial_copies(2) == []


# ------------------------------------------------------------------ e2e ----

def _make_llm(**kw):
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position=256)
    return LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
               max_batch_size=8, kv_num_blocks=64, kv_block_size=4,
               seed=3, **kw)


def test_e2e_partial_reuse_exact_decode():
    """Greedy decode with partial reuse on must match reuse fully off —
    the copied page + mid-block prefill resume is numerically identical."""
    sp = SamplingParams(max_tokens=8, ignore_eos=True, temperature=0.0)
    first = [5, 6, 7, 8, 20, 21, 22, 23, 30, 31]
    # shares block 0+1 fully? no: shares 6 tokens = block 0 (4) + 2 partial
    second = [5, 6, 7, 8, 20, 21, 40, 41, 42, 43]

    llm = _make_llm()
    out_first = llm.generate([first], sp)[0].outputs[0].token_ids
    st0 = llm.get_kv_cache_stats()
    out_second = llm.generate([second], sp)[0].outputs[0].token_ids
    st1 = llm.get_kv_cache_stats()
    assert st1["partial_reused_blocks"] > st0.get("partial_reused_blocks", 0)
    llm.shutdown()

    ref = _make_llm(enable_block_reuse=False)
    ref_first = ref.generate([first], sp)[0].outputs[0].token_ids
    ref_second = ref.generate([second], sp)[0].outputs[0].token_ids
    ref.shutdown()

    assert out_first == ref_first
    assert out_second == ref_second


def test_partial_skipped_after_host_onboarding():
    """Partial reuse must NOT trigger when host-tier onboarding extended
    the match: the hash chain only covers device-matched blocks, so the
    parent would be stale and a child block would be reused at the WRONG
    position (review finding: stale-parent probe)."""
    from tests.test_kv_offload import FakePagePool
    cfg = KVCacheConfig(block_size=BS, num_blocks=8, host_cache_blocks=8)
    kv = KVCacheManager(cfg, num_layers=1, num_kv_heads=1, head_dim=8,
                        num_blocks=8)
    pages = FakePagePool(8)
    kv.attach_block_io(pages.extract, pages.inject)
    base = [1, 2, 3, 4, 10, 11, 12, 13, 9]
    kv.add_sequence(1, base)
    kv.grow_sequence(1, len(base))
    kv.seal_full_blocks(1, base)
    kv.free_sequence(1)
    # churn so BOTH cached blocks offload to host
    filler = list(range(500, 500 + 7 * BS))
    kv.add_sequence(2, filler)
    kv.grow_sequence(2, len(filler))
    kv.free_sequence(2)
    assert kv.stats()["host_cached_blocks"] == 2
    # same two blocks + a third diverging block: onboarding restores both
    # from host; the tail block must NOT partial-match children of block 0
    # (block 1's tokens [10,11...] live under parent=hash(block0))
    probe = [1, 2, 3, 4, 10, 11, 12, 13, 10, 11, 99, 98]
    matched = kv.add_sequence(3, probe)
    assert matched == 2 * BS          # host onboarding only, NO partial
    assert kv.drain_partial_copies(3) == []
    # direct backend guard: hashes don't cover onboarded blocks
    k, _, _ = kv._bk.try_partial_match(3, probe)
    assert k == 0


def test_partial_dst_eviction_offloads_before_copy():
    """When _take_block for the partial dst evicts a cached block, its
    ORIGINAL contents must offload to the host tier before the executor's
    page copy lands (review finding: drain-after-copy corruption)."""
    from tests.test_kv_offload import FakePagePool
    cfg = KVCacheConfig(block_size=BS, num_blocks=8, host_cache_blocks=8)
    kv = KVCacheManager(cfg, num_layers=1, num_kv_heads=1, head_dim=8,
                        num_blocks=8)   # 7 usable blocks
    pages = FakePagePool(8)
    kv.attach_block_io(pages.extract, pages.inject)
    # chain A: blocks b0, b1 sealed (b1 is the future partial SOURCE)
    a = [1, 2, 3, 4, 10, 11, 12, 13, 9]
    kv.add_sequence(1, a)
    kv.grow_sequence(1, len(a))
    kv.seal_full_blocks(1, a)
    kv.free_sequence(1)
    # chain C: one sealed block bC with recognizable device contents
    c = [50, 51, 52, 53, 9]
    kv.add_sequence(2, c)
    kv.grow_sequence(2, len(c))
    bC = kv.block_table(2, 1)[0]
    pages.pool[bC] = 111.0
    kv.seal_full_blocks(2, c)
    kv.free_sequence(2)
    # fill the free list with a LIVE sequence so the partial dst can only
    # come from evicting a cached block
    filler = list(range(900, 900 + 4 * BS))   # 4 blocks
    kv.add_sequence(10, filler)
    kv.grow_sequence(10, len(filler))
    # probe: full match b0 (reffed), partial src b1 (pinned) -> dst must
    # evict bC, whose 111.0 page must offload BEFORE the executor's copy
    probe = [1, 2, 3, 4, 10, 11, 99, 98]
    matched = kv.add_sequence(3, probe)
    assert matched == BS + 2, matched
    assert len(kv.drain_partial_copies(3)) == 1
    assert kv.num_offloaded == 1
    assert kv._bk.drain_evictions() == []     # drained inside add_sequence
    vals = [float(p[0][0][0]) for p in kv.host_cache.values()]
    assert 111.0 in vals, vals
