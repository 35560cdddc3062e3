"""Parity tests: native (C++) KV bookkeeping vs the pure-Python fallback.

The native backend (native/kv_bookkeeping.cc) must make identical decisions —
same block ids, same reuse matches, same evictions — for identical op
sequences, since allocation order (FIFO free list, LRU evictable) is fully
deterministic and independent of hash *values*.
"""

import random

import pytest

from tensorrt_llm_tpu.native import load_native
from tensorrt_llm_tpu.runtime.kv_cache_manager import (
    _NativeBookkeeping,
    _PyBookkeeping,
)

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="no C++ toolchain available")


def make_pair(num_blocks=64, block_size=4, reuse=True):
    lib = load_native()
    return (_PyBookkeeping(num_blocks, block_size, reuse),
            _NativeBookkeeping(lib, num_blocks, block_size, reuse))


def check_same(py, nat, seq_ids):
    assert py.num_free_blocks() == nat.num_free_blocks()
    ps, ns = py.stats(), nat.stats()
    assert ps == ns, (ps, ns)
    for sid in seq_ids:
        assert py.num_seq_blocks(sid) == nat.num_seq_blocks(sid)
        if py.num_seq_blocks(sid) >= 0:
            assert py.block_table(sid, 16) == nat.block_table(sid, 16)


def test_basic_lifecycle_parity():
    py, nat = make_pair()
    toks = list(range(10))
    for bk in (py, nat):
        assert bk.add_sequence(1, toks) == 0
        bk.grow_sequence(1, 10)
        bk.seal_full_blocks(1, toks)
    check_same(py, nat, [1])
    for bk in (py, nat):
        assert bk.slot_mapping(1, 0, 10) == [
            bk.block_table(1, 3)[i // 4] * 4 + i % 4 for i in range(10)]
        bk.free_sequence(1)
    check_same(py, nat, [1])


def test_prefix_reuse_parity():
    py, nat = make_pair()
    prompt = list(range(20))
    for bk in (py, nat):
        bk.add_sequence(1, prompt)
        bk.grow_sequence(1, 20)
        bk.seal_full_blocks(1, prompt)
        bk.free_sequence(1)
        # same prompt again: 4 full blocks of the 20 tokens are reusable
        # (the 5th holds the last token and is never matched)
        matched = bk.add_sequence(2, prompt)
        assert matched == 16
    check_same(py, nat, [2])


def test_salt_isolates_reuse():
    """A salted sequence must not publish blocks reachable without the salt
    (and vice versa) — reference BlockKey includes cacheSalt."""
    py, nat = make_pair()
    prompt = list(range(12))
    for bk in (py, nat):
        bk.add_sequence(1, prompt, cache_salt="tenant-a")
        bk.grow_sequence(1, 12)
        bk.seal_full_blocks(1, prompt)
        bk.free_sequence(1)
        assert bk.add_sequence(2, prompt) == 0          # unsalted: no match
        assert bk.add_sequence(3, prompt, cache_salt="tenant-b") == 0
        assert bk.add_sequence(4, prompt, cache_salt="tenant-a") == 8
    check_same(py, nat, [2, 3, 4])


def test_eviction_parity():
    py, nat = make_pair(num_blocks=9, block_size=2)  # 8 usable blocks
    for bk in (py, nat):
        for sid in range(3):  # 3 seqs x 2 blocks, sealed then freed
            toks = [100 * sid + i for i in range(4)]
            bk.add_sequence(sid, toks)
            bk.grow_sequence(sid, 4)
            bk.seal_full_blocks(sid, toks)
            bk.free_sequence(sid)
        # now 6 evictable + 2 free; allocating 4 blocks evicts LRU seq 0
        bk.add_sequence(10, [7, 7, 7, 7, 7, 7, 7, 7])
        bk.grow_sequence(10, 8)
        assert bk.add_sequence(11, [0, 1, 2, 3]) == 0   # seq 0 was evicted
        assert bk.add_sequence(12, [200, 201, 202, 203]) == 2  # seq 2 cached
    check_same(py, nat, [10, 11, 12])


def test_out_of_blocks_raises():
    py, nat = make_pair(num_blocks=3, block_size=2)
    for bk in (py, nat):
        bk.add_sequence(1, [1, 2, 3, 4])
        bk.grow_sequence(1, 4)
        with pytest.raises(RuntimeError):
            bk.grow_sequence(1, 8)


def test_randomized_parity():
    py, nat = make_pair(num_blocks=40, block_size=4)
    rng = random.Random(0)
    live = {}
    next_id = 0
    for _ in range(400):
        op = rng.random()
        if op < 0.35 or not live:
            sid = next_id
            next_id += 1
            toks = [rng.randrange(50) for _ in range(rng.randrange(1, 30))]
            need = (len(toks) + 3) // 4
            if need > min(py.num_free_blocks(), 30):
                continue
            salt = rng.choice([None, "s1", "s2"])
            m_py = py.add_sequence(sid, toks, salt)
            m_nat = nat.add_sequence(sid, toks, salt)
            assert m_py == m_nat
            py.grow_sequence(sid, len(toks))
            nat.grow_sequence(sid, len(toks))
            live[sid] = toks
        elif op < 0.6:
            sid = rng.choice(list(live))
            toks = live[sid]
            grown = len(toks) + rng.randrange(1, 5)
            need = (grown + 3) // 4 - py.num_seq_blocks(sid)
            if need > py.num_free_blocks():
                continue
            live[sid] = toks + [rng.randrange(50)] * (grown - len(toks))
            py.grow_sequence(sid, grown)
            nat.grow_sequence(sid, grown)
        elif op < 0.8:
            sid = rng.choice(list(live))
            py.seal_full_blocks(sid, live[sid])
            nat.seal_full_blocks(sid, live[sid])
        else:
            sid = rng.choice(list(live))
            py.free_sequence(sid)
            nat.free_sequence(sid)
            del live[sid]
        check_same(py, nat, list(live))


def test_manager_uses_native_by_default():
    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        KVCacheConfig,
        KVCacheManager,
    )
    kv = KVCacheManager(KVCacheConfig(block_size=4), num_layers=1,
                        num_kv_heads=1, head_dim=8, num_blocks=16)
    assert kv.is_native
    kv.add_sequence(0, [1, 2, 3, 4, 5])
    kv.grow_sequence(0, 5)
    assert kv.num_seq_blocks(0) == 2
    assert kv.slot_mapping(0, 0, 5) == [
        kv.block_table(0, 2)[i // 4] * 4 + i % 4 for i in range(5)]
    assert kv.can_grow(0, 60)
    assert not kv.can_grow(0, 61)  # 15 usable blocks
    kv.free_sequence(0)
    assert kv.stats()["active_sequences"] == 0


def test_match_prefix_parity():
    """Dry-run prefix probe: identical answers, zero side effects."""
    py, nat = make_pair()
    prompt = list(range(20))
    for bk in (py, nat):
        bk.add_sequence(1, prompt)
        bk.grow_sequence(1, 20)
        bk.seal_full_blocks(1, prompt)
        bk.free_sequence(1)
        before = bk.stats()
        assert bk.match_prefix(prompt) == 16
        assert bk.match_prefix(prompt[:9]) == 8
        assert bk.match_prefix(list(range(100, 120))) == 0
        assert bk.stats() == before          # no refs taken, nothing moved
    check_same(py, nat, [])
