"""Host KV offload tier + retention-priority eviction.

Reference capabilities: secondary host block pool with onboard/offload
(`cpp/include/tensorrt_llm/batch_manager/kvCacheManager.h:1045`,
`batch_manager/kvCacheTransferManager.cpp`) and priority-based eviction
(`KvCacheRetentionConfig`, `cpp/include/tensorrt_llm/executor/executor.h:559`).
"""

import numpy as np
import pytest

from tensorrt_llm_tpu.runtime.kv_cache_manager import (
    KVCacheConfig, KVCacheManager)


def _mgr(num_blocks=16, block_size=4, host_blocks=8, backend="python"):
    cfg = KVCacheConfig(block_size=block_size, num_blocks=num_blocks,
                        enable_block_reuse=True,
                        host_cache_blocks=host_blocks)
    return KVCacheManager(cfg, num_layers=1, num_kv_heads=1, head_dim=4,
                          num_blocks=num_blocks, bookkeeping=backend)


class FakePagePool:
    """Stands in for the engine's extract/inject: one np 'pool' whose rows
    are block contents, so payload round-trips are checkable."""

    def __init__(self, num_blocks, width=6):
        self.pool = np.zeros((num_blocks, width), np.float32)

    def extract(self, block_ids):
        return [np.array(self.pool[list(block_ids)])]

    def inject(self, block_ids, payload):
        self.pool[list(block_ids)] = payload[0]


@pytest.mark.parametrize("backend", ["python", "native"])
def test_offload_and_onboard_roundtrip(backend):
    bs = 4
    kv = _mgr(num_blocks=8, block_size=bs, host_blocks=8, backend=backend)
    pages = FakePagePool(8)
    kv.attach_block_io(pages.extract, pages.inject)

    prompt = list(range(100, 100 + 2 * bs + 1))  # 2 full blocks + 1
    assert kv.add_sequence(1, prompt) == 0
    kv.grow_sequence(1, len(prompt))
    t1 = kv.block_table(1, 3)
    # simulate device writes: stamp block contents with their ids
    for b in t1:
        pages.pool[b] = b
    kv.seal_full_blocks(1, prompt)
    kv.free_sequence(1)

    # churn: force eviction of the two cached blocks (pool has 7 usable)
    filler = list(range(500, 500 + 7 * bs))
    kv.add_sequence(2, filler)
    kv.grow_sequence(2, len(filler))
    assert kv.num_offloaded == 2
    assert kv.stats()["host_cached_blocks"] == 2
    saved = {h: p[0].copy() for h, p in kv.host_cache.items()}
    kv.free_sequence(2)

    # same prompt again: device tier is gone, host tier onboards both blocks
    matched = kv.add_sequence(3, prompt)
    assert matched == 2 * bs
    assert kv.num_onboarded == 2
    t3 = kv.block_table(3, 2)
    onboarded = sorted(pages.pool[b][0] for b in t3)
    assert onboarded == sorted(p[0][0] for p in saved.values()), \
        "onboarded device blocks must hold the offloaded contents"
    kv.free_sequence(3)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_match_prefix_counts_host_tier(backend):
    bs = 4
    kv = _mgr(num_blocks=8, block_size=bs, host_blocks=8, backend=backend)
    pages = FakePagePool(8)
    kv.attach_block_io(pages.extract, pages.inject)
    prompt = list(range(7, 7 + 2 * bs + 1))
    kv.add_sequence(1, prompt)
    kv.grow_sequence(1, len(prompt))
    kv.seal_full_blocks(1, prompt)
    kv.free_sequence(1)
    assert kv.match_prefix(prompt) == 2 * bs  # device tier
    filler = list(range(900, 900 + 7 * bs))
    kv.add_sequence(2, filler)
    kv.grow_sequence(2, len(filler))
    kv.free_sequence(2)
    assert kv.match_prefix(prompt) == 2 * bs  # host tier now
    # different salt: no match in either tier
    assert kv.match_prefix(prompt, cache_salt="other") == 0


@pytest.mark.parametrize("backend", ["python", "native"])
def test_priority_eviction_order(backend):
    """Low retention priority evicts before high, regardless of LRU age."""
    bs = 4
    kv = _mgr(num_blocks=7, block_size=bs, host_blocks=0, backend=backend)

    # seq A: HIGH priority, sealed FIRST (oldest in LRU terms)
    pa = list(range(10, 10 + bs + 1))
    kv.add_sequence(1, pa)
    kv.set_seq_priority(1, 80)
    kv.grow_sequence(1, len(pa))
    kv.seal_full_blocks(1, pa)
    a_block = kv.block_table(1, 1)[0]
    kv.free_sequence(1)

    # seq B: LOW priority, sealed second (newer)
    pb = list(range(40, 40 + bs + 1))
    kv.add_sequence(2, pb)
    kv.set_seq_priority(2, 10)
    kv.grow_sequence(2, len(pb))
    kv.seal_full_blocks(2, pb)
    kv.free_sequence(2)

    # allocate until eviction is forced: B (low prio) must go first
    pc = list(range(70, 70 + 5 * bs))
    kv.add_sequence(3, pc)
    kv.grow_sequence(3, len(pc))
    assert kv.match_prefix(pa) == bs, "high-priority block survived"
    assert kv.match_prefix(pb) == 0, "low-priority block was evicted first"
    # one more block: now the high-priority one goes too
    kv.grow_sequence(3, len(pc) + bs)
    assert kv.match_prefix(pa) == 0
    kv.free_sequence(3)
    assert a_block >= 0  # silence lint


@pytest.mark.parametrize("backend", ["python", "native"])
def test_onboard_stops_at_device_capacity(backend):
    """Onboarding must not throw when the device pool is tight — it stops
    extending the match instead."""
    bs = 4
    kv = _mgr(num_blocks=5, block_size=bs, host_blocks=8, backend=backend)
    pages = FakePagePool(5)
    kv.attach_block_io(pages.extract, pages.inject)
    prompt = list(range(0, 3 * bs + 1))  # 3 full blocks
    kv.add_sequence(1, prompt)
    kv.grow_sequence(1, len(prompt))
    kv.seal_full_blocks(1, prompt)
    kv.free_sequence(1)
    filler = list(range(200, 200 + 4 * bs))
    kv.add_sequence(2, filler)       # evicts all three to host
    kv.grow_sequence(2, len(filler))
    assert kv.num_offloaded >= 3
    # keep filler alive: only 0 free blocks remain -> onboarding limited
    matched = kv.add_sequence(3, prompt)
    assert matched < 3 * bs  # could not fully onboard
    kv.free_sequence(3)
    kv.free_sequence(2)


def test_e2e_decode_parity_through_host_tier():
    """Evict a prompt's KV to host, onboard it back, and require the decode
    to match the original greedy continuation exactly."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tensorrt_llm_tpu as tllm
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position=256)
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
                   max_batch_size=4, kv_num_blocks=24, kv_block_size=4,
                   kv_host_cache_blocks=96)
    sp = tllm.SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    prompt = [(7 * i + 3) % 128 for i in range(13)]  # 3 full blocks @ bs=4

    first = llm.generate([prompt], sp)[0].outputs[0].token_ids

    # churn the pool so the prompt's sealed blocks offload to host
    for i in range(6):
        filler = [(i * 31 + j) % 128 for j in range(40)]
        llm.generate([filler], tllm.SamplingParams(max_tokens=2,
                                                   ignore_eos=True))
    st = llm.get_kv_cache_stats()
    assert st["offloaded_blocks"] > 0, "churn did not trigger offload"

    again = llm.generate([prompt], sp)[0].outputs[0].token_ids
    st2 = llm.get_kv_cache_stats()
    assert st2["onboarded_blocks"] > 0, "host tier was not used on re-run"
    assert again == first, "decode through onboarded host KV must match"
    llm.shutdown()


@pytest.mark.parametrize("backend", ["python", "native"])
def test_secondary_offload_min_priority_gate(backend):
    """Blocks below secondary_offload_min_priority never reach the host
    tier; blocks at/above it do (reference llm_args.py:1661)."""
    bs = 4
    cfg = KVCacheConfig(block_size=bs, num_blocks=8,
                        enable_block_reuse=True, host_cache_blocks=8,
                        secondary_offload_min_priority=50)
    kv = KVCacheManager(cfg, num_layers=1, num_kv_heads=1, head_dim=4,
                        num_blocks=8, bookkeeping=backend)
    pages = FakePagePool(8)
    kv.attach_block_io(pages.extract, pages.inject)

    def run_seq(seq_id, prompt, priority):
        kv.add_sequence(seq_id, prompt)
        kv.set_seq_priority(seq_id, priority)
        kv.grow_sequence(seq_id, len(prompt))
        kv.seal_full_blocks(seq_id, prompt)
        kv.free_sequence(seq_id)

    # low priority (evicts first AND is below the offload gate)
    run_seq(1, list(range(100, 100 + 2 * bs + 1)), priority=10)
    # churn: evict the low-priority cached blocks
    filler = list(range(500, 500 + 7 * bs))
    kv.add_sequence(2, filler)
    kv.grow_sequence(2, len(filler))
    assert kv.num_offloaded == 0, "low-priority blocks must not offload"
    kv.free_sequence(2)

    # high priority: offloads normally
    run_seq(3, list(range(900, 900 + 2 * bs + 1)), priority=80)
    filler2 = list(range(700, 700 + 7 * bs))
    kv.add_sequence(4, filler2)
    kv.grow_sequence(4, len(filler2))
    assert kv.num_offloaded == 2
    kv.free_sequence(4)


def test_dp_placement_count_balanced():
    """Attention-DP admission balances ACTIVE COUNTS (free blocks break
    ties) so each rank's decode rows always fit its per-rank band."""
    from tensorrt_llm_tpu.runtime.kv_cache_manager import (
        DpKVCacheManager, KVCacheConfig)
    cfg = KVCacheConfig(block_size=4, num_blocks=64)
    dp = DpKVCacheManager(cfg, num_layers=1, num_kv_heads=1, head_dim=4,
                          num_blocks_per_rank=64, dp_size=4)
    # skew rank loads: rank of seq i would historically follow free blocks
    for i in range(16):
        dp.add_sequence(i, [1, 2, 3])
        dp.grow_sequence(i, 3)
    import collections
    counts = collections.Counter(dp._rank_of.values())
    assert all(c == 4 for c in counts.values()), counts
    # free a whole rank's worth; new arrivals refill the emptiest rank
    victims = [s for s, r in dp._rank_of.items() if r == 2]
    for s in victims:
        dp.free_sequence(s)
    for i in range(100, 104):
        dp.add_sequence(i, [1, 2, 3])
    counts = collections.Counter(dp._rank_of.values())
    assert counts[2] == 4, counts
