"""Pluggable external KV store (reference kv_connector_config — the
LMCache-style connector plane): reuse blocks leaving the device flow
save(); prefix misses past the device and host tiers probe load()."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tensorrt_llm_tpu.runtime.kv_cache_manager import (
    KVCacheConfig, KVCacheManager, KvCacheConnector)
from tests.test_kv_offload import FakePagePool


class DictConnector(KvCacheConnector):
    def __init__(self):
        self.store = {}
        self.saves = 0
        self.loads = 0

    @staticmethod
    def _copy(x):
        # payloads are nested lists of per-layer page arrays (e.g. [K, V]
        # per layer) — preserve the structure
        if isinstance(x, (list, tuple)):
            return [DictConnector._copy(y) for y in x]
        return np.array(x)

    def save(self, key, payload):
        self.saves += 1
        self.store[key] = self._copy(payload)

    def load(self, key):
        p = self.store.get(key)
        if p is not None:
            self.loads += 1
        return p


def _mgr(conn, num_blocks=8, block_size=4, host_blocks=0):
    cfg = KVCacheConfig(block_size=block_size, num_blocks=num_blocks,
                        enable_block_reuse=True,
                        host_cache_blocks=host_blocks, kv_connector=conn)
    return KVCacheManager(cfg, num_layers=1, num_kv_heads=1, head_dim=4,
                          num_blocks=num_blocks, bookkeeping="python")


def _seed_and_churn(kv, pages, prompt, bs):
    """Seed the reuse index with `prompt`, then evict everything."""
    assert kv.add_sequence(1, prompt) == 0
    kv.grow_sequence(1, len(prompt))
    for b in kv.block_table(1, 3):
        pages.pool[b] = b
    kv.seal_full_blocks(1, prompt)
    kv.free_sequence(1)
    filler = list(range(500, 500 + 7 * bs))
    kv.add_sequence(2, filler)
    kv.grow_sequence(2, len(filler))
    kv.free_sequence(2)


def test_connector_save_and_load_without_host_tier():
    bs = 4
    conn = DictConnector()
    kv = _mgr(conn, host_blocks=0)
    pages = FakePagePool(8)
    kv.attach_block_io(pages.extract, pages.inject)
    prompt = list(range(100, 100 + 2 * bs + 1))
    _seed_and_churn(kv, pages, prompt, bs)
    assert conn.saves == 2 and len(conn.store) == 2
    assert kv.stats()["host_cached_blocks"] == 0   # no host tier

    # same prompt: blocks restored FROM THE CONNECTOR
    matched = kv.add_sequence(3, prompt)
    assert matched == 2 * bs
    assert conn.loads == 2
    assert kv.stats()["connector_loads"] == 2
    t3 = kv.block_table(3, 2)
    got = sorted(float(pages.pool[b][0]) for b in t3)
    want = sorted(float(p[0][0][0]) for p in conn.store.values())
    assert got == want, "restored device blocks must hold saved contents"


def test_connector_behind_host_tier():
    """With both tiers, onboarding prefers the host cache; the connector
    still holds everything and serves past the host LRU horizon."""
    bs = 4
    conn = DictConnector()
    kv = _mgr(conn, host_blocks=1)   # host keeps only ONE block
    pages = FakePagePool(8)
    kv.attach_block_io(pages.extract, pages.inject)
    prompt = list(range(100, 100 + 2 * bs + 1))
    _seed_and_churn(kv, pages, prompt, bs)
    assert kv.stats()["host_cached_blocks"] == 1   # LRU kept the newest
    assert len(conn.store) == 2                    # connector kept both
    matched = kv.add_sequence(3, prompt)
    assert matched == 2 * bs                       # host + connector
    assert conn.loads >= 1


def test_match_prefix_counts_connector():
    bs = 4
    conn = DictConnector()
    kv = _mgr(conn, host_blocks=0)
    pages = FakePagePool(8)
    kv.attach_block_io(pages.extract, pages.inject)
    prompt = list(range(100, 100 + 2 * bs + 1))
    _seed_and_churn(kv, pages, prompt, bs)
    assert kv.match_prefix(prompt) == 2 * bs
    assert kv.match_prefix(list(range(900, 909))) == 0


def test_stable_whash_across_processes():
    """Connector keys must be process-stable (FNV over ints + sha of the
    salt), unlike Python's seeded hash()."""
    import subprocess
    import sys
    code = ("from tensorrt_llm_tpu.runtime.kv_cache_manager import "
            "KVCacheManager as M; "
            "print(M._whash(0, (1, 2, 3), 'salt'), M._whash(7, (9,), None))")
    outs = {subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           env={"PYTHONHASHSEED": str(seed),
                                "PATH": "/usr/bin:/bin:/usr/local/bin",
                                "JAX_PLATFORMS": "cpu"},
                           cwd="/root/repo").stdout.strip()
            for seed in (1, 2)}
    assert len(outs) == 1 and "" not in outs, outs


def test_e2e_connector_decode_parity():
    """Decode after a connector restore matches cold decode exactly."""
    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position=256)
    conn = DictConnector()
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
              max_batch_size=4, kv_num_blocks=12, kv_block_size=4, seed=5,
              kv_connector=conn)
    sp = SamplingParams(max_tokens=4, ignore_eos=True, temperature=0.0)
    prompt = list(range(3, 3 + 9))
    cold = llm.generate([prompt], sp)[0].outputs[0].token_ids
    # churn the tiny pool so the prompt's blocks evict through the connector
    llm.generate([list(range(40 + 8 * i, 48 + 8 * i)) for i in range(4)], sp)
    again = llm.generate([prompt], sp)[0].outputs[0].token_ids
    st = llm.get_kv_cache_stats()
    llm.shutdown()
    assert conn.saves > 0, st
    assert again == cold, (again, cold)


def test_connector_failures_do_not_break_serving():
    """A flaky external store must never kill the executor: save/load/
    contains raising is logged and treated as a miss."""
    class Flaky(KvCacheConnector):
        def save(self, key, payload):
            raise IOError("store down")

        def load(self, key):
            raise IOError("store down")

        def contains(self, key):
            raise IOError("store down")

    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position=256)
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
              max_batch_size=4, kv_num_blocks=12, kv_block_size=4, seed=5,
              kv_connector=Flaky())
    sp = SamplingParams(max_tokens=4, ignore_eos=True, temperature=0.0)
    prompt = list(range(3, 12))
    try:
        cold = llm.generate([prompt], sp)[0].outputs[0].token_ids
        # churn so offload (and its failing save) happens
        llm.generate([list(range(40 + 8 * i, 48 + 8 * i))
                      for i in range(4)], sp)
        again = llm.generate([prompt], sp)[0].outputs[0].token_ids
        assert again == cold
        assert llm.match_kv_prefix(prompt) >= 0  # contains() failure = miss
        st = llm.get_kv_cache_stats()
        assert st["connector_saves"] == 0 and st["connector_loads"] == 0
    finally:
        llm.shutdown()
