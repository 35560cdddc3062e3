"""Paged KV cache manager with block reuse.

TPU-native counterpart of the reference's C++ `BlockManager`/`KVCacheManager`
(`cpp/.../batch_manager/kvCacheManager.h:1045,1690`): paged block pool, a
radix-style reuse index keyed by token-chain hashes
(reference `BlockKey`, kvCacheManager.h:148-195), LRU eviction of unreferenced
cached blocks (reference `evictionPolicy.h:29,70`), and free-memory-derived
pool sizing (reference resource_manager.py:782 `calculate_max_num_blocks`).

Device tensors live here: per layer, K and V pools shaped
``[num_blocks, num_kv_heads, block_size, head_dim]`` (head-sharded under TP).
Host bookkeeping runs in the C++ extension (`native/kv_bookkeeping.cc`) when a
compiler is available — the same split as the reference, which keeps this
per-iteration-hot path in `batch_manager/` C++ — with a pure-Python fallback
kept in semantic lockstep (tests/test_native_kv.py enforces identical block
tables for identical op sequences).

Quantized KV (reference `KvCacheDataType::{INT8,FP8}`) stores int8/fp8 data
pools; INT8 adds a per-(token, head) scale pool, FP8 (e4m3) needs none.
"""

from __future__ import annotations

import collections
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tensorrt_llm_tpu.quantization.mode import KvCacheQuantAlgo
from tensorrt_llm_tpu.utils import cdiv, logger


@dataclass
class KVCacheConfig:
    """Mirrors reference `KvCacheConfig` (llm_args.py:1622), TPU fields."""

    block_size: int = 16                  # tokens per block
    num_blocks: Optional[int] = None      # None => derive from free_mem_fraction
    free_mem_fraction: float = 0.85
    enable_block_reuse: bool = True
    # Partial tail-block reuse (reference enable_partial_reuse /
    # copy_on_partial_reuse, KvCacheConfig llm_args.py): after full-block
    # matching, a cached block sharing a token prefix with the request's
    # next tokens is reused for those head tokens.  copy_on_partial_reuse
    # copies the page into a fresh block (the source stays cached);
    # without it the source block is adopted in place when unreferenced.
    enable_partial_reuse: bool = True
    copy_on_partial_reuse: bool = True
    max_tokens: Optional[int] = None
    kv_quant: KvCacheQuantAlgo = KvCacheQuantAlgo.NONE
    dtype: jnp.dtype = jnp.bfloat16
    # Secondary host-memory tier (reference secondary block pool +
    # onboard/offload transfers, kvCacheManager.h:1045 /
    # kvCacheTransferManager.cpp): up to this many evicted reuse blocks are
    # offloaded to host RAM and onboarded back on a prefix hit.  0 = off.
    host_cache_blocks: int = 0
    # Only blocks with retention priority >= this offload to the host tier
    # (reference secondary_offload_min_priority, llm_args.py:1661) —
    # low-priority content is not worth the host copy + RAM.
    secondary_offload_min_priority: Optional[int] = None
    # sparse decode (RocketKV-style): allocate a per-page key-summary pool
    # [NB, Hkv, D] alongside K/V for full-attention layers
    sparse_kt: bool = False
    # DSA lightning indexer (DeepSeek V3.2, reference sparse/dsa.py
    # DSACacheManager): latent layout gains a per-token indexer-key pool
    # [NB, 1, BS, index_head_dim] per layer
    dsa_index_dim: int = 0
    # Pluggable external KV store (reference KvCacheConnectorConfig,
    # llm_args.py:817 — the LMCache-style connector plane): an object with
    # save(key, payload) / load(key) / contains(key).  Blocks evicted from
    # the reuse index flow save() (a tier colder than the host cache);
    # prefix misses probe load().  Keys are process-stable chain hashes.
    kv_connector: Optional[Any] = None
    # "kv": separate K and V pools per layer; "latent": one pool per layer
    # (MLA compressed KV + rope key — reference mlaCacheFormatter layout)
    layout: str = "kv"
    # VSWA: give sliding-window layers their own small cyclic pools
    # (reference per-window WindowBlockManager) instead of full-length pages
    separate_window_pools: bool = True


# Default retention priority — reference KvCacheRetentionConfig
# (executor.h:559) uses 35 as the default eviction priority.
DEFAULT_RETENTION_PRIORITY = 35


class KvCacheConnector:
    """External KV-block store interface (reference kv_connector_config /
    connector worker+scheduler classes, collapsed for the single-controller
    design): the cache manager calls save() as reuse blocks leave the
    device (after any host-tier insert), load() on prefix misses past both
    device and host tiers, and contains() for dry-run match scoring.

    Payloads are the engine's extract_kv_blocks output (one list of
    per-layer numpy page arrays); keys are process-stable 64-bit chain
    hashes of (parent, block tokens, salt), so an out-of-process store
    keyed on them can serve other processes with identical tokenizations.
    """

    def save(self, key: int, payload) -> None:
        raise NotImplementedError

    def load(self, key: int):
        """Return the payload stored under key, or None."""
        raise NotImplementedError

    def contains(self, key: int) -> bool:
        """Existence probe used by dry-run prefix scoring (the KV-aware
        router) — called once per block per routing decision, so REMOTE
        stores must override this with a cheap key check: the default
        falls back to a full load() and discards the payload."""
        return self.load(key) is not None


def prefix_chain_hashes(token_ids, block_size: int, salt=None) -> List[int]:
    """Chain hash of every full block of a prompt — the router-side mirror
    of the hashes advertised by 'stored' KV events (reference event-fed
    radix view, serve/router.py:76-139).  Because each chain hash encodes
    its whole prefix, set membership of hash b implies blocks 0..b match."""
    parent = 0
    out = []
    for b in range(len(token_ids) // block_size):
        chunk = tuple(token_ids[b * block_size:(b + 1) * block_size])
        parent = KVCacheManager._whash(parent, chunk, salt)
        out.append(parent)
    return out


def _stable_mix(h: int, v: int) -> int:
    h ^= v & 0xFFFFFFFFFFFFFFFF
    return (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF


class SequenceInfo:
    __slots__ = ("block_ids", "num_tokens", "block_hashes", "salt",
                 "priority")

    def __init__(self):
        self.block_ids: List[int] = []
        self.num_tokens = 0
        self.block_hashes: List[int] = []
        self.salt = None
        self.priority = DEFAULT_RETENTION_PRIORITY


class _PyBookkeeping:
    """Pure-Python host bookkeeping (fallback when g++ is unavailable)."""

    def __init__(self, num_blocks: int, block_size: int, enable_reuse: bool):
        self.block_size = block_size
        self.enable_reuse = enable_reuse
        # block 0 is reserved as the "null" block (padding rows in block
        # tables point at it; its contents are garbage but always masked).
        self.free_blocks = collections.deque(range(1, num_blocks))
        self.ref_count = [0] * num_blocks
        # reuse index: chain-hash -> block_id (only FULL immutable blocks)
        self.cached_blocks: Dict[int, int] = {}
        self.block_hash: List[Optional[int]] = [None] * num_blocks
        # evictable cached blocks (ref==0, in cached_blocks), bucketed by
        # retention priority: lowest priority evicts first, LRU within a
        # bucket (reference priority eviction, evictionPolicy.h:29,70 +
        # KvCacheRetentionConfig executor.h:559)
        self.evictable: Dict[int, collections.OrderedDict] = {}
        self.block_priority = [DEFAULT_RETENTION_PRIORITY] * num_blocks
        self.sequences: Dict[int, SequenceInfo] = {}
        # partial-reuse side index: sealed block contents + a child index
        # keyed by (parent_hash, salt) so the block FOLLOWING a full match
        # can be probed for a shared token prefix (reference partial reuse,
        # BlockManager::loadOrAllocateBlocks / copy_on_partial_reuse)
        self.block_tokens: Dict[int, tuple] = {}
        self.block_parent: Dict[int, tuple] = {}
        self.children: Dict[tuple, collections.OrderedDict] = {}
        self.num_reused_blocks = 0
        self.num_partial_reused = 0
        self.num_allocated_blocks = 0
        self.num_evicted_blocks = 0
        # block ids evicted from the reuse index since the last drain — the
        # wrapper offloads their contents to the host tier before the new
        # owner's first device write lands (reference offload,
        # kvCacheTransferManager.cpp)
        self.pending_evictions: List[int] = []

    @staticmethod
    def _chain_hash(parent: int, tokens: tuple, salt) -> int:
        return hash((parent, tokens, salt))

    def _n_evictable(self) -> int:
        return sum(len(b) for b in self.evictable.values())

    def set_seq_priority(self, seq_id: int, priority: int):
        info = self.sequences.get(seq_id)
        if info is not None:
            info.priority = int(priority)

    def _take_block(self) -> int:
        if self.free_blocks:
            bid = self.free_blocks.popleft()
        elif self.evictable:
            prio = min(p for p, b in self.evictable.items() if b)
            bucket = self.evictable[prio]
            bid, _ = bucket.popitem(last=False)  # LRU within priority
            if not bucket:
                del self.evictable[prio]
            h = self.block_hash[bid]
            if h is not None:
                self.cached_blocks.pop(h, None)
                self.block_hash[bid] = None
            self._forget_block(bid)
            self.num_evicted_blocks += 1
            self.pending_evictions.append(bid)
        else:
            raise RuntimeError("KV cache out of blocks")
        self.ref_count[bid] = 1
        self.num_allocated_blocks += 1
        return bid

    def drain_evictions(self) -> List[int]:
        out, self.pending_evictions = self.pending_evictions, []
        return out

    def _forget_block(self, bid: int):
        """Drop a block from the partial-reuse side index."""
        self.block_tokens.pop(bid, None)
        key = self.block_parent.pop(bid, None)
        if key is not None:
            bucket = self.children.get(key)
            if bucket is not None:
                bucket.pop(bid, None)
                if not bucket:
                    del self.children[key]

    def _ref_block(self, bid: int):
        if self.ref_count[bid] == 0:
            for p, bucket in list(self.evictable.items()):
                if bucket.pop(bid, None) is not None:
                    if not bucket:
                        del self.evictable[p]
                    break
        self.ref_count[bid] += 1

    def _unref_block(self, bid: int):
        self.ref_count[bid] -= 1
        assert self.ref_count[bid] >= 0
        if self.ref_count[bid] == 0:
            if self.block_hash[bid] is not None and self.enable_reuse:
                # keep contents, evict by (priority, LRU) later
                self.evictable.setdefault(
                    self.block_priority[bid],
                    collections.OrderedDict())[bid] = None
            else:
                self.free_blocks.append(bid)

    # ---- ops mirrored by the native backend ---------------------------------
    def num_free_blocks(self) -> int:
        return len(self.free_blocks) + self._n_evictable()

    def match_prefix(self, token_ids: List[int], cache_salt=None,
                     partial: bool = False) -> int:
        """Dry-run reuse lookup: cached prefix tokens, no side effects."""
        if not self.enable_reuse:
            return 0
        matched, parent = 0, 0
        n_full = (len(token_ids) - 1) // self.block_size
        for b in range(n_full):
            chunk = tuple(token_ids[b * self.block_size:(b + 1) * self.block_size])
            h = self._chain_hash(parent, chunk, cache_salt)
            if h not in self.cached_blocks:
                break
            matched += self.block_size
            parent = h
        if partial:
            k, _ = self._best_partial(parent, cache_salt, token_ids, matched)
            matched += k
        return matched

    def _best_partial(self, parent: int, salt, token_ids: List[int],
                      matched: int):
        """Longest shared token prefix of any cached child of `parent` with
        the request's next tokens (capped so >=1 token is recomputed).
        Returns (k, block_id)."""
        limit = min(self.block_size, len(token_ids) - 1 - matched)
        if limit < 1:
            return 0, -1
        cands = self.children.get((parent, salt))
        if not cands:
            return 0, -1
        target = token_ids[matched:matched + limit]
        best_k, best_bid = 0, -1
        for bid in cands:
            toks = self.block_tokens.get(bid)
            if toks is None:
                continue
            k = 0
            for x, y in zip(toks, target):
                if x != y:
                    break
                k += 1
            if k > best_k:
                best_k, best_bid = k, bid
        return best_k, best_bid

    def try_partial_match(self, seq_id: int, token_ids: List[int],
                          copy_on_partial: bool = True):
        """Partial tail-block reuse (reference enable_partial_reuse /
        copy_on_partial_reuse, kvCacheManager.cpp loadOrAllocateBlocks):
        after full-block matching, the cached child of the chain tail whose
        tokens share the longest prefix with the request's next tokens is
        reused for those head tokens.  With copy_on_partial the sequence
        gets a fresh block and the caller device-copies the source page
        into it; otherwise the source block itself is adopted in place
        (only when unreferenced) and leaves the reuse index.

        Returns (extra_tokens, src_block, dst_block); dst == src means no
        device copy is needed.  (0, -1, -1) when nothing matched."""
        if not self.enable_reuse:
            return (0, -1, -1)
        info = self.sequences[seq_id]
        bs = self.block_size
        if info.num_tokens % bs or \
                info.num_tokens != bs * len(info.block_ids) or \
                len(info.block_hashes) != len(info.block_ids):
            # the last guard: every owned block must be a hash-chain match
            # (host-onboarded blocks have no hashes — probing children of
            # an earlier node would reuse a block at the wrong position)
            return (0, -1, -1)
        parent = info.block_hashes[-1] if info.block_hashes else 0
        k, src = self._best_partial(parent, info.salt, token_ids,
                                    info.num_tokens)
        if k < 1:
            return (0, -1, -1)
        if not copy_on_partial:
            # in-place adoption: the source page will be partially
            # overwritten, so it must be unshared and leave the index
            if self.ref_count[src] != 0:
                return (0, -1, -1)
            self._ref_block(src)
            h = self.block_hash[src]
            if h is not None:
                self.cached_blocks.pop(h, None)
                self.block_hash[src] = None
            self._forget_block(src)
            self.num_allocated_blocks += 1
            dst = src
        else:
            self._ref_block(src)  # pin: _take_block may otherwise evict it
            try:
                dst = self._take_block()
            except RuntimeError:
                self._unref_block(src)
                return (0, -1, -1)
            self._unref_block(src)
        info.block_ids.append(dst)
        info.num_tokens += k
        self.num_partial_reused += 1
        return (k, src, dst)

    def add_sequence(self, seq_id: int, token_ids: List[int],
                     cache_salt=None) -> int:
        info = SequenceInfo()
        info.salt = cache_salt
        self.sequences[seq_id] = info
        matched_tokens = 0
        parent = 0
        if self.enable_reuse:
            n_full = (len(token_ids) - 1) // self.block_size  # keep last token
            for b in range(n_full):
                chunk = tuple(token_ids[b * self.block_size:(b + 1) * self.block_size])
                h = self._chain_hash(parent, chunk, cache_salt)
                bid = self.cached_blocks.get(h)
                if bid is None:
                    break
                self._ref_block(bid)
                info.block_ids.append(bid)
                info.block_hashes.append(h)
                matched_tokens += self.block_size
                parent = h
        info.num_tokens = matched_tokens
        if matched_tokens:
            self.num_reused_blocks += len(info.block_ids)
        return matched_tokens

    def grow_sequence(self, seq_id: int, new_total_tokens: int):
        info = self.sequences[seq_id]
        need = cdiv(new_total_tokens, self.block_size)
        while len(info.block_ids) < need:
            info.block_ids.append(self._take_block())
        info.num_tokens = new_total_tokens

    def num_seq_blocks(self, seq_id: int) -> int:
        info = self.sequences.get(seq_id)
        return -1 if info is None else len(info.block_ids)

    def seal_full_blocks(self, seq_id: int, token_ids: List[int]):
        if not self.enable_reuse:
            return
        info = self.sequences[seq_id]
        n_full = len(token_ids) // self.block_size
        parent = info.block_hashes[-1] if info.block_hashes else 0
        for b in range(len(info.block_hashes), n_full):
            bid = info.block_ids[b]
            chunk = tuple(token_ids[b * self.block_size:(b + 1) * self.block_size])
            h = self._chain_hash(parent, chunk, info.salt)
            # first writer wins; duplicates keep their private block
            if h not in self.cached_blocks:
                self.cached_blocks[h] = bid
                self.block_hash[bid] = h
                self.block_priority[bid] = info.priority
                self.block_tokens[bid] = chunk
                key = (parent, info.salt)
                self.block_parent[bid] = key
                self.children.setdefault(
                    key, collections.OrderedDict())[bid] = None
            info.block_hashes.append(h)
            parent = h

    def fork_sequence(self, src_id: int, dst_id: int):
        """Beam-search fork: share fully-written blocks by ref count,
        allocate fresh tail blocks. Returns [(src_block, dst_block)] pairs
        whose contents the caller must device-copy."""
        src = self.sequences[src_id]
        shared = min(max((src.num_tokens - 1) // self.block_size, 0),
                     len(src.block_ids))
        if len(src.block_ids) - shared > self.num_free_blocks():
            raise RuntimeError("KV cache out of blocks")
        dst = SequenceInfo()
        dst.num_tokens = src.num_tokens
        dst.salt = src.salt
        dst.priority = src.priority
        pairs = []
        for bid in src.block_ids[:shared]:
            self._ref_block(bid)
            dst.block_ids.append(bid)
        for bid in src.block_ids[shared:]:
            nb = self._take_block()
            dst.block_ids.append(nb)
            pairs.append((bid, nb))
        self.sequences[dst_id] = dst
        return pairs

    def free_sequence(self, seq_id: int):
        info = self.sequences.pop(seq_id, None)
        if info is None:
            return
        for bid in info.block_ids:
            self._unref_block(bid)

    def block_table(self, seq_id: int, max_blocks: int) -> List[int]:
        ids = self.sequences[seq_id].block_ids[:max_blocks]
        return ids + [0] * (max_blocks - len(ids))

    def slot_mapping(self, seq_id: int, start_token: int,
                     num_tokens: int) -> List[int]:
        info = self.sequences[seq_id]
        bs = self.block_size
        out = []
        for pos in range(start_token, start_token + num_tokens):
            out.append(info.block_ids[pos // bs] * bs + pos % bs)
        return out

    def stats(self) -> dict:
        return {
            "free_blocks": len(self.free_blocks),
            "evictable_blocks": self._n_evictable(),
            "reused_blocks": self.num_reused_blocks,
            "partial_reused_blocks": self.num_partial_reused,
            "allocated_blocks": self.num_allocated_blocks,
            "evicted_blocks": self.num_evicted_blocks,
            "active_sequences": len(self.sequences),
        }


class _NativeBookkeeping:
    """ctypes wrapper over native/kv_bookkeeping.cc (same op surface)."""

    def __init__(self, lib, num_blocks: int, block_size: int,
                 enable_reuse: bool):
        import ctypes

        self._ct = ctypes
        self._lib = lib
        self.block_size = block_size
        self._h = lib.tllm_kvbm_create(num_blocks, block_size,
                                       1 if enable_reuse else 0)

    def __del__(self):
        try:
            self._lib.tllm_kvbm_destroy(self._h)
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    def _tok_buf(self, token_ids):
        import numpy as np
        arr = np.asarray(token_ids, dtype=np.int32)
        return arr, arr.ctypes.data_as(self._ct.POINTER(self._ct.c_int32))

    def num_free_blocks(self) -> int:
        return int(self._lib.tllm_kvbm_num_free(self._h))

    def set_seq_priority(self, seq_id: int, priority: int):
        self._lib.tllm_kvbm_set_priority(self._h, seq_id, int(priority))

    def drain_evictions(self) -> List[int]:
        import numpy as np
        out: List[int] = []
        buf = np.zeros(256, np.int32)
        ptr = buf.ctypes.data_as(self._ct.POINTER(self._ct.c_int32))
        while True:
            n = int(self._lib.tllm_kvbm_drain_evictions(self._h, ptr, 256))
            out.extend(buf[:n].tolist())
            if n < 256:
                return out

    def match_prefix(self, token_ids, cache_salt=None,
                     partial: bool = False) -> int:
        _keep, ptr = self._tok_buf(token_ids)
        salt = 0 if cache_salt is None else hash(cache_salt) & (2**64 - 1)
        fn = (self._lib.tllm_kvbm_match_partial if partial
              else self._lib.tllm_kvbm_match)
        return int(fn(self._h, ptr, len(token_ids), salt,
                      0 if cache_salt is None else 1))

    def try_partial_match(self, seq_id: int, token_ids,
                          copy_on_partial: bool = True):
        _keep, ptr = self._tok_buf(token_ids)
        out = (self._ct.c_int64 * 3)()
        self._lib.tllm_kvbm_partial_match(
            self._h, seq_id, ptr, len(token_ids),
            1 if copy_on_partial else 0, out)
        return (int(out[0]), int(out[1]), int(out[2]))

    def add_sequence(self, seq_id: int, token_ids, cache_salt=None) -> int:
        _keep, ptr = self._tok_buf(token_ids)
        salt = 0 if cache_salt is None else hash(cache_salt) & (2**64 - 1)
        return int(self._lib.tllm_kvbm_add_sequence(
            self._h, seq_id, ptr, len(token_ids), salt,
            0 if cache_salt is None else 1))

    def grow_sequence(self, seq_id: int, new_total_tokens: int):
        rc = self._lib.tllm_kvbm_grow(self._h, seq_id, new_total_tokens)
        if rc == -2:
            raise KeyError(seq_id)   # unknown/freed id — match _PyBookkeeping
        if rc != 0:
            raise RuntimeError("KV cache out of blocks")

    def num_seq_blocks(self, seq_id: int) -> int:
        return int(self._lib.tllm_kvbm_seq_num_blocks(self._h, seq_id))

    def seal_full_blocks(self, seq_id: int, token_ids):
        _keep, ptr = self._tok_buf(token_ids)
        self._lib.tllm_kvbm_seal(self._h, seq_id, ptr, len(token_ids))

    def fork_sequence(self, src_id: int, dst_id: int):
        import numpy as np
        max_pairs = 64
        src_b = np.zeros(max_pairs, np.int32)
        dst_b = np.zeros(max_pairs, np.int32)
        pi32 = self._ct.POINTER(self._ct.c_int32)
        n = self._lib.tllm_kvbm_fork(
            self._h, src_id, dst_id,
            src_b.ctypes.data_as(pi32), dst_b.ctypes.data_as(pi32), max_pairs)
        if n < 0:
            raise RuntimeError("KV cache out of blocks (fork)")
        return list(zip(src_b[:n].tolist(), dst_b[:n].tolist()))

    def free_sequence(self, seq_id: int):
        self._lib.tllm_kvbm_free_seq(self._h, seq_id)

    def block_table(self, seq_id: int, max_blocks: int) -> List[int]:
        import numpy as np
        out = np.zeros(max_blocks, np.int32)
        self._lib.tllm_kvbm_block_table(
            self._h, seq_id,
            out.ctypes.data_as(self._ct.POINTER(self._ct.c_int32)), max_blocks)
        return out.tolist()

    def slot_mapping(self, seq_id: int, start_token: int,
                     num_tokens: int) -> List[int]:
        import numpy as np
        out = np.zeros(num_tokens, np.int32)
        rc = self._lib.tllm_kvbm_slot_mapping(
            self._h, seq_id, start_token, num_tokens,
            out.ctypes.data_as(self._ct.POINTER(self._ct.c_int32)))
        if rc != 0:
            raise IndexError("slot_mapping past allocated blocks")
        return out.tolist()

    def stats(self) -> dict:
        out = (self._ct.c_int64 * 8)()
        self._lib.tllm_kvbm_stats(self._h, out)
        return {
            "free_blocks": int(out[0]),
            "evictable_blocks": int(out[1]),
            "reused_blocks": int(out[2]),
            "partial_reused_blocks": int(out[7]),
            "allocated_blocks": int(out[3]),
            "evicted_blocks": int(out[4]),
            "active_sequences": int(out[5]),
        }


def _make_bookkeeping(num_blocks: int, block_size: int, enable_reuse: bool,
                      backend: str = "auto"):
    """backend: "auto" (native if buildable), "native", or "python"."""
    backend = os.environ.get("TLLM_KV_BOOKKEEPING", backend)
    if backend != "python":
        from tensorrt_llm_tpu.native import load_native
        lib = load_native()
        if lib is not None:
            return _NativeBookkeeping(lib, num_blocks, block_size, enable_reuse)
        if backend == "native":
            raise RuntimeError("native KV bookkeeping requested but the "
                               "extension could not be built")
        logger.info("using pure-Python KV bookkeeping")
    return _PyBookkeeping(num_blocks, block_size, enable_reuse)


class SlotManager:
    """Fixed sequence slots for slot-addressed state (SSM conv/ssm pools) —
    reference `SlotManager` (resource_manager.py:1300) / seq_slot_manager."""

    def __init__(self, max_slots: int):
        self.max_slots = max_slots
        self._free = list(range(max_slots - 1, -1, -1))
        self._of: Dict[int, int] = {}

    @property
    def in_use(self) -> bool:
        return bool(self._of)

    def add(self, seq_id: int) -> int:
        if seq_id in self._of:
            return self._of[seq_id]
        if not self._free:
            raise RuntimeError("out of sequence slots (max_slots="
                               f"{self.max_slots})")
        slot = self._free.pop()
        self._of[seq_id] = slot
        return slot

    def release(self, seq_id: int):
        slot = self._of.pop(seq_id, None)
        if slot is not None:
            self._free.append(slot)

    def get(self, seq_id: int) -> int:
        return self._of.get(seq_id, -1)


class KVCacheManager:
    def __init__(self, cfg: KVCacheConfig, num_layers: int,
                 num_kv_heads: int, head_dim: int,
                 num_blocks: int, bookkeeping: str = "auto",
                 max_slots: int = 256):
        """num_kv_heads is the GLOBAL head count — under TP the engine shards
        the pools over the "tp" mesh axis (each device holds its heads)."""
        self.cfg = cfg
        self.block_size = cfg.block_size
        self.num_layers = num_layers
        self.num_blocks = num_blocks
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.slots = SlotManager(max_slots)
        self._bk = _make_bookkeeping(num_blocks, cfg.block_size,
                                     cfg.enable_block_reuse, bookkeeping)
        # VSWA (reference per-window WindowBlockManager, kvCacheManager.h:600):
        # sliding layers get their own smaller pools, addressed as fixed
        # per-sequence cyclic rings (no dynamic bookkeeping needed)
        self.vswa_window: Optional[int] = None
        self.ring_blocks = 0
        self.ring_slots = 0
        self.sliding_layers: set = set()
        self._ring: Optional[SlotManager] = None
        # KV-cache event stream (reference kvCacheEventManager.cpp feeding
        # the /kv_cache_events route): "stored" events carry cross-process-
        # comparable chain hashes of published full blocks.  Bounded ring;
        # consumers page with event ids.
        self.events: collections.deque = collections.deque(maxlen=4096)
        self._next_event_id = 0
        self._event_hashes: Dict[int, List[int]] = {}  # seq -> chain hashes
        # ---- secondary host tier (reference BlockManager secondary pool +
        # kvCacheTransferManager onboard/offload).  The host cache maps the
        # wrapper-level salted chain hash of a full block to its extracted
        # page contents (one pytree of np arrays per layer); device<->host
        # copies ride the engine's disagg extract/inject machinery.
        self.host_cache: "collections.OrderedDict[int, list]" = \
            collections.OrderedDict()
        self._extract_fn = None
        self._inject_fn = None
        self._block_whash: Dict[int, int] = {}   # bid -> content chain hash
        self._whash_refs: Dict[int, int] = {}    # hash -> device block count
        self._block_prio: Dict[int, int] = {}    # bid -> retention priority
        self._seq_prio: Dict[int, int] = {}
        self._seq_whash: Dict[int, List[int]] = {}
        self._seq_salt: Dict[int, object] = {}
        # pending (src, dst) page copies from copy-on-partial-reuse, drained
        # by the executor right after admission (before the prefill step)
        self._partial_copies: Dict[int, List[tuple]] = {}
        self.num_offloaded = 0
        self.num_onboarded = 0
        self.num_connector_saves = 0
        self.num_connector_loads = 0

    @property
    def is_native(self) -> bool:
        return isinstance(self._bk, _NativeBookkeeping)

    # ------------------------------------------------------------------ VSWA ----
    def configure_vswa(self, window: int, ring_blocks: int, ring_slots: int,
                       sliding_layers):
        """Separate per-window pools for sliding-window layers.

        Each active sequence owns a fixed ring of ``ring_blocks`` blocks in
        the (smaller) local pool, addressed purely by its ring slot: block
        table of ring slot s is [s*R, .., s*R+R-1] and position p writes ring
        offset ``p % (R*block_size)`` — cyclic KV like the reference's
        per-window cyclic cache, but with zero host bookkeeping."""
        self.vswa_window = window
        self.ring_blocks = ring_blocks
        self.ring_slots = ring_slots
        self.sliding_layers = set(sliding_layers)
        self._ring = SlotManager(ring_slots)
        if self.cfg.enable_block_reuse:
            # prefix reuse would skip recomputing cached tokens, but a new
            # sequence's ring holds none of their sliding-layer KV — reuse
            # and per-sequence rings are incompatible (the reference also
            # runs VSWA without block reuse)
            assert not self._seq_salt and not self.slots.in_use, \
                "configure_vswa before any sequence"
            self._bk = _make_bookkeeping(
                self.num_blocks, self.block_size, False,
                "native" if self.is_native else "python")
            # keep the CONFIG consistent with the rebuilt backend: the
            # wrapper's seal path (whash bookkeeping + "stored" events)
            # gates on this flag, and leaving it set would advertise
            # phantom reusable prefixes to the KV-aware router
            import dataclasses as _dc
            self.cfg = _dc.replace(self.cfg, enable_block_reuse=False)

    @property
    def vswa(self) -> bool:
        return self.vswa_window is not None

    @property
    def ring_capacity(self) -> int:
        """Tokens held per sequence in a sliding-layer ring."""
        return self.ring_blocks * self.block_size

    def can_admit_new(self) -> bool:
        """Room for a brand-new sequence (ring slots are the VSWA limit)."""
        return self._ring is None or bool(self._ring._free)

    def local_num_blocks(self) -> int:
        # +1: ring block 0 is reserved (like the main allocator's block 0)
        # so PAD_SLOT writes can remap there — see ops/attention_xla.py
        # _scatter_pages; slabs start at block 1 (local_block_table)
        return self.ring_slots * self.ring_blocks + 1

    def ring_slot_of(self, seq_id: int) -> int:
        return -1 if self._ring is None else self._ring.get(seq_id)

    def local_block_table(self, seq_id: int) -> List[int]:
        s = self._ring.get(seq_id)
        if s < 0:
            return [0] * self.ring_blocks
        return list(range(1 + s * self.ring_blocks,
                          1 + (s + 1) * self.ring_blocks))

    def local_slot_mapping(self, seq_id: int, start_token: int,
                           num_tokens: int, pad_slot: int,
                           dedup: bool = True) -> List[int]:
        """Cyclic flat slots for positions [start, start+n); when several
        positions of one chunk land on the same ring offset, only the LAST
        write survives (earlier ones map to the pad slot and drop).  Pass
        dedup=False for sequential per-step writes (fused multi-step decode
        applies one slot per scan step, so later steps overwrite anyway)."""
        s = self._ring.get(seq_id)
        P = self.ring_capacity
        if s < 0:
            return [pad_slot] * num_tokens
        base = self.block_size + s * P   # slabs start at block 1
        if not dedup:
            return [base + (start_token + i) % P for i in range(num_tokens)]
        out = [pad_slot] * num_tokens
        seen = set()
        for i in range(num_tokens - 1, -1, -1):
            off = (start_token + i) % P
            if off not in seen:
                seen.add(off)
                out[i] = base + off
        return out

    def ring_fork_pairs(self, src_id: int, dst_id: int) -> List[tuple]:
        """Block copies needed to fork the sliding-layer rings (beams)."""
        if self._ring is None:
            return []
        self._ring.add(dst_id)
        s, d = self._ring.get(src_id), self._ring.get(dst_id)
        R = self.ring_blocks
        return [(1 + s * R + i, 1 + d * R + i) for i in range(R)]

    # ------------------------------------------------------------------ pools --
    def allocate_pools(self, dtype=None) -> List[Tuple[jax.Array, jax.Array]]:
        """Create device pools (call under the target mesh/sharding ctx).

        Layout is head-major pages ``[NB, Hkv, BS, D]``: one page is a
        contiguous HBM chunk and each head's slice of a page is a contiguous
        ``[BS, D]`` tile — what the Pallas paged-attention kernel DMAs.

        Head dims below the 128-lane tile store LANE-PACKED:
        ``[NB, Hkv, BS*D//128, 128]`` with r = 128//D consecutive tokens per
        lane row (row-major element order identical to the logical layout).
        Without this, XLA pads the D lanes to 128 (2x HBM for D=64 — the
        TinyLlama/GPT-OSS r3 e2e OOMs) and the Pallas kernels' packed page
        view costs a full-pool relayout copy per step.  Consumers detect
        packing by ``pool.shape[-1] != head_dim``.
        """
        dtype = dtype or self.cfg.dtype

        def nb_for(layer: int) -> int:
            # VSWA: sliding layers use the (smaller) ring pool
            if self.vswa and layer in self.sliding_layers:
                return self.local_num_blocks()
            return self.num_blocks

        D, BS = self.head_dim, self.block_size
        pack = (D < 128 and 128 % D == 0 and (BS * D) % 128 == 0
                and self.cfg.layout != "latent")

        def pool(layer: int):
            if pack:
                shape = (nb_for(layer), self.num_kv_heads,
                         BS * D // 128, 128)
            else:
                shape = (nb_for(layer), self.num_kv_heads, BS, D)
            if self.cfg.layout == "latent":
                # MLA: one latent pool per layer (no separate V); quantized
                # latent caches are a later round
                if self.cfg.dsa_index_dim:
                    return (jnp.zeros(shape, dtype),
                            jnp.zeros((shape[0], 1, self.block_size,
                                       self.cfg.dsa_index_dim), dtype))
                return jnp.zeros(shape, dtype)
            if self.cfg.kv_quant == KvCacheQuantAlgo.INT8:
                # int8 data + per-(token, head) scale pools (reference
                # KvCacheDataType::INT8); halves KV HBM footprint + gather
                # traffic.  Scales stay logical [NB, Hkv, BS] even when the
                # data pool is lane-packed.
                sshape = (shape[0], self.num_kv_heads, BS)
                return (
                    (jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32)),
                    (jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32)),
                )
            if self.cfg.kv_quant == KvCacheQuantAlgo.FP8:
                # fp8 e4m3 data pools, no scales (reference KvCacheDataType::
                # FP8 with unit scale — e4m3's dynamic range covers bf16 KV
                # values post-RMSNorm); halves KV HBM footprint like INT8 but
                # dequant is a pure dtype convert
                return (jnp.zeros(shape, jnp.float8_e4m3fn),
                        jnp.zeros(shape, jnp.float8_e4m3fn))
            if self.cfg.sparse_kt and not (
                    self.vswa and layer in self.sliding_layers):
                # RocketKV-style per-page key summaries (3rd cache leaf)
                return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                        jnp.zeros((shape[0], shape[1], D), dtype))
            return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

        return [pool(i) for i in range(self.num_layers)]

    @staticmethod
    def blocks_from_memory(bytes_budget: int, num_layers: int,
                           num_kv_heads: int, head_dim: int,
                           block_size: int, dtype_bytes: int = 2,
                           num_pools: int = 2,
                           extra_dims: int = 0,
                           scale_pools: bool = False) -> int:
        """num_pools: 2 for K+V layouts, 1 for the MLA latent layout.
        extra_dims: additional per-token per-layer channels in side pools
        (DSA indexer keys, sparse-KT summaries — without this the derived
        block count overcommits HBM and pool allocation OOMs).
        scale_pools: INT8/FP8 KV adds a f32 scale per (token, head, pool)."""
        per_block = (num_pools * num_layers * block_size * num_kv_heads
                     * head_dim * dtype_bytes)
        per_block += num_layers * block_size * extra_dims * dtype_bytes
        if scale_pools:
            per_block += num_pools * num_layers * block_size * num_kv_heads * 4
        return max(int(bytes_budget // per_block), 16)

    # ------------------------------------------------------------------ queries --
    @property
    def num_free_blocks(self) -> int:
        """Blocks available right now (free list + evictable cached)."""
        return self._bk.num_free_blocks()

    def blocks_needed(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.block_size)

    def num_seq_blocks(self, seq_id: int) -> int:
        """Blocks currently owned by seq_id (0 if unknown)."""
        n = self._bk.num_seq_blocks(seq_id)
        return 0 if n < 0 else n

    def has_sequence(self, seq_id: int) -> bool:
        return self._bk.num_seq_blocks(seq_id) >= 0

    # ------------------------------------------------------------ host tier ----
    @property
    def host_tier_enabled(self) -> bool:
        return ((self.cfg.host_cache_blocks > 0
                 or self.cfg.kv_connector is not None)
                and self.cfg.enable_block_reuse and not self.vswa
                and self._extract_fn is not None)

    def attach_block_io(self, extract_fn, inject_fn):
        """Hook the engine's page copy machinery (extract_kv_blocks /
        inject_kv_blocks) so evicted reuse blocks can offload to host RAM
        and onboard back — same transfer plane as disaggregated serving."""
        self._extract_fn = extract_fn
        self._inject_fn = inject_fn

    @staticmethod
    def _whash(parent: int, chunk: tuple, salt) -> int:
        """Process-STABLE content chain hash (FNV-1a over ints): host-tier
        and connector keys survive restarts and match across processes
        (unlike Python's seeded hash())."""
        h = _stable_mix(0xCBF29CE484222325, parent)
        for t in chunk:
            h = _stable_mix(h, int(t))
        if salt is not None:
            import hashlib
            d = hashlib.sha256(repr(salt).encode()).digest()
            h = _stable_mix(h, int.from_bytes(d[:8], "little"))
        return h

    def _whash_set(self, bid: int, wh: int):
        old = self._block_whash.get(bid)
        if old == wh:
            return
        if old is not None:
            self._whash_refs[old] = self._whash_refs.get(old, 1) - 1
            if self._whash_refs[old] <= 0:
                del self._whash_refs[old]
        self._block_whash[bid] = wh
        self._whash_refs[wh] = self._whash_refs.get(wh, 0) + 1

    def _whash_pop(self, bid: int):
        """Drop bid's hash mapping; returns the hash if that was the LAST
        device block carrying this content (None otherwise)."""
        wh = self._block_whash.pop(bid, None)
        if wh is None:
            return None
        left = self._whash_refs.get(wh, 1) - 1
        if left <= 0:
            self._whash_refs.pop(wh, None)
            return wh
        self._whash_refs[wh] = left
        return None

    def _emit_removed(self, wh: int):
        """'removed' KV event: the block left every matchable tier, so
        event-fed router views must drop it (reference
        kvCacheEventManager.cpp removed events feeding serve/router.py:76)."""
        self.events.append({"id": self._next_event_id, "type": "removed",
                            "block_hash": wh})
        self._next_event_id += 1

    def _drain_offloads(self):
        """Offload reuse blocks evicted by the last backend op to the host
        tier — called before any new device write can overwrite them."""
        bids = self._bk.drain_evictions()
        if not bids:
            return
        enabled = self.host_tier_enabled
        min_p = self.cfg.secondary_offload_min_priority
        conn = self.cfg.kv_connector
        for bid in bids:
            wh = self._whash_pop(bid)  # None if other device copies remain
            prio = self._block_prio.pop(bid, DEFAULT_RETENTION_PRIORITY)
            if wh is not None and not enabled:
                self._emit_removed(wh)
            if not enabled or wh is None:
                continue
            # the priority gate applies to the HOST RAM tier only
            # (reference secondary_offload_min_priority); the connector is
            # the coldest tier and receives everything leaving the device
            host_ok = (self.cfg.host_cache_blocks > 0
                       and (min_p is None or prio >= min_p))
            if host_ok and wh in self.host_cache:
                self.host_cache.move_to_end(wh)
                continue
            need_save = conn is not None
            if not host_ok and not need_save:
                self._emit_removed(wh)
                continue
            payload = self._extract_fn([bid])
            if need_save:
                # an external store failure must never kill the serving loop
                try:
                    conn.save(wh, payload)
                    self.num_connector_saves += 1
                except Exception as e:  # noqa: BLE001
                    logger.warning("kv connector save failed: %s", e)
            if host_ok:
                self.host_cache[wh] = payload
                self.num_offloaded += 1
                while len(self.host_cache) > self.cfg.host_cache_blocks:
                    old_wh, _ = self.host_cache.popitem(last=False)
                    # still in the connector (durable) or on device
                    # (duplicate content) => still matchable: no event
                    if conn is None and old_wh not in self._whash_refs:
                        self._emit_removed(old_wh)

    def set_seq_priority(self, seq_id: int, priority: int):
        """Retention priority for blocks this sequence stores for reuse
        (reference KvCacheRetentionConfig, executor.h:559): lower evicts
        first."""
        self._bk.set_seq_priority(seq_id, priority)
        self._seq_prio[seq_id] = int(priority)

    # ------------------------------------------------------------------ ops -----
    def add_sequence(self, seq_id: int, token_ids: List[int],
                     cache_salt=None) -> int:
        """Register a sequence; match reusable prefix blocks.

        Returns the number of *tokens* whose KV is already cached (multiple of
        block_size, and strictly less than len(token_ids) so at least one
        token is recomputed to produce logits — same rule as the reference's
        partial-reuse guard).  After the device-tier match the host tier is
        probed: consecutive host-cached blocks are onboarded (allocated on
        device + page-injected), extending the match like the reference's
        secondary-pool onboarding.
        """
        self.slots.add(seq_id)
        if self._ring is not None:
            self._ring.add(seq_id)
        matched = self._bk.add_sequence(seq_id, token_ids, cache_salt)
        matched_dev = matched   # device-tier full-block matches only
        bs = self.block_size
        self._seq_salt[seq_id] = cache_salt
        whs: List[int] = []
        parent = 0
        for b in range(matched // bs):
            parent = self._whash(
                parent, tuple(token_ids[b * bs:(b + 1) * bs]), cache_salt)
            whs.append(parent)
        self._seq_whash[seq_id] = whs
        conn = self.cfg.kv_connector
        if self.host_tier_enabled and (self.host_cache or conn is not None):
            n_full = (len(token_ids) - 1) // bs  # last token recomputed
            b = matched // bs
            while b < n_full:
                chunk = tuple(token_ids[b * bs:(b + 1) * bs])
                wh = self._whash(parent, chunk, cache_salt)
                payload = self.host_cache.get(wh)
                if payload is None and conn is not None:
                    try:
                        payload = conn.load(wh)
                    except Exception as e:  # noqa: BLE001
                        logger.warning("kv connector load failed: %s", e)
                        payload = None
                    if payload is not None:
                        self.num_connector_loads += 1
                if payload is None:
                    break
                try:
                    self._bk.grow_sequence(seq_id, (b + 1) * bs)
                except RuntimeError:
                    break  # device pool exhausted: stop onboarding
                # offload anything that grow just evicted BEFORE injecting
                # (the freed block may be the one we are about to write)
                self._drain_offloads()
                bid = self._bk.block_table(seq_id, b + 1)[b]
                self._inject_fn([bid], payload)
                if wh in self.host_cache:
                    self.host_cache.move_to_end(wh)
                self._whash_set(bid, wh)
                self._block_prio[bid] = self._seq_prio.get(
                    seq_id, DEFAULT_RETENTION_PRIORITY)
                self.num_onboarded += 1
                whs.append(wh)
                parent = wh
                matched = (b + 1) * bs
                b += 1
        # Partial tail-block reuse applies only when the chain tip is a
        # DEVICE-matched block: host/connector onboarding extends
        # block_ids without extending the hash chain, so the bookkeeping's
        # parent would be stale and would probe children at the wrong
        # position (the backends also guard on this invariant).
        if self.cfg.enable_partial_reuse and matched % bs == 0 \
                and matched == matched_dev:
            k, src, dst = self._bk.try_partial_match(
                seq_id, token_ids, self.cfg.copy_on_partial_reuse)
            if k:
                matched += k
                if dst != src:
                    self._partial_copies.setdefault(
                        seq_id, []).append((src, dst))
                # the dst block may have been evicted from the reuse index
                # to serve this allocation: offload its ORIGINAL contents
                # to the host tier before the executor's page copy
                # overwrites them
                self._drain_offloads()
        return matched

    def drain_partial_copies(self, seq_id: int) -> List[tuple]:
        """(src, dst) block pairs whose pages the engine must device-copy
        before the sequence's first prefill chunk (copy-on-partial-reuse)."""
        return self._partial_copies.pop(seq_id, [])

    def grow_sequence(self, seq_id: int, new_total_tokens: int):
        """Ensure the sequence owns enough blocks for new_total_tokens."""
        self._bk.grow_sequence(seq_id, new_total_tokens)
        self._drain_offloads()

    def can_grow(self, seq_id: int, new_total_tokens: int) -> bool:
        need = self.blocks_needed(new_total_tokens) - self.num_seq_blocks(seq_id)
        return need <= self.num_free_blocks

    def seal_full_blocks(self, seq_id: int, token_ids: List[int]):
        """Publish completed blocks into the reuse index (called as the
        sequence crosses block boundaries)."""
        self._bk.seal_full_blocks(seq_id, token_ids)
        if not self.cfg.enable_block_reuse:
            return
        # record each block's content hash for host-tier offload identity
        bs = self.block_size
        whs = self._seq_whash.setdefault(seq_id, [])
        n_full = len(token_ids) // bs
        if len(whs) < n_full:
            salt = self._seq_salt.get(seq_id)
            table = self._bk.block_table(seq_id, n_full)
            parent = whs[-1] if whs else 0
            for b in range(len(whs), n_full):
                chunk = tuple(token_ids[b * bs:(b + 1) * bs])
                parent = self._whash(parent, chunk, salt)
                whs.append(parent)
                self._whash_set(table[b], parent)
                self._block_prio[table[b]] = self._seq_prio.get(
                    seq_id, DEFAULT_RETENTION_PRIORITY)
        # emit "stored" events with the SALTED stable chain hash: the event
        # hash must describe the same identity the reuse index matches on
        # (a salt-isolated block advertised under the unsalted hash would
        # mislead event-fed routers), and _whash is process-stable
        salt = self._seq_salt.get(seq_id)
        hashes = self._event_hashes.setdefault(seq_id, [])
        n_full = len(token_ids) // self.block_size
        parent = hashes[-1] if hashes else 0
        for b in range(len(hashes), n_full):
            chunk = tuple(token_ids[b * self.block_size:(b + 1) * self.block_size])
            h = self._whash(parent, chunk, salt)
            self.events.append({"id": self._next_event_id, "type": "stored",
                                "block_hash": h, "parent_hash": parent})
            self._next_event_id += 1
            hashes.append(h)
            parent = h

    def match_prefix(self, token_ids: List[int], cache_salt=None) -> int:
        """Cached prefix length (tokens) for a prospective prompt — a
        side-effect-free reuse-index lookup backing the KV-aware router.
        Counts both tiers (host blocks would onboard on admission)."""
        matched_full = self._bk.match_prefix(token_ids, cache_salt)
        matched = matched_full
        conn = self.cfg.kv_connector
        if self.host_tier_enabled and (self.host_cache or conn is not None):
            bs = self.block_size
            parent = 0
            for b in range(matched // bs):
                parent = self._whash(
                    parent, tuple(token_ids[b * bs:(b + 1) * bs]), cache_salt)
            n_full = (len(token_ids) - 1) // bs
            b = matched // bs
            while b < n_full:
                chunk = tuple(token_ids[b * bs:(b + 1) * bs])
                wh = self._whash(parent, chunk, cache_salt)
                in_conn = False
                if wh not in self.host_cache and conn is not None:
                    try:
                        in_conn = conn.contains(wh)
                    except Exception:  # noqa: BLE001 — dry-run score only
                        in_conn = False
                if wh not in self.host_cache and not in_conn:
                    break
                matched += bs
                parent = wh
                b += 1
        if self.cfg.enable_partial_reuse and matched == matched_full:
            # partial tail-block overlap extends the device-tier score
            # (side-effect-free); skipped when host tiers extended past it
            matched = max(matched, self._bk.match_prefix(
                token_ids, cache_salt, partial=True))
        return matched

    def get_events(self, since_id: int = 0) -> List[dict]:
        """Events with id >= since_id (bounded history)."""
        return [e for e in self.events if e["id"] >= since_id]

    def event_cursor(self):
        """(next_since_id, oldest_retained_id) — explicit wire cursors so
        routers never infer gaps from id contiguity (which breaks under
        the DP manager's id namespacing, ADVICE r4).  A client whose
        cursor is below oldest_retained_id missed ring-trimmed events and
        must resync with ?full=1."""
        oldest = self.events[0]["id"] if self.events else self._next_event_id
        return self._next_event_id, oldest

    def reuse_block_hashes(self) -> List[int]:
        """Every currently matchable block chain hash (device + host
        tiers) — the full-snapshot resync for event-fed router views
        whose cursor fell behind the bounded event history."""
        out = list(self._whash_refs)
        out.extend(h for h in self.host_cache if h not in self._whash_refs)
        return out

    def fork_sequence(self, src_id: int, dst_id: int):
        """Fork dst from src (beam search): share immutable blocks, allocate
        private tail blocks. Returns (src_block, dst_block) pairs that the
        engine must copy on device (reference: KV block sharing for beams,
        kvCacheManager.h GenerationRequest per-beam block tables)."""
        self.slots.add(dst_id)
        pairs = self._bk.fork_sequence(src_id, dst_id)
        # wrapper-level identity rides along (both backends copy salt and
        # priority into the forked SeqInfo): a later seal on the fork must
        # hash under the SOURCE's salt, not recompute unsalted from root
        self._seq_salt[dst_id] = self._seq_salt.get(src_id)
        if src_id in self._seq_prio:
            self._seq_prio[dst_id] = self._seq_prio[src_id]
        self._seq_whash[dst_id] = list(self._seq_whash.get(src_id, []))
        self._event_hashes[dst_id] = list(
            self._event_hashes.get(src_id, []))
        self._drain_offloads()
        return pairs

    def free_sequence(self, seq_id: int):
        self.slots.release(seq_id)
        if self._ring is not None:
            self._ring.release(seq_id)
        self._event_hashes.pop(seq_id, None)
        self._seq_whash.pop(seq_id, None)
        self._seq_salt.pop(seq_id, None)
        self._seq_prio.pop(seq_id, None)
        self._partial_copies.pop(seq_id, None)
        self._bk.free_sequence(seq_id)

    # ------------------------------------------------------------------ tables --
    def block_table(self, seq_id: int, max_blocks: int) -> List[int]:
        return self._bk.block_table(seq_id, max_blocks)

    def slot_mapping(self, seq_id: int, start_token: int,
                     num_tokens: int) -> List[int]:
        """Flat slots (block_id*block_size + offset) for token positions
        [start_token, start_token+num_tokens)."""
        return self._bk.slot_mapping(seq_id, start_token, num_tokens)

    def slot_of(self, seq_id: int) -> int:
        """Fixed per-sequence slot for slot-addressed state pools."""
        return self.slots.get(seq_id)

    def stats(self) -> dict:
        s = self._bk.stats()
        s["num_blocks"] = self.num_blocks
        s["host_cached_blocks"] = len(self.host_cache)
        s["offloaded_blocks"] = self.num_offloaded
        s["onboarded_blocks"] = self.num_onboarded
        if self.cfg.kv_connector is not None:
            s["connector_saves"] = self.num_connector_saves
            s["connector_loads"] = self.num_connector_loads
        return s


class DpKVCacheManager:
    """Attention-DP facade: one KVCacheManager per dp rank, requests
    assigned to the least-loaded rank at admission (the reference's ADP
    balancing, executor_request_queue.py:370-426).  Block ids are
    rank-LOCAL — the engine shards the pools' block axis over "dp", so each
    rank's shard_map slice indexes its own manager's ids directly."""

    def __init__(self, cfg: KVCacheConfig, num_layers: int,
                 num_kv_heads: int, head_dim: int,
                 num_blocks_per_rank: int, dp_size: int,
                 max_slots: int = 256):
        self.cfg = cfg
        self.block_size = cfg.block_size
        self.num_layers = num_layers
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.dp_size = dp_size
        self.num_blocks = num_blocks_per_rank  # per-rank (local ids)
        self.ranks = [KVCacheManager(cfg, num_layers, num_kv_heads, head_dim,
                                     num_blocks_per_rank,
                                     max_slots=max_slots)
                      for _ in range(dp_size)]
        self._rank_of: Dict[int, int] = {}

    # ---- placement -------------------------------------------------------------
    def rank_of(self, seq_id: int) -> int:
        return self._rank_of.get(seq_id, 0)

    def add_sequence(self, seq_id: int, token_ids, cache_salt=None) -> int:
        # count-balanced placement (free blocks break ties): keeps every
        # rank's active count <= ceil(total/dp), so decode batches always
        # fit their per-rank row band (model_engine prepare_decode_inputs)
        counts = collections.Counter(self._rank_of.values())
        r = min(range(self.dp_size),
                key=lambda i: (counts.get(i, 0),
                               -self.ranks[i].num_free_blocks))
        self._rank_of[seq_id] = r
        return self.ranks[r].add_sequence(seq_id, token_ids, cache_salt)

    def free_sequence(self, seq_id: int):
        r = self._rank_of.pop(seq_id, None)
        if r is not None:
            self.ranks[r].free_sequence(seq_id)

    # ---- routed per-sequence ops -------------------------------------------------
    def _r(self, seq_id):
        return self.ranks[self._rank_of[seq_id]]

    def grow_sequence(self, seq_id, n):
        self._r(seq_id).grow_sequence(seq_id, n)

    def set_seq_priority(self, seq_id, priority):
        self._r(seq_id).set_seq_priority(seq_id, priority)

    def drain_partial_copies(self, seq_id):
        return self._r(seq_id).drain_partial_copies(seq_id)

    def can_grow(self, seq_id, n):
        return self._r(seq_id).can_grow(seq_id, n)

    def seal_full_blocks(self, seq_id, toks):
        self._r(seq_id).seal_full_blocks(seq_id, toks)

    def match_prefix(self, token_ids, cache_salt=None) -> int:
        return max(r.match_prefix(token_ids, cache_salt) for r in self.ranks)

    def get_events(self, since_id: int = 0):
        # per-rank local ids collide across ranks; namespace them as
        # id*R + rank so a single cursor (max id + 1) pages correctly
        R = len(self.ranks)
        evs = []
        for i, r in enumerate(self.ranks):
            local_since = max(0, (since_id - i + R - 1) // R)
            for e in r.get_events(local_since):
                evs.append({**e, "id": e["id"] * R + i})
        evs.sort(key=lambda e: e["id"])
        return [e for e in evs if e["id"] >= since_id]

    def event_cursor(self):
        """Namespaced cursors: min of per-rank next ids guarantees no
        future event is skipped (a later poll may return a few duplicates
        from faster ranks — idempotent, applied in id order); max of
        per-rank retained floors is a conservative gap signal."""
        R = len(self.ranks)
        pairs = [r.event_cursor() for r in self.ranks]
        return (min(n * R + i for i, (n, _) in enumerate(pairs)),
                max(o * R + i for i, (_, o) in enumerate(pairs)))

    def reuse_block_hashes(self):
        out = []
        for r in self.ranks:
            out.extend(r.reuse_block_hashes())
        return sorted(set(out))

    def block_table(self, seq_id, mb):
        return self._r(seq_id).block_table(seq_id, mb)

    def slot_mapping(self, seq_id, start, n):
        return self._r(seq_id).slot_mapping(seq_id, start, n)

    def num_seq_blocks(self, seq_id):
        r = self._rank_of.get(seq_id)
        return 0 if r is None else self.ranks[r].num_seq_blocks(seq_id)

    def slot_of(self, seq_id):
        r = self._rank_of.get(seq_id)
        return -1 if r is None else self.ranks[r].slot_of(seq_id)

    def blocks_needed(self, n):
        return cdiv(n, self.block_size)

    @property
    def num_free_blocks(self) -> int:
        # conservative: capacity checks admit only what the tightest rank
        # can take (per-rank checks happen at placement)
        return min(r.num_free_blocks for r in self.ranks)

    @property
    def slots(self):
        return self.ranks[0].slots

    @property
    def is_native(self) -> bool:
        return self.ranks[0].is_native

    def allocate_pools(self, dtype=None):
        """Global pools with the block axis spanning dp ranks (the engine
        shards axis 0 over "dp"; each rank's slice is its local pool)."""
        import dataclasses as _dc
        sizing = KVCacheManager(
            _dc.replace(self.cfg), self.num_layers, self.num_kv_heads,
            self.head_dim, self.num_blocks * self.dp_size, bookkeeping="python")
        return sizing.allocate_pools(dtype)

    def fork_sequence(self, src_id, dst_id):
        r = self._rank_of[src_id]
        self._rank_of[dst_id] = r
        return self.ranks[r].fork_sequence(src_id, dst_id)

    def stats(self) -> dict:
        out = self.ranks[0].stats()
        for r in self.ranks[1:]:
            for k, v in r.stats().items():
                out[k] = out.get(k, 0) + v if isinstance(v, int) else v
        out["num_blocks"] = self.num_blocks * self.dp_size
        out["dp_size"] = self.dp_size
        return out


class HelixKVCacheManager:
    """Helix/decode context parallelism: one sequence's KV pages are
    distributed BLOCK-CYCLICALLY over the "cp" ranks (global block g lives
    on rank g % cp), each rank attends its shard and partial softmax stats
    combine over ICI — the reference's helix CP (docs/source/features/
    helix.md, kernels/helixKernels.cu) with the alltoall replaced by a
    psum-combine.  Block ids are rank-LOCAL; the engine shards the pools'
    block axis over "cp"."""

    def __init__(self, cfg: KVCacheConfig, num_layers: int,
                 num_kv_heads: int, head_dim: int,
                 num_blocks_per_rank: int, cp_size: int,
                 max_slots: int = 256):
        self.cfg = cfg
        self.block_size = cfg.block_size
        self.num_layers = num_layers
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.cp_size = cp_size
        self.num_blocks = num_blocks_per_rank
        import dataclasses as _dc
        # interleaved positions defeat chain hashing: no reuse per shard
        rcfg = _dc.replace(cfg, enable_block_reuse=False)
        self.ranks = [KVCacheManager(rcfg, num_layers, num_kv_heads,
                                     head_dim, num_blocks_per_rank,
                                     max_slots=max_slots)
                      for _ in range(cp_size)]
        self.sliding_layers: set = set()
        self.vswa = False

    # ---- geometry ---------------------------------------------------------------
    def _rank_tokens(self, r: int, num_tokens: int) -> int:
        """Tokens covered by rank r's blocks for a sequence of num_tokens."""
        g = cdiv(num_tokens, self.block_size)          # global blocks
        mine = g // self.cp_size + (1 if g % self.cp_size > r else 0)
        return mine * self.block_size

    def blocks_needed(self, n: int) -> int:
        return cdiv(n, self.block_size)

    @property
    def num_free_blocks(self) -> int:
        return min(r.num_free_blocks for r in self.ranks) * self.cp_size

    def num_seq_blocks(self, seq_id: int) -> int:
        return sum(r.num_seq_blocks(seq_id) for r in self.ranks)

    def has_sequence(self, seq_id: int) -> bool:
        return self.ranks[0].has_sequence(seq_id)

    # ---- ops ---------------------------------------------------------------------
    def add_sequence(self, seq_id: int, token_ids, cache_salt=None) -> int:
        for r in self.ranks:
            r.add_sequence(seq_id, [], cache_salt)
        return 0  # interleaved shards: no prefix reuse

    def grow_sequence(self, seq_id: int, new_total_tokens: int):
        for i, r in enumerate(self.ranks):
            r.grow_sequence(seq_id, self._rank_tokens(i, new_total_tokens))

    def can_grow(self, seq_id: int, n: int) -> bool:
        return all(
            r.blocks_needed(self._rank_tokens(i, n)) - r.num_seq_blocks(
                seq_id) <= r.num_free_blocks
            for i, r in enumerate(self.ranks))

    def seal_full_blocks(self, seq_id: int, token_ids):
        pass  # no reuse across interleaved shards

    def match_prefix(self, token_ids, cache_salt=None) -> int:
        return 0  # interleaved shards: no prefix reuse

    def get_events(self, since_id: int = 0):
        return []

    def event_cursor(self):
        return 0, 0

    def free_sequence(self, seq_id: int):
        for r in self.ranks:
            r.free_sequence(seq_id)

    def fork_sequence(self, src_id: int, dst_id: int):
        """Beam fork: fork every rank's shard of the sequence.  Returns
        PER-RANK copy pairs [cp][(src, dst), ...] — the engine cp-bands
        them so each mesh rank copies only its own pool shard."""
        return [r.fork_sequence(src_id, dst_id) for r in self.ranks]

    # ---- tables -------------------------------------------------------------------
    def rank_block_table(self, seq_id: int, r: int,
                         max_blocks: int) -> List[int]:
        return self.ranks[r].block_table(seq_id, max_blocks)

    def rank_slot_mapping(self, seq_id: int, start_token: int,
                          num_tokens: int, pad_slot: int):
        """Per-rank flat slots [cp][num_tokens]: position p is a real slot
        on rank (p//bs) % cp and pad everywhere else."""
        bs = self.block_size
        out = [[pad_slot] * num_tokens for _ in range(self.cp_size)]
        # fetch each rank's table ONCE (a per-token ctypes block_table call
        # made long prefill chunks quadratic host work)
        last = start_token + num_tokens - 1
        max_j = (last // bs) // self.cp_size + 1
        tables = [r.block_table(seq_id, max_j) for r in self.ranks]
        for i in range(num_tokens):
            p = start_token + i
            g = p // bs
            r = g % self.cp_size
            j = g // self.cp_size      # rank-local block index of this seq
            out[r][i] = tables[r][j] * bs + p % bs
        return out

    def slot_of(self, seq_id: int) -> int:
        return self.ranks[0].slot_of(seq_id)

    def can_admit_new(self) -> bool:
        return True

    def local_block_table(self, seq_id: int):  # VSWA off under helix
        return []

    @property
    def slots(self):
        return self.ranks[0].slots

    @property
    def is_native(self) -> bool:
        return self.ranks[0].is_native

    def allocate_pools(self, dtype=None):
        import dataclasses as _dc
        sizing = KVCacheManager(
            _dc.replace(self.cfg), self.num_layers, self.num_kv_heads,
            self.head_dim, self.num_blocks * self.cp_size,
            bookkeeping="python")
        return sizing.allocate_pools(dtype)

    def stats(self) -> dict:
        out = self.ranks[0].stats()
        for r in self.ranks[1:]:
            for k, v in r.stats().items():
                out[k] = out.get(k, 0) + v if isinstance(v, int) else v
        out["num_blocks"] = self.num_blocks * self.cp_size
        out["cp_size"] = self.cp_size
        return out


class StarKVCacheManager:
    """Star-attention context parallelism (reference CpType.STAR,
    `attention_backend/star_flashinfer.py`; paper arXiv:2411.17116): one
    sequence's KV is split into CONTIGUOUS per-rank chunks over "cp".
    Prefill is communication-free — each rank runs local causal attention
    over [anchor block; its chunk] and keeps only its chunk's KV — and
    decode combines per-rank partial attention stats over ICI (the same
    softmax combine as helix).  Generated tokens append to the rank owning
    their position (the last region is open-ended).  Block ids are
    rank-LOCAL; the engine shards the pools' block axis over "cp"."""

    def __init__(self, cfg: KVCacheConfig, num_layers: int,
                 num_kv_heads: int, head_dim: int,
                 num_blocks_per_rank: int, cp_size: int,
                 max_slots: int = 256):
        self.cfg = cfg
        self.block_size = cfg.block_size
        self.num_layers = num_layers
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.cp_size = cp_size
        self.num_blocks = num_blocks_per_rank
        import dataclasses as _dc
        rcfg = _dc.replace(cfg, enable_block_reuse=False)
        self.ranks = [KVCacheManager(rcfg, num_layers, num_kv_heads,
                                     head_dim, num_blocks_per_rank,
                                     max_slots=max_slots)
                      for _ in range(cp_size)]
        # per-sequence region starts (tokens, block-aligned): rank r owns
        # [starts[r], starts[r+1]) and the last rank [starts[-1], inf)
        self._bounds: Dict[int, List[int]] = {}
        self.sliding_layers: set = set()
        self.vswa = False

    # ---- geometry ---------------------------------------------------------------
    def bounds_of(self, seq_id: int) -> List[int]:
        return self._bounds[seq_id]

    def anchor_len(self, seq_id: int) -> int:
        """Anchor tokens prepended to every rank's chunk (= rank 0's chunk,
        the paper's anchor-block default)."""
        b = self._bounds[seq_id]
        return b[1] if self.cp_size > 1 else 0

    def rank_of_pos(self, seq_id: int, pos: int) -> int:
        b = self._bounds[seq_id]
        r = self.cp_size - 1
        while r > 0 and pos < b[r]:
            r -= 1
        return r

    def rank_local_len(self, seq_id: int, total_tokens: int, r: int) -> int:
        """Tokens of [0, total) owned by rank r."""
        b = self._bounds[seq_id]
        lo = b[r]
        hi = b[r + 1] if r + 1 < self.cp_size else None
        top = total_tokens if hi is None else min(total_tokens, hi)
        return max(0, top - lo)

    def blocks_needed(self, n: int) -> int:
        return cdiv(n, self.block_size)

    @property
    def num_free_blocks(self) -> int:
        return min(r.num_free_blocks for r in self.ranks) * self.cp_size

    def num_seq_blocks(self, seq_id: int) -> int:
        return sum(r.num_seq_blocks(seq_id) for r in self.ranks)

    def has_sequence(self, seq_id: int) -> bool:
        return seq_id in self._bounds

    # ---- ops ---------------------------------------------------------------------
    def add_sequence(self, seq_id: int, token_ids, cache_salt=None) -> int:
        bs = self.block_size
        gb = max(cdiv(len(token_ids), bs), 1)      # prompt blocks
        bpr = max(cdiv(gb, self.cp_size), 1)       # blocks per rank chunk
        self._bounds[seq_id] = [min(r * bpr, gb) * bs
                                for r in range(self.cp_size)]
        for r in self.ranks:
            r.add_sequence(seq_id, [], cache_salt)
        return 0  # no prefix reuse across contiguous shards

    def grow_sequence(self, seq_id: int, new_total_tokens: int):
        for i, r in enumerate(self.ranks):
            r.grow_sequence(seq_id,
                            self.rank_local_len(seq_id, new_total_tokens, i))

    def can_grow(self, seq_id: int, n: int) -> bool:
        return all(
            r.blocks_needed(self.rank_local_len(seq_id, n, i))
            - r.num_seq_blocks(seq_id) <= r.num_free_blocks
            for i, r in enumerate(self.ranks))

    def seal_full_blocks(self, seq_id: int, token_ids):
        pass  # no reuse across shards

    def match_prefix(self, token_ids, cache_salt=None) -> int:
        return 0

    def get_events(self, since_id: int = 0):
        return []

    def event_cursor(self):
        return 0, 0

    def free_sequence(self, seq_id: int):
        self._bounds.pop(seq_id, None)
        for r in self.ranks:
            r.free_sequence(seq_id)

    def fork_sequence(self, src_id: int, dst_id: int):
        """Beam fork: fork every rank's contiguous shard; the owner-rank
        bounds carry over.  Returns per-rank pairs [cp][(src, dst), ...]."""
        self._bounds[dst_id] = self._bounds[src_id]
        return [r.fork_sequence(src_id, dst_id) for r in self.ranks]

    # ---- tables -------------------------------------------------------------------
    def rank_block_table(self, seq_id: int, r: int,
                         max_blocks: int) -> List[int]:
        return self.ranks[r].block_table(seq_id, max_blocks)

    def rank_slot_mapping(self, seq_id: int, start_token: int,
                          num_tokens: int, pad_slot: int):
        """Per-rank flat slots [cp][num_tokens]: position p is a real slot
        only on its owning rank."""
        bs = self.block_size
        b = self._bounds[seq_id]
        out = [[pad_slot] * num_tokens for _ in range(self.cp_size)]
        # fetch each rank's table ONCE (a per-token ctypes block_table call
        # made long prefill chunks quadratic host work)
        tables: dict = {}
        for i in range(num_tokens):
            p = start_token + i
            r = self.rank_of_pos(seq_id, p)
            lp = p - b[r]                 # rank-local position
            j = lp // bs
            tab = tables.get(r)
            if tab is None or j >= len(tab):
                tab = tables[r] = self.ranks[r].block_table(seq_id, j + 64)
            out[r][i] = tab[j] * bs + lp % bs
        return out

    def slot_of(self, seq_id: int) -> int:
        return self.ranks[0].slot_of(seq_id)

    def can_admit_new(self) -> bool:
        return True

    def local_block_table(self, seq_id: int):  # VSWA off under star
        return []

    @property
    def slots(self):
        return self.ranks[0].slots

    @property
    def is_native(self) -> bool:
        return self.ranks[0].is_native

    def allocate_pools(self, dtype=None):
        import dataclasses as _dc
        sizing = KVCacheManager(
            _dc.replace(self.cfg), self.num_layers, self.num_kv_heads,
            self.head_dim, self.num_blocks * self.cp_size,
            bookkeeping="python")
        return sizing.allocate_pools(dtype)

    def stats(self) -> dict:
        out = self.ranks[0].stats()
        for r in self.ranks[1:]:
            for k, v in r.stats().items():
                out[k] = out.get(k, 0) + v if isinstance(v, int) else v
        out["num_blocks"] = self.num_blocks * self.cp_size
        out["cp_size"] = self.cp_size
        return out
