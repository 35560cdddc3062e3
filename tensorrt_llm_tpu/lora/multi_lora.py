"""Runtime multi-LoRA: many adapters served concurrently.

Counterpart of the reference's multi-LoRA stack (`PeftCacheManager`, grouped
LoRA GEMM `cpp/tensorrt_llm/kernels/lora/`, `loraOp.cpp`): adapters are
stacked into per-layer device tensors (slot 0 is the zero adapter = base
model), every request carries an adapter slot, and each linear adds its
per-row low-rank side product

    y += scaling * (x @ A[slot]) @ B[slot]

computed as a masked loop over live slots (slot count is small and static,
so the extra work is L tiny rank-r matmuls — the TPU analog of the grouped
LoRA GEMM).

Fused-projection mapping: q/k/v (and gate/up) adapters concatenate along the
rank axis with their B factors scattered into the fused output's column
ranges, so one (A, B) pair per fused linear covers all sub-projections.

Under TP the stacked tensors shard like their base linears: column-parallel
B factors are column-permuted into the fused weight's per-rank interleaved
layout and shard on the output dim; row-parallel A factors shard on the
input dim and the rank-r intermediate psums over the tp axes before B.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from tensorrt_llm_tpu.lora.lora_manager import LoraAdapter, load_lora_adapter
from tensorrt_llm_tpu.utils import logger


class MultiLoraManager:
    """Builds stacked per-layer adapter tensors for a llama-family model."""

    def __init__(self, adapters: Dict[str, LoraAdapter], cfg):
        self.names = ["<base>"] + sorted(adapters)
        self.slots = {n: i for i, n in enumerate(self.names)}
        self.adapters = adapters
        self.cfg = cfg
        # paged mode sizes ranks against the FULL adapter pool so swapped-in
        # adapters always fit the device stacks
        self._rank_adapters: Optional[Dict[str, LoraAdapter]] = None

    @classmethod
    def from_paths(cls, paths: Dict[str, str], cfg) -> "MultiLoraManager":
        adapters = {name: load_lora_adapter(p)
                    for name, p in paths.items()}
        for name, a in adapters.items():
            # runtime multi-LoRA applies additive BA deltas per batch row;
            # DoRA's row renormalization depends on the merged weight and
            # cannot ride that path — merge it at load instead
            assert not a.is_dora, (
                f"adapter {name!r} is DoRA — use lora_path= (merge at "
                "load); runtime multi-LoRA slots are additive-only")
        return cls(adapters, cfg)

    def slot_of(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        return self.slots[name]

    # ---- stacked tensors -----------------------------------------------------------
    def _fused(self, layer: int, subs: List[Tuple[str, int, int]],
               in_dim: int, out_dim: int):
        """Stack one fused linear's adapters.

        subs: [(hf_module_suffix, out_lo, out_hi)] column ranges of each
        sub-projection inside the fused output.  Returns (A [L, in, R],
        B [L, R, out]) float32 with scaling folded into B, or None if no
        adapter touches this linear.
        """
        L = len(self.names)
        per = []
        for name in self.names[1:]:
            ad = self.adapters[name]
            pairs = []
            for suffix, lo, hi in subs:
                key = f"model.layers.{layer}.{suffix}"
                if key in ad.weights:
                    A, B = ad.weights[key]  # A [r, in], B [out_sub, r]
                    pairs.append((A, B, lo, hi))
            per.append(pairs)
        if self._rank_adapters is None:
            if not any(per):
                return None
            r_tot = max(sum(A.shape[0] for A, _, _, _ in pairs) or 1
                        for pairs in per)
        else:
            # paged mode: stack exists iff ANY pool adapter touches this
            # (layer, linear), sized to the pool-wide max rank so swapped-in
            # adapters always fit and the param-tree structure never changes
            r_tot = 0
            for ad in self._rank_adapters.values():
                r = sum(ad.weights[f"model.layers.{layer}.{suffix}"][0]
                        .shape[0]
                        for suffix, _, _ in subs
                        if f"model.layers.{layer}.{suffix}" in ad.weights)
                r_tot = max(r_tot, r)
            if r_tot == 0:
                return None
        r_tot = max(r_tot, 1)
        A_st = np.zeros((L, in_dim, r_tot), np.float32)
        B_st = np.zeros((L, r_tot, out_dim), np.float32)
        for li, pairs in enumerate(per):
            off = 0
            name = self.names[li + 1]
            ad = self.adapters[name]
            for A, B, lo, hi in pairs:
                r = A.shape[0]
                A_st[li + 1, :, off:off + r] = A.T
                # per-module scaling: rank_pattern modules carry their own r
                B_st[li + 1, off:off + r, lo:hi] = \
                    B.T * ad.module_scaling(r)
                off += r
        return A_st, B_st

    def build_layer_lora(self, layer: int) -> Dict:
        """Per-layer stacked adapters keyed by fused linear name."""
        cfg = self.cfg
        D = cfg.head_dim
        qd = cfg.num_heads * D
        kvd = cfg.num_kv_heads * D
        H, I = cfg.hidden_size, cfg.intermediate_size
        tp = cfg.mapping.tp_size
        out = {}
        v = self._fused(layer, [("self_attn.q_proj", 0, qd),
                                ("self_attn.k_proj", qd, qd + kvd),
                                ("self_attn.v_proj", qd + kvd, qd + 2 * kvd)],
                        H, qd + 2 * kvd)
        if v is not None:
            A, B = v
            if tp > 1:  # match the fused qkv weight's per-rank interleave
                B = interleave_columns(
                    B, [(0, qd), (qd, qd + kvd), (qd + kvd, qd + 2 * kvd)],
                    tp)
            out["qkv"] = (A, B)
        v = self._fused(layer, [("self_attn.o_proj", 0, H)], qd, H)
        if v is not None:
            out["o"] = v
        v = self._fused(layer, [("mlp.gate_proj", 0, I),
                                ("mlp.up_proj", I, 2 * I)], H, 2 * I)
        if v is not None:
            A, B = v
            if tp > 1:
                B = interleave_columns(B, [(0, I), (I, 2 * I)], tp)
            out["gate_up"] = (A, B)
        v = self._fused(layer, [("mlp.down_proj", 0, H)], I, H)
        if v is not None:
            out["down"] = v
        return out

    def attach(self, params: Dict, dtype) -> Dict:
        """Inject stacked adapter tensors into the model's param pytree."""
        import jax.numpy as jnp
        n = 0
        for i, lp in enumerate(params["layers"]):
            lora = self.build_layer_lora(i)
            if not lora:
                continue
            attn_lora = {k: (jnp.asarray(a).astype(dtype),
                             jnp.asarray(b).astype(dtype))
                         for k, (a, b) in lora.items() if k in ("qkv", "o")}
            mlp_lora = {k: (jnp.asarray(a).astype(dtype),
                            jnp.asarray(b).astype(dtype))
                        for k, (a, b) in lora.items()
                        if k in ("gate_up", "down")}
            if attn_lora:
                lp["attn"]["lora"] = attn_lora
            if mlp_lora:
                lp["mlp"]["lora"] = mlp_lora
            n += len(lora)
        logger.info("multi-LoRA: %d adapters (%s), %d fused linears patched",
                    len(self.names) - 1, self.names[1:], n)
        return params


class PagedMultiLoraManager(MultiLoraManager):
    """Bounded device adapter slots with LRU paging (the reference's
    PeftCacheManager: host-resident adapter pool, device cache of
    max_device_adapters slots, swap-in on demand).

    Adapters stay host-resident; at most `capacity` live in the stacked
    device tensors at once.  acquire(name) pins an adapter slot for a
    request's lifetime (swapping one in if absent — a few .at[slot].set
    writes under the engine lock); release(name) unpins it.  Eviction
    picks the least-recently-used slot with no in-flight requests.
    """

    def __init__(self, adapters: Dict[str, LoraAdapter],
                 cfg, max_device_adapters: int = 4):
        assert adapters, "paged multi-LoRA needs at least one adapter"
        self.capacity = min(max_device_adapters, len(adapters))
        resident = sorted(adapters)[: self.capacity]
        super().__init__({n: adapters[n] for n in resident}, cfg)
        self.all_adapters = dict(adapters)
        self._rank_adapters = self.all_adapters
        self._engine = None
        self._refs: Dict[str, int] = {n: 0 for n in resident}
        self._lru: List[str] = list(resident)   # least-recent first
        self.num_swaps = 0
        # acquire() runs on the submit thread while release() runs on the
        # executor thread via on_finished — the slot/ref/LRU bookkeeping
        # must be atomic or a racing release can zero a just-pinned ref
        # and evict an adapter mid-request.  A Condition (not a bare Lock)
        # lets acquire() wait for a slot when every one is pinned by
        # in-flight requests instead of failing under load.
        import threading
        self._cond = threading.Condition()
        self._lock = self._cond  # Condition is itself a context-manager lock

    def bind_engine(self, engine):
        assert getattr(engine, "pp_size", 1) == 1, \
            "paged multi-LoRA under PP lands later (per-stage param writes)"
        self._engine = engine

    # ---- paging ---------------------------------------------------------------
    def _touch(self, name: str):
        if name in self._lru:
            self._lru.remove(name)
        self._lru.append(name)

    def acquire(self, name: Optional[str],
                timeout: float = 120.0) -> int:
        """Slot for `name`, swapping it in if needed; pins until release.
        When every device slot is pinned by in-flight requests, blocks
        until one frees (the reference PeftCacheManager likewise queues
        requests whose adapter cannot onboard yet)."""
        import time as _t
        if name is None:
            return 0
        if name not in self.all_adapters:
            raise KeyError(name)
        deadline = _t.monotonic() + timeout
        with self._cond:
            while name not in self.slots and not self._has_victim():
                remaining = deadline - _t.monotonic()
                if remaining <= 0 or not self._cond.wait(
                        timeout=min(remaining, 1.0)):
                    if _t.monotonic() >= deadline:
                        raise RuntimeError(
                            "all device adapter slots stayed pinned for "
                            f"{timeout:.0f}s — raise "
                            "lora_max_device_adapters")
            if name not in self.slots:
                self._swap_in(name)
            self._refs[name] = self._refs.get(name, 0) + 1
            self._touch(name)
            return self.slots[name]

    def release(self, name: Optional[str]):
        if not name:
            return
        with self._cond:
            if name in self._refs:
                self._refs[name] = max(self._refs[name] - 1, 0)
                if self._refs[name] == 0:
                    self._cond.notify_all()

    def _has_victim(self) -> bool:
        return any(self._refs.get(c, 0) == 0 for c in self._lru)

    def slot_of(self, name: Optional[str]) -> int:
        # non-pinning lookup (compat); acquire() is the serving path
        return 0 if name is None else self.slots.get(name, -1)

    def _pick_victim(self) -> str:
        for cand in self._lru:
            if self._refs.get(cand, 0) == 0:
                return cand
        raise RuntimeError(
            "all device adapter slots are pinned by in-flight requests — "
            "raise lora_max_device_adapters")

    def _swap_in(self, name: str):
        assert self._engine is not None, "bind_engine() before serving"
        victim = self._pick_victim()
        slot = self.slots.pop(victim)
        self.adapters.pop(victim)
        self._refs.pop(victim, None)
        self._lru.remove(victim)
        self.adapters[name] = self.all_adapters[name]
        self.slots[name] = slot
        self.names[slot] = name
        self._refs[name] = 0
        self.num_swaps += 1

        # stacks for just this adapter, with pool-wide ranks/structure
        tmp = MultiLoraManager({name: self.all_adapters[name]}, self.cfg)
        tmp._rank_adapters = self.all_adapters
        import jax.numpy as jnp
        eng = self._engine
        with eng.lock:
            params = eng.params
            for i, lp in enumerate(params["layers"]):
                lora = tmp.build_layer_lora(i)
                for key, (A, B) in lora.items():
                    holder = lp["attn"] if key in ("qkv", "o") else lp["mlp"]
                    sA, sB = holder["lora"][key]
                    holder["lora"][key] = (
                        sA.at[slot].set(jnp.asarray(A[1]).astype(sA.dtype)),
                        sB.at[slot].set(jnp.asarray(B[1]).astype(sB.dtype)))
        logger.info("multi-LoRA: paged %r into slot %d (evicted %r)",
                    name, slot, victim)


def apply_lora(x, base_out, lora: Tuple, lora_ids, row_parallel=False):
    """base_out += masked per-slot low-rank products (slot 0 contributes 0).

    x [T, in], lora = (A [L, in, R], B [L, R, out]), lora_ids [T] int32.
    row_parallel: x and A are sharded on the input dim — psum the rank-r
    intermediate over the tp axes before B (mirrors the base linear's
    all-reduce)."""
    import jax.numpy as jnp
    A, B = lora
    L = A.shape[0]
    if L <= 1:
        return base_out
    # all live slots in one batched product and ONE collective (a per-slot
    # all-reduce in a loop multiplied small-collective latency by the slot
    # count on every row-parallel linear of every step)
    hs = jnp.einsum("ti,lir->ltr", x.astype(A.dtype), A[1:],
                    preferred_element_type=jnp.float32)   # [L-1, T, R]
    if row_parallel:
        from tensorrt_llm_tpu.parallel.ops import tp_all_reduce
        hs = tp_all_reduce(hs)
    ds = jnp.einsum("ltr,lro->lto", hs.astype(B.dtype), B[1:],
                    preferred_element_type=jnp.float32)   # [L-1, T, out]
    sel = (lora_ids[None, :] == jnp.arange(1, L)[:, None]
           ).astype(jnp.float32)                          # [L-1, T]
    return base_out + jnp.einsum("lt,lto->to", sel, ds).astype(base_out.dtype)


def interleave_columns(mat: np.ndarray, seg_bounds, tp: int) -> np.ndarray:
    """Permute the last axis from segment-major [s0 | s1 | ..] to the fused
    TP-interleaved layout [s0_r0 | s1_r0 | .. | s0_r1 | ..] used by the base
    fused weights (Attention.from_float / GatedMLP.from_float)."""
    idx = []
    for r in range(tp):
        for lo, hi in seg_bounds:
            per = (hi - lo) // tp
            idx.extend(range(lo + r * per, lo + (r + 1) * per))
    return mat[..., np.array(idx)]
