"""Wide-EP MoE load balancer.

Counterpart of the reference's online expert rebalancer
(`cpp/tensorrt_llm/kernels/moeLoadBalance/`, `runtime/moeLoadBalancer/`,
Python `moe_load_balancer.py:127`): per-expert load statistics accumulate on
device inside the MoE layers' cache pytree (zero extra syncs — they ride the
donated cache update), and a host-side planner periodically recomputes the
expert→slot placement so every expert-parallel rank carries a near-equal
token load.  The placement is a permutation installed as an ``expert_map``
param (logical expert id → physical slot); weight tensors are permuted to
match, so outputs are bit-identical while the per-rank load flattens.

Expert *replication* (hot experts on several ranks) is the next increment —
the planner interface already returns per-slot assignments.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from tensorrt_llm_tpu.utils import logger


def plan_placement(loads: np.ndarray, ep_size: int) -> np.ndarray:
    """LPT (longest-processing-time) assignment of experts to ep ranks.

    loads: [E] token counts. Returns perm [E] where physical slot s hosts
    logical expert perm[s]; slots [r*E/ep, (r+1)*E/ep) live on rank r.
    """
    E = len(loads)
    per = E // ep_size
    order = np.argsort(loads)[::-1]           # heaviest first
    rank_load = np.zeros(ep_size, np.int64)
    rank_slots: List[List[int]] = [[] for _ in range(ep_size)]
    for e in order:
        # least-loaded rank with a free slot
        cands = [r for r in range(ep_size) if len(rank_slots[r]) < per]
        r = min(cands, key=lambda r: rank_load[r])
        rank_slots[r].append(int(e))
        rank_load[r] += int(loads[e])
    perm = np.concatenate([np.asarray(s, np.int64) for s in rank_slots])
    return perm


def balance_stat(loads: np.ndarray, ep_size: int,
                 perm: Optional[np.ndarray] = None) -> float:
    """max-rank-load / mean-rank-load under a placement (1.0 = perfect)."""
    E = len(loads)
    per = E // ep_size
    l = loads if perm is None else loads[perm]
    ranks = l.reshape(ep_size, per).sum(1)
    return float(ranks.max() / max(ranks.mean(), 1e-9))


class MoeLoadBalancer:
    def __init__(self, model, engine, interval: int = 0):
        """interval: executor iterations between rebalances (0 = manual)."""
        self.model = model
        self.engine = engine
        self.interval = interval
        self.ep_size = model.cfg.mapping.moe_ep_size
        self.history: List[dict] = []
        # current placement per moe layer (logical -> slot permutation)
        self.perms: Dict[int, np.ndarray] = {}

    # ---- statistics ---------------------------------------------------------------
    def snapshot_loads(self) -> Dict[int, np.ndarray]:
        """Read the on-device per-layer expert load counters (in SLOT order;
        mapped back to logical ids via the current placement)."""
        out = {}
        for i, cache in enumerate(self.engine.kv_caches):
            if isinstance(cache, tuple) and len(cache) == 2 \
                    and getattr(cache[1], "ndim", None) == 1:
                slot_loads = np.asarray(cache[1])
                perm = self.perms.get(i)
                if perm is None:
                    out[i] = slot_loads
                else:
                    logical = np.zeros_like(slot_loads)
                    logical[perm] = slot_loads
                    out[i] = logical
        return out

    # ---- placement -----------------------------------------------------------------
    def rebalance(self) -> dict:
        """Recompute placements from current loads and install them."""
        import jax
        import jax.numpy as jnp

        loads = self.snapshot_loads()
        report = {}
        new_params = self.engine.params
        with self.engine.lock:
            params = jax.tree.map(lambda x: x, self.engine.params)  # shallow
        changed = False
        for i, load in loads.items():
            if load.sum() == 0:
                continue
            before = balance_stat(load, self.ep_size, self.perms.get(i))
            perm = plan_placement(load, self.ep_size)
            after = balance_stat(load, self.ep_size, perm)
            report[i] = {"before": before, "after": after}
            if after >= before - 1e-6:
                continue
            self._install(params, i, perm)
            self.perms[i] = perm
            changed = True
        if changed:
            self.engine.update_params(params)
        self.history.append(report)
        logger.info("moe rebalance: %s", report)
        return report

    def _install(self, params, layer: int, perm: np.ndarray):
        """Permute expert weights to the new slots + set expert_map.

        Slot s currently holds logical expert old_perm[s]; recover logical
        order via inv_old, then lay out new slot s = logical perm[s]."""
        import jax.numpy as jnp
        mp = params["layers"][layer]["mlp"]
        old_perm = self.perms.get(layer)
        if old_perm is None:
            slot_to_logical = np.arange(len(perm))
        else:
            slot_to_logical = np.asarray(old_perm)
        inv_old = np.zeros(len(perm), np.int64)
        inv_old[slot_to_logical] = np.arange(len(perm))
        gather = jnp.asarray(inv_old[perm])  # new slot s <- current slot
        for key in ("w_gate_up", "w_down", "b_gate_up", "b_down",
                    "w_gate_up_s", "w_gate_up_z", "w_down_s", "w_down_z"):
            if key in mp:
                mp[key] = mp[key][gather]
        inv_new = np.zeros(len(perm), np.int32)
        inv_new[perm] = np.arange(len(perm), dtype=np.int32)
        mp["expert_map"] = jnp.asarray(inv_new)

    # ---- executor hook --------------------------------------------------------------
    def step(self, iteration: int):
        if self.interval and iteration % self.interval == 0:
            self.rebalance()
