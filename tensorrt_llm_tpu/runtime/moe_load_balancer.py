"""Wide-EP MoE load balancer (placement + hot-expert replication).

Counterpart of the reference's online expert rebalancer
(`cpp/tensorrt_llm/kernels/moeLoadBalance/`, `runtime/moeLoadBalancer/`,
Python `moe_load_balancer.py:127`): per-expert load statistics accumulate on
device inside the MoE layers' cache pytree (zero extra syncs — they ride the
donated cache update), and a host-side planner periodically recomputes the
expert→slot placement so every expert-parallel rank carries a near-equal
token load.

With ``moe_redundant_experts > 0`` the weight stacks carry extra slots: the
planner REPLICATES the hottest experts into them (the reference's redundant
expert slots), splitting a hot expert's tokens across its replicas, and
installs a ``[2, E]`` (primary, replica) expert_map.  Placement changes are
output-preserving — replicas are exact weight copies.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from tensorrt_llm_tpu.utils import logger


def plan_placement(loads: np.ndarray, ep_size: int,
                   num_slots: Optional[int] = None) -> np.ndarray:
    """LPT assignment of expert (replica) units to ep ranks.

    loads: [E] logical token counts.  num_slots >= E adds replica units for
    the hottest experts (each replica carries load/replicas).  Returns
    slot_to_logical [S]: physical slot s hosts logical expert stl[s];
    slots [r*S/ep, (r+1)*S/ep) live on rank r.
    """
    E = len(loads)
    S = num_slots or E
    per = S // ep_size
    reps = np.ones(E, np.int64)
    for _ in range(S - E):
        # duplicate whichever expert currently has the highest per-replica
        # load (greedy — matches the reference's replication heuristic);
        # capped at 2 replicas because dispatch splits tokens across at most
        # a (primary, replica) pair — a 3rd copy would never receive tokens
        per_rep = np.where(reps < 2, loads / reps, -np.inf)
        if not np.isfinite(per_rep).any():
            per_rep = loads / reps  # S > 2E: forced cold copies
        reps[np.argmax(per_rep)] += 1
    units: List[tuple] = []
    for e in range(E):
        for _ in range(int(reps[e])):
            units.append((int(e), float(loads[e]) / reps[e]))
    units.sort(key=lambda u: -u[1])          # heaviest first (LPT)
    rank_load = np.zeros(ep_size, np.float64)
    rank_slots: List[List[int]] = [[] for _ in range(ep_size)]
    for e, w in units:
        cands = [r for r in range(ep_size)
                 if len(rank_slots[r]) < per and e not in rank_slots[r]]
        if not cands:  # replicas may have to share a rank for tiny configs
            cands = [r for r in range(ep_size) if len(rank_slots[r]) < per]
        r = min(cands, key=lambda r: rank_load[r])
        rank_slots[r].append(e)
        rank_load[r] += w
    return np.concatenate([np.asarray(s, np.int64) for s in rank_slots])


def balance_stat(loads: np.ndarray, ep_size: int,
                 placement: Optional[np.ndarray] = None,
                 num_slots: Optional[int] = None) -> float:
    """max-rank-load / mean-rank-load under a placement (1.0 = perfect).
    Replicated experts split their load across at most TWO replicas (the
    dispatch limit); 3rd+ copies model as receiving zero tokens."""
    E = len(loads)
    S = num_slots or (len(placement) if placement is not None else E)
    per = S // ep_size
    if placement is None:
        placement = np.arange(E)
        if S > E:
            placement = np.concatenate(
                [placement, np.arange(S - E) % E])
    counts = np.bincount(placement, minlength=E)
    eff = np.minimum(np.maximum(counts, 1), 2)
    seen = np.zeros(E, np.int64)
    ridx = np.empty(len(placement), np.int64)
    for s, e in enumerate(placement):
        ridx[s] = seen[e]
        seen[e] += 1
    slot_loads = np.where(ridx < eff[placement],
                          loads[placement] / eff[placement], 0.0)
    ranks = slot_loads.reshape(ep_size, per).sum(1)
    return float(ranks.max() / max(ranks.mean(), 1e-9))


class MoeLoadBalancer:
    def __init__(self, model, engine, interval: int = 0):
        """interval: executor iterations between rebalances (0 = manual)."""
        self.model = model
        self.engine = engine
        self.interval = interval
        self.ep_size = model.cfg.mapping.moe_ep_size
        self.num_experts = model.cfg.num_experts
        self.num_slots = (model.cfg.num_experts
                          + getattr(model.cfg, "moe_redundant_experts", 0))
        self.history: List[dict] = []
        # current slot -> logical placement per moe layer
        self.placements: Dict[int, np.ndarray] = {}

    def _placement(self, layer: int) -> np.ndarray:
        p = self.placements.get(layer)
        if p is not None:
            return p
        base = np.arange(self.num_experts, dtype=np.int64)
        if self.num_slots > self.num_experts:
            base = np.concatenate(
                [base, np.arange(self.num_slots - self.num_experts)
                 % self.num_experts])
        return base

    # ---- statistics ---------------------------------------------------------------
    def snapshot_loads(self) -> Dict[int, np.ndarray]:
        """Per-layer LOGICAL expert loads (slot counters summed over a
        logical expert's replicas)."""
        out = {}
        # hold the engine lock: kv_caches are donated into each step, so an
        # unlocked read can touch a buffer the running step just invalidated
        with self.engine.lock:
            for i, cache in enumerate(self.engine.kv_caches):
                if isinstance(cache, tuple) and len(cache) == 2 \
                        and getattr(cache[1], "ndim", None) == 1:
                    slot_loads = np.asarray(cache[1])
                    stl = self._placement(i)[: len(slot_loads)]
                    logical = np.zeros(self.num_experts, slot_loads.dtype)
                    np.add.at(logical, stl, slot_loads)
                    out[i] = logical
        return out

    # ---- placement -----------------------------------------------------------------
    def rebalance(self) -> dict:
        """Recompute placements from current loads and install them."""
        import jax

        loads = self.snapshot_loads()
        report = {}
        with self.engine.lock:
            params = jax.tree.map(lambda x: x, self.engine.params)  # shallow
        changed = False
        for i, load in loads.items():
            if load.sum() == 0:
                continue
            before = balance_stat(load, self.ep_size, self._placement(i))
            placement = plan_placement(load, self.ep_size, self.num_slots)
            after = balance_stat(load, self.ep_size, placement)
            report[i] = {"before": before, "after": after}
            if after >= before - 1e-6:
                continue
            self._install(params, i, placement)
            self.placements[i] = placement
            changed = True
        if changed:
            self.engine.update_params(params)
        # start a fresh statistics window: old counters were accumulated
        # under the OLD placement — attributing them through the new
        # slot->logical map would misread every moved slot
        with self.engine.lock:
            caches = list(self.engine.kv_caches)
            for i in range(len(caches)):
                c = caches[i]
                if isinstance(c, tuple) and len(c) == 2 \
                        and getattr(c[1], "ndim", None) == 1:
                    caches[i] = (c[0], c[1] * 0)  # sharding-preserving zero
            self.engine.kv_caches = caches
        self.history.append(report)
        logger.info("moe rebalance: %s", report)
        return report

    def _install(self, params, layer: int, placement: np.ndarray):
        """Re-lay expert weights so new slot s holds logical placement[s]
        (copying from any current replica) and install the [2, E]
        (primary, replica) expert_map."""
        import jax.numpy as jnp
        mp = params["layers"][layer]["mlp"]
        cur = self._placement(layer)
        # current slot holding each logical expert (first replica)
        cur_slot_of = np.full(self.num_experts, -1, np.int64)
        for s in range(len(cur) - 1, -1, -1):
            cur_slot_of[cur[s]] = s
        gather = jnp.asarray(cur_slot_of[placement])  # new slot <- cur slot
        from jax.sharding import NamedSharding
        for key in ("w_gate_up", "w_down", "b_gate_up", "b_down",
                    "w_gate_up_s", "w_gate_up_z", "w_down_s", "w_down_z"):
            if key in mp:
                leaf = mp[key]
                if isinstance(getattr(leaf, "sharding", None), NamedSharding):
                    # permutation across ep-sharded rows: tell XLA the
                    # result keeps the input's sharding (plain leaf[gather]
                    # is ambiguous and raises ShardingTypeError)
                    mp[key] = leaf.at[gather].get(
                        out_sharding=leaf.sharding)
                else:
                    mp[key] = leaf[gather]
        primary = np.full(self.num_experts, -1, np.int32)
        replica = np.full(self.num_experts, -1, np.int32)
        for s, e in enumerate(placement):
            if primary[e] < 0:
                primary[e] = s
            elif replica[e] < 0:
                replica[e] = s
        replica = np.where(replica < 0, primary, replica)
        mp["expert_map"] = jnp.asarray(np.stack([primary, replica]))

    # ---- executor hook --------------------------------------------------------------
    def step(self, iteration: int):
        if self.interval and iteration % self.interval == 0:
            self.rebalance()
