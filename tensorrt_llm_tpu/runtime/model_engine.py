"""Model engine: bucketed, jitted forward steps over the paged KV cache.

Counterpart of the reference's `PyTorchModelEngine`
(`pyexecutor/model_engine.py:128`) + `CUDAGraphRunner`
(`cuda_graph_runner.py:83`): where the reference captures CUDA graphs per
(batch size, mode) and pads batches to the nearest captured size
(cuda_graph_runner.py:402-474), we jit one XLA executable per (mode, bucket)
— same padding discipline, with the compiler cache playing the role of the
graph cache.  KV caches are donated so updates alias in place.

Parallelism: when mapping.world_size > 1 the step function is wrapped in
shard_map over the device mesh — weights/KV are head- or column-sharded,
activations replicated, collectives explicit in the layers.
"""

from __future__ import annotations

import functools
import os
import threading
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tensorrt_llm_tpu.attention_backend.interface import AttentionMetadata
from tensorrt_llm_tpu.models.modeling_utils import DecoderModelForCausalLM
from tensorrt_llm_tpu.parallel.mapping import Mapping
from tensorrt_llm_tpu.parallel.mesh import make_mesh
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
from tensorrt_llm_tpu.utils import cdiv, logger, round_up

# Out-of-bounds slot => scatter drops the write (padding rows).
PAD_SLOT = np.int32(2**30)

# Coarse buckets: every (bucket, table-width) pair is one compiled
# executable; compile time is expensive (minutes through a remote-compile
# tunnel), so fewer/larger buckets with padding waste beat many tight ones.
DEFAULT_DECODE_BUCKETS = (16, 64, 256)
DEFAULT_PREFILL_BUCKETS = (128, 512, 2048)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def prune_specs(specs, params):
    """Filter a spec pytree down to the keys present in params."""
    if isinstance(params, dict):
        return {k: prune_specs(specs[k], v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        out = [prune_specs(s, p) for s, p in zip(specs, params)]
        return type(params)(out)
    return specs


@dataclass
class StepInputs:
    """Host-assembled step inputs (numpy, padded to bucket)."""

    input_ids: np.ndarray
    input_embeds: np.ndarray = None    # [T, H] multimodal fused embeddings
    positions: np.ndarray = None
    slot_mapping: np.ndarray = None
    block_tables: np.ndarray = None
    kv_lens: np.ndarray = None
    logit_indices: np.ndarray = None
    q_offset: np.ndarray = None
    seq_slots: np.ndarray = None
    lora_ids: np.ndarray = None
    # VSWA: sliding layers' cyclic-ring inputs (None when rings are off)
    local_slot_mapping: np.ndarray = None
    local_block_tables: np.ndarray = None
    # host-only (attention-DP): logits row per request / prefill owner rank
    row_map: np.ndarray = None
    owner: int = 0


class ModelEngine:
    def __init__(
        self,
        model: DecoderModelForCausalLM,
        params: Dict,
        kv_manager: KVCacheManager,
        mapping: Optional[Mapping] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        max_blocks_per_seq: Optional[int] = None,
        decode_buckets: Sequence[int] = DEFAULT_DECODE_BUCKETS,
        prefill_buckets: Sequence[int] = DEFAULT_PREFILL_BUCKETS,
        max_batch_size: int = 64,
        max_seq_len: int = 2048,
    ):
        self.model = model
        self.kv_manager = kv_manager
        self.mapping = mapping or Mapping()
        self.max_seq_len = max_seq_len
        self.max_blocks_per_seq = max_blocks_per_seq or cdiv(
            max_seq_len, kv_manager.block_size)
        self.decode_buckets = tuple(
            b for b in decode_buckets if b <= max(max_batch_size, decode_buckets[0]))
        self.prefill_buckets = tuple(prefill_buckets)

        self._helix = (self.mapping.cp_size > 1
                       and self.mapping.cp_type == "helix")
        self._star = (self.mapping.cp_size > 1
                      and self.mapping.cp_type == "star")
        # Qwen2-VL multimodal 3D rope: prefill positions travel as
        # [4*Tp] = [physical; t; h; w] so the step signature is unchanged
        try:
            self._mrope = bool(model.cfg.rope.mrope_sections)
        except Exception:  # noqa: BLE001 — models without a rope config
            self._mrope = False

        # VSWA: sliding-window layers get their own small cyclic-ring pools
        # (reference per-window WindowBlockManager).  Ring = window + one
        # block: prefill attends BEFORE the chunk's writes land (chunk K/V
        # come from the inputs), and the one-block slack covers fused
        # multi-step decode's k <= block_size sequential writes.
        self._vswa = False
        cfg = model.cfg
        slw = (getattr(cfg, "sliding_window", None)
               or getattr(cfg, "attention_chunk_size", None))
        if (slw and hasattr(kv_manager, "configure_vswa")
                and kv_manager.cfg.separate_window_pools
                and self.mapping.dp_size == 1
                and self.mapping.cp_size == 1
                and self.mapping.pp_size == 1):
            sliding = [i for i in range(cfg.num_layers)
                       if cfg.is_sliding_layer(i)]
            bs = kv_manager.block_size
            ring_blocks = cdiv(slw, bs) + 1
            if sliding and ring_blocks < self.max_blocks_per_seq:
                ring_slots = min(kv_manager.slots.max_slots,
                                 max(max_batch_size * 4, 32))
                kv_manager.configure_vswa(slw, ring_blocks, ring_slots,
                                          sliding)
                self._vswa = True

        self.mesh = mesh
        self.pp_size = self.mapping.pp_size
        if self.pp_size > 1:
            # pipeline parallel: per-stage sub-meshes, layer slices and KV
            # pools live on their stage's devices (see _init_pp)
            self._fns = {}
            self.lock = threading.Lock()
            self._init_pp(params)
            return
        if self.mapping.world_size > 1 and self.mesh is None:
            self.mesh = make_mesh(self.mapping)

        # place parameters / caches
        if self.mesh is not None:
            specs = prune_specs(self.model.param_specs(), params)
            shardings = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P))
            self.params = jax.device_put(params, shardings)
            pools = self._allocate_layer_caches()
            if hasattr(self.model, "cache_specs"):
                # hybrid/SSM models know their pools' sharding (conv
                # channels / SSM heads over TP) — paged-KV heuristics don't
                self._cache_specs = self.model.cache_specs(
                    pools, self._cache_leaf_spec)
            else:
                self._cache_specs = jax.tree.map(self._cache_leaf_spec,
                                                 pools)
            cache_shardings = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), self._cache_specs,
                is_leaf=lambda x: isinstance(x, P))
            self.kv_caches = jax.device_put(pools, cache_shardings)
            self._param_specs = specs
        else:
            self.params = jax.device_put(params)
            self.kv_caches = self._allocate_layer_caches()
            self._param_specs = None
            self._cache_specs = None

        self._fns = {}  # (mode,) -> jitted step
        # guards kv_caches swaps between the executor thread and direct
        # callers (LLM.score, warmup)
        self.lock = threading.Lock()

    def _allocate_layer_caches(self):
        """Per-layer cache pools: paged KV by default; hybrid/SSM models
        override make_layer_caches to mix in slot-addressed state pools
        (reference MambaCacheManager + rnnStateManager)."""
        if hasattr(self.model, "make_layer_caches"):
            return self.model.make_layer_caches(self.kv_manager)
        return self.kv_manager.allocate_pools()

    # ------------------------------------------------------------------ pipeline --
    def _init_pp(self, params):
        """Pipeline parallelism, single-controller style (the TPU analog of
        the reference's `_executor_loop_pp`, py_executor.py:1101): layers are
        cut into contiguous stages, each stage's params + KV pools live on
        its own sub-mesh (TP/EP axes inside the stage), activations hop
        stages via device_put over ICI, and JAX async dispatch overlaps
        microbatches — stage s of batch m runs while stage s+1 runs batch
        m-1, with no host sync in between."""
        m = self.mapping
        dev_list = jax.devices()[:m.world_size]
        if jax.process_count() > 1 and \
                os.environ.get("TLLM_PP_CROSS_HOST_TRANSFER") != "1":
            # multi-host without DCN cross-host device transfers
            # (jax_cross_host_transfer_socket_address unset): lay the PP
            # axis out FASTEST so each stage takes one device per host —
            # every process then owns a shard of every stage and the
            # activation handoff never needs a cross-host device_put
            # (in-stage collectives ride the jitted programs, which span
            # processes fine).  Set TLLM_PP_CROSS_HOST_TRANSFER=1 on pods
            # with the DCN-transfer flags to keep stages host-local.
            devs = np.array(dev_list).reshape(
                m.dp_size, m.cp_size, m.moe_ep_size, m.moe_tp_size,
                m.pp_size)
            devs = np.moveaxis(devs, -1, 1)
        else:
            devs = np.array(dev_list).reshape(
                m.dp_size, m.pp_size, m.cp_size, m.moe_ep_size,
                m.moe_tp_size)
        L = self.model.cfg.num_layers
        base, rem = divmod(L, m.pp_size)
        full_specs = self.model.param_specs()
        pools = self.kv_manager.allocate_pools()
        tied = self.model.cfg.tie_word_embeddings

        self.mesh = None
        self.pp_stages = []
        lo = 0
        for s in range(m.pp_size):
            hi = lo + base + (1 if s < rem else 0)
            mesh = jax.sharding.Mesh(devs[:, s], ("dp", "cp", "ep", "tp"))
            p = {"rope": params["rope"], "layers": list(params["layers"][lo:hi])}
            spec = {"rope": full_specs["rope"],
                    "layers": list(full_specs["layers"][lo:hi])}
            if "rope_local" in params:
                p["rope_local"] = params["rope_local"]
                spec["rope_local"] = full_specs["rope_local"]
            if s == 0 or (s == m.pp_size - 1 and tied):
                p["embedding"] = params["embedding"]
                spec["embedding"] = full_specs["embedding"]
            if s == m.pp_size - 1:
                p["final_norm"] = params["final_norm"]
                spec["final_norm"] = full_specs["final_norm"]
                if not tied:
                    p["lm_head"] = params["lm_head"]
                    spec["lm_head"] = full_specs["lm_head"]
            shardings = jax.tree.map(lambda sp: NamedSharding(mesh, sp),
                                     prune_specs(spec, p),
                                     is_leaf=lambda x: isinstance(x, P))
            stage_pools = pools[lo:hi]
            cache_specs = jax.tree.map(self._cache_leaf_spec, stage_pools)
            cache_shardings = jax.tree.map(
                lambda sp: NamedSharding(mesh, sp), cache_specs,
                is_leaf=lambda x: isinstance(x, P))
            self.pp_stages.append({
                "mesh": mesh,
                "lo": lo, "hi": hi,
                "params": jax.device_put(p, shardings),
                "specs": prune_specs(spec, p),
                "caches": jax.device_put(stage_pools, cache_shardings),
                "cache_specs": cache_specs,
                "fns": {},
            })
            lo = hi

    # ------------------------------------------------------------------ disagg ---
    def _mesh_ctx(self, mesh=None):
        """Mesh context for EAGER ops on explicitly-sharded arrays (the
        disagg gather/scatter paths run outside jit)."""
        from contextlib import nullcontext
        m = mesh if mesh is not None else self.mesh
        return jax.set_mesh(m) if m is not None else nullcontext()

    def extract_kv_blocks(self, block_ids, ring_ids=None) -> list:
        """Gather whole KV pages for a sequence to host memory — the send
        side of disaggregated prefill/decode (reference CacheTransceiver /
        cacheFormatter; our transfer plane is host DMA + DCN instead of
        UCX/NIXL RDMA).  Returns one pytree of np arrays per layer, each leaf
        [n_blocks, ...page dims...].  VSWA sliding layers are extracted by
        their ring tables (ring offsets are position-derived, so they line
        up on any receiver with the same ring capacity)."""
        ids = jnp.asarray(np.asarray(block_ids, np.int32))
        rids = (ids if ring_ids is None
                else jnp.asarray(np.asarray(ring_ids, np.int32)))
        sliding = self.kv_manager.sliding_layers if self._vswa else set()

        def pull(layer, i, mesh=None):
            with self._mesh_ctx(mesh):
                return jax.tree.map(
                    lambda c: (np.asarray(c[rids if i in sliding else ids])
                               if c.ndim >= 3 else np.zeros((0,), np.int32)),
                    layer)

        with self.lock:
            if self.pp_size > 1:
                out = []
                i = 0
                for st in self.pp_stages:
                    for layer in st["caches"]:
                        out.append(pull(layer, i, st["mesh"]))
                        i += 1
                return out
            return [pull(layer, i)
                    for i, layer in enumerate(self.kv_caches)]

    def inject_kv_blocks(self, block_ids, host_layers: list, ring_ids=None):
        """Scatter transferred KV pages into this engine's pools (receive
        side of disaggregated serving)."""
        ids = jnp.asarray(np.asarray(block_ids, np.int32))
        rids = (ids if ring_ids is None
                else jnp.asarray(np.asarray(ring_ids, np.int32)))
        sliding = self.kv_manager.sliding_layers if self._vswa else set()

        def put_layer(cache_layer, host_layer, layer_idx):
            # match by leaf order so deserialized payloads (flat leaf lists)
            # and structured pytrees both work
            tgt = rids if layer_idx in sliding else ids
            leaves_c, treedef = jax.tree.flatten(cache_layer)
            leaves_h = jax.tree.leaves(host_layer)
            new = [c if np.asarray(h).size == 0
                   else c.at[tgt].set(jnp.asarray(h).astype(c.dtype))
                   for c, h in zip(leaves_c, leaves_h)]
            return jax.tree.unflatten(treedef, new)

        with self.lock:
            if self.pp_size > 1:
                i = 0
                for st in self.pp_stages:
                    n = st["hi"] - st["lo"]
                    with self._mesh_ctx(st["mesh"]):
                        st["caches"] = [
                            put_layer(st["caches"][j], host_layers[i + j],
                                      i + j)
                            for j in range(n)]
                    i += n
                return
            with self._mesh_ctx():
                self.kv_caches = [
                    put_layer(self.kv_caches[i], host_layers[i], i)
                    for i in range(len(self.kv_caches))]

    def release_weight_memory(self):
        """Page model weights off the device (RLHF rollout support —
        reference /release_memory + _torch/virtual_memory.py): leaves move
        to host RAM with their shardings remembered; device HBM is freed
        once the last in-flight computation referencing them completes."""
        with self.lock:
            if getattr(self, "_released_params", None) is not None:
                return

            def offload(tree):
                host = jax.tree.map(
                    lambda a: np.asarray(a) if isinstance(a, jax.Array)
                    else a, tree)
                shards = jax.tree.map(
                    lambda a: a.sharding if isinstance(a, jax.Array)
                    else None, tree)
                return host, shards

            if self.pp_size > 1:
                self._released_params = [offload(st["params"])
                                         for st in self.pp_stages]
                for st in self.pp_stages:
                    st["params"] = None
            else:
                self._released_params = offload(self.params)
                self.params = None

    def resume_weight_memory(self):
        """Re-upload weights released by release_weight_memory (reference
        /resume_memory)."""
        with self.lock:
            rel = getattr(self, "_released_params", None)
            if rel is None:
                return

            def onload(host, shards):
                return jax.tree.map(
                    lambda h, s: (jax.device_put(h, s) if s is not None
                                  else h), host, shards)

            if self.pp_size > 1:
                for st, (host, shards) in zip(self.pp_stages, rel):
                    st["params"] = onload(host, shards)
            else:
                self.params = onload(*rel)
            self._released_params = None

    def update_params(self, params: Dict):
        """Hot-swap weights under the engine lock (RLHF weight update —
        reference /update_weights). Placement mirrors __init__."""
        with self.lock:
            # a new leaf (e.g. the load balancer installing expert_map)
            # changes the params pytree structure: cached jitted step fns
            # close over shard_map in_specs built for the OLD tree and would
            # crash on first use — drop them so they rebuild lazily
            old = getattr(self, "params", None)
            if old is not None and (jax.tree_util.tree_structure(old)
                                    != jax.tree_util.tree_structure(params)):
                self._fns = {}
            if self.pp_size > 1:
                tied = self.model.cfg.tie_word_embeddings
                last = len(self.pp_stages) - 1
                for s, st in enumerate(self.pp_stages):
                    p = {"rope": params["rope"],
                         "layers": list(params["layers"][st["lo"]:st["hi"]])}
                    if "rope_local" in params:
                        p["rope_local"] = params["rope_local"]
                    if s == 0 or (s == last and tied):
                        p["embedding"] = params["embedding"]
                    if s == last:
                        p["final_norm"] = params["final_norm"]
                        if not tied:
                            p["lm_head"] = params["lm_head"]
                    shardings = jax.tree.map(
                        lambda sp, m=st["mesh"]: NamedSharding(m, sp),
                        st["specs"], is_leaf=lambda x: isinstance(x, P))
                    st["params"] = jax.device_put(p, shardings)
                return
            if self.mesh is not None:
                # re-prune: runtime features (expert_map, lora) may have
                # added keys since init
                specs = prune_specs(self.model.param_specs(), params)
                shardings = jax.tree.map(
                    lambda s: NamedSharding(self.mesh, s), specs,
                    is_leaf=lambda x: isinstance(x, P))
                self._param_specs = specs
                self.params = jax.device_put(params, shardings)
            else:
                self.params = jax.device_put(params)

    def _make_pp_stage_fn(self, mode: str, s: int):
        model = self.model
        st = self.pp_stages[s]
        lo, hi = st["lo"], st["hi"]
        first, last = s == 0, s == len(self.pp_stages) - 1

        vswa = self._vswa

        def step(params, caches, x_or_ids, positions, slot_mapping,
                 block_tables, kv_lens, q_offset, logit_indices, seq_slots,
                 lora_ids, local_slots, local_tables):
            meta = AttentionMetadata(
                positions=positions, slot_mapping=slot_mapping,
                block_tables=block_tables, kv_lens=kv_lens,
                q_offset=q_offset, seq_slots=seq_slots, lora_ids=lora_ids,
                local_slot_mapping=local_slots if vswa else None,
                local_block_tables=local_tables if vswa else None,
                mode="prefill" if mode.startswith("prefill") else mode)
            if first and last:
                raise AssertionError("pp_size must be > 1 here")
            if first:
                if mode.endswith("_embeds"):
                    h = x_or_ids.astype(model.cfg.dtype)
                    return model._run_layers(params, h, None, caches, meta,
                                             lo, hi)
                return model.forward_first_stage(params, x_or_ids, caches,
                                                 meta, hi)
            if last:
                return model.forward_last_stage(params, x_or_ids, caches,
                                                meta, lo, logit_indices)
            return model.forward_mid_stage(params, x_or_ids, caches, meta,
                                           lo, hi)

        step = jax.shard_map(
            step, mesh=st["mesh"],
            in_specs=(st["specs"], st["cache_specs"],
                      P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), st["cache_specs"]),
            check_vma=False)
        return jax.jit(step, donate_argnums=(1,))

    def _pp_put(self, x, mesh):
        """Move a stage-replicated array onto another stage's mesh.

        Single host: a plain device copy (ICI, async).  Multi-host without
        DCN cross-host device transfers: the multihost layout gives every
        process a shard of every stage (see _init_pp), so hop through the
        local replicated host copy and place this process's shards."""
        tgt = NamedSharding(mesh, P())
        try:
            return jax.device_put(x, tgt)
        except ValueError:
            return jax.device_put(np.asarray(x.addressable_data(0)), tgt)

    def _run_pp(self, mode: str, inputs: StepInputs):
        with self.lock:
            h = jnp.asarray(inputs.input_embeds
                            if inputs.input_embeds is not None
                            else inputs.input_ids)
            ls, lt = self._locals_of(inputs)
            common = (jnp.asarray(inputs.positions),
                      jnp.asarray(inputs.slot_mapping),
                      jnp.asarray(inputs.block_tables),
                      jnp.asarray(inputs.kv_lens),
                      jnp.asarray(inputs.q_offset),
                      jnp.asarray(inputs.logit_indices),
                      jnp.asarray(inputs.seq_slots),
                      jnp.asarray(inputs.lora_ids), ls, lt)
            for s, st in enumerate(self.pp_stages):
                if mode not in st["fns"]:
                    st["fns"][mode] = self._make_pp_stage_fn(mode, s)
                if s > 0:
                    # stage handoff: ICI transfer, no host sync
                    h = self._pp_put(h, st["mesh"])
                h, st["caches"] = st["fns"][mode](
                    st["params"], st["caches"], h, *common)
            return h

    def _copy_kv_blocks_pp(self, pairs):
        src = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
        dst = jnp.asarray(np.array([p[1] for p in pairs], np.int32))
        with self.lock:
            for st in self.pp_stages:
                st["caches"] = jax.tree.map(
                    lambda c: (c.at[dst].set(c[src])
                               if c.ndim >= 3 else c), st["caches"])

    def _cache_leaf_spec(self, leaf) -> P:
        """Block axis "dp"-sharded (attention-DP: each replica owns its
        blocks), head axis ("cp","ep","tp")-sharded; data pools are 4D,
        scale pools 3D.  Single-head pools (MLA latents) keep heads
        replicated."""
        dp = "dp" if self.mapping.dp_size > 1 else None
        if self._helix or self._star:
            # helix/star CP: the BLOCK axis is sharded (each rank owns its
            # block-cyclic / contiguous shard of every sequence); heads stay
            # TP-sharded
            dp = ("dp", "cp") if dp else "cp"
        # ring CP keeps pools replicated over "cp" (writes are all-gathered);
        # Ulysses shards the head axis over cp
        heads = (("cp", "ep", "tp") if self.mapping.cp_type == "ulysses"
                 else ("ep", "tp"))
        if leaf.ndim == 1:
            # MoE expert-load counters: one slice per expert-parallel rank
            return P("ep")
        if leaf.shape[1] == 1:
            return P(dp, *([None] * (leaf.ndim - 1)))
        if leaf.ndim == 4:
            return P(dp, heads, None, None)
        return P(dp, heads, None)

    # ------------------------------------------------------------------ step fns --
    def _make_multi_step_fn(self, num_steps: int):
        """k fused decode steps with on-device sampling (lax.scan).

        The TPU analog of capturing several decode iterations in one CUDA
        graph: one dispatch produces `num_steps` tokens per sequence, with
        sampling (temperature/top-k/top-p) running on device between steps.
        Slot mappings for future positions are precomputed on host
        (blocks are pre-grown), so the scan is fully static-shaped.
        """
        from tensorrt_llm_tpu.runtime.sampler import sample_tokens

        model = self.model

        vswa = self._vswa
        unroll = (os.environ.get("TLLM_MULTI_STEP_UNROLL", "0") == "1"
                  or self._multi_step_mode() == "unroll")

        def steps(params, kv_caches, first_ids, positions0, slot_table,
                  block_tables, kv_lens0, sampling_state, seq_slots,
                  lora_ids, local_slot_table, local_tables):
            B = first_ids.shape[0]

            def body(carry, step_xs):
                step_slots, step_local = step_xs
                caches, ids, pos, kv_lens, key_step = carry
                meta = AttentionMetadata(
                    positions=pos,
                    slot_mapping=step_slots,
                    block_tables=block_tables,
                    kv_lens=kv_lens,
                    q_offset=jnp.int32(0),
                    seq_slots=seq_slots,
                    lora_ids=lora_ids,
                    local_slot_mapping=step_local if vswa else None,
                    local_block_tables=local_tables if vswa else None,
                    mode="decode",
                )
                logits, caches = model.forward(
                    params, ids, caches, meta,
                    jnp.arange(B, dtype=jnp.int32))
                tokens, logp = sample_tokens(logits, sampling_state,
                                             step_offset=key_step)
                return ((caches, tokens, pos + 1, kv_lens + 1, key_step + 1),
                        (tokens, logp))

            carry0 = (kv_caches, first_ids, positions0, kv_lens0,
                      jnp.int32(0))
            if unroll:
                # unrolled k-step body: identical math, no while-loop HLO.
                # Escape hatch for lax.scan misbehavior at full model depth
                # on real hardware (r4: 22-layer scan hangs, 1-layer OK)
                carry, ys = carry0, []
                for j in range(num_steps):
                    carry, y = body(carry, (slot_table[j],
                                            local_slot_table[j]))
                    ys.append(y)
                kv_caches = carry[0]
                toks = jnp.stack([y[0] for y in ys])
                logps = jnp.stack([y[1] for y in ys])
            else:
                (kv_caches, _, _, _, _), (toks, logps) = jax.lax.scan(
                    body, carry0,
                    (slot_table, local_slot_table))  # each [k, B]
            return toks, logps, kv_caches

        if self.mesh is not None:
            cache_spec = self._cache_specs
            if self.mapping.dp_size > 1:
                # attention-DP: rank-grouped rows ride the batch axis —
                # row-wise inputs (ids/positions/tables/lens/sampling
                # state) shard over "dp"; slot tables shard their row dim
                from tensorrt_llm_tpu.runtime.sampler import SamplingState
                d = P("dp")
                kB = P(None, "dp")
                state_spec = SamplingState(
                    temperature=d, top_k=d, top_p=d, min_p=d, greedy=d,
                    seeds=d)
                lt_spec = d if self._vswa else P()   # dummy [1,1] if off
                # replicate sampled tokens/logps in-graph (multi-host: the
                # host can only fetch fully-addressable arrays)
                inner = steps

                def steps(params, caches, *rest):
                    toks, logps, nc = inner(params, caches, *rest)
                    return (jax.lax.all_gather(toks, "dp", axis=1,
                                               tiled=True),
                            jax.lax.all_gather(logps, "dp", axis=1,
                                               tiled=True), nc)
                steps = jax.shard_map(
                    steps, mesh=self.mesh,
                    in_specs=(self._param_specs, cache_spec,
                              d, d, kB, d, d, state_spec, d, d, kB,
                              lt_spec),
                    out_specs=(P(), P(), cache_spec),
                    check_vma=False,
                )
                return jax.jit(steps, donate_argnums=(1,))
            steps = jax.shard_map(
                steps, mesh=self.mesh,
                in_specs=(self._param_specs, cache_spec,
                          P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
                out_specs=(P(), P(), cache_spec),
                check_vma=False,
            )
        return jax.jit(steps, donate_argnums=(1,))

    def _multi_step_mode(self) -> str:
        """How k fused decode steps execute.  "chain" (TPU default):
        k separate single-step dispatches with on-device sampling, the
        next step's ids fed from the previous step's DEVICE tokens — no
        host sync inside the chunk, and in-place KV scatter aliasing
        works because each XLA program touches each pool once (exactly
        the proven single-step pattern; donation chains buffers across
        dispatches).  "scan"/"unroll": one fused program — measured
        pathological on v5e at real pool sizes because the multi-step
        program copies the pools between steps (r5_benchmin: k=2 ~20s
        per dispatch on free-mem-sized pools, k=4 aborts the device;
        benchmarks/tpu_return_logs/r5_benchmin_k*.log, r5_aot_*.log).
        The CPU default stays "scan" (fast compiles, no pathology)."""
        mode = os.environ.get("TLLM_MULTI_STEP_MODE", "auto")
        if mode == "auto":
            import jax as _j
            return "chain" if _j.default_backend() != "cpu" else "scan"
        return mode

    def _make_chain_step_fn(self):
        """One decode step + on-device sampling: (tokens [B], logps [B],
        caches).  The chain-mode building block.

        EVERYTHING per-step derives ON DEVICE from per-composition
        uploads: positions/kv_lens = base + step offset, flat write
        slots = block_tables[pos // bs] * bs + pos % bs (VSWA ring slots
        from the ring tables at pos % ring_capacity — exactly
        KVCacheManager.local_slot_mapping's arithmetic).  On the
        tunnel-attached chip a fresh-content upload costs ~100 ms while
        dispatches are free (r5 probe), so the steady-state decode loop
        must upload nothing but the cached step-offset scalar."""
        from tensorrt_llm_tpu.runtime.sampler import sample_tokens

        model = self.model
        vswa = self._vswa
        bs = self.kv_manager.block_size
        ring_cap = (int(self.kv_manager.ring_capacity)
                    if vswa else 0)

        def step(params, kv_caches, ids, pos_base, block_tables,
                 len_base, sampling_state, seq_slots, lora_ids,
                 local_tables, step_off):
            B = ids.shape[0]
            positions = pos_base + step_off
            slots = (jnp.take_along_axis(
                block_tables, (positions // bs)[:, None], axis=1)[:, 0]
                * bs + positions % bs)
            lslots = None
            if vswa:
                pm = positions % ring_cap
                lslots = (jnp.take_along_axis(
                    local_tables, (pm // bs)[:, None], axis=1)[:, 0]
                    * bs + pm % bs)
            meta = AttentionMetadata(
                positions=positions,
                slot_mapping=slots,
                block_tables=block_tables,
                kv_lens=len_base + step_off,
                q_offset=jnp.int32(0),
                seq_slots=seq_slots,
                lora_ids=lora_ids,
                local_slot_mapping=lslots,
                local_block_tables=local_tables if vswa else None,
                mode="decode",
            )
            logits, caches = model.forward(
                params, ids, kv_caches, meta,
                jnp.arange(B, dtype=jnp.int32))
            tokens, logp = sample_tokens(logits, sampling_state,
                                         step_offset=step_off)
            return tokens, logp, caches

        if self.mesh is not None:
            cache_spec = self._cache_specs
            if self.mapping.dp_size > 1:
                from tensorrt_llm_tpu.runtime.sampler import SamplingState
                d = P("dp")
                state_spec = SamplingState(
                    temperature=d, top_k=d, top_p=d, min_p=d, greedy=d,
                    seeds=d)
                lt_spec = d if self._vswa else P()
                inner = step

                def step(params, caches, *rest):
                    t, lp, nc = inner(params, caches, *rest)
                    return (jax.lax.all_gather(t, "dp", axis=0,
                                               tiled=True),
                            jax.lax.all_gather(lp, "dp", axis=0,
                                               tiled=True), nc)
                step = jax.shard_map(
                    step, mesh=self.mesh,
                    in_specs=(self._param_specs, cache_spec,
                              d, d, d, d, state_spec, d, d,
                              lt_spec, P()),
                    out_specs=(P(), P(), cache_spec),
                    check_vma=False,
                )
                return jax.jit(step, donate_argnums=(1,))
            step = jax.shard_map(
                step, mesh=self.mesh,
                in_specs=(self._param_specs, cache_spec,
                          P(), P(), P(), P(), P(), P(), P(),
                          P(), P()),
                out_specs=(P(), P(), cache_spec),
                check_vma=False,
            )
        return jax.jit(step, donate_argnums=(1,))

    @property
    def multi_step_needs_slot_tables(self) -> bool:
        """Chain mode derives write slots in-graph; the executor can skip
        the O(k x B) host slot_mapping loops per chunk."""
        return self._multi_step_mode() != "chain" or self.pp_size > 1

    def _step_scalar(self, j: int):
        """Cached device scalar for step offset j — a fresh jnp.int32 in
        the decode loop is a fresh-content upload (~100 ms on the tunnel;
        the axon client content-caches repeats)."""
        cache = getattr(self, "_step_scalar_cache", None)
        if cache is None:
            cache = self._step_scalar_cache = {}
        s = cache.get(j)
        if s is None:
            s = cache[j] = jnp.int32(j)
        return s

    def _chain_dev_array(self, name: str, host) -> jax.Array:
        """Device copy of a host array re-uploaded ONLY when the content
        changes (uploads cost ~100 ms on the tunnel; np comparison of a
        [B, MB] table is microseconds)."""
        cache = getattr(self, "_chain_dev", None)
        if cache is None:
            cache = self._chain_dev = {}
        host = np.asarray(host)
        ent = cache.get(name)
        if (ent is None or ent[0].shape != host.shape
                or ent[0].dtype != host.dtype
                or not np.array_equal(ent[0], host)):
            ent = cache[name] = (host.copy(), jnp.asarray(host))
        return ent[1]

    def _run_decode_chain(self, inputs: StepInputs, num_steps: int,
                          sampling_state, slot_table,
                          local_slot_table=None):
        # slot tables are ignored: the chain derives write slots on device
        # from the block tables + positions (identical arithmetic to
        # KVCacheManager.slot_mapping / local_slot_mapping)
        if "chain_step" not in self._fns:
            self._fns["chain_step"] = self._make_chain_step_fn()
        fn = self._fns["chain_step"]
        if inputs.local_block_tables is not None:
            lt = self._chain_dev_array("lt", inputs.local_block_tables)
        else:
            _, lt = self._locals_of(inputs)

        # steady-state chunks of a stable composition upload NOTHING:
        # positions/kv_lens advance uniformly, so they ride the cached
        # base arrays + the step-offset scalar.  Padding rows (pos 0,
        # len 1) ride too: their in-graph slots resolve through the
        # all-zeros pad table row to reserved page 0 at any offset.
        cache = getattr(self, "_chain_dev", None)
        if cache is None:
            cache = self._chain_dev = {}
        pos_h = np.asarray(inputs.positions)
        lens_h = np.asarray(inputs.kv_lens)
        base = cache.get("pos_base")
        off0 = 0
        reuse = False
        if base is not None and base[0].shape == pos_h.shape:
            dpos = pos_h.astype(np.int64) - base[0]
            dlen = lens_h.astype(np.int64) - cache["len_base"][0]
            real = pos_h > 0
            du = np.unique(dpos[real])
            if (du.size == 1 and du[0] >= 0
                    and (dpos[~real] == 0).all()
                    and (dlen[real] == du[0]).all()
                    and (dlen[~real] == 0).all()):
                off0 = int(du[0])
                reuse = True
        if not reuse:
            cache["pos_base"] = (pos_h.copy(), jnp.asarray(pos_h))
            cache["len_base"] = (lens_h.copy(), jnp.asarray(lens_h))
        pos0 = cache["pos_base"][1]
        lens0 = cache["len_base"][1]
        bt = self._chain_dev_array("bt", inputs.block_tables)
        ss = self._chain_dev_array("ss", inputs.seq_slots)
        li = self._chain_dev_array("li", inputs.lora_ids)
        ids = (inputs.input_ids if hasattr(inputs.input_ids, "devices")
               else jnp.asarray(inputs.input_ids))

        toks_l, logps_l = [], []
        with self.lock:
            for j in range(num_steps):
                toks_j, logps_j, self.kv_caches = fn(
                    self.params, self.kv_caches, ids, pos0, bt,
                    lens0, sampling_state, ss, li, lt,
                    self._step_scalar(off0 + j))
                ids = toks_j
                toks_l.append(toks_j)
                logps_l.append(logps_j)
        toks = jnp.stack(toks_l)
        logps = jnp.stack(logps_l)
        if os.environ.get("TLLM_SYNC_DISPATCH") == "1":
            jax.block_until_ready(toks)
        return toks, logps

    def run_decode_multi(self, inputs: StepInputs, num_steps: int,
                         sampling_state, slot_table: np.ndarray,
                         local_slot_table: Optional[np.ndarray] = None):
        """Run `num_steps` fused decode steps. Returns (tokens [k, B],
        logprobs [k, B]) as device arrays."""
        if self.pp_size > 1:
            return self._run_decode_multi_pp(inputs, num_steps,
                                             sampling_state, slot_table,
                                             local_slot_table)
        if self._multi_step_mode() == "chain":
            return self._run_decode_chain(inputs, num_steps,
                                          sampling_state, slot_table,
                                          local_slot_table)
        key = ("multi", num_steps)
        if key not in self._fns:
            self._fns[key] = self._make_multi_step_fn(num_steps)
        fn = self._fns[key]
        if local_slot_table is None:
            local_slot_table = np.zeros_like(np.asarray(slot_table))
        _, lt = self._locals_of(inputs)
        with self.lock:
            toks, logps, self.kv_caches = fn(
                self.params, self.kv_caches,
                jnp.asarray(inputs.input_ids), jnp.asarray(inputs.positions),
                jnp.asarray(slot_table), jnp.asarray(inputs.block_tables),
                jnp.asarray(inputs.kv_lens), sampling_state,
                jnp.asarray(inputs.seq_slots),
                jnp.asarray(inputs.lora_ids),
                jnp.asarray(local_slot_table), lt)
        if os.environ.get("TLLM_SYNC_DISPATCH") == "1":
            jax.block_until_ready(toks)
        return toks, logps

    def _run_decode_multi_pp(self, inputs: StepInputs, num_steps: int,
                             sampling_state, slot_table,
                             local_slot_table=None):
        """Multi-step decode under PP: chained stage dispatches with
        on-device sampling between steps — step k+1's input ids are step
        k's sampled tokens as DEVICE arrays, so the host never syncs
        inside the chunk (the PP analog of the fused lax.scan; the
        reference likewise runs its overlap loop under PP,
        py_executor.py:1101)."""
        from dataclasses import replace as _dc_replace

        from tensorrt_llm_tpu.runtime.sampler import sample_tokens
        if "pp_sample" not in self._fns:
            self._fns["pp_sample"] = jax.jit(
                lambda lg, st, k: sample_tokens(lg, st, step_offset=k))
        samp = self._fns["pp_sample"]
        slot_table = np.asarray(slot_table)
        lst = (np.asarray(local_slot_table)
               if local_slot_table is not None else None)
        ids = jnp.asarray(inputs.input_ids)
        pos = jnp.asarray(inputs.positions)
        lens = jnp.asarray(inputs.kv_lens)
        toks, logps = [], []
        for k in range(num_steps):
            si = _dc_replace(inputs, input_ids=ids, positions=pos,
                             kv_lens=lens, slot_mapping=slot_table[k])
            if lst is not None and self._vswa:
                si.local_slot_mapping = lst[k]
            logits = self._run_pp("decode", si)
            t, lp = samp(logits, sampling_state, jnp.int32(k))
            toks.append(t)
            logps.append(lp)
            # sampled on the LAST stage's mesh — hand back to stage 0 for
            # the next step (ICI transfer, still no host sync)
            ids = self._pp_put(t, self.pp_stages[0]["mesh"])
            pos, lens = pos + 1, lens + 1
        return jnp.stack(toks), jnp.stack(logps)

    def _make_step_fn(self, mode: str, with_hidden: bool = False,
                      capture: str = "final", embeds_input: bool = False):
        model = self.model

        vswa = self._vswa

        is_mrope = self._mrope

        def step(params, kv_caches, input_x, positions, slot_mapping,
                 block_tables, kv_lens, q_offset, logit_indices, seq_slots,
                 lora_ids, local_slots, local_tables):
            mrope = None
            if is_mrope and positions.shape[0] == 4 * input_x.shape[0]:
                Tp = input_x.shape[0]
                mrope = positions[Tp:].reshape(3, Tp)
                positions = positions[:Tp]
            meta = AttentionMetadata(
                positions=positions,
                slot_mapping=slot_mapping,
                block_tables=block_tables,
                kv_lens=kv_lens,
                q_offset=q_offset,
                seq_slots=seq_slots,
                lora_ids=lora_ids,
                local_slot_mapping=local_slots if vswa else None,
                local_block_tables=local_tables if vswa else None,
                mrope_positions=mrope,
                mode="prefill" if mode.startswith("prefill") else mode,
            )
            ids = None if embeds_input else input_x
            emb = input_x if embeds_input else None
            if with_hidden:
                return model.forward(params, ids, kv_caches, meta,
                                     logit_indices, return_hidden=True,
                                     capture=capture, input_embeds=emb)
            logits, new_caches = model.forward(
                params, ids, kv_caches, meta, logit_indices,
                input_embeds=emb)
            return logits, new_caches

        if self.mesh is not None:
            cache_spec = self._cache_specs
            out_specs = ((P(), P(), cache_spec) if with_hidden
                         else (P(), cache_spec))
            # Ulysses prefill: input token ids arrive sequence-sharded over
            # "cp"; everything else (positions, slots, tables) is replicated
            # since every rank writes its head slice for all tokens
            # helix replicates tokens over cp (only KV is sharded);
            # ulysses/ring shard the prefill sequence
            ids_spec = (P("cp") if (not self._helix
                                    and self.mapping.cp_size > 1
                                    and mode == "prefill") else P())
            if self.mapping.dp_size > 1:
                # attention-DP: decode shards the batch dim over "dp";
                # prefill replicates compute but per-rank slot/table inputs
                # steer the KV writes to the owner rank's pool slice
                d = P("dp")
                if mode.startswith("prefill"):
                    in_data = (ids_spec, P(), d, d, d, P(), P(), d, P(),
                               P(), P())
                else:
                    in_data = (d, d, d, d, d, P(), d, d, d, P(), P())
                # all-gather the dp-stacked outputs in-graph so they are
                # fully addressable on EVERY process (multi-host: a rank
                # cannot fetch another host's shard; the global shape the
                # host sees is unchanged)
                inner = step
                if with_hidden:
                    def step(params, caches, *rest):
                        lg, hd, nc = inner(params, caches, *rest)
                        return (jax.lax.all_gather(lg, "dp", axis=0,
                                                   tiled=True),
                                jax.lax.all_gather(hd, "dp", axis=0,
                                                   tiled=True), nc)
                else:
                    def step(params, caches, *rest):
                        lg, nc = inner(params, caches, *rest)
                        return jax.lax.all_gather(lg, "dp", axis=0,
                                                  tiled=True), nc
                out_specs = ((P(), P(), cache_spec) if with_hidden
                             else (P(), cache_spec))
                step = jax.shard_map(
                    step, mesh=self.mesh,
                    in_specs=(self._param_specs, cache_spec, *in_data),
                    out_specs=out_specs,
                    check_vma=False,
                )
                return jax.jit(step, donate_argnums=(1,))
            if self._star:
                # star CP: prefill rows are [anchor; chunk_r] per rank —
                # ids/positions/slots/lens/logit rows/lora all "cp"-sharded,
                # logits come back rank-stacked; decode replicates the
                # query row but shards the per-rank KV tables/local lens
                s = P("cp")
                if mode.startswith("prefill"):
                    in_data = (s, s, s, s, s, P(), s, P(), s, P(), P())
                    # rank-stacked logits all-gather in-graph so every
                    # process can fetch them (multihost star CP)
                    inner_star = step
                    if with_hidden:
                        def step(params, caches, *rest):
                            lg, hd, nc = inner_star(params, caches, *rest)
                            return (jax.lax.all_gather(lg, "cp", axis=0,
                                                       tiled=True), hd, nc)
                    else:
                        def step(params, caches, *rest):
                            lg, nc = inner_star(params, caches, *rest)
                            return jax.lax.all_gather(lg, "cp", axis=0,
                                                      tiled=True), nc
                    out_specs = ((P(), P(), cache_spec) if with_hidden
                                 else (P(), cache_spec))
                else:
                    in_data = (P(), P(), s, s, s, P(), P(), P(), P(), P(),
                               P())
                step = jax.shard_map(
                    step, mesh=self.mesh,
                    in_specs=(self._param_specs, cache_spec, *in_data),
                    out_specs=out_specs,
                    check_vma=False,
                )
                return jax.jit(step, donate_argnums=(1,))
            c = P("cp") if self._helix else P()
            step = jax.shard_map(
                step, mesh=self.mesh,
                in_specs=(self._param_specs, cache_spec, ids_spec,
                          P(), c, c, P(), P(), P(), P(), P(), P(), P()),
                out_specs=out_specs,
                check_vma=False,
            )
        return jax.jit(step, donate_argnums=(1,))

    def _get_fn(self, mode: str):
        if mode not in self._fns:
            self._fns[mode] = self._make_step_fn(
                mode, embeds_input=mode.endswith("_embeds"))
        return self._fns[mode]

    # ------------------------------------------------------------------ blocks ---
    def copy_kv_blocks(self, pairs, ring_pairs=None, owner: int = 0):
        """Device-copy KV pages src->dst in every layer pool (beam-search
        fork tails).  Pairs are padded to a small bucket; (0,0) pads copy the
        null block onto itself.  ring_pairs: VSWA sliding-layer ring copies
        (applied to the sliding layers' local pools instead).  Under
        attention-DP the block ids are owner-rank local: other ranks get
        (0,0) null pads so their pool shards are untouched."""
        if not pairs and not ring_pairs:
            return
        cp_banded = bool(pairs) and isinstance(pairs[0], (list, tuple)) \
            and (not pairs[0] or isinstance(pairs[0][0], (list, tuple)))
        if cp_banded and not any(pairs):
            return
        if self.pp_size > 1:
            self._copy_kv_blocks_pp(pairs)
            return

        def bucket(ps):
            n = 8
            while n < len(ps):
                n *= 2
            src = np.zeros(n, np.int32)
            dst = np.zeros(n, np.int32)
            for i, (s, d) in enumerate(ps):
                src[i], dst[i] = s, d
            return src, dst

        if cp_banded:
            # helix/star CP: per-rank pair lists -> [cp, n] id rows so each
            # mesh rank copies only inside its own block-axis shard
            n = 8
            while n < max(len(p) for p in pairs):
                n *= 2
            src = np.zeros((len(pairs), n), np.int32)
            dst = np.zeros((len(pairs), n), np.int32)
            for r, ps in enumerate(pairs):
                for i, (a, b) in enumerate(ps):
                    src[r, i], dst[r, i] = a, b
        else:
            src, dst = bucket(pairs or [])
        sliding = self.kv_manager.sliding_layers if self._vswa else set()
        dp = self.mapping.dp_size
        if self._vswa:
            lsrc, ldst = bucket(ring_pairs or [])
        else:
            lsrc, ldst = np.zeros(1, np.int32), np.zeros(1, np.int32)

        if dp > 1:
            # per-rank id rows: owner gets the real pairs, everyone else
            # copies the null block onto itself
            def band(ids):
                out = np.zeros((dp, len(ids)), np.int32)
                out[owner] = ids
                return out
            src, dst, lsrc, ldst = band(src), band(dst), band(lsrc), \
                band(ldst)

        key = ("copy_blocks", src.shape, lsrc.shape)
        if key not in self._fns:
            def copy(caches, src_ids, dst_ids, lsrc_ids, ldst_ids):
                # only page pools (ndim>=3) are block-indexed; 1-D leaves
                # (expert-load counters) pass through.  Sliding layers use
                # the ring ids (their pools are smaller).
                src_ids, dst_ids = src_ids.reshape(-1), dst_ids.reshape(-1)
                lsrc_ids, ldst_ids = (lsrc_ids.reshape(-1),
                                      ldst_ids.reshape(-1))
                out = []
                for i, layer in enumerate(caches):
                    s, d = ((lsrc_ids, ldst_ids) if i in sliding
                            else (src_ids, dst_ids))
                    out.append(jax.tree.map(
                        lambda c: (c.at[d].set(c[s])
                                   if c.ndim >= 3 else c), layer))
                return out
            if self.mesh is not None:
                cache_spec = self._cache_specs
                if cp_banded:
                    ids, lids = P("cp"), P()   # no VSWA rings under CP
                elif dp > 1:
                    ids = lids = P("dp")
                else:
                    ids = lids = P()
                copy = jax.shard_map(
                    copy, mesh=self.mesh,
                    in_specs=(cache_spec, ids, ids, lids, lids),
                    out_specs=cache_spec, check_vma=False)
            self._fns[key] = jax.jit(copy, donate_argnums=(0,))
        with self.lock:
            self.kv_caches = self._fns[key](
                self.kv_caches, jnp.asarray(src), jnp.asarray(dst),
                jnp.asarray(lsrc), jnp.asarray(ldst))

    # ---------------------------------------------------------------- cross ----
    def inject_cross_states(self, req):
        """Mllama: write one request's fixed vision K/V into the cross
        layers' slot-addressed pools (jitted, donated; padded to the
        model's max cross length so one executable serves all requests —
        see models/mllama.py inject_cross)."""
        states = np.asarray(req.cross_states, np.float32)
        Nmax = self.model.max_cross_len
        padded = np.zeros((Nmax, states.shape[1]), np.float32)
        padded[:states.shape[0]] = states
        if "cross_inject" not in self._fns:
            def fn(params, caches, slot, st, clen, istart):
                return self.model.inject_cross(params, caches, slot, st,
                                               clen, istart)
            self._fns["cross_inject"] = jax.jit(fn, donate_argnums=(1,))
        slot = self.kv_manager.slot_of(req.request_id)
        with self.lock:
            self.kv_caches = self._fns["cross_inject"](
                self.params, self.kv_caches, jnp.asarray(np.int32(slot)),
                jnp.asarray(padded),
                jnp.asarray(np.int32(states.shape[0])),
                jnp.asarray(np.int32(getattr(req, "cross_image_start", 0))))

    # ------------------------------------------------------------------ exec ----
    def run_decode(self, inputs: StepInputs) -> np.ndarray:
        """Run one decode step; returns logits [B_real, V]."""
        if self.pp_size > 1:
            return self._run_pp("decode", inputs)
        fn = self._get_fn("decode")
        with self.lock:
            return self._run(fn, inputs)

    def _locals_of(self, inputs: StepInputs):
        """VSWA ring inputs as arrays (placeholders when rings are off)."""
        if inputs.local_slot_mapping is not None:
            return (jnp.asarray(inputs.local_slot_mapping),
                    jnp.asarray(inputs.local_block_tables))
        ph = getattr(self, "_locals_placeholder", None)
        if ph is None:
            # constant placeholders: building + transferring them per
            # dispatch costs ~2ms on the decode hot path
            ph = self._locals_placeholder = (
                jnp.zeros(1, jnp.int32), jnp.zeros((1, 1), jnp.int32))
        return ph

    def _run(self, fn, inputs: StepInputs):
        x = (inputs.input_embeds if inputs.input_embeds is not None
             else inputs.input_ids)
        ls, lt = self._locals_of(inputs)
        logits, self.kv_caches = fn(
            self.params, self.kv_caches,
            jnp.asarray(x), jnp.asarray(inputs.positions),
            jnp.asarray(inputs.slot_mapping), jnp.asarray(inputs.block_tables),
            jnp.asarray(inputs.kv_lens), jnp.asarray(inputs.q_offset),
            jnp.asarray(inputs.logit_indices),
            jnp.asarray(inputs.seq_slots),
            jnp.asarray(inputs.lora_ids), ls, lt)
        if os.environ.get("TLLM_SYNC_DISPATCH") == "1":
            # debug: surface async device errors at their dispatch site
            jax.block_until_ready(logits)
        return logits

    def run_prefill(self, inputs: StepInputs) -> jax.Array:
        """Run one prefill chunk (single sequence); returns logits [1, V]."""
        mode = ("prefill_embeds" if inputs.input_embeds is not None
                else "prefill")
        if self.pp_size > 1:
            return self._run_pp(mode, inputs)
        fn = self._get_fn(mode)
        with self.lock:
            logits = self._run(fn, inputs)
        if self._star:
            # logits come back rank-stacked [cp, V]: keep the row of the
            # rank owning the last prompt token
            logits = np.asarray(logits)[inputs.owner:inputs.owner + 1]
        return logits

    def run_with_hidden(self, mode: str, inputs: StepInputs,
                        capture: str = "final"):
        """Step returning (logits, hidden) at logit_indices rows — the tap
        used by one-model speculative drafters."""
        key = (mode, "hidden", capture)
        if key not in self._fns:
            self._fns[key] = self._make_step_fn(mode, with_hidden=True,
                                                capture=capture)
        fn = self._fns[key]
        ls, lt = self._locals_of(inputs)
        with self.lock:
            logits, hidden, self.kv_caches = fn(
                self.params, self.kv_caches,
                jnp.asarray(inputs.input_ids), jnp.asarray(inputs.positions),
                jnp.asarray(inputs.slot_mapping),
                jnp.asarray(inputs.block_tables),
                jnp.asarray(inputs.kv_lens), jnp.asarray(inputs.q_offset),
                jnp.asarray(inputs.logit_indices),
                jnp.asarray(inputs.seq_slots),
                jnp.asarray(inputs.lora_ids), ls, lt)
        return logits, hidden

    # ------------------------------------------------------------------ input prep --
    def _table_bucket(self, reqs, extra_tokens: int = 0,
                      virtual_extra=None) -> int:
        """Pad block tables to a power-of-two page count >= the batch max —
        cuts the XLA gather's padded-KV waste (the reference pads to the
        CUDA-graph capture size the same way)."""
        ve = virtual_extra or [0] * len(reqs)
        need = max((cdiv(r.num_tokens + v + extra_tokens,
                         self.kv_manager.block_size)
                    for r, v in zip(reqs, ve)), default=1)
        mb = 16
        while mb < need:
            mb *= 4
        return min(mb, self.max_blocks_per_seq)

    def prepare_decode_inputs(self, reqs, extra_tokens: int = 0,
                              virtual_extra=None) -> StepInputs:
        """Assemble padded decode inputs for a batch of generating requests.
        extra_tokens widens the block-table bucket for fused multi-step
        decode (positions num_tokens..num_tokens+extra-1 must be gatherable).

        virtual_extra (overlap decode): per-request counts of tokens already
        DISPATCHED but not yet applied host-side — positions/lens advance as
        if they had landed; input_ids rows are placeholders the caller
        replaces with the previous chunk's device-resident sampled tokens
        (the reference's overlap scheduler, py_executor.py:1660).

        Attention-DP: rows are grouped by each request's dp rank (rank r
        owns rows [r*Bp/dp, (r+1)*Bp/dp)); row_map records each request's
        row so the caller can gather its logits back in request order."""
        kv = self.kv_manager
        dp = self.mapping.dp_size
        B = len(reqs)
        if dp > 1:
            per_rank = {}
            for req in reqs:
                per_rank.setdefault(kv.rank_of(req.request_id),
                                    []).append(req)
            worst = max(len(v) for v in per_rank.values())
            bloc = pick_bucket(worst,
                               tuple(max(cdiv(b, dp), 1)
                                     for b in self.decode_buckets))
            if worst > bloc:
                # pick_bucket silently caps at the last bucket; an
                # overflowing rank band would scatter KV into ANOTHER
                # rank's pool shard — fail loudly instead (placement is
                # count-balanced, so this indicates a bug or a
                # max_batch_size far above the compiled buckets)
                raise RuntimeError(
                    f"attention-DP rank holds {worst} decode requests but "
                    f"the largest per-rank bucket is {bloc}")
            Bp = bloc * dp
        else:
            Bp = pick_bucket(B, self.decode_buckets)
        MB = self._table_bucket(reqs, extra_tokens, virtual_extra)
        ve = virtual_extra or [0] * len(reqs)
        input_ids = np.zeros(Bp, np.int32)
        positions = np.zeros(Bp, np.int32)
        slots = np.full(Bp, PAD_SLOT, np.int32)
        tables = np.zeros((Bp, MB), np.int32)
        kv_lens = np.ones(Bp, np.int32)
        seq_slots = np.full(Bp, PAD_SLOT, np.int32)
        lora_ids = np.zeros(Bp, np.int32)
        row_map = np.zeros(B, np.int32)
        lslots, ltables = None, None
        if self._vswa:
            lslots = np.full(Bp, PAD_SLOT, np.int32)
            ltables = np.zeros((Bp, kv.ring_blocks), np.int32)
        counters = [0] * max(dp, 1)
        for i, req in enumerate(reqs):
            if dp > 1:
                r = kv.rank_of(req.request_id)
                row = r * (Bp // dp) + counters[r]
                counters[r] += 1
            else:
                row = i
            row_map[i] = row
            toks = req.all_token_ids
            pos = req.num_tokens + ve[i] - 1  # position of the new token
            input_ids[row] = toks[-1]
            positions[row] = pos
            if self._mrope:
                # decode rope positions shift by the request's mrope delta
                # (t==h==w for generated tokens => 1-D rope is exact)
                positions[row] = min(max(0, pos + getattr(req, "mrope_delta",
                                                          0)),
                                     self.max_seq_len - 1)
            if not self._helix and not self._star:
                slots[row] = kv.slot_mapping(req.request_id, pos, 1)[0]
                tables[row, :] = kv.block_table(req.request_id, MB)
            kv_lens[row] = pos + 1
            seq_slots[row] = kv.slot_of(req.request_id)
            lora_ids[row] = getattr(req, "lora_slot", 0)
            if self._vswa:
                lslots[row] = kv.local_slot_mapping(
                    req.request_id, pos, 1, PAD_SLOT)[0]
                ltables[row, :] = kv.local_block_table(req.request_id)
        if dp > 1:
            # local logit rows per shard
            logit_indices = np.tile(np.arange(Bp // dp, dtype=np.int32), dp)
        else:
            logit_indices = np.arange(Bp, dtype=np.int32)
        if self._helix:
            slots, tables = self._helix_decode_tables(reqs, Bp,
                                                      extra_tokens)
        if self._star:
            slots, tables, kv_lens = self._star_decode_tables(reqs, Bp,
                                                              extra_tokens)
        return StepInputs(
            input_ids=input_ids, positions=positions, slot_mapping=slots,
            block_tables=tables, kv_lens=kv_lens,
            logit_indices=logit_indices,
            q_offset=np.int32(0), seq_slots=seq_slots, lora_ids=lora_ids,
            local_slot_mapping=lslots, local_block_tables=ltables,
            row_map=row_map if dp > 1 else None)

    def _prepare_star_prefill(self, req, chunk: int) -> StepInputs:
        """Star-attention phase-1 inputs: rank r processes the rows
        [anchor block; chunk_r] with LOCAL causal attention (no cross-rank
        traffic — reference star attention context phase,
        attention_backend/star_flashinfer.py + model_engine.py:2890 input
        split).  Rows are rank-stacked on axis 0 and shard over "cp"."""
        kv = self.kv_manager
        cp = self.mapping.cp_size
        prompt = req.prompt_token_ids
        L = len(prompt)
        if req.context_position != 0 or chunk != L:
            raise RuntimeError(
                "star CP needs single-chunk prefill: raise the prefill "
                f"bucket above the prompt length ({L} tokens)")
        b = kv.bounds_of(req.request_id)
        A = kv.anchor_len(req.request_id)
        lens = [kv.rank_local_len(req.request_id, L, r) for r in range(cp)]
        rows = [lens[0]] + [(A if lens[r] else 0) + lens[r]
                            for r in range(1, cp)]
        Tp = pick_bucket(max(rows), self.prefill_buckets)
        ids = np.zeros(cp * Tp, np.int32)
        pos = np.zeros(cp * Tp, np.int32)
        slots = np.full(cp * Tp, PAD_SLOT, np.int32)
        kv_lens = np.zeros(cp, np.int32)
        logit_idx = np.zeros(cp, np.int32)
        maps = kv.rank_slot_mapping(req.request_id, 0, L, int(PAD_SLOT))
        for r in range(cp):
            o = r * Tp
            anchor = 0 if r == 0 else (A if lens[r] else 0)
            n = anchor + lens[r]
            if anchor:
                ids[o:o + anchor] = prompt[:anchor]
                pos[o:o + anchor] = np.arange(anchor)
                # anchor rows are recomputed context: their KV never lands
            if lens[r]:
                lo = b[r]
                ids[o + anchor:o + n] = prompt[lo:lo + lens[r]]
                pos[o + anchor:o + n] = np.arange(lo, lo + lens[r])
                slots[o + anchor:o + n] = maps[r][lo:lo + lens[r]]
            # pad rows repeat the last valid position (rope-safe)
            pos[o + n:o + Tp] = pos[o + max(n, 1) - 1]
            kv_lens[r] = n
        owner = kv.rank_of_pos(req.request_id, L - 1)
        logit_idx[owner] = kv_lens[owner] - 1
        return StepInputs(
            input_ids=ids, positions=pos, slot_mapping=slots,
            block_tables=np.zeros((cp, 1), np.int32), kv_lens=kv_lens,
            logit_indices=logit_idx, q_offset=np.int32(0),
            seq_slots=np.array([kv.slot_of(req.request_id)], np.int32),
            lora_ids=np.full(cp * Tp, getattr(req, "lora_slot", 0),
                             np.int32),
            owner=owner)

    def _star_table_bucket(self, reqs, extra_tokens: int = 0) -> int:
        kv = self.kv_manager
        cp = self.mapping.cp_size
        need = 1
        for r_ in reqs:
            total = r_.num_tokens + extra_tokens
            for r in range(cp):
                need = max(need, cdiv(
                    kv.rank_local_len(r_.request_id, total, r),
                    kv.block_size))
        mb = 16
        while mb < need:
            mb *= 4
        return min(mb, self.max_blocks_per_seq)

    def _star_decode_tables(self, reqs, Bp: int, extra_tokens: int = 0):
        """Rank-stacked decode inputs: slots route the new token's KV to its
        owning rank, tables/lens expose each rank's contiguous chunk; axis 0
        shards over "cp"."""
        cp = self.mapping.cp_size
        kv = self.kv_manager
        MBl = self._star_table_bucket(reqs, extra_tokens)
        slots = np.full(cp * Bp, PAD_SLOT, np.int32)
        tables = np.zeros((cp * Bp, MBl), np.int32)
        lens = np.zeros(cp * Bp, np.int32)
        for i, req in enumerate(reqs):
            pos = req.num_tokens - 1
            maps = kv.rank_slot_mapping(req.request_id, pos, 1,
                                        int(PAD_SLOT))
            for r in range(cp):
                slots[r * Bp + i] = maps[r][0]
                tables[r * Bp + i, :] = kv.rank_block_table(
                    req.request_id, r, MBl)
                lens[r * Bp + i] = kv.rank_local_len(req.request_id,
                                                     pos + 1, r)
        return slots, tables, lens

    def _helix_table_bucket(self, reqs, extra_tokens: int = 0) -> int:
        cp = self.mapping.cp_size
        kv = self.kv_manager
        need = max((cdiv(cdiv(r.num_tokens + extra_tokens, kv.block_size),
                         cp) for r in reqs), default=1)
        mb = 16
        while mb < need:
            mb *= 4
        return min(mb, cdiv(self.max_blocks_per_seq, cp) + 1)

    def _helix_decode_tables(self, reqs, Bp: int, extra_tokens: int = 0):
        """Rank-stacked decode slots/tables: axis 0 shards over "cp"
        (helix block-cyclic KV placement)."""
        cp = self.mapping.cp_size
        kv = self.kv_manager
        MBl = self._helix_table_bucket(reqs, extra_tokens)
        slots = np.full(cp * Bp, PAD_SLOT, np.int32)
        tables = np.zeros((cp * Bp, MBl), np.int32)
        for i, req in enumerate(reqs):
            pos = req.num_tokens - 1
            maps = kv.rank_slot_mapping(req.request_id, pos, 1,
                                        int(PAD_SLOT))
            for r in range(cp):
                slots[r * Bp + i] = maps[r][0]
                tables[r * Bp + i, :] = kv.rank_block_table(
                    req.request_id, r, MBl)
        return slots, tables

    def prepare_prefill_inputs(self, req, chunk: int) -> StepInputs:
        """Assemble padded inputs for one context chunk of one request."""
        if self._star:
            return self._prepare_star_prefill(req, chunk)
        kv = self.kv_manager
        dp = self.mapping.dp_size
        start = req.context_position
        Tp = pick_bucket(chunk, self.prefill_buckets)
        assert chunk <= Tp, (chunk, self.prefill_buckets)
        toks = req.prompt_token_ids[start:start + chunk]
        input_ids = np.zeros(Tp, np.int32)
        input_ids[:chunk] = toks
        positions = np.arange(start, start + Tp, dtype=np.int32)
        positions = np.minimum(positions, self.max_seq_len - 1)
        owner = kv.rank_of(req.request_id) if dp > 1 else 0
        if not self._helix:
            # attention-DP prefill: every rank runs the (replicated)
            # compute, but only the owner's slot/table rows are real —
            # other ranks' KV writes pad-drop and their logits rows are
            # ignored by the caller
            slots = np.full(max(dp, 1) * Tp, PAD_SLOT, np.int32)
            slots[owner * Tp:owner * Tp + chunk] = \
                kv.slot_mapping(req.request_id, start, chunk)
            tables = np.zeros((max(dp, 1), self.max_blocks_per_seq),
                              np.int32)
            tables[owner, :] = kv.block_table(req.request_id,
                                              self.max_blocks_per_seq)
        kv_lens = np.full(max(dp, 1), start + chunk, np.int32)
        seq_slots = np.full(max(dp, 1), PAD_SLOT, np.int32)
        seq_slots[owner] = kv.slot_of(req.request_id)
        embeds = None
        pe = getattr(req, "prompt_embeds", None)
        if pe is not None:
            embeds = np.zeros((Tp, pe.shape[1]), np.float32)
            embeds[:chunk] = pe[start:start + chunk]
        lslots, ltables = None, None
        if self._vswa:
            lslots = np.full(Tp, PAD_SLOT, np.int32)
            lslots[:chunk] = kv.local_slot_mapping(
                req.request_id, start, chunk, PAD_SLOT)
            ltables = np.asarray(
                [kv.local_block_table(req.request_id)], np.int32)
        if self._helix:
            cp = self.mapping.cp_size
            MBl = self._helix_table_bucket([req])
            slots = np.full(cp * Tp, PAD_SLOT, np.int32)
            maps = kv.rank_slot_mapping(req.request_id, start, chunk,
                                        int(PAD_SLOT))
            tables = np.zeros((cp, MBl), np.int32)
            for r in range(cp):
                slots[r * Tp:r * Tp + chunk] = maps[r]
                tables[r, :] = kv.rank_block_table(req.request_id, r, MBl)
        if self._mrope:
            # append the [3, Tp] (t, h, w) rows: [4*Tp] total (see step fn)
            mr = getattr(req, "mrope_positions", None)
            ext = np.zeros((3, Tp), np.int32)
            if mr is not None:
                seg = np.asarray(mr)[:, start:start + chunk]
                ext[:, :chunk] = seg
                if chunk < Tp and chunk > 0:
                    ext[:, chunk:] = seg[:, -1:]
            else:  # text-only prompt: t = h = w = physical position
                ext[:] = positions[None, :]
            ext = np.minimum(ext, self.max_seq_len - 1)
            positions = np.concatenate([positions, ext.reshape(-1)])
        return StepInputs(
            input_ids=input_ids, input_embeds=embeds, positions=positions,
            slot_mapping=slots, block_tables=tables, kv_lens=kv_lens,
            logit_indices=np.array([chunk - 1], np.int32),
            q_offset=np.int32(start),
            seq_slots=seq_slots,
            lora_ids=np.full(Tp, getattr(req, "lora_slot", 0), np.int32),
            local_slot_mapping=lslots, local_block_tables=ltables,
            owner=owner)

    # ------------------------------------------------------------------ tree ----
    def _make_tree_fn(self, with_hidden: bool, capture: str,
                      embeds_input: bool = False, chunk_causal: bool = True):
        """Prefill-like step with a [T, T] in-chunk mask input: draft-tree
        verification (reference packed-mask spec-dec kernels), and — with
        chunk_causal=False — custom-visibility prefill (Gemma3-VL
        bidirectional image spans)."""
        model = self.model
        vswa = self._vswa

        def step(params, kv_caches, input_x, positions, slot_mapping,
                 block_tables, kv_lens, logit_indices, seq_slots, lora_ids,
                 local_slots, local_tables, pair_mask):
            meta = AttentionMetadata(
                positions=positions,
                slot_mapping=slot_mapping,
                block_tables=block_tables,
                kv_lens=kv_lens,
                q_offset=jnp.int32(0),
                seq_slots=seq_slots,
                lora_ids=lora_ids,
                local_slot_mapping=local_slots if vswa else None,
                local_block_tables=local_tables if vswa else None,
                pair_mask=pair_mask,
                chunk_causal=chunk_causal,
                mode="prefill",
            )
            ids = None if embeds_input else input_x
            emb = input_x if embeds_input else None
            if with_hidden:
                return model.forward(params, ids, kv_caches, meta,
                                     logit_indices, return_hidden=True,
                                     capture=capture, input_embeds=emb)
            return model.forward(params, ids, kv_caches, meta,
                                 logit_indices, input_embeds=emb)

        if self.mesh is not None:
            out = ((P(), P(), self._cache_specs) if with_hidden
                   else (P(), self._cache_specs))
            step = jax.shard_map(
                step, mesh=self.mesh,
                in_specs=(self._param_specs, self._cache_specs,
                          P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
                          P()),
                out_specs=out,
                check_vma=False)
        return jax.jit(step, donate_argnums=(1,))

    def run_verify_tree(self, inputs: StepInputs, pair_mask: np.ndarray,
                        with_hidden: bool = False, capture: str = "final",
                        chunk_causal: bool = True):
        """Verify a draft tree (or run a custom-visibility prefill) in one
        forward; returns per-row logits (+ hiddens when requested)."""
        if self.pp_size > 1:
            assert not with_hidden, (
                "hidden-tapping drafters (EAGLE/MTP) stay single-step "
                "under PP — cross-stage hidden capture lands later")
            return self._run_pp_tree(inputs, pair_mask, chunk_causal)
        embeds = inputs.input_embeds is not None
        key = ("tree", with_hidden, capture, embeds, chunk_causal)
        if key not in self._fns:
            self._fns[key] = self._make_tree_fn(with_hidden, capture,
                                                embeds, chunk_causal)
        fn = self._fns[key]
        x = inputs.input_embeds if embeds else inputs.input_ids
        ls, lt = self._locals_of(inputs)
        with self.lock:
            out = fn(
                self.params, self.kv_caches,
                jnp.asarray(x), jnp.asarray(inputs.positions),
                jnp.asarray(inputs.slot_mapping),
                jnp.asarray(inputs.block_tables),
                jnp.asarray(inputs.kv_lens),
                jnp.asarray(inputs.logit_indices),
                jnp.asarray(inputs.seq_slots),
                jnp.asarray(inputs.lora_ids), ls, lt,
                jnp.asarray(pair_mask))
            if with_hidden:
                logits, hidden, self.kv_caches = out
                return logits, hidden
            logits, self.kv_caches = out
        return logits

    def _make_pp_tree_fn(self, s: int, embeds_input: bool,
                         chunk_causal: bool):
        """Tree-verification stage function: the PP stage step with a
        [T, T] pair-mask threaded through the attention metadata."""
        model = self.model
        st = self.pp_stages[s]
        lo, hi = st["lo"], st["hi"]
        first, last = s == 0, s == len(self.pp_stages) - 1
        vswa = self._vswa

        def step(params, caches, x_or_ids, positions, slot_mapping,
                 block_tables, kv_lens, q_offset, logit_indices, seq_slots,
                 lora_ids, local_slots, local_tables, pair_mask):
            meta = AttentionMetadata(
                positions=positions, slot_mapping=slot_mapping,
                block_tables=block_tables, kv_lens=kv_lens,
                q_offset=jnp.int32(0), seq_slots=seq_slots,
                lora_ids=lora_ids,
                local_slot_mapping=local_slots if vswa else None,
                local_block_tables=local_tables if vswa else None,
                pair_mask=pair_mask, chunk_causal=chunk_causal,
                mode="prefill")
            if first:
                if embeds_input:
                    h = x_or_ids.astype(model.cfg.dtype)
                    return model._run_layers(params, h, None, caches, meta,
                                             lo, hi)
                return model.forward_first_stage(params, x_or_ids, caches,
                                                 meta, hi)
            if last:
                return model.forward_last_stage(params, x_or_ids, caches,
                                                meta, lo, logit_indices)
            return model.forward_mid_stage(params, x_or_ids, caches, meta,
                                           lo, hi)

        step = jax.shard_map(
            step, mesh=st["mesh"],
            in_specs=(st["specs"], st["cache_specs"],
                      P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
                      P()),
            out_specs=(P(), st["cache_specs"]),
            check_vma=False)
        return jax.jit(step, donate_argnums=(1,))

    def _run_pp_tree(self, inputs: StepInputs, pair_mask, chunk_causal):
        embeds = inputs.input_embeds is not None
        with self.lock:
            h = jnp.asarray(inputs.input_embeds if embeds
                            else inputs.input_ids)
            ls, lt = self._locals_of(inputs)
            pm = jnp.asarray(pair_mask)
            common = (jnp.asarray(inputs.positions),
                      jnp.asarray(inputs.slot_mapping),
                      jnp.asarray(inputs.block_tables),
                      jnp.asarray(inputs.kv_lens),
                      jnp.asarray(inputs.q_offset),
                      jnp.asarray(inputs.logit_indices),
                      jnp.asarray(inputs.seq_slots),
                      jnp.asarray(inputs.lora_ids), ls, lt, pm)
            for s, st in enumerate(self.pp_stages):
                key = ("tree", embeds, chunk_causal)
                if key not in st["fns"]:
                    st["fns"][key] = self._make_pp_tree_fn(
                        s, embeds, chunk_causal)
                if s > 0:
                    h = jax.device_put(h, NamedSharding(st["mesh"], P()))
                h, st["caches"] = st["fns"][key](
                    st["params"], st["caches"], h, *common)
            return h

    def prepare_tree_verify_inputs(self, req, tokens, positions,
                                   write_mask) -> StepInputs:
        """Inputs for tree verification: `tokens[i]` at `positions[i]`;
        rows with write_mask[i] False get pad slots (tree rows — their KV
        never lands in the cache).  kv_lens[0] = committed prefix length."""
        kv = self.kv_manager
        chunk = len(tokens)
        Tp = pick_bucket(chunk, self.prefill_buckets)
        input_ids = np.zeros(Tp, np.int32)
        input_ids[:chunk] = tokens
        pos = np.zeros(Tp, np.int32)
        pos[:chunk] = positions
        pos[chunk:] = positions[-1]
        slots = np.full(Tp, PAD_SLOT, np.int32)
        lslots = np.full(Tp, PAD_SLOT, np.int32) if self._vswa else None
        for i in range(chunk):
            if write_mask[i]:
                slots[i] = kv.slot_mapping(req.request_id,
                                           int(positions[i]), 1)[0]
                if self._vswa:
                    lslots[i] = kv.local_slot_mapping(
                        req.request_id, int(positions[i]), 1, PAD_SLOT)[0]
        tables = np.zeros((1, self.max_blocks_per_seq), np.int32)
        tables[0, :] = kv.block_table(req.request_id, self.max_blocks_per_seq)
        prefix_len = int(positions[0])  # committed tokens already in cache
        ltables = None
        if self._vswa:
            ltables = np.asarray(
                [kv.local_block_table(req.request_id)], np.int32)
        return StepInputs(
            input_ids=input_ids, positions=pos, slot_mapping=slots,
            block_tables=tables, kv_lens=np.array([prefix_len], np.int32),
            logit_indices=np.arange(Tp, dtype=np.int32),
            q_offset=np.int32(prefix_len),
            seq_slots=np.array([kv.slot_of(req.request_id)], np.int32),
            lora_ids=np.full(Tp, getattr(req, "lora_slot", 0), np.int32),
            local_slot_mapping=lslots, local_block_tables=ltables)

    def prepare_verify_inputs(self, req, draft_tokens) -> StepInputs:
        """Inputs for a speculative verify pass: the last accepted token plus
        the draft chunk, with logits at every row (reference: draft-token
        verification in the spec-dec flow, _torch/speculative/)."""
        kv = self.kv_manager
        dp = self.mapping.dp_size
        n = req.num_tokens
        toks = [req.all_token_ids[-1]] + list(draft_tokens)
        chunk = len(toks)
        Tp = pick_bucket(chunk, self.prefill_buckets)
        input_ids = np.zeros(Tp, np.int32)
        input_ids[:chunk] = toks
        start = n - 1
        positions = np.minimum(np.arange(start, start + Tp, dtype=np.int32),
                               self.max_seq_len - 1)
        # attention-DP: replicated compute, owner-masked KV writes — the
        # same pattern as prepare_prefill_inputs; the caller reads the
        # owner band of the dp-stacked logits/hidden
        owner = kv.rank_of(req.request_id) if dp > 1 else 0
        slots = np.full(max(dp, 1) * Tp, PAD_SLOT, np.int32)
        slots[owner * Tp:owner * Tp + chunk] = \
            kv.slot_mapping(req.request_id, start, chunk)
        tables = np.zeros((max(dp, 1), self.max_blocks_per_seq), np.int32)
        tables[owner, :] = kv.block_table(req.request_id,
                                          self.max_blocks_per_seq)
        kv_lens = np.full(max(dp, 1), start + chunk, np.int32)
        seq_slots = np.full(max(dp, 1), PAD_SLOT, np.int32)
        seq_slots[owner] = kv.slot_of(req.request_id)
        lslots, ltables = None, None
        if self._vswa:
            lslots = np.full(Tp, PAD_SLOT, np.int32)
            lslots[:chunk] = kv.local_slot_mapping(
                req.request_id, start, chunk, PAD_SLOT)
            ltables = np.asarray(
                [kv.local_block_table(req.request_id)], np.int32)
        return StepInputs(
            input_ids=input_ids, positions=positions, slot_mapping=slots,
            block_tables=tables, kv_lens=kv_lens,
            logit_indices=np.arange(Tp, dtype=np.int32),
            q_offset=np.int32(start),
            seq_slots=seq_slots,
            lora_ids=np.full(Tp, getattr(req, "lora_slot", 0), np.int32),
            local_slot_mapping=lslots, local_block_tables=ltables,
            owner=owner)

    # ------------------------------------------------------------------ autotune --
    def autotune_kernels(self, m_bucket: int = 16):
        """Tune W4A16 tactic (block_k) per distinct weight shape on the real
        device and cache it (reference AutoTuner warmup, autotuner.py:257).
        Must run before the step functions compile — the jitted steps bake
        the cached tactic in at trace time."""
        import jax

        from tensorrt_llm_tpu.autotuner import AutoTuner, autotune
        from tensorrt_llm_tpu.ops.w4a16_gemm import (
            w4a16_matmul, w4a16_tactic_candidates)
        from tensorrt_llm_tpu.quantization import pack_group_for
        from tensorrt_llm_tpu.utils import is_tpu_backend

        if not is_tpu_backend() or self.mesh is not None \
                or self.pp_size > 1:
            return  # tuning rides the single-chip eager path
        tuner = AutoTuner.get()
        # persist measured tactics next to the compiled-program cache so a
        # fresh process skips re-timing (reference: profiling cache file)
        from tensorrt_llm_tpu.utils.common import enable_compilation_cache
        cache_dir = enable_compilation_cache()
        tactic_path = (os.path.join(cache_dir, "autotune.json")
                       if cache_dir else None)
        if tactic_path and os.path.exists(tactic_path) and not tuner.cache:
            try:
                tuner.load(tactic_path)
                logger.info("autotune cache loaded (%d tactics)",
                            len(tuner.cache))
            except Exception:  # noqa: BLE001 — stale/corrupt cache file
                pass
        n_before = len(tuner.cache)
        seen = {}
        params_leaves = jax.tree.leaves_with_path(self.params)
        by_path = {jax.tree_util.keystr(p): v for p, v in params_leaves}
        for path, leaf in by_path.items():
            if not path.endswith("['qweight']") or leaf.dtype != jnp.int8:
                continue
            parent = path[: -len("['qweight']")]
            scales = by_path.get(parent + "['scales']")
            if scales is None:
                continue
            tiled = leaf.ndim == 3
            if tiled:
                K = leaf.shape[1] * 2
                N = leaf.shape[0] * leaf.shape[2]
            else:
                K, N = leaf.shape[0] * 2, leaf.shape[1]
            key = (K, N, int(tiled))
            if key in seen or tuner.lookup("w4a16", key):
                continue
            seen[key] = True
            cands = w4a16_tactic_candidates(
                K, N, tiled, group=K // scales.shape[0])
            x = jnp.zeros((m_bucket, K), jnp.bfloat16)

            def run(tactic, _x=x, _p=leaf, _s=scales):
                def body(i, xx):
                    o = w4a16_matmul(xx, _p, _s, **tactic)
                    return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
                return jax.lax.fori_loop(0, tuner.chain_len, body, _x)

            with autotune():
                tuner.maybe_tune("w4a16", key, cands, run)

        # grouped expert weights (MoE W4A16 kernel): [E, n_n, K//2, BN]
        from tensorrt_llm_tpu.ops.moe_w4a16 import (
            w4a16_grouped_matmul, w4a16_gmm_tactic_candidates)
        for path, leaf in by_path.items():
            if leaf.dtype != jnp.int8 or leaf.ndim != 4:
                continue
            scales = by_path.get(path[:-2] + "_s']")
            if scales is None or scales.ndim != 3:
                continue
            zeros = by_path.get(path[:-2] + "_z']")
            E = leaf.shape[0]
            K = leaf.shape[2] * 2
            N = leaf.shape[1] * leaf.shape[3]
            key = (K, N, E)
            if key in seen or tuner.lookup("w4a16_gmm", key):
                continue
            seen[key] = True
            cands = w4a16_gmm_tactic_candidates(
                K, N, E, group=K // scales.shape[1])
            M = max(8 * m_bucket, 32)
            gs = jnp.full((E,), M // E, jnp.int32).at[0].add(M % E)
            x = jnp.zeros((M, K), jnp.bfloat16)

            def run_gmm(tactic, _x=x, _p=leaf, _s=scales, _z=zeros, _gs=gs):
                def body(i, xx):
                    o = w4a16_grouped_matmul(xx, _p, _s, _gs, zeros=_z,
                                             **tactic)
                    return xx + (jnp.max(jnp.abs(o)) * 1e-30).astype(xx.dtype)
                return jax.lax.fori_loop(0, tuner.chain_len, body, _x)

            with autotune():
                tuner.maybe_tune("w4a16_gmm", key, cands, run_gmm)

        if tactic_path and len(tuner.cache) > n_before:
            try:
                tuner.save(tactic_path)
                logger.info("autotune cache saved (%d tactics)",
                            len(tuner.cache))
            except OSError:
                pass

    # ------------------------------------------------------------------ warmup ----
    def warmup(self, decode: bool = True, prefill: bool = True,
               multi_steps: int = 0):
        """Precompile all buckets (the analog of CUDA-graph capture
        warmup).  Decode compiles every BLOCK-TABLE bucket a sequence can
        grow through (tables pad to power-of-4 page counts — crossing a
        boundary mid-run must not hit the compiler), and the fused
        multi-step executable when the executor will use one."""
        import numpy as np
        from tensorrt_llm_tpu.runtime.request import LlmRequest
        from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
        from tensorrt_llm_tpu.runtime.sampler import SamplingState
        self.autotune_kernels()
        kv = self.kv_manager

        def _sync(tag, out=None):
            # debug: surface an aborting warmup dispatch AT the dispatch.
            # NOTE a real FETCH, not block_until_ready — on the axon
            # tunnel block_until_ready returns before the program ran;
            # only materializing data is a true sync.
            if os.environ.get("TLLM_WARMUP_SYNC") == "1":
                import time as _t
                t0 = _t.time()
                try:
                    if out is not None:
                        np.asarray(jax.tree.leaves(out)[0])
                    logger.info("warmup sync [%s]: %.1fs", tag,
                                _t.time() - t0)
                except Exception as e:  # noqa: BLE001
                    logger.error("warmup sync [%s] FAILED: %s", tag, e)
                    raise

        if prefill:
            for T in self.prefill_buckets:
                if T > self.max_seq_len:
                    continue
                req = LlmRequest([1] * min(T, self.max_seq_len),
                                 SamplingParams(max_tokens=1))
                kv.add_sequence(req.request_id, req.prompt_token_ids)
                kv.grow_sequence(req.request_id, req.prompt_len)
                out_p = self.run_prefill(
                    self.prepare_prefill_inputs(req, req.prompt_len))
                _sync(f"prefill T={T}", out_p)
                kv.free_sequence(req.request_id)
        if decode:
            # representative lengths hitting each table bucket up to the
            # engine limit.  Leave k-1 tokens of headroom below each
            # bucket/limit: the fused k-step warmup runs steps at
            # L..L+k-1, and L = bucket_cap - 1 made step k index past the
            # block table — an out-of-range scalar-prefetch DMA that
            # wedged the chip asynchronously and killed the first real
            # request's fetch (r5 root cause #2; tpu_return_logs/
            # r5_stage3.log pins it to "multi B=16 L=255 k=4").
            bs = kv.block_size
            km = max(1, int(multi_steps))
            lens, mb = [], 16
            while True:
                lens.append(min(mb * bs - km, self.max_seq_len - km,
                                kv.num_blocks * bs // 2))
                if mb * bs - 1 >= self.max_seq_len - 1                         or mb >= self.max_blocks_per_seq:
                    break
                mb *= 4
            lens = sorted(set(max(2, l) for l in lens))
            for B in self.decode_buckets:
                for L in lens:
                    req = LlmRequest([1] * L, SamplingParams(max_tokens=1))
                    kv.add_sequence(req.request_id, req.prompt_token_ids)
                    # grow for the k-step chain's future positions too
                    kv.grow_sequence(req.request_id, L + km - 1)
                    reqs = [req] * B
                    inputs = self.prepare_decode_inputs(reqs)
                    out_d = self.run_decode(inputs)
                    _sync(f"decode B={B} L={L}", out_d)
                    # executor uses k = max_decode_steps, capped at 4
                    # when eos can stop early — warm both variants
                    for k in sorted({multi_steps, min(multi_steps, 4)}):
                        if k <= 1 or os.environ.get(
                                "TLLM_WARMUP_MULTI", "1") != "1":
                            continue
                        st = np.full((k, len(inputs.input_ids)),
                                     np.int64(2 ** 30), np.int32)
                        state = SamplingState.from_params(
                            [req.sampling_params] * len(reqs),
                            step=0, pad_to=len(inputs.input_ids))
                        out_m = self.run_decode_multi(inputs, k, state,
                                                      st)
                        _sync(f"multi B={B} L={L} k={k}", out_m)
                    kv.free_sequence(req.request_id)
        logger.info("engine warmup done (%d executables)", len(self._fns))
