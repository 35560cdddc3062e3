"""Request schedulers: capacity policy + micro-batch (token budget + chunking).

Counterpart of the reference's C++ `CapacityScheduler` policies
(`batch_manager/capacityScheduler.cpp`: MaxUtilization :341, GuaranteedNoEvict
:186, StaticBatch :148) and `MicroBatchScheduler` (token/batch budget +
context chunking, microBatchScheduler.cpp), which Python binds at
`pyexecutor/scheduler.py:141,186`.  Here both run in-process in Python — the
inner loops are O(active requests) per step.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
from tensorrt_llm_tpu.runtime.request import LlmRequest, RequestState
from tensorrt_llm_tpu.utils import cdiv


class CapacitySchedulerPolicy(str, enum.Enum):
    MAX_UTILIZATION = "max_utilization"
    GUARANTEED_NO_EVICT = "guaranteed_no_evict"
    STATIC_BATCH = "static_batch"


@dataclass
class SchedulerConfig:
    """Mirrors reference SchedulerConfig (llm_args.py:1460)."""

    policy: CapacitySchedulerPolicy = CapacitySchedulerPolicy.GUARANTEED_NO_EVICT
    max_batch_size: int = 64
    max_num_tokens: int = 2048          # per-step token budget
    enable_chunked_prefill: bool = True
    max_chunk_size: Optional[int] = None
    # batch waiting (reference TorchLlmArgs.batch_wait_timeout_iters /
    # batch_wait_max_tokens_ratio; py_executor.py:2090-2110): while decode
    # work exists, hold NEW prefills for up to `timeout_iters` iterations
    # until the scheduled token count reaches `max_tokens_ratio *
    # max_num_tokens` — denser prefill batches at high load
    batch_wait_timeout_iters: int = 0
    batch_wait_max_tokens_ratio: float = 0.0


@dataclass
class ScheduledBatch:
    # (request, chunk_len) pairs — each prefill chunk runs as one model call
    prefill: List[Tuple[LlmRequest, int]] = field(default_factory=list)
    decode: List[LlmRequest] = field(default_factory=list)
    paused: List[LlmRequest] = field(default_factory=list)

    @property
    def empty(self) -> bool:
        return not self.prefill and not self.decode

    @property
    def total_tokens(self) -> int:
        return sum(c for _, c in self.prefill) + len(self.decode)


class Scheduler:
    """capacity + micro-batch scheduling for one engine step."""

    def __init__(self, cfg: SchedulerConfig, kv: KVCacheManager):
        self.cfg = cfg
        self.kv = kv
        self._batch_wait_iters = 0

    def _apply_batch_waiting(self, batch: "ScheduledBatch",
                             active_ctx: set) -> None:
        """Drop this iteration's NEW prefills while decode work exists and
        the batch is under the token-density threshold (reference
        _waiting_requests, py_executor.py:2090-2110).  Prefills already
        mid-chunking are never held — pausing them would strand KV."""
        cfg = self.cfg
        enabled = (cfg.batch_wait_timeout_iters > 0
                   or cfg.batch_wait_max_tokens_ratio > 0)
        new_prefill = [(r, c) for r, c in batch.prefill
                       if id(r) not in active_ctx]
        if not (enabled and new_prefill and batch.decode):
            self._batch_wait_iters = 0
            return
        # single-knob defaults (setting only one must not no-op the
        # feature): a ratio alone gets a bounded timeout; a timeout alone
        # holds regardless of batch density until it expires
        timeout = cfg.batch_wait_timeout_iters or 8
        ratio = (cfg.batch_wait_max_tokens_ratio
                 if cfg.batch_wait_max_tokens_ratio > 0 else 1.0)
        should_wait = (
            self._batch_wait_iters < timeout
            and batch.total_tokens < ratio * cfg.max_num_tokens)
        if should_wait:
            self._batch_wait_iters += 1
            held = {id(r) for r, _ in new_prefill}
            batch.prefill = [(r, c) for r, c in batch.prefill
                             if id(r) not in held]
        else:
            self._batch_wait_iters = 0

    # ---- capacity pass -----------------------------------------------------------
    def _fits_no_evict(self, req: LlmRequest, reserved: int) -> Tuple[bool, int]:
        """Worst case: blocks to hold the full sequence at max_total_len."""
        have = self.kv.num_seq_blocks(req.request_id)
        need = self.kv.blocks_needed(req.max_total_len) - have
        fits = need + reserved <= self.kv.num_free_blocks
        return fits, max(need, 0)

    def _fits_next_step(self, req: LlmRequest, reserved: int,
                        step_tokens: int) -> Tuple[bool, int]:
        """MaxUtilization: only the blocks needed for this step's tokens."""
        have = self.kv.num_seq_blocks(req.request_id)
        # anything not yet generating (QUEUED or CONTEXT_INIT) is sized by
        # its scheduled chunk — sizing a new request by its whole prompt
        # would degrade MaxUtilization to whole-prompt admission
        target = (req.num_tokens + 1 if req.is_generating
                  else req.context_position + step_tokens)
        need = self.kv.blocks_needed(target) - have
        fits = need + reserved <= self.kv.num_free_blocks
        return fits, max(need, 0)

    # ---- main ---------------------------------------------------------------------
    def schedule(self, active: List[LlmRequest],
                 waiting: List[LlmRequest]) -> ScheduledBatch:
        cfg = self.cfg
        batch = ScheduledBatch()
        token_budget = cfg.max_num_tokens
        reserved_blocks = 0
        n_scheduled = 0

        gen_reqs = [r for r in active if r.is_generating]
        ctx_reqs = [r for r in active if r.is_context_init]

        # STATIC_BATCH (reference capacityScheduler.cpp:148): the current
        # batch runs to completion before any new request is admitted
        if cfg.policy == CapacitySchedulerPolicy.STATIC_BATCH and active:
            waiting = []

        # 1) decode first (generation requests have priority: in-flight work,
        #    same order as the reference's scheduler which never starves
        #    generation)
        for req in gen_reqs:
            if n_scheduled >= cfg.max_batch_size or token_budget <= 0:
                batch.paused.append(req)
                continue
            if cfg.policy == CapacitySchedulerPolicy.GUARANTEED_NO_EVICT:
                fits, need = self._fits_no_evict(req, reserved_blocks)
            else:
                fits, need = self._fits_next_step(req, reserved_blocks, 1)
            if not fits:
                batch.paused.append(req)
                continue
            reserved_blocks += need
            batch.decode.append(req)
            token_budget -= 1
            n_scheduled += 1

        # 2) in-progress context (chunked prefill continuations), then new
        #    requests from the waiting queue — higher scheduling priority
        #    first, FIFO within a priority level (reference executor.h
        #    Request::priority; stable sort preserves arrival order)
        waiting = sorted(waiting,
                         key=lambda r: -getattr(r, "priority", 0.5))
        for req in ctx_reqs + list(waiting):
            if n_scheduled >= cfg.max_batch_size or token_budget <= 0:
                break
            if (req.state == RequestState.QUEUED
                    and not getattr(self.kv, "can_admit_new",
                                    lambda: True)()):
                continue  # VSWA ring slots exhausted: admit later
            remaining = (req.remaining_context if req.is_context_init
                         else req.prompt_len)
            if cfg.enable_chunked_prefill:
                chunk = min(remaining, token_budget)
                if cfg.max_chunk_size:
                    chunk = min(chunk, cfg.max_chunk_size)
                # keep chunk boundaries block-aligned unless it's the final one
                bs = self.kv.block_size
                if chunk < remaining:
                    chunk = (chunk // bs) * bs
                if chunk <= 0:
                    continue
            else:
                chunk = remaining
                if chunk > token_budget:
                    continue
            # capacity check
            if cfg.policy == CapacitySchedulerPolicy.GUARANTEED_NO_EVICT:
                fits, need = self._fits_no_evict(req, reserved_blocks)
            else:
                fits, need = self._fits_next_step(req, reserved_blocks, chunk)
            if not fits:
                continue
            reserved_blocks += need
            batch.prefill.append((req, chunk))
            token_budget -= chunk
            n_scheduled += 1

        self._apply_batch_waiting(batch, {id(r) for r in ctx_reqs})
        return batch
