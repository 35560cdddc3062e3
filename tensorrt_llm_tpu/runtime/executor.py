"""Continuous-batching executor loop.

Counterpart of the reference's `PyExecutor` (`pyexecutor/py_executor.py:236`;
loop `_executor_loop` :1473): a background thread that each iteration
  1. ingests new requests,
  2. schedules (capacity + micro-batch, chunked prefill),
  3. allocates paged-KV blocks (with prefix reuse),
  4. runs prefill chunks + one batched decode step on device,
  5. samples, applies stop criteria, streams results.

JAX async dispatch plays the role of the reference's overlap scheduler: device
steps for prefill/decode are enqueued without host sync; the only host sync is
fetching sampled token ids (the reference syncs the same way in
`_sample_async`/`update_requests`).
"""

from __future__ import annotations

import queue
import threading
import time
import traceback
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
from tensorrt_llm_tpu.runtime.request import (
    FinishReason,
    LlmRequest,
    RequestState,
)
from tensorrt_llm_tpu.runtime.sampler import SamplingState, sample_tokens
from tensorrt_llm_tpu.runtime.scheduler import Scheduler, SchedulerConfig
from tensorrt_llm_tpu.utils import logger


@dataclass
class IterationStats:
    """Reference analog: IterationStats (py_executor.py:806-1019)."""

    iteration: int = 0
    num_active: int = 0
    num_waiting: int = 0
    num_prefill_tokens: int = 0
    num_decode_tokens: int = 0
    kv_stats: dict = field(default_factory=dict)
    step_time_ms: float = 0.0
    tokens_generated: int = 0


class PyExecutor:
    def __init__(
        self,
        engine: ModelEngine,
        scheduler_cfg: Optional[SchedulerConfig] = None,
        eos_token_id: Optional[int] = None,
        max_seq_len: int = 2048,
        max_decode_steps: int = 4,
        drafter=None,
        tokenizer=None,
        vocab_size: Optional[int] = None,
        watchdog_timeout: float = 300.0,
        profile_start_stop: Optional[str] = None,
        tracer=None,
        moe_balancer=None,
        overlap_decode: Optional[bool] = None,
        overlap_depth: Optional[int] = None,
        iter_stats_max_iterations: int = 1000,
        batched_logits_processor=None,
    ):
        # fused multi-step decode (one dispatch = up to N tokens/seq); the
        # TPU analog of multi-iteration CUDA-graph capture
        self.max_decode_steps = max(1, max_decode_steps)
        # overlap decode (reference _executor_loop_overlap +
        # _process_previous_batch, py_executor.py:1660,1936): chunks are
        # dispatched with the PREVIOUS chunk's device-resident sampled
        # tokens as input, so the host never blocks between dispatches;
        # fetch + stop handling trail behind, up to `depth` chunks deep.
        import collections
        import os as _os2
        self._inflight = collections.deque()
        self._inflight_comp = None
        self._virtual: dict = {}   # req_id -> dispatched-but-unapplied tokens
        self._overlap_depth = max(1, int(
            overlap_depth if overlap_depth is not None
            else _os2.environ.get("TLLM_OVERLAP_DEPTH", "4")))
        self._overlap_enabled = (
            overlap_decode if overlap_decode is not None
            else _os2.environ.get("TLLM_OVERLAP_DECODE", "1") == "1")
        self._stats_max = max(1, int(iter_stats_max_iterations))
        # one host callable over the whole decode batch (reference
        # batched_logits_processor): forces the single-step host path
        self.batched_logits_processor = batched_logits_processor
        # test hook: pretend results never land early so the pipeline
        # always runs at full depth (CPU arrays are ready instantly)
        self._force_lag = _os2.environ.get("TLLM_OVERLAP_LAG") == "1"
        # speculative decoding (reference: _torch/speculative/)
        self.drafter = drafter
        if drafter is not None:
            drafter.bind(engine, engine.kv_manager)
        self._needs_hidden = bool(drafter is not None
                                  and getattr(drafter, "needs_hidden", False))
        self._hidden_capture = getattr(drafter, "hidden_capture", "final")
        self.spec_stats = {"proposed": 0, "accepted": 0, "rounds": 0}
        # adaptive spec disable (reference acceptance_window): rolling
        # accepted-length history; once its mean drops below the
        # configured threshold, speculation turns off for good
        self._spec_adaptive_off = False
        self._spec_len_cap = None
        aw = getattr(getattr(drafter, "cfg", None), "acceptance_window",
                     None)
        import collections as _coll
        self._accept_hist = _coll.deque(maxlen=aw) if aw else None
        # guided decoding (reference: pyexecutor/guided_decoder.py)
        from tensorrt_llm_tpu.runtime.guided_decoder import GuidedDecoder
        self.tokenizer = tokenizer
        self.guided = GuidedDecoder(
            vocab_size or engine.model.cfg.vocab_size)
        # async stop-string scanning (reference postproc_worker.py:52):
        # keeps tokenizer.decode off the executor thread and lets
        # stop-string requests ride the fused/overlap decode paths
        self._stop_scan = None
        self._stop_fed: dict = {}   # req_id -> tokens handed to the worker
        if tokenizer is not None and _os2.environ.get(
                "TLLM_ASYNC_STOP_SCAN", "1") == "1":
            from tensorrt_llm_tpu.runtime.postproc import StopScanWorker
            self._stop_scan = StopScanWorker(tokenizer)
        self.engine = engine
        self.kv = engine.kv_manager
        if hasattr(self.kv, "attach_block_io"):
            # host KV tier rides the engine's disagg page copy machinery
            self.kv.attach_block_io(engine.extract_kv_blocks,
                                    engine.inject_kv_blocks)
        scheduler_cfg = scheduler_cfg or SchedulerConfig()
        # prefill chunks can never exceed the largest compiled bucket
        max_prefill = engine.prefill_buckets[-1]
        scheduler_cfg.max_chunk_size = min(
            scheduler_cfg.max_chunk_size or max_prefill, max_prefill)
        self.scheduler = Scheduler(scheduler_cfg, self.kv)
        self.eos_token_id = eos_token_id
        self.max_seq_len = max_seq_len

        self.request_queue: "queue.Queue[LlmRequest]" = queue.Queue()
        self.active: List[LlmRequest] = []
        self.waiting: List[LlmRequest] = []
        # generation_only requests whose streamed KV frames are still
        # arriving (reference disagg transfer-in-progress states)
        self._receiving: List[LlmRequest] = []
        self._cancelled: set = set()

        self.iteration = 0
        self.stats_history: List[IterationStats] = []
        self.total_tokens_generated = 0
        # Wide-EP load balancer (reference moe_load_balancer.py)
        self.moe_balancer = moe_balancer

        # hang detection (reference pyexecutor/hang_detector.py)
        from tensorrt_llm_tpu.runtime.watchdog import HangDetector
        self.watchdog = HangDetector(watchdog_timeout)
        # request tracing (reference llmapi/tracing.py)
        if tracer is None:
            from tensorrt_llm_tpu.llmapi.tracing import RequestTracer
            tracer = RequestTracer()
        self.tracer = tracer
        # iteration-window device profiling (reference TLLM_PROFILE_START_STOP)
        import os as _os
        pss = profile_start_stop or _os.environ.get("TLLM_PROFILE_START_STOP")
        self._profile_window = None
        if pss:
            a, b = (int(x) for x in pss.split(","))
            self._profile_window = (a, b)
            self._profiling = False

        self._shutdown = threading.Event()
        self._wake = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

        # Multi-host lockstep (reference: rank-0 ingestion + broadcast,
        # executor_request_queue.py:346-426): with >1 controller processes
        # every rank must see the same requests in the same iteration, so
        # ingestion becomes a collective: rank 0 drains its local queue and
        # broadcasts (requests, cancels, shutdown) to all ranks each loop
        # iteration.
        import jax
        self._num_procs = jax.process_count()
        self._proc_id = jax.process_index()
        self._stop_loop = False
        self._cancel_sync: set = set()

    # ---------------------------------------------------------------- lifecycle --
    def start(self):
        assert self._thread is None
        self._thread = threading.Thread(target=self._loop_main, daemon=True,
                                        name="tllm-tpu-executor")
        self._thread.start()
        self.watchdog.start()

    def shutdown(self):
        self._shutdown.set()
        self._wake.set()
        self.watchdog.stop()
        if self._thread:
            self._thread.join(timeout=30)
            self._thread = None
        if self.drafter is not None and hasattr(self.drafter, "flush"):
            self.drafter.flush()  # capture-style drafters write final shard
        if self._stop_scan is not None:
            self._stop_scan.close()

    # ---------------------------------------------------------------- submit ----
    def submit(self, request: LlmRequest) -> LlmRequest:
        if getattr(self, "weights_released", False):
            raise RuntimeError("model weights are released from device "
                               "memory; call resume_memory() first")
        if request.prompt_len == 0:
            raise ValueError("prompt must contain at least one token")
        if request.prompt_len >= self.max_seq_len:
            raise ValueError(
                f"prompt length {request.prompt_len} exceeds max_seq_len "
                f"{self.max_seq_len} (need room for at least one new token)")
        if request.prompt_len + request.sampling_params.max_tokens > self.max_seq_len:
            # copy-on-clamp: the params object may be shared across the
            # caller's batch — mutating it would shrink other requests
            import dataclasses as _dc
            request.sampling_params = _dc.replace(
                request.sampling_params,
                max_tokens=max(1, self.max_seq_len - request.prompt_len))
        self.request_queue.put(request)
        self._wake.set()
        return request

    def cancel(self, request_id: int):
        self._cancelled.add(request_id)
        self._wake.set()

    # ---------------------------------------------------------------- loop ------
    def _loop_main(self):
        try:
            # multiproc: only the collective stop flag ends the loop, so
            # rank 0 always broadcasts shutdown before leaving and no rank
            # hangs in the ingest collective
            while not self._stop_loop and (
                    self._num_procs > 1 or not self._shutdown.is_set()):
                worked = self._step()
                self.watchdog.heartbeat(
                    busy=bool(self.active or self.waiting))
                if not worked:
                    self._wake.wait(timeout=0.005)
                    self._wake.clear()
        except BaseException as e:  # noqa: BLE001
            self._error = e
            logger.error("executor loop died: %s\n%s", e, traceback.format_exc())
            for req in self.active + self.waiting + self._receiving:
                req.finish(FinishReason.ERROR)
                req.emit(finished=True, error=str(e))

    def _fetch_new_requests(self):
        if self._num_procs > 1:
            self._fetch_new_requests_multiproc()
            return
        while True:
            try:
                req = self.request_queue.get_nowait()
            except queue.Empty:
                break
            if req.request_type == "generation_only":
                self._admit_generation_only(req)
            else:
                self.waiting.append(req)

    def _fetch_new_requests_multiproc(self):
        """Collective ingestion: exactly one broadcast pair per loop
        iteration on every rank, so ranks self-synchronize on the header
        collective.  The payload carries (new requests, cancellations,
        shutdown flag); non-zero ranks reconstruct shadow LlmRequests with
        rank-0's request ids so KV bookkeeping stays identical everywhere."""
        import pickle

        import numpy as np
        from jax.experimental import multihost_utils

        if self._proc_id == 0:
            reqs = []
            while True:
                try:
                    req = self.request_queue.get_nowait()
                except queue.Empty:
                    break
                assert req.request_type == "full", (
                    "disaggregated request types are single-controller only")
                reqs.append(req)
            payload = pickle.dumps({
                "reqs": [(r.request_id, r.prompt_token_ids,
                          r.sampling_params, r.cache_salt, r.lora_request,
                          r.retention_priority)
                         for r in reqs],
                "cancel": sorted(self._cancelled),
                "stop": self._shutdown.is_set(),
            })
            # pad to a power-of-two bucket: broadcast shapes must match on
            # all ranks and stay few to bound pjit cache entries
            size = max(64, 1 << (len(payload) - 1).bit_length())
            header = np.array([len(payload), size], np.int64)
            buf = np.zeros(size, np.uint8)
            buf[: len(payload)] = np.frombuffer(payload, np.uint8)
        else:
            reqs = None
            header = np.zeros(2, np.int64)
        header = np.asarray(multihost_utils.broadcast_one_to_all(header))
        nbytes, size = int(header[0]), int(header[1])
        if self._proc_id != 0:
            buf = np.zeros(size, np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        state = pickle.loads(buf[:nbytes].tobytes())

        # every rank handles exactly the broadcast cancel set this iteration
        # (a cancel() arriving on rank 0 mid-iteration must wait for the next
        # broadcast or ranks would free KV on different iterations)
        self._cancel_sync = set(state["cancel"])
        if state["stop"]:
            self._stop_loop = True
        if self._proc_id == 0:
            self.waiting.extend(reqs)
        else:
            for rid, toks, sp, salt, lora, prio in state["reqs"]:
                req = LlmRequest(list(toks), sp, request_id=rid,
                                 cache_salt=salt, lora_request=lora,
                                 retention_priority=prio)
                # keep beam/fork id allocation in lockstep with rank 0
                LlmRequest._id_counter = max(LlmRequest._id_counter, rid)
                self.waiting.append(req)

    def _admit_generation_only(self, req):
        """Disaggregated decode side: inject the transferred prompt KV and
        enter generation directly (reference disagg states,
        py_executor.py:2218-2335 + CacheTransceiver receive)."""
        dp = req.disagg_params
        P = req.prompt_len
        # private blocks: a unique salt defeats prefix matching so injected
        # pages never alias another sequence's reused blocks
        self.kv.add_sequence(req.request_id, req.prompt_token_ids,
                             cache_salt=f"__disagg_{req.request_id}")
        self.kv.grow_sequence(req.request_id, P)
        if getattr(dp, "kv_frames", None) is not None:
            # streamed receive (ContextProgress analog): frames inject as
            # they arrive, overlapping the sender's remaining prefill;
            # the request activates when the end frame lands
            self._receiving.append(req)
            self._pump_kv_receive()
            return
        table = self.kv.block_table(req.request_id, self.kv.blocks_needed(P))
        ring = (self.kv.local_block_table(req.request_id)
                if getattr(self.engine, "_vswa", False) else None)
        self.engine.inject_kv_blocks(table, dp.kv_payload["layers"], ring)
        self._activate_generation_only(req)

    def _activate_generation_only(self, req):
        dp = req.disagg_params
        req.start_context()
        req.context_position = req.prompt_len
        req.finish_context()
        for tok in dp.first_gen_tokens:
            req.append_token(int(tok))
        req.emit(finished=False)
        self.active.append(req)

    def _pump_kv_receive(self):
        """Drain available KV frames (non-blocking) into pre-allocated
        block tables; activate requests whose end frame arrived."""
        import jax
        for req in list(self._receiving):
            q = req.disagg_params.kv_frames
            P = req.prompt_len
            while True:
                try:
                    frame = q.get_nowait()
                except queue.Empty:
                    break
                if frame.get("error"):
                    self._receiving.remove(req)
                    self.kv.free_sequence(req.request_id)
                    req.finish(FinishReason.ERROR)
                    req.emit(finished=True,
                             error=f"kv stream: {frame['error']}")
                    break
                if frame.get("end"):
                    dp = req.disagg_params
                    if not dp.first_gen_tokens:
                        dp.first_gen_tokens = list(
                            frame.get("first_gen_tokens", []))
                    self._receiving.remove(req)
                    self._activate_generation_only(req)
                    break
                table = self.kv.block_table(req.request_id,
                                            self.kv.blocks_needed(P))
                if frame.get("ring"):
                    ring = self.kv.local_block_table(req.request_id)
                    self.engine.inject_kv_blocks(table, frame["layers"],
                                                 ring)
                else:
                    s = frame["start_block"]
                    n = np.asarray(
                        jax.tree.leaves(frame["layers"][0])[0]).shape[0]
                    self.engine.inject_kv_blocks(table[s:s + n],
                                                 frame["layers"])

    def _handle_cancellations(self):
        # multiproc: act only on the collectively-agreed cancel set so every
        # rank frees KV in the same iteration
        pending = (self._cancel_sync if self._num_procs > 1
                   else self._cancelled)
        if not pending:
            return
        if self._inflight and any(self._virtual.get(rid) for rid in pending):
            # in-flight chunks still write a cancelled sequence's slots:
            # sync before its blocks go back to the pool
            self._drain_inflight()
        for req in list(self.active):
            if req.request_id in pending:
                self.kv.free_sequence(req.request_id)
                self.active.remove(req)
                req.finish(FinishReason.CANCELLED)
                self._run_finish_hook(req)
                req.emit(finished=True)
                pending.discard(req.request_id)
                self._cancelled.discard(req.request_id)
        for req in list(self.waiting):
            if req.request_id in pending:
                self.waiting.remove(req)
                req.finish(FinishReason.CANCELLED)
                self._run_finish_hook(req)
                req.emit(finished=True)
                pending.discard(req.request_id)
                self._cancelled.discard(req.request_id)
        for req in list(self._receiving):
            if req.request_id in pending:
                self._receiving.remove(req)
                self.kv.free_sequence(req.request_id)
                req.finish(FinishReason.CANCELLED)
                self._run_finish_hook(req)
                req.emit(finished=True)
                pending.discard(req.request_id)
                self._cancelled.discard(req.request_id)
        # ids matching no live request (already finished, or bogus) would
        # otherwise leak forever — and multiproc rebroadcasts the whole
        # cancel set every iteration.  Keep a short grace window so a
        # cancel racing a not-yet-fetched submission still lands.
        unmatched = getattr(self, "_cancel_unmatched", None)
        if unmatched is None:
            unmatched = self._cancel_unmatched = {}
        for rid in list(pending):
            misses = unmatched.get(rid, 0) + 1
            if misses >= 3:
                pending.discard(rid)
                self._cancelled.discard(rid)
                unmatched.pop(rid, None)
            else:
                unmatched[rid] = misses
        for rid in list(unmatched):
            if rid not in self._cancelled:
                unmatched.pop(rid, None)

    @staticmethod
    def _run_finish_hook(req):
        """One-shot per-request finish callback (paged-LoRA slot unpin)."""
        cb = getattr(req, "on_finished", None)
        if cb is not None:
            req.on_finished = None
            try:
                cb(req)
            except Exception:  # noqa: BLE001 — hooks must not kill the loop
                logger.exception("request finish hook failed")

    def _step(self) -> bool:
        t0 = time.perf_counter()
        self._fetch_new_requests()
        self._handle_cancellations()
        if self._receiving:
            self._pump_kv_receive()
        if not self.active and not self.waiting:
            if self._inflight:
                self._drain_inflight()
            return False

        batch = self.scheduler.schedule(self.active, self.waiting)
        if batch.empty:
            if self._inflight:
                # nothing schedulable (e.g. every request finished while
                # chunks were in flight): sync so emission/cleanup proceed
                self._drain_inflight()
                self._cleanup_finished()
                return True
            return False
        self.iteration += 1
        self._maybe_profile()
        if self.moe_balancer is not None:
            # fire at step START: deterministic w.r.t. generate() returning
            # (the final token may be emitted mid-step, releasing the caller
            # before the step's tail runs)
            self.moe_balancer.step(self.iteration)
        stats = IterationStats(iteration=self.iteration,
                               num_active=len(self.active),
                               num_waiting=len(self.waiting))

        # ---- prefill chunks -----------------------------------------------------
        for req, chunk in batch.prefill:
            if req.state == RequestState.QUEUED:
                if req.sampling_params.prompt_logprobs \
                        or req.sampling_params.return_context_logits:
                    # full prompt logits are required: a reused prefix has
                    # no logits, so defeat prefix matching with a unique
                    # salt (the blocks still seal under it, harmlessly)
                    req.cache_salt = ("__ctx_logits__", req.request_id,
                                      req.cache_salt)
                cached = self.kv.add_sequence(req.request_id,
                                              req.prompt_token_ids,
                                              req.cache_salt)
                if req.retention_priority is not None and \
                        hasattr(self.kv, "set_seq_priority"):
                    self.kv.set_seq_priority(req.request_id,
                                             req.retention_priority)
                req.num_cached_tokens = cached
                req.context_position = cached
                # copy-on-partial-reuse: device-copy the matched source
                # page into the fresh tail block BEFORE any prefill write
                # of this iteration lands (dispatch order = device order)
                ppairs = getattr(self.kv, "drain_partial_copies",
                                 lambda s: [])(req.request_id)
                if ppairs:
                    owner = (self.kv.rank_of(req.request_id)
                             if hasattr(self.kv, "rank_of") else 0)
                    self.engine.copy_kv_blocks(ppairs, owner=owner)
                req.start_context()
                if req.sampling_params.guided_decoding is not None:
                    from tensorrt_llm_tpu.runtime.guided_decoder import create_matcher
                    try:
                        self.guided.register(req.request_id, create_matcher(
                            req.sampling_params.guided_decoding,
                            self.tokenizer, self.eos_token_id,
                            vocab_size=self.guided.vocab_size))
                    except Exception as exc:  # noqa: BLE001
                        # a malformed grammar/schema is a PER-REQUEST input
                        # error — it must not reach the loop's catch-all
                        # and kill every in-flight request
                        self.kv.free_sequence(req.request_id)
                        self.waiting.remove(req)
                        req.finish(FinishReason.ERROR)
                        req.emit(finished=True,
                                 error=f"guided decoding: {exc}")
                        continue
                self.waiting.remove(req)
                self.active.append(req)
                # reuse may cover the whole remaining chunk; re-clamp
                chunk = min(chunk, req.remaining_context)
                if chunk <= 0:
                    chunk = req.remaining_context  # defensive; >=1 by manager
            start = req.context_position
            self.kv.grow_sequence(req.request_id, start + chunk)
            if start == 0 and getattr(req, "cross_states", None) \
                    is not None and not getattr(req, "_cross_injected",
                                                False):
                # Mllama: write the request's vision K/V into the
                # slot-addressed cross pools before the first chunk
                self.engine.inject_cross_states(req)
                req._cross_injected = True
            pm = getattr(req, "prefill_pair_mask", None)
            if pm is not None:
                # custom-visibility prefill (Gemma3-VL: image tokens attend
                # bidirectionally within their image) — single forward with
                # a host-built [T, T] mask through the tree-verify step
                if start != 0 or chunk != req.remaining_context:
                    # per-request input error, NOT an assert: one oversized
                    # prompt must never kill the executor loop for everyone
                    self.kv.free_sequence(req.request_id)
                    self.active.remove(req)
                    req.finish(FinishReason.ERROR)
                    req.emit(finished=True, error=(
                        "masked prefill requires a single chunk: prompt "
                        f"length {req.prompt_len} exceeds the largest "
                        "prefill bucket / token budget"))
                    continue
                import numpy as _np
                inputs = self.engine.prepare_tree_verify_inputs(
                    req, req.prompt_token_ids,
                    _np.arange(chunk, dtype=_np.int32),
                    [True] * chunk)
                pe = getattr(req, "prompt_embeds", None)
                if pe is not None:
                    Tp = inputs.input_ids.shape[0]
                    emb = _np.zeros((Tp, pe.shape[1]), _np.float32)
                    emb[:chunk] = pe[:chunk]
                    inputs.input_embeds = emb
                Tp = inputs.input_ids.shape[0]
                want_rows = (req.sampling_params.prompt_logprobs
                             or req.sampling_params.return_context_logits)
                inputs.logit_indices = (
                    _np.arange(Tp, dtype=_np.int32) if want_rows
                    else _np.array([chunk - 1], _np.int32))
                pmp = _np.zeros((Tp, Tp), bool)
                pmp[:chunk, :chunk] = pm
                logits = self.engine.run_verify_tree(inputs, pmp,
                                                     chunk_causal=False)
                if want_rows:
                    self._capture_prompt_rows(req, start, chunk,
                                              np.asarray(logits))
                    logits = np.asarray(logits)[chunk - 1:chunk]
            elif self._needs_hidden and req.sampling_params.greedy:
                # one-model drafters need the hidden of every prompt row
                inputs = self.engine.prepare_prefill_inputs(req, chunk)
                Tp = inputs.input_ids.shape[0]
                inputs.logit_indices = np.arange(Tp, dtype=np.int32)
                all_logits, hidden = self.engine.run_with_hidden(
                    "prefill", inputs, self._hidden_capture)
                if self.engine.mapping.dp_size > 1:
                    # ADP: owner band of the dp-stacked rows
                    o = inputs.owner * Tp
                    all_logits = np.asarray(all_logits)[o:o + Tp]
                    hidden = np.asarray(hidden)[o:o + Tp]
                self.drafter.on_hidden(
                    req, start, np.asarray(hidden)[:chunk])
                self._capture_prompt_rows(req, start, chunk, all_logits)
                logits = all_logits[chunk - 1:chunk]
            elif (req.sampling_params.prompt_logprobs
                  or req.sampling_params.return_context_logits) \
                    and not getattr(self.engine, "_star", False) \
                    and not getattr(self.engine, "_helix", False):
                # prompt logprobs / context logits: request every prompt
                # row's logits (reference gather_context_logits)
                inputs = self.engine.prepare_prefill_inputs(req, chunk)
                Tp = inputs.input_ids.shape[0]
                inputs.logit_indices = np.arange(Tp, dtype=np.int32)
                all_logits = np.asarray(self.engine.run_prefill(inputs))
                if self.engine.mapping.dp_size > 1:
                    o = inputs.owner * Tp
                    all_logits = all_logits[o:o + Tp]
                self._capture_prompt_rows(req, start, chunk, all_logits)
                logits = all_logits[chunk - 1:chunk]
            else:
                inputs = self.engine.prepare_prefill_inputs(req, chunk)
                logits = self.engine.run_prefill(inputs)
                if self.engine.mapping.dp_size > 1:
                    # replicated ADP prefill: the owner rank's logits row
                    # (host slice: device gathers on dp-sharded arrays are
                    # ambiguous to GSPMD)
                    logits = np.asarray(logits)[inputs.owner:inputs.owner + 1]
            req.context_position += chunk
            self.kv.seal_full_blocks(
                req.request_id, req.prompt_token_ids[:req.context_position])
            self._pump_kv_stream(req)
            stats.num_prefill_tokens += chunk
            if req.remaining_context == 0:
                req.finish_context()
                if req.sampling_params.use_beam_search:
                    from tensorrt_llm_tpu.runtime.beam_search import BeamSearch
                    req._beam = BeamSearch(req, self.kv, self.engine,
                                           self.eos_token_id,
                                           self.max_seq_len)
                    req._beam.init_from_logits(np.asarray(logits)[0])
                    if req._beam.done:
                        req._beam.apply_to_request()
                else:
                    self._sample_and_update([req], logits)

        # ---- beam-search requests: one fused step over all live beams ----
        beam_reqs = [r for r in batch.decode
                     if r.is_generating and getattr(r, "_beam", None)]
        for req in beam_reqs:
            req._beam.step()
            stats.num_decode_tokens += len(req._beam.live)
            if req._beam.done:
                req._beam.apply_to_request()

        # ---- speculative decode (greedy requests, when a drafter is set) ----
        decode_reqs = [r for r in batch.decode
                       if r.is_generating and not getattr(r, "_beam", None)]
        # spec concurrency gate (reference NGramDecodingConfig
        # .max_concurrency via suggest_spec_config): big decode batches
        # amortize per-step cost already, so speculation turns off
        dcfg = getattr(self.drafter, "cfg", None)
        spec_cap = getattr(dcfg, "max_concurrency", None)
        spec_on = (self.drafter is not None
                   and not self._spec_adaptive_off
                   and self.batched_logits_processor is None
                   and (spec_cap is None or len(decode_reqs) <= spec_cap))
        # draft length by batch size (reference draft_len_schedule)
        self._spec_len_cap = None
        sched = getattr(dcfg, "draft_len_schedule", None)
        if sched:
            fits = [bs for bs in sched if bs <= len(decode_reqs)]
            self._spec_len_cap = sched[max(fits)] if fits else None
            if self._spec_len_cap == 0:
                spec_on = False
        if self._inflight and (beam_reqs or spec_on):
            # spec/beam paths read request state and dispatch their own
            # steps: sync the overlap pipeline BEFORE they run — and the
            # drain can FINISH captured requests, so re-filter
            self._drain_inflight()
            decode_reqs = [r for r in decode_reqs if r.is_generating]
        if spec_on:
            remaining = []
            for req in decode_reqs:
                # spec accept loops bypass _sample_and_update, so requests
                # recording per-token logprobs / raw generation logits or
                # needing host logit controls (stop strings, penalties,
                # bans — all applied only on the host sampling path) must
                # take the normal path
                sp_r = req.sampling_params
                if sp_r.greedy and \
                        not self.guided.has(req.request_id) and \
                        not sp_r.logprobs and \
                        not sp_r.return_generation_logits and \
                        not self._needs_host_controls(sp_r):
                    n0 = req.num_output_tokens
                    if self._spec_decode(req):
                        stats.num_decode_tokens += \
                            req.num_output_tokens - n0
                        continue
                remaining.append(req)
            decode_reqs = remaining
        # requests leaving the spec path (gate off, controls, adaptive
        # disable) may hold tree-verified KV deferred to ride the next
        # spec chunk — the normal decode paths never write it, so flush
        # before they run with those positions in kv_lens
        for req in decode_reqs:
            if getattr(req, "spec_pending", 0):
                self._flush_pending(req)

        # ---- decode batch ---------------------------------------------------------
        if self._inflight and not decode_reqs:
            self._drain_inflight()
        if decode_reqs:
            k = self._decode_steps_for(decode_reqs)
            overlap = k > 1 and self._overlap_ok(decode_reqs)
            if self._inflight and not overlap:
                # the drain applies pending chunks and can FINISH requests
                # already captured in decode_reqs — re-filter, or the
                # paths below would append tokens past their finish
                self._drain_inflight()
                decode_reqs = [r for r in decode_reqs if r.is_generating]
            if not decode_reqs:
                pass
            elif overlap:
                self._overlap_decode(decode_reqs, k)
                stats.num_decode_tokens += len(decode_reqs) * k
            elif k > 1:
                self._decode_multi(decode_reqs, k)
                stats.num_decode_tokens += len(decode_reqs) * k
            else:
                for req in decode_reqs:
                    self.kv.grow_sequence(req.request_id, req.num_tokens)
                inputs = self.engine.prepare_decode_inputs(decode_reqs)
                if self._needs_hidden:
                    logits, hidden = self.engine.run_with_hidden(
                        "decode", inputs, self._hidden_capture)
                    hidden = np.asarray(hidden)
                    if inputs.row_map is not None:
                        hidden = hidden[inputs.row_map]
                    for i, req in enumerate(decode_reqs):
                        if req.sampling_params.greedy:
                            self.drafter.on_hidden(
                                req, req.num_tokens - 1, hidden[i:i + 1])
                else:
                    logits = self.engine.run_decode(inputs)
                if inputs.row_map is not None:
                    # attention-DP: gather request rows back from the
                    # rank-grouped batch layout (host-side)
                    logits = np.asarray(logits)[inputs.row_map]
                self._sample_and_update(decode_reqs, logits)
                stats.num_decode_tokens += len(decode_reqs)

        # ---- async stop-string scan (reference postproc workers) -----------------
        if self._stop_scan is not None:
            self._pump_stop_scan()

        # ---- cleanup finished -----------------------------------------------------
        self._cleanup_finished()

        stats.kv_stats = self.kv.stats()
        stats.step_time_ms = (time.perf_counter() - t0) * 1e3
        stats.tokens_generated = self.total_tokens_generated
        self.stats_history.append(stats)
        if len(self.stats_history) > self._stats_max:
            self.stats_history = self.stats_history[-self._stats_max:]
        return True

    def _pump_stop_scan(self):
        """Hand new tokens of stop-string requests to the scan worker and
        finish any request whose match landed.  No tokenizer calls happen
        on this (executor) thread; a match takes effect up to one fused
        chunk late, truncated back to the matching token so results are
        identical to the synchronous scan."""
        for req in self.active:
            sp = req.sampling_params
            if not sp.stop or not req.is_generating:
                continue
            n = len(req.output_token_ids)
            fed = self._stop_fed.get(req.request_id, 0)
            if n > fed:
                self._stop_scan.feed(req.request_id, sp.stop,
                                     req.output_token_ids,
                                     sp.skip_special_tokens)
                self._stop_fed[req.request_id] = n
        hits = self._stop_scan.poll()
        if not hits:
            return
        for req in self.active:
            hit = hits.get(req.request_id)
            if hit is None or not req.is_generating:
                continue
            n_match, stop_str = hit
            req.truncate_output(n_match)
            req.stop_string = stop_str
            req.finish(FinishReason.STOP_STRING)
            if req.request_type != "context_only":
                req.emit(finished=True)

    def _pump_kv_stream(self, req: LlmRequest, tail: bool = False):
        """Streamed disagg transfer (reference ContextProgress layer-wise
        streaming, cacheTransceiver.cpp:203 — here chunk-wise: XLA runs
        all layers in one dispatch, so the natural progress unit is the
        finished prefill chunk).  Push newly-completed full blocks as a
        frame so the network send + receiver inject overlap the remaining
        prefill compute; ``tail=True`` flushes the final (possibly
        partial) block at finish."""
        if req.kv_stream is None or req.request_type != "context_only":
            return
        if getattr(self.engine, "_vswa", False):
            # sliding-window rings can rewrite early blocks mid-prefill;
            # they settle only at finish — ship everything as one frame
            if not tail:
                return
            done = self.kv.blocks_needed(req.prompt_len)
            if done > req._kv_streamed_blocks:
                table = self.kv.block_table(req.request_id, done)
                ring = self.kv.local_block_table(req.request_id)
                layers = self.engine.extract_kv_blocks(table, ring)
                req.kv_stream.put({"start_block": 0, "layers": layers,
                                   "ring": True})
                req._kv_streamed_blocks = done
            return
        bs = self.kv.block_size
        done = (self.kv.blocks_needed(req.prompt_len) if tail
                else req.context_position // bs)
        sent = req._kv_streamed_blocks
        if done > sent:
            table = self.kv.block_table(req.request_id, done)
            layers = self.engine.extract_kv_blocks(table[sent:done])
            req.kv_stream.put({"start_block": sent, "layers": layers})
            req._kv_streamed_blocks = done

    def _cleanup_finished(self):
        for req in list(self.active):
            if req.is_finished:
                if self._virtual.get(req.request_id):
                    # later in-flight chunks still write this sequence's
                    # slots — freeing now would hand its blocks to a new
                    # prefill mid-write.  The next iteration's composition
                    # change drains the pipeline, then cleanup proceeds.
                    continue
                if req.request_type == "context_only" \
                        and req.kv_stream is not None \
                        and req.kv_payload is None:
                    # streamed send side: most blocks already left during
                    # the chunk loop; flush the tail + end marker instead
                    # of capturing a whole payload
                    self._pump_kv_stream(req, tail=True)
                    P = req.prompt_len
                    req.kv_payload = {"streamed": True, "num_tokens": P,
                                      "block_size": self.kv.block_size}
                    req.kv_stream.put({
                        "end": True, "num_tokens": P,
                        "block_size": self.kv.block_size,
                        "first_gen_tokens": list(req.output_token_ids)})
                    req.emit(finished=True)
                elif req.request_type == "context_only" \
                        and req.kv_payload is None:
                    # disagg send side: capture the prompt KV pages before
                    # freeing the sequence (reference CacheTransceiver send)
                    P = req.prompt_len
                    table = self.kv.block_table(req.request_id,
                                                self.kv.blocks_needed(P))
                    ring = (self.kv.local_block_table(req.request_id)
                            if getattr(self.engine, "_vswa", False) else None)
                    req.kv_payload = {
                        "layers": self.engine.extract_kv_blocks(table, ring),
                        "num_tokens": P,
                        "block_size": self.kv.block_size,
                    }
                    # the finished piece was held back until the payload
                    # existed (clients read kv_payload on completion)
                    req.emit(finished=True)
                if self.drafter is not None and \
                        not getattr(req, "_drafter_notified", False):
                    # non-spec finishes (normal decode path) must still
                    # reach the drafter — capture-style drafters
                    # (SAVE_HIDDEN_STATES) flush per-request state here
                    req._drafter_notified = True
                    self.drafter.on_request_finished(req)
                self._run_finish_hook(req)
                self.kv.free_sequence(req.request_id)
                self.guided.drop(req.request_id)
                if self._stop_scan is not None and \
                        self._stop_fed.pop(req.request_id, None) is not None:
                    self._stop_scan.drop(req.request_id)
                self.active.remove(req)
                self.tracer.record_request(req)

    def _flush_pending(self, req: LlmRequest):
        """Write KV for tokens accepted by tree verification but not yet in
        the cache (all appended tokens except the last — the normal paths
        re-feed the last token themselves)."""
        P = getattr(req, "spec_pending", 0)
        if not P:
            return
        n = req.num_tokens
        toks = req.all_token_ids[n - 1 - P:n - 1]
        positions = np.arange(n - 1 - P, n - 1, dtype=np.int32)
        self.kv.grow_sequence(req.request_id, n - 1)
        inputs = self.engine.prepare_tree_verify_inputs(
            req, toks, positions, [True] * P)
        Tp = len(inputs.input_ids)
        self.engine.run_verify_tree(inputs, np.tril(np.ones((Tp, Tp), bool)))
        req.spec_pending = 0

    def _relaxed_params(self, req):
        """(topk, delta, thinking_now) when relaxed thinking-phase
        acceptance is configured, else None (strict equality).  Reference
        MTP relaxed acceptance (mtp.py:798-845): the per-sequence delta is
        non-zero only inside a <think> span."""
        cfg = getattr(self.drafter, "cfg", None)
        if cfg is None or not getattr(cfg, "use_relaxed_acceptance_for_thinking", False):
            return None
        # incremental scan over any tokens (prompt or decoded via any path)
        # appended since the last look
        bt = cfg.begin_thinking_phase_token
        et = cfg.end_thinking_phase_token
        start = getattr(req, "_think_scanned", 0)
        state = getattr(req, "_thinking", False)
        toks = req.all_token_ids
        for t in toks[start:]:
            if t == bt:
                state = True
            elif t == et:
                state = False
        req._thinking = state
        req._think_scanned = len(toks)
        return (int(cfg.relaxed_topk), float(cfg.relaxed_delta), state)

    @staticmethod
    def _relaxed_accept(row, tok: int, topk: int, delta: float) -> bool:
        """Accept `tok` when it is in the target's top-`topk` and its
        probability is within `delta` of the top-1 probability."""
        row = np.asarray(row, np.float64)
        p = np.exp(row - row.max())
        p = p / p.sum()
        top = np.argpartition(-p, min(topk, p.size - 1))[:topk]
        return int(tok) in {int(t) for t in top} \
            and float(p.max() - p[int(tok)]) <= delta

    def _needs_host_controls(self, sp) -> bool:
        """Sampling features applied only on the host logits path — they
        force single-step decode and exclude a request from speculation
        (whose accept loop bypasses _sample_and_update entirely).  Stop
        strings only force the host path when the async scan worker is off
        (with it on they ride fused chunks and truncate on match)."""
        return bool(sp.repetition_penalty != 1.0
                    or sp.presence_penalty != 0.0
                    or sp.frequency_penalty != 0.0
                    or (sp.stop and self._stop_scan is None)
                    or sp.min_tokens or sp.bad_words
                    or sp.logit_bias or sp.no_repeat_ngram_size
                    or sp.logits_processor is not None)

    def _record_acceptance(self, accepted_len: int):
        """Rolling acceptance-length tracking (reference acceptance_window /
        acceptance_length_threshold): a full window averaging below the
        threshold disables speculation for the rest of the run."""
        if self._accept_hist is None or self._spec_adaptive_off:
            return
        self._accept_hist.append(accepted_len)
        cfg = self.drafter.cfg
        thr = cfg.acceptance_length_threshold
        if thr is not None \
                and len(self._accept_hist) == self._accept_hist.maxlen \
                and sum(self._accept_hist) / len(self._accept_hist) < thr:
            self._spec_adaptive_off = True
            logger.info("speculation disabled: rolling acceptance length "
                        "%.2f < threshold %.2f",
                        sum(self._accept_hist) / len(self._accept_hist), thr)

    def _spec_decode(self, req: LlmRequest) -> bool:
        """Draft -> single verify forward -> accept longest matching prefix
        plus one bonus token.  Returns False to fall back to normal decode
        (pending tree-verified KV is flushed first)."""
        budget = min(req.sampling_params.max_tokens - req.num_output_tokens,
                     self.max_seq_len - req.num_tokens) - 1
        if budget < 1:
            self._flush_pending(req)
            return False
        relaxed = self._relaxed_params(req)
        # tree verification is strict-match by construction; inside a
        # thinking span the relaxed CHAIN path accepts more, so prefer it
        tree = (None if self.engine.mapping.dp_size > 1
                or (relaxed is not None and relaxed[2])
                else self.drafter.propose_tree(req))
        if tree is not None and tree[0]:
            if self._verify_tree(req, *tree):
                return True
        self._flush_pending(req)
        if self._spec_len_cap is not None:
            budget = min(budget, self._spec_len_cap)
        draft = self.drafter.propose(req)[:budget]
        if not draft:
            return False
        k = len(draft)
        need = self.kv.blocks_needed(req.num_tokens + k) - \
            self.kv.num_seq_blocks(req.request_id)
        if need > self.kv.num_free_blocks:
            return False
        self.kv.grow_sequence(req.request_id, req.num_tokens + k)
        inputs = self.engine.prepare_verify_inputs(req, draft)
        if self._needs_hidden:
            logits, hidden = self.engine.run_with_hidden(
                "prefill", inputs, self._hidden_capture)
        else:
            logits, hidden = self.engine.run_prefill(inputs), None
        if self.engine.mapping.dp_size > 1:
            # ADP: owner band of the dp-stacked rows
            Tp = inputs.input_ids.shape[0]
            o = inputs.owner * Tp
            logits = np.asarray(logits)[o:o + Tp]
            if hidden is not None:
                hidden = np.asarray(hidden)[o:o + Tp]
        rows = np.asarray(logits[:k + 1])
        greedy = np.asarray(np.argmax(rows, axis=-1))
        cfg = getattr(self.drafter, "cfg", None)
        thinking = relaxed is not None and relaxed[2]
        accepted: List[int] = []
        for j in range(k):
            if draft[j] == int(greedy[j]):
                accepted.append(draft[j])
            elif thinking and \
                    self._relaxed_accept(rows[j], draft[j],
                                         relaxed[0], relaxed[1]):
                accepted.append(draft[j])
            else:
                break
            if relaxed is not None:
                # phase transitions apply mid-chunk, like the reference's
                # relaxed-acceptance kernel tracking begin/end tokens
                if draft[j] == cfg.begin_thinking_phase_token:
                    thinking = True
                elif draft[j] == cfg.end_thinking_phase_token:
                    thinking = False
        accepted.append(int(greedy[len(accepted)]))  # bonus / correction
        if hidden is not None:
            # rows 0..a are fed by real tokens (last accepted + matched
            # drafts) => their hiddens at positions num_tokens-1.. are valid
            a = len(accepted) - 1
            self.drafter.on_hidden(req, req.num_tokens - 1,
                                   np.asarray(hidden)[:a + 1])
        self.spec_stats["proposed"] += k
        self.spec_stats["accepted"] += len(accepted) - 1
        self.spec_stats["rounds"] += 1
        self._record_acceptance(len(accepted))
        for tok in accepted:
            if not req.is_generating:
                break
            req.append_token(tok)
            self.total_tokens_generated += 1
            reason = req.check_stop(self.eos_token_id)
            if reason is None and req.num_tokens >= self.max_seq_len:
                reason = FinishReason.LENGTH
            if reason is not None:
                req.finish(reason)
        self.drafter.on_accepted(req, accepted)
        if req.is_finished:
            req._drafter_notified = True
            self.drafter.on_request_finished(req)
            req.emit(finished=True)
        else:
            req.emit(finished=False)
        return True

    def _verify_tree(self, req: LlmRequest, tree_tokens, parents) -> bool:
        """Verify a draft TREE in one forward (reference: tree drafting with
        packed spec-dec masks).  Chunk rows = pending-commit tokens + the
        last token + tree nodes; tree nodes carry pad slots (their KV never
        lands) and an ancestor mask.  Accepted-path KV is written by riding
        the NEXT round's chunk (req.spec_pending), so no KV rewind/copies
        are ever needed."""
        n = req.num_tokens
        P = getattr(req, "spec_pending", 0)
        k = len(tree_tokens)
        budget = min(req.sampling_params.max_tokens - req.num_output_tokens,
                     self.max_seq_len - req.num_tokens) - 1
        if budget < 1 or n - 1 - P < 0:
            return False
        need = self.kv.blocks_needed(n) - self.kv.num_seq_blocks(
            req.request_id)
        if need > self.kv.num_free_blocks:
            return False
        self.kv.grow_sequence(req.request_id, n)

        # depth of each node (root children = 1)
        depth = [0] * k
        for i, p in enumerate(parents):
            depth[i] = 1 if p < 0 else depth[p] + 1
        C = P + 1  # committed rows (pending + last token)
        toks = list(req.all_token_ids[n - 1 - P:n]) + list(tree_tokens)
        positions = np.array(
            list(range(n - 1 - P, n)) + [n - 1 + d for d in depth], np.int32)
        write_mask = [True] * C + [False] * k

        T = C + k
        inputs = self.engine.prepare_tree_verify_inputs(
            req, toks, positions, write_mask)
        Tp = len(inputs.input_ids)
        mask = np.zeros((Tp, Tp), bool)
        np.fill_diagonal(mask, True)
        for i in range(C):           # committed rows: causal
            mask[i, :i + 1] = True
        for i in range(k):           # tree rows: committed rows + ancestors
            r = C + i
            mask[r, :C] = True
            j = i
            while j >= 0:
                mask[r, C + j] = True
                j = parents[j]
        hidden = None
        if self._needs_hidden:
            logits, hidden = self.engine.run_verify_tree(
                inputs, mask, with_hidden=True,
                capture=self._hidden_capture)
            logits, hidden = np.asarray(logits), np.asarray(hidden)
        else:
            logits = np.asarray(self.engine.run_verify_tree(inputs, mask))
        greedy = np.argmax(logits[:T], axis=-1)

        # walk the tree from the last committed row
        children = {}
        for i, p in enumerate(parents):
            children.setdefault(p, []).append(i)
        accepted: List[int] = []
        accepted_rows = []
        cur_node = -1
        cur_row = C - 1
        while True:
            want = int(greedy[cur_row])
            nxt = next((i for i in children.get(cur_node, ())
                        if tree_tokens[i] == want), None)
            if nxt is None or len(accepted) >= budget:
                break
            accepted.append(want)
            cur_node, cur_row = nxt, C + nxt
            accepted_rows.append(cur_row)
        accepted.append(int(greedy[cur_row]))  # bonus / correction

        if hidden is not None:
            # committed rows carry hiddens for positions n-1-P..n-1; each
            # accepted tree row carries its depth position's hidden
            self.drafter.on_hidden(req, n - 1 - P, hidden[:C])
            for r in accepted_rows:
                self.drafter.on_hidden(req, int(positions[r]),
                                       hidden[r:r + 1])

        self.spec_stats["proposed"] += k
        self.spec_stats["accepted"] += len(accepted) - 1
        self.spec_stats["rounds"] += 1
        self._record_acceptance(len(accepted))
        appended = 0
        for tok in accepted:
            if not req.is_generating:
                break
            req.append_token(tok)
            appended += 1
            self.total_tokens_generated += 1
            reason = req.check_stop(self.eos_token_id)
            if reason is None and req.num_tokens >= self.max_seq_len:
                reason = FinishReason.LENGTH
            if reason is not None:
                req.finish(reason)
        req.spec_pending = max(appended - 1, 0)
        self.drafter.on_accepted(req, accepted[:appended])
        if req.is_finished:
            req._drafter_notified = True
            self.drafter.on_request_finished(req)
            req.emit(finished=True)
        else:
            req.emit(finished=False)
        return True

    def _maybe_profile(self):
        """Capture a device trace for iterations [start, stop) — the analog
        of the reference's cudaProfilerStart/torch.profiler window."""
        if self._profile_window is None:
            return
        import jax
        start, stop = self._profile_window
        if self.iteration == start and not self._profiling:
            import tempfile
            self._profile_dir = tempfile.mkdtemp(prefix="tllm_tpu_trace_")
            jax.profiler.start_trace(self._profile_dir)
            self._profiling = True
            logger.info("profiling started (iter %d) -> %s", start,
                        self._profile_dir)
        elif self.iteration >= stop and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("profiling stopped (iter %d); trace in %s",
                        self.iteration, self._profile_dir)

    def _decode_steps_for(self, reqs: List[LlmRequest]) -> int:
        """How many decode steps can be fused without overshooting any
        request's budget (stops are checked after the fused chunk)."""
        if self.guided.any_active(reqs):
            return 1  # per-token host masks can't ride the fused scan
        if self.batched_logits_processor is not None:
            return 1  # global host processor needs every step's logits
        if self._needs_hidden and any(r.sampling_params.greedy for r in reqs):
            return 1  # one-model drafter taps each step's hidden states
        if getattr(self.engine, "_helix", False) \
                or getattr(self.engine, "_star", False):
            return 1  # helix/star CP: per-rank slot tables built per step
        if any(self._needs_host_controls(r.sampling_params)
               or r.sampling_params.return_generation_logits
               or (r.sampling_params.logprobs or 0) > 1
               for r in reqs):
            return 1  # penalties/stop/logit controls need host state
        k = self.max_decode_steps
        if self.drafter is not None and not self._spec_adaptive_off:
            # speculation replaces multi-token fusion (reference: spec
            # modes own the decode loop): large fused chunks would eat a
            # request's whole budget before the drafter ever re-proposes
            # (history-based drafters like NGram need generated tokens)
            k = min(k, 2)
        for r in reqs:
            sp = r.sampling_params
            # budget overshoot is fine (excess sampled tokens are dropped
            # host-side; their KV rows get overwritten) — clamping k to the
            # remaining budget would compile a fresh k-variant per tail.
            # Stay within the engine's position ceiling though.
            room = self.max_seq_len - r.num_tokens \
                - self._virtual.get(r.request_id, 0) + 1
            k = min(k, max(room, 1))
            if not sp.ignore_eos or sp.stop_token_ids:
                # could stop early on eos: cap overshoot at 4 wasted steps
                k = min(k, 4)
        k = max(k, 1)
        # shrink until the extra KV blocks for k-1 lookahead positions fit
        # (virtual = overlap-dispatched positions the pool already covers)
        while k > 1:
            extra = sum(
                self.kv.blocks_needed(r.num_tokens
                                      + self._virtual.get(r.request_id, 0)
                                      + k - 1)
                - self.kv.num_seq_blocks(r.request_id)
                for r in reqs)
            if extra <= self.kv.num_free_blocks:
                break
            k -= 1
        return k

    def _decode_multi(self, reqs: List[LlmRequest], k: int):
        """One fused k-step decode dispatch + host-side stop handling."""
        # grow blocks for all k positions up front
        for req in reqs:
            self.kv.grow_sequence(req.request_id, req.num_tokens + k - 1)
        inputs = self.engine.prepare_decode_inputs(reqs, extra_tokens=k - 1)
        B = len(inputs.input_ids)
        # attention-DP: rows live at rank-grouped positions (row_map)
        rows = (inputs.row_map if inputs.row_map is not None
                else np.arange(len(reqs)))
        slot_table = np.full((k, B), np.int64(2**30), np.int32)
        local_table = None
        if getattr(self.engine, "_vswa", False):
            local_table = np.full((k, B), np.int64(2**30), np.int32)
        sp_rows = [SamplingParams() for _ in range(B)]
        for i, req in enumerate(reqs):
            start = req.num_tokens - 1
            slot_table[:, rows[i]] = self.kv.slot_mapping(
                req.request_id, start, k)
            if local_table is not None:
                local_table[:, rows[i]] = self.kv.local_slot_mapping(
                    req.request_id, start, k, int(2**30), dedup=False)
            sp_rows[rows[i]] = req.sampling_params
        state = SamplingState.from_params(sp_rows, step=self.iteration,
                                          pad_to=B)
        toks, logps = self.engine.run_decode_multi(inputs, k, state,
                                                   slot_table, local_table)
        self._apply_multi(reqs, rows, k, toks, logps)

    def _apply_multi(self, reqs, rows, k, toks, logps):
        """Host-side bookkeeping for one fused chunk: append sampled tokens,
        stop checks, emission (the reference's _update_requests)."""
        toks = np.asarray(toks)[:, rows]   # [k, B] -> request order
        if any(r.sampling_params.logprobs for r in reqs):
            logps = np.asarray(logps)[:, rows]
        else:
            # skip the second device fetch (~40 ms RTT each on the
            # tunnel) when nobody records logprobs
            logps = np.zeros_like(toks, np.float32)
        for i, req in enumerate(reqs):
            for j in range(k):
                if not req.is_generating:
                    break
                tok = int(toks[j, i])
                req.append_token(tok)
                self.total_tokens_generated += 1
                if req.sampling_params.logprobs:
                    req.logprobs.append({tok: float(logps[j, i])})
                reason = req.check_stop(self.eos_token_id)
                if reason is None and req.num_tokens >= self.max_seq_len:
                    reason = FinishReason.LENGTH
                if reason is not None:
                    reason = self._reconcile_stop_on_finish(req, reason)
                    req.finish(reason)
                    req.emit(finished=True)
            if req.is_generating:
                req.emit(finished=False)

    # -------------------------------------------------------------- overlap ----
    def _overlap_ok(self, reqs) -> bool:
        """Overlap decode preconditions: plain fused-multi-step requests on
        a single controller (beam/spec/guided/helix/star already forced
        k == 1 by _decode_steps_for)."""
        return (self._overlap_enabled
                and self._num_procs == 1
                and not getattr(self.engine, "_helix", False)
                and not getattr(self.engine, "_star", False))

    def _drain_inflight(self, only_ready: bool = False):
        """Apply in-flight chunks oldest-first.  only_ready=True stops at
        the first chunk whose results have not landed yet (while the
        pipeline stays within its depth cap)."""
        while self._inflight:
            ch = self._inflight[0]
            if only_ready:
                ready = (not self._force_lag
                         and getattr(ch["toks"], "is_ready", lambda: True)())
                if not ready and len(self._inflight) <= self._overlap_depth:
                    break
            self._inflight.popleft()
            for r in ch["reqs"]:
                self._virtual[r.request_id] = max(
                    0, self._virtual.get(r.request_id, 0) - ch["k"])
            self._apply_multi(ch["reqs"], ch["rows"], ch["k"],
                              ch["toks"], ch["logps"])
        if not self._inflight:
            self._inflight_comp = None
        self._virtual = {k: v for k, v in self._virtual.items() if v > 0}

    def _overlap_decode(self, reqs, k: int):
        """Dispatch one fused chunk fed from the previous chunk's
        device-resident tokens; apply completed chunks without blocking
        (block only at the pipeline depth cap)."""
        comp = (tuple(r.request_id for r in reqs), k)
        if self._inflight and self._inflight_comp != comp:
            self._drain_inflight()

        virt = [self._virtual.get(r.request_id, 0) for r in reqs]
        try:
            for r, v in zip(reqs, virt):
                self.kv.grow_sequence(r.request_id, r.num_tokens + v + k - 1)
        except RuntimeError:
            # pool exhausted mid-pipeline (e.g. overshoot past requests that
            # finished in an unapplied chunk): sync, free finished, retry
            self._drain_inflight()
            self._cleanup_finished()
            reqs = [r for r in reqs if r.is_generating]
            if not reqs:
                return
            virt = [0] * len(reqs)
            comp = (tuple(r.request_id for r in reqs), k)
            for r in reqs:
                self.kv.grow_sequence(r.request_id, r.num_tokens + k - 1)
        inputs = self.engine.prepare_decode_inputs(
            reqs, extra_tokens=k - 1, virtual_extra=virt)
        if self._inflight:
            prev = self._inflight[-1]
            if prev["toks_dev"].shape[1] == len(inputs.input_ids):
                inputs.input_ids = prev["toks_dev"][prev["k"] - 1]
            else:
                # padded batch bucket changed (shouldn't with a stable
                # composition, but stay safe): sync instead
                self._drain_inflight()
                virt = [0] * len(reqs)
                inputs = self.engine.prepare_decode_inputs(
                    reqs, extra_tokens=k - 1)

        B = len(inputs.input_ids)
        rows = (inputs.row_map if inputs.row_map is not None
                else np.arange(len(reqs)))
        slot_table = np.full((k, B), np.int64(2**30), np.int32)
        local_table = None
        if getattr(self.engine, "_vswa", False):
            local_table = np.full((k, B), np.int64(2**30), np.int32)
        sp_rows = [SamplingParams() for _ in range(B)]
        tables_needed = getattr(self.engine, "multi_step_needs_slot_tables",
                                True)
        for i, req in enumerate(reqs):
            start = req.num_tokens + virt[i] - 1
            if tables_needed:
                slot_table[:, rows[i]] = self.kv.slot_mapping(
                    req.request_id, start, k)
                if local_table is not None:
                    local_table[:, rows[i]] = self.kv.local_slot_mapping(
                        req.request_id, start, k, int(2**30), dedup=False)
            sp_rows[rows[i]] = req.sampling_params
        if not tables_needed:
            # chain mode: one SamplingState per COMPOSITION, not per
            # chunk — the per-chunk seed fold re-uploads a fresh seeds
            # array every dispatch (~100 ms of fresh-content upload on
            # the tunnel); cross-chunk randomness uniqueness rides the
            # chain's GLOBAL step offset.  scan/unroll restart offsets at
            # 0 each chunk, so they keep per-chunk seeds.
            state_key = (comp, B)
            if getattr(self, "_chain_state_key", None) != state_key:
                self._chain_state = SamplingState.from_params(
                    sp_rows, step=self.iteration, pad_to=B)
                self._chain_state_key = state_key
            state = self._chain_state
        else:
            state = SamplingState.from_params(sp_rows, step=self.iteration,
                                              pad_to=B)
        toks, logps = self.engine.run_decode_multi(inputs, k, state,
                                                   slot_table, local_table)
        self._inflight.append({"reqs": list(reqs), "rows": rows, "k": k,
                               "toks": toks, "logps": logps,
                               "toks_dev": toks})
        self._inflight_comp = comp
        for r in reqs:
            self._virtual[r.request_id] = \
                self._virtual.get(r.request_id, 0) + k

        # apply whatever has landed; block only past the depth cap
        self._drain_inflight(only_ready=True)

    def _capture_prompt_rows(self, req, start: int, chunk: int, all_logits):
        """Record per-prompt-position logits/logprobs from a full-rows
        prefill chunk (reference context-logits gather + prompt logprobs).
        Row i predicts the token at absolute position start+i+1."""
        sp = req.sampling_params
        rows = np.asarray(all_logits[:chunk], np.float32)
        if sp.return_context_logits:
            req.context_logits = (rows if req.context_logits is None
                                  else np.concatenate(
                                      [req.context_logits, rows]))
        if sp.prompt_logprobs:
            if req.prompt_logprobs is None:
                # position 0 has no preceding context to predict it from
                req.prompt_logprobs = [None]
            n = int(sp.prompt_logprobs)
            lse = np.log(np.sum(np.exp(
                rows - rows.max(axis=-1, keepdims=True)),
                axis=-1, keepdims=True)) + rows.max(axis=-1, keepdims=True)
            lp = rows - lse
            for i in range(chunk):
                pos = start + i + 1
                if pos >= req.prompt_len:
                    break  # the last row predicts the first generated token
                row = lp[i]
                top = np.argpartition(-row, min(n, row.size - 1))[:n]
                ids = set(top.tolist()) | {int(req.prompt_token_ids[pos])}
                req.prompt_logprobs.append(
                    {int(t): float(row[t]) for t in ids})

    # ---------------------------------------------------------------- sampling ----
    def _sample_and_update(self, reqs: List[LlmRequest], logits):
        """Sample one token per request from logits[:len(reqs)] and apply
        stop criteria (host side, like the reference's _update_requests)."""
        sp = [r.sampling_params for r in reqs]
        if any(r.sampling_params.return_generation_logits for r in reqs):
            # raw model logits, before masks/penalties (reference
            # generation-logits gather)
            raw = np.asarray(logits)
            for i, req in enumerate(reqs):
                if req.sampling_params.return_generation_logits:
                    req.generation_logits.append(
                        np.array(raw[i], np.float32))
        mask = self.guided.build_mask(reqs, logits.shape[0])
        if mask is not None:
            logits = logits + mask
        logits = self._apply_penalties(reqs, logits)
        logits = self._apply_logit_controls(reqs, logits)
        if self.batched_logits_processor is not None:
            # one call over the whole batch (reference
            # batched_logits_processor / BatchedLogitsProcessor)
            out = self.batched_logits_processor(
                [r.request_id for r in reqs],
                [r.all_token_ids for r in reqs],
                np.array(np.asarray(logits[:len(reqs)]), np.float32))
            logits = np.concatenate(
                [np.asarray(out, np.float32),
                 np.asarray(logits[len(reqs):], np.float32)]) \
                if logits.shape[0] > len(reqs) else np.asarray(out,
                                                               np.float32)
        state = SamplingState.from_params(sp, step=self.iteration,
                                          pad_to=logits.shape[0])
        tokens, logp = sample_tokens(logits, state)
        tokens = np.asarray(tokens)
        logp = np.asarray(logp)
        final = None  # lazily materialized for top-N logprobs
        for i, req in enumerate(reqs):
            if not req.is_generating:
                # defense in depth: a request finished by an earlier
                # application this iteration must not grow past its end
                continue
            tok = int(tokens[i])
            req.append_token(tok)
            self.total_tokens_generated += 1
            nlp = req.sampling_params.logprobs
            if nlp and nlp > 1:
                # top-N logprobs of the post-controls distribution
                # (reference TopKLogprobs; only the host path has logits)
                if final is None:
                    final = np.asarray(logits, np.float64)
                row = final[i]
                lsm = row - (np.log(np.exp(row - row.max()).sum())
                             + row.max())
                top = np.argpartition(-lsm, min(nlp, lsm.size - 1))[:nlp]
                d = {int(t): float(lsm[t]) for t in top}
                d[tok] = float(lsm[tok])
                req.logprobs.append(d)
            elif nlp:
                req.logprobs.append({tok: float(logp[i])})
            if not self.guided.advance(req, tok):
                req.finish(FinishReason.ERROR)
                req.emit(finished=True, error="guided decoding: dead end")
                continue
            # KV for this token is written next step; sequence length grows
            reason = req.check_stop(self.eos_token_id)
            if reason is None:
                reason = self._check_stop_strings(req)
            if reason is None and req.num_tokens >= self.max_seq_len:
                reason = FinishReason.LENGTH
            if reason is not None:
                reason = self._reconcile_stop_on_finish(req, reason)
                req.finish(reason)
                if req.request_type != "context_only":
                    # ctx-only finish is emitted by the cleanup pass, after
                    # the KV payload has been captured
                    req.emit(finished=True)
            else:
                req.emit(finished=False)

    def _apply_penalties(self, reqs, logits):
        """Repetition/presence/frequency penalties from host token counts
        (reference: penalty kernels applied pre-sampling)."""
        active = [r for r in reqs if (
            r.sampling_params.repetition_penalty != 1.0
            or r.sampling_params.presence_penalty != 0.0
            or r.sampling_params.frequency_penalty != 0.0)]
        if not active:
            return logits
        from tensorrt_llm_tpu.runtime.sampler import apply_penalties
        B = logits.shape[0]
        V = self.engine.model.cfg.vocab_size
        counts = np.zeros((B, V), np.int32)
        rep = np.ones(B, np.float32)
        pres = np.zeros(B, np.float32)
        freq = np.zeros(B, np.float32)
        for i, r in enumerate(reqs):
            sp = r.sampling_params
            rep[i], pres[i], freq[i] = (sp.repetition_penalty,
                                        sp.presence_penalty,
                                        sp.frequency_penalty)
            if rep[i] != 1.0 or pres[i] != 0.0 or freq[i] != 0.0:
                # incremental per-request token counts: recomputing
                # np.unique over the whole history every step is
                # O(n^2 log n) across a long generation
                toks = r.all_token_ids
                seen = getattr(r, "_pen_seen", 0)
                cnt = getattr(r, "_pen_counts", None)
                if cnt is None or seen > len(toks):
                    cnt = r._pen_counts = np.zeros(V, np.int32)
                    seen = 0
                for t in toks[seen:]:
                    cnt[int(t) % V] += 1
                r._pen_seen = len(toks)
                counts[i] = cnt
        return apply_penalties(logits, counts, rep, pres, freq)

    def _apply_logit_controls(self, reqs, logits):
        """Host-side per-request logit edits (reference: embedding_bias,
        bad-words/no-repeat-ngram ban kernels, min-tokens eos suppression,
        user logits processors) — these force single-step decode."""
        touched = False
        out = logits
        for i, r in enumerate(reqs):
            sp = r.sampling_params
            if not (sp.min_tokens or sp.bad_words or sp.logit_bias
                    or sp.no_repeat_ngram_size or sp.logits_processor):
                continue
            if not touched:
                out = np.array(np.asarray(logits), np.float32)
                touched = True
            row = out[i]
            toks = r.all_token_ids
            if sp.logit_bias:
                for t, b in sp.logit_bias.items():
                    row[int(t)] += float(b)
            if sp.min_tokens and r.num_output_tokens < sp.min_tokens:
                eos = (sp.end_id if sp.end_id is not None
                       else self.eos_token_id)
                for t in ([eos] if eos is not None else []) + list(
                        sp.stop_token_ids or []):
                    row[int(t)] = -1e30
            if sp.bad_words:
                for w in sp.bad_words:
                    if len(w) == 1 or (len(toks) >= len(w) - 1
                                       and toks[-(len(w) - 1):]
                                       == list(w[:-1])):
                        row[int(w[-1])] = -1e30
            n = sp.no_repeat_ngram_size
            if n and len(toks) >= n - 1:
                tail = tuple(toks[-(n - 1):]) if n > 1 else ()
                for j in range(len(toks) - n + 1):
                    if tuple(toks[j:j + n - 1]) == tail:
                        row[int(toks[j + n - 1])] = -1e30
            if sp.logits_processor is not None:
                out[i] = np.asarray(
                    sp.logits_processor(list(toks), row), np.float32)
        return out

    def _reconcile_stop_on_finish(self, req: LlmRequest, reason):
        """A request finishing by EOS/length may carry a stop string that
        completed EARLIER in the same fused chunk — the synchronous scan
        checks every token, so the async path must honor it too (else the
        stop text leaks and finish_reason diverges).  Feed the final chunk,
        flush the scan worker, and take this request's hit; the hit wins
        only if it landed strictly before the finishing token (at the same
        token, check_stop ran first in the synchronous order)."""
        sp = req.sampling_params
        if (self._stop_scan is None or not sp.stop
                or reason not in (FinishReason.EOS, FinishReason.LENGTH)):
            return reason
        n = len(req.output_token_ids)
        if n > self._stop_fed.get(req.request_id, 0):
            self._stop_scan.feed(req.request_id, sp.stop,
                                 req.output_token_ids,
                                 sp.skip_special_tokens)
            self._stop_fed[req.request_id] = n
        self._stop_scan.flush()
        hit = self._stop_scan.take(req.request_id)
        if hit is None:
            return reason
        n_match, stop_str = hit
        if n_match >= n:
            return reason
        req.truncate_output(n_match)
        req.stop_string = stop_str
        return FinishReason.STOP_STRING

    def _check_stop_strings(self, req: LlmRequest):
        sp = req.sampling_params
        if not sp.stop or self.tokenizer is None:
            return None
        if self._stop_scan is not None:
            return None   # the async worker owns the scan (_pump_stop_scan)
        tail = self.tokenizer.decode(req.output_token_ids[-24:])
        for s_ in sp.stop:
            if s_ in tail:
                req.stop_string = s_
                return FinishReason.STOP_STRING
        return None

    # ---------------------------------------------------------------- stats -------
    def get_stats(self) -> List[dict]:
        return [vars(s) for s in self.stats_history[-10:]]
