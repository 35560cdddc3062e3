"""Request state machine.

Counterpart of the reference's `GenericLlmRequest`
(`cpp/.../batch_manager/llmRequest.h:86`; states llmRequest.h:47-74) and its
Python subclass (`pyexecutor/llm_request.py`): tracks a request through
queued -> context (possibly chunked) -> generation -> complete, including
paged-KV block ownership and streaming output.
"""

from __future__ import annotations

import enum
import queue
import time
from dataclasses import dataclass, field
from typing import Any, List, Optional

from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams


class RequestState(enum.Enum):
    QUEUED = "queued"
    CONTEXT_INIT = "context_init"            # prefill in progress (chunked)
    GENERATION_IN_PROGRESS = "generation"
    GENERATION_COMPLETE = "complete"
    # disaggregated serving (round-2+): context-only / generation-only
    CONTEXT_ONLY = "context_only"
    GENERATION_ONLY = "generation_only"


class FinishReason(enum.Enum):
    NOT_FINISHED = "not_finished"
    EOS = "stop"          # hit eos / stop token
    STOP_STRING = "stop_string"
    LENGTH = "length"     # max_tokens or model max len
    CANCELLED = "cancelled"
    ERROR = "error"


@dataclass
class RequestOutputPiece:
    """One streamed increment."""
    request_id: int
    new_token_ids: List[int]
    finished: bool
    finish_reason: Optional[FinishReason] = None
    logprobs: Optional[list] = None
    error: Optional[str] = None
    # async stop-scan truncation: already-streamed tokens past this output
    # length were generated after the stop string completed — drop them
    truncate_to: Optional[int] = None


class LlmRequest:
    _id_counter = 0

    def __init__(self, prompt_token_ids: List[int],
                 sampling_params: SamplingParams,
                 request_id: Optional[int] = None,
                 arrival_time: Optional[float] = None,
                 lora_request: Optional[Any] = None,
                 cache_salt: Optional[str] = None,
                 request_type: str = "full",
                 disagg_params: Optional[Any] = None,
                 retention_priority: Optional[int] = None,
                 priority: float = 0.5):
        if request_id is None:
            LlmRequest._id_counter += 1
            request_id = LlmRequest._id_counter
        self.request_id = request_id
        self.prompt_token_ids = list(prompt_token_ids)
        self.sampling_params = sampling_params
        self.lora_request = lora_request
        self.cache_salt = cache_salt
        # KV retention priority for blocks this request stores for reuse
        # (reference KvCacheRetentionConfig, executor.h:559): lower evicts
        # first; None = manager default (35).
        self.retention_priority = retention_priority
        # scheduling priority in [0, 1], default 0.5 (reference executor.h
        # Request::priority): higher admits from the waiting queue first
        self.priority = priority

        self.state = RequestState.QUEUED
        self.output_token_ids: List[int] = []
        self.finish_reason = FinishReason.NOT_FINISHED

        # paged KV
        self.block_ids: List[int] = []
        self.num_cached_tokens = 0      # prefix-reuse hit length
        # chunked prefill progress: tokens already prefilled (incl. reused)
        self.context_position = 0
        self.seq_slot: Optional[int] = None

        # streaming
        self.out_queue: "queue.Queue[RequestOutputPiece]" = queue.Queue()
        self._streamed = 0
        # emit every N tokens (reference stream_interval,
        # py_executor.py:2743 — first token and finish always emit;
        # skipped emissions batch into the next piece)
        self.stream_interval = 1

        # metrics (reference: perf metrics on LlmRequest)
        self.arrival_time = arrival_time or time.time()
        self.first_sched_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.end_time: Optional[float] = None

        self.logprobs: List[dict] = []
        self.prompt_logprobs: Optional[List[Optional[dict]]] = None
        self.context_logits = None           # np [prompt_len, V] opt-in
        self.generation_logits: List = []    # np [V] rows, opt-in
        self.stop_string: Optional[str] = None  # which stop string matched
        self.token_times: List[tuple] = []      # (cum tokens, time) per emit

        # disaggregated serving (reference llmRequest.h:76-81 request types)
        self.request_type = request_type   # full | context_only | generation_only
        self.disagg_params = disagg_params
        self.kv_payload: Optional[Any] = None  # filled for context_only
        # streamed transfer (ContextProgress analog): the executor pushes
        # per-chunk KV frames here while later chunks still compute
        self.kv_stream = None
        self._kv_streamed_blocks = 0
        if disagg_params is not None and getattr(disagg_params, "stream",
                                                 False) \
                and request_type == "context_only":
            import queue as _q
            self.kv_stream = _q.Queue()

    # ---- derived ---------------------------------------------------------------
    @property
    def prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        """Total tokens in sequence (prompt + generated)."""
        return self.prompt_len + len(self.output_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def all_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def remaining_context(self) -> int:
        return self.prompt_len - self.context_position

    @property
    def is_context_init(self) -> bool:
        return self.state == RequestState.CONTEXT_INIT

    @property
    def is_generating(self) -> bool:
        return self.state == RequestState.GENERATION_IN_PROGRESS

    @property
    def is_finished(self) -> bool:
        return self.state == RequestState.GENERATION_COMPLETE

    @property
    def max_total_len(self) -> int:
        return self.prompt_len + self.sampling_params.max_tokens

    # ---- transitions ------------------------------------------------------------
    def start_context(self):
        assert self.state == RequestState.QUEUED
        self.state = RequestState.CONTEXT_INIT
        self.first_sched_time = self.first_sched_time or time.time()

    def finish_context(self):
        assert self.state == RequestState.CONTEXT_INIT
        self.state = RequestState.GENERATION_IN_PROGRESS

    def append_token(self, token_id: int):
        self.output_token_ids.append(token_id)
        if self.first_token_time is None:
            self.first_token_time = time.time()

    def finish(self, reason: FinishReason):
        self.state = RequestState.GENERATION_COMPLETE
        self.finish_reason = reason
        self.end_time = time.time()

    def truncate_output(self, n: int):
        """Drop output tokens past `n` (async stop-scan overshoot: the
        fused chunk sampled past the stop-string match).  Aligns every
        per-token side list so results match the synchronous scan."""
        if n >= len(self.output_token_ids):
            return
        self._truncated_to = n
        self.output_token_ids = self.output_token_ids[:n]
        if self.logprobs:
            self.logprobs = self.logprobs[:n]
        if self.generation_logits:
            self.generation_logits = self.generation_logits[:n]
        self._streamed = min(self._streamed, n)

    # ---- stop criteria (host side, like the reference's CPU accept loop) --------
    def check_stop(self, eos_token_id: Optional[int]) -> Optional[FinishReason]:
        sp = self.sampling_params
        last = self.output_token_ids[-1] if self.output_token_ids else None
        end_id = sp.end_id if sp.end_id is not None else eos_token_id
        if last is not None and not sp.ignore_eos and end_id is not None \
                and last == end_id:
            return FinishReason.EOS
        if sp.stop_token_ids and last in sp.stop_token_ids:
            return FinishReason.EOS
        if self.num_output_tokens >= sp.max_tokens:
            return FinishReason.LENGTH
        return None

    # ---- streaming ---------------------------------------------------------------
    def emit(self, finished: bool, error: Optional[str] = None):
        if not finished and error is None and self.stream_interval > 1:
            n = len(self.output_token_ids)
            if n > 1 and n % self.stream_interval != 0:
                return
        new = self.output_token_ids[self._streamed:]
        self._streamed = len(self.output_token_ids)
        if new:
            # (cumulative tokens, wall time) per emission — feeds the bench
            # CLI's inter-token-latency percentiles (reference
            # bench/dataclasses/statistics.py per-token timestamps)
            self.token_times.append((self._streamed, time.time()))
        self.out_queue.put(RequestOutputPiece(
            request_id=self.request_id,
            new_token_ids=new,
            finished=finished,
            finish_reason=self.finish_reason if finished else None,
            error=error,
            truncate_to=getattr(self, "_truncated_to", None),
        ))
