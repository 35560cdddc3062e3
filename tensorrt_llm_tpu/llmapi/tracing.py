"""Request tracing (OTLP when available, no-op otherwise).

Counterpart of the reference's `llmapi/tracing.py:63-137`: one span per
request carrying the same timing attributes (queue time, time-to-first-token,
end-to-end latency, token counts).  opentelemetry is optional — absent, the
tracer degrades to an in-process ring buffer that tests and the
/perf_metrics endpoint can read.
"""

from __future__ import annotations

import collections
from typing import Optional

# span attribute keys (mirroring reference SpanAttributes, tracing.py:137-170)
ATTR_QUEUE_TIME = "gen_ai.latency.time_in_queue"
ATTR_TTFT = "gen_ai.latency.time_to_first_token"
ATTR_E2E = "gen_ai.latency.e2e"
ATTR_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
ATTR_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
ATTR_FINISH_REASON = "gen_ai.response.finish_reasons"


def _try_otel(endpoint: Optional[str]):
    try:
        from opentelemetry import trace
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
            OTLPSpanExporter,
        )
    except ImportError:
        return None
    provider = TracerProvider()
    provider.add_span_processor(
        BatchSpanProcessor(OTLPSpanExporter(endpoint=endpoint)))
    trace.set_tracer_provider(provider)
    return trace.get_tracer("tensorrt_llm_tpu")


class RequestTracer:
    """Records one trace record (and OTLP span when available) per finished
    request."""

    def __init__(self, otlp_endpoint: Optional[str] = None,
                 keep_last: int = 256):
        self._otel = _try_otel(otlp_endpoint) if otlp_endpoint else None
        self.records = collections.deque(maxlen=keep_last)

    def record_request(self, req) -> dict:
        """Build the span attributes from the request's timestamps
        (LlmRequest perf metrics — arrival/first_sched/first_token/end)."""
        attrs = {
            ATTR_PROMPT_TOKENS: req.prompt_len,
            ATTR_COMPLETION_TOKENS: req.num_output_tokens,
            ATTR_FINISH_REASON: req.finish_reason.value,
        }
        if req.first_sched_time:
            attrs[ATTR_QUEUE_TIME] = req.first_sched_time - req.arrival_time
        if req.first_token_time:
            attrs[ATTR_TTFT] = req.first_token_time - req.arrival_time
        if req.end_time:
            attrs[ATTR_E2E] = req.end_time - req.arrival_time
        self.records.append({"request_id": req.request_id, **attrs})
        if self._otel is not None:
            span = self._otel.start_span("llm_request",
                                         start_time=int(req.arrival_time * 1e9))
            for k, v in attrs.items():
                span.set_attribute(k, v)
            span.end(end_time=int((req.end_time or req.arrival_time) * 1e9))
        return attrs
