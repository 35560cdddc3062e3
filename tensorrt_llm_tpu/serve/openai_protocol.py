"""OpenAI API request/response schemas.

Counterpart of the reference's `tensorrt_llm/serve/openai_protocol.py` —
pydantic models for /v1/completions and /v1/chat/completions plus conversions
to SamplingParams.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, Field

from tensorrt_llm_tpu.llmapi.sampling_params import GuidedDecodingParams, SamplingParams


def random_id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:24]}"


class CompletionRequest(BaseModel):
    model: str
    prompt: Union[str, List[str], List[int], List[List[int]]]
    max_tokens: int = 16
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    n: int = 1
    stream: bool = False
    logprobs: Optional[int] = None
    echo: bool = False
    stop: Union[str, List[str], None] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None
    user: Optional[str] = None
    ignore_eos: bool = False
    response_format: Optional[Dict[str, Any]] = None

    def to_sampling_params(self) -> SamplingParams:
        return SamplingParams(
            max_tokens=self.max_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            stop=self.stop,
            seed=self.seed,
            logprobs=self.logprobs,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            ignore_eos=self.ignore_eos,
            guided_decoding=_guided_from_response_format(self.response_format),
        )


class ChatMessage(BaseModel):
    role: str
    content: Union[str, List[Dict[str, Any]], None] = None
    name: Optional[str] = None
    tool_calls: Optional[List[Dict[str, Any]]] = None


class ChatCompletionRequest(BaseModel):
    model: str
    messages: List[ChatMessage]
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    n: int = 1
    stream: bool = False
    stop: Union[str, List[str], None] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    seed: Optional[int] = None
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    user: Optional[str] = None
    ignore_eos: bool = False
    response_format: Optional[Dict[str, Any]] = None
    tools: Optional[List[Dict[str, Any]]] = None

    def to_sampling_params(self) -> SamplingParams:
        max_toks = self.max_completion_tokens or self.max_tokens or 512
        return SamplingParams(
            max_tokens=max_toks,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            stop=self.stop,
            seed=self.seed,
            logprobs=self.top_logprobs if self.logprobs else None,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            ignore_eos=self.ignore_eos,
            guided_decoding=_guided_from_response_format(self.response_format),
        )


def _guided_from_response_format(rf: Optional[Dict[str, Any]]):
    if not rf:
        return None
    t = rf.get("type")
    if t == "json_object":
        return GuidedDecodingParams(json_object=True)
    if t == "json_schema":
        schema = rf.get("json_schema", {}).get("schema")
        return GuidedDecodingParams(json=schema)
    return None


def completion_response(req: CompletionRequest, texts: List[str],
                        finish_reasons: List[Optional[str]],
                        usage: Dict[str, int],
                        logprobs: Optional[list] = None) -> Dict:
    return {
        "id": random_id("cmpl"),
        "object": "text_completion",
        "created": int(time.time()),
        "model": req.model,
        "choices": [
            {"index": i, "text": t, "finish_reason": fr,
             "logprobs": (logprobs[i] if logprobs else None)}
            for i, (t, fr) in enumerate(zip(texts, finish_reasons))
        ],
        "usage": usage,
    }


def chat_response(req: ChatCompletionRequest, text: str,
                  finish_reason: Optional[str],
                  usage: Dict[str, int]) -> Dict:
    return {
        "id": random_id("chatcmpl"),
        "object": "chat.completion",
        "created": int(time.time()),
        "model": req.model,
        "choices": [{
            "index": 0,
            "message": {"role": "assistant", "content": text},
            "finish_reason": finish_reason,
        }],
        "usage": usage,
    }


def chat_chunk(rid: str, model: str, delta: Dict,
               finish_reason: Optional[str] = None) -> Dict:
    return {
        "id": rid,
        "object": "chat.completion.chunk",
        "created": int(time.time()),
        "model": model,
        "choices": [{"index": 0, "delta": delta,
                     "finish_reason": finish_reason}],
    }
