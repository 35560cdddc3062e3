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
            n=self.n,
            stop=self.stop,
            seed=self.seed,
            logprobs=self.logprobs,
            # OpenAI echo + logprobs returns prompt-token logprobs too
            prompt_logprobs=self.logprobs if self.echo else None,
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
    # EPD disagg: precomputed multimodal-embedding handle from
    # /v1/mm_embeddings (reference mm_embedding_handle flow)
    multi_modal_embeddings: Optional[Dict[str, Any]] = None
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
    # "auto" | "none" | "required" | {"type": "function",
    #                                 "function": {"name": ...}}
    tool_choice: Union[str, Dict[str, Any]] = "auto"

    def forced_tool(self) -> Optional[Dict[str, Any]]:
        """The tool definition when tool_choice forces one function."""
        if not isinstance(self.tool_choice, dict) or not self.tools:
            return None
        want = self.tool_choice.get("function", {}).get("name")
        for t in self.tools:
            if t.get("function", {}).get("name") == want:
                return t
        return None

    def to_sampling_params(self) -> SamplingParams:
        max_toks = self.max_completion_tokens or self.max_tokens or 512
        guided = _guided_from_response_format(self.response_format)
        forced = self.forced_tool()
        if forced is not None and guided is None:
            # forced function call: constrain the whole completion to the
            # tool's parameter schema (reference: guided decoding applied
            # for tool_choice in serve/openai_server.py)
            schema = forced.get("function", {}).get("parameters")
            guided = (GuidedDecodingParams(json=schema) if schema
                      else GuidedDecodingParams(json_object=True))
        return SamplingParams(
            max_tokens=max_toks,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            n=self.n,
            stop=self.stop,
            seed=self.seed,
            logprobs=(self.top_logprobs or 1) if self.logprobs else None,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            ignore_eos=self.ignore_eos,
            guided_decoding=guided,
        )


class ResponsesRequest(BaseModel):
    """OpenAI Responses API (reference serve/openai_server.py:273-279)."""
    model: str
    input: Union[str, List[Dict[str, Any]]]
    instructions: Optional[str] = None
    max_output_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    stream: bool = False
    tools: Optional[List[Dict[str, Any]]] = None
    ignore_eos: bool = False     # extension: benchmarking aid

    def to_messages(self) -> List["ChatMessage"]:
        msgs: List[ChatMessage] = []
        if self.instructions:
            msgs.append(ChatMessage(role="system",
                                    content=self.instructions))
        if isinstance(self.input, str):
            msgs.append(ChatMessage(role="user", content=self.input))
        else:
            for item in self.input:
                if item.get("type", "message") == "message":
                    msgs.append(ChatMessage(role=item.get("role", "user"),
                                            content=item.get("content")))
        return msgs

    def chat_tools(self) -> Optional[List[Dict[str, Any]]]:
        """Responses-style flat tool defs -> chat-completions nesting."""
        if not self.tools:
            return None
        out = []
        for t in self.tools:
            if "function" in t:
                out.append(t)
            else:
                out.append({"type": "function", "function": {
                    "name": t.get("name"),
                    "description": t.get("description"),
                    "parameters": t.get("parameters"),
                }})
        return out

    def to_sampling_params(self) -> SamplingParams:
        return SamplingParams(
            max_tokens=self.max_output_tokens or 512,
            temperature=self.temperature,
            top_p=self.top_p,
            ignore_eos=self.ignore_eos,
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
    if t == "structural_tag":
        # xgrammar structural tags (reference chat "structural_tag"
        # response_format): the spec rides alongside "type"
        return GuidedDecodingParams(structural_tag={
            k: v for k, v in rf.items() if k != "type"})
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


def chat_choice(index: int, text: Optional[str],
                finish_reason: Optional[str],
                tool_calls: Optional[List[Dict]] = None,
                reasoning: Optional[str] = None,
                logprobs: Optional[Dict] = None) -> Dict:
    message: Dict[str, Any] = {"role": "assistant", "content": text}
    if tool_calls:
        message["tool_calls"] = tool_calls
        finish_reason = "tool_calls"
    if reasoning:
        message["reasoning_content"] = reasoning
    choice = {"index": index, "message": message,
              "finish_reason": finish_reason}
    if logprobs is not None:
        choice["logprobs"] = logprobs
    return choice


def chat_response(req: ChatCompletionRequest, text: str,
                  finish_reason: Optional[str],
                  usage: Dict[str, int],
                  tool_calls: Optional[List[Dict]] = None,
                  reasoning: Optional[str] = None,
                  extra_choices: Optional[List[Dict]] = None,
                  logprobs: Optional[Dict] = None) -> Dict:
    choices = [chat_choice(0, text, finish_reason, tool_calls, reasoning,
                           logprobs)]
    choices.extend(extra_choices or [])
    return {
        "id": random_id("chatcmpl"),
        "object": "chat.completion",
        "created": int(time.time()),
        "model": req.model,
        "choices": choices,
        "usage": usage,
    }


def responses_response(model: str, text: str, usage: Dict[str, int],
                       tool_calls: Optional[List[Dict]] = None,
                       reasoning: Optional[str] = None) -> Dict:
    """OpenAI Responses API object (reference /v1/responses,
    serve/openai_server.py:273-279)."""
    rid = random_id("resp")
    output: List[Dict[str, Any]] = []
    if reasoning:
        output.append({"type": "reasoning", "id": random_id("rs"),
                       "summary": [{"type": "summary_text",
                                    "text": reasoning}]})
    if text:
        output.append({
            "type": "message", "id": random_id("msg"), "role": "assistant",
            "status": "completed",
            "content": [{"type": "output_text", "text": text,
                         "annotations": []}],
        })
    for tc in tool_calls or []:
        output.append({
            "type": "function_call", "id": random_id("fc"),
            "call_id": tc["id"], "name": tc["function"]["name"],
            "arguments": tc["function"]["arguments"],
            "status": "completed",
        })
    return {
        "id": rid, "object": "response", "created_at": int(time.time()),
        "status": "completed", "model": model, "output": output,
        "usage": {"input_tokens": usage.get("prompt_tokens", 0),
                  "output_tokens": usage.get("completion_tokens", 0),
                  "total_tokens": usage.get("total_tokens", 0)},
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
