"""OpenAI-compatible HTTP server.

Counterpart of the reference's `OpenAIServer` (`serve/openai_server.py:82`,
routes :255-290): /v1/completions, /v1/chat/completions (+SSE streaming),
/v1/models, /health, /metrics, /kv_cache_events, /perf_metrics.

Built on aiohttp (this image carries no fastapi); generation runs in the
executor's background thread, so request handlers only await queue reads.
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Optional

from aiohttp import web

from tensorrt_llm_tpu.llmapi.llm import LLM
from tensorrt_llm_tpu.serve.openai_protocol import (
    ChatCompletionRequest,
    CompletionRequest,
    ResponsesRequest,
    chat_choice,
    chat_chunk,
    chat_response,
    completion_response,
    random_id,
    responses_response,
)
from tensorrt_llm_tpu.serve.tool_parser import get_tool_parser
from tensorrt_llm_tpu.utils import logger


class OpenAIServer:
    def __init__(self, llm: LLM, model_name: str = "tpu-llm",
                 tool_parser: Optional[str] = None,
                 reasoning_parser: Optional[str] = None,
                 register_to: Optional[str] = None,
                 advertise_url: Optional[str] = None,
                 disagg_role: str = "generation"):
        """tool_parser: model family for function-call markup parsing
        ("qwen3" | "deepseek_v3" | "harmony" | ... — reference
        serve/tool_parser/ + harmony_adapter.py).
        register_to/advertise_url/disagg_role: announce this worker to a
        disaggregated front end on startup and withdraw on shutdown
        (reference metadata-server registration, disagg_auto_scaling.py)."""
        import uuid
        self.llm = llm
        # per-process event-stream epoch: a restart resets KV event ids,
        # so routers must be able to detect it and drop their stale view
        self._epoch = uuid.uuid4().hex
        self.model_name = model_name
        self.tool_parser_name = tool_parser
        # "deepseek-r1" | "qwen3" | "nano-v3": split <think> blocks into
        # reasoning_content (reference llmapi/reasoning_parser.py)
        self.reasoning_parser_name = reasoning_parser
        self.register_to = register_to
        self.advertise_url = advertise_url
        self.disagg_role = disagg_role
        self.app = web.Application()
        self.started_at = time.time()
        if register_to:
            self.app.on_startup.append(self._register_worker)
            self.app.on_cleanup.append(self._unregister_worker)
        self.app.add_routes([
            web.get("/health", self.health),
            web.get("/v1/models", self.models),
            web.post("/v1/completions", self.completions),
            web.post("/v1/chat/completions", self.chat_completions),
            web.post("/v1/responses", self.responses),
            web.get("/metrics", self.metrics),
            web.get("/perf_metrics", self.perf_metrics),
            web.get("/kv_cache_events", self.kv_cache_events),
            web.post("/prefix_match", self.prefix_match),
            web.post("/v1/embeddings", self.embeddings),
            web.get("/traces", self.traces),
            web.post("/update_weights", self.update_weights),
            web.post("/release_memory", self.release_memory),
            web.post("/resume_memory", self.resume_memory),
            web.get("/health_generate", self.health_generate),
            web.get("/version", self.version),
            web.get("/steady_clock_offset", self.steady_clock_offset),
            web.post("/disagg/context", self.disagg_context),
            web.post("/disagg/generate", self.disagg_generate),
            web.post("/disagg/context_stream", self.disagg_context_stream),
            web.post("/disagg/generate_streamed",
                     self.disagg_generate_streamed),
            web.post("/v1/mm_embeddings", self.mm_embeddings),
        ])

    # -------------------------------------------------------------- EPD encode --
    @staticmethod
    def _encode_mm_handle(payload) -> dict:
        """Portable multimodal-embedding handle: compressed npz in base64
        (reference mm_embedding_handle, openai_server.py:620-623)."""
        import base64
        import io

        import numpy as np
        buf = io.BytesIO()
        arrays = {"embeds": np.asarray(payload["embeds"], np.float32),
                  "token_ids": np.asarray(payload["token_ids"], np.int32)}
        for k, v in (payload.get("extra") or {}).items():
            if v is None:
                continue
            try:
                a = np.asarray(v)
            except (TypeError, ValueError):
                continue  # non-array extras (rare) don't cross the wire
            if a.dtype == object:
                # np.asarray HAPPILY builds object arrays from dicts etc.;
                # savez would pickle them and the decode side
                # (allow_pickle=False) could never load the handle
                continue
            arrays[f"extra_{k}"] = a
        np.savez_compressed(buf, **arrays)
        return {"format": "npz_b64",
                "mm_hash": payload.get("mm_hash"),
                "data": base64.b64encode(buf.getvalue()).decode()}

    @staticmethod
    def _decode_mm_handle(handle: dict) -> dict:
        import base64
        import io

        import numpy as np
        if handle.get("format") != "npz_b64":
            raise ValueError(f"unknown mm handle format: {handle.get('format')!r}")
        z = np.load(io.BytesIO(base64.b64decode(handle["data"])),
                    allow_pickle=False)
        extra = {k[len("extra_"):]: z[k] for k in z.files
                 if k.startswith("extra_")}
        return {"token_ids": z["token_ids"].tolist(),
                "embeds": z["embeds"],
                "extra": extra or None,
                "mm_hash": handle.get("mm_hash")}

    async def mm_embeddings(self, request: web.Request):
        """EPD disagg encode stage (reference mm_encoder_only serving,
        openai_server.py:620): run ONLY the multimodal encoder on the
        request's images and return a portable embedding handle the
        prefill/decode server consumes via
        ``prompt["multi_modal_embeddings"]`` (handle form:
        ``{"format": "npz_b64", "data": ...}``)."""
        import asyncio as _aio
        try:
            body = await request.json()
            prompt = body.get("prompt")
            token_ids = body.get("prompt_token_ids")
            images = [self._decode_image_part({"image_url": {"url": u}})
                      if isinstance(u, str) else u
                      for u in body.get("images") or []]
            messages = body.get("messages")
            if messages:
                from tensorrt_llm_tpu.serve.openai_protocol import (
                    ChatMessage)
                msgs = [ChatMessage(**m) for m in messages]
                images, tmpl = self._extract_multimodal(msgs)
                prompt = self._apply_chat_template(tmpl)
            p = {"multi_modal_data": {"image": images}}
            if token_ids is not None:
                p["prompt_token_ids"] = token_ids
            else:
                p["prompt"] = prompt
            payload = await _aio.to_thread(self.llm.encode_multimodal, p)
        except (ValueError, KeyError, TypeError) as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({
            "object": "mm_embeddings",
            "model": self.model_name,
            "mm_embedding_handle": self._encode_mm_handle(payload),
            "prompt_token_ids": payload["token_ids"],
        })

    # ------------------------------------------------------------------ misc ----
    async def _register_worker(self, app):
        from aiohttp import ClientSession
        try:
            async with ClientSession() as s:
                await s.post(f"{self.register_to}/register", json={
                    "url": self.advertise_url, "role": self.disagg_role})
        except Exception as e:  # noqa: BLE001 — front end may come up later
            logger.warning("worker registration with %s failed: %s",
                           self.register_to, e)

    async def _unregister_worker(self, app):
        from aiohttp import ClientSession
        try:
            async with ClientSession() as s:
                await s.post(f"{self.register_to}/unregister", json={
                    "url": self.advertise_url, "role": self.disagg_role})
        except Exception:  # noqa: BLE001
            pass

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def models(self, request):
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "created": int(self.started_at),
                      "owned_by": "tensorrt_llm_tpu"}],
        })

    async def metrics(self, request):
        """Prometheus-style metrics (reference: /metrics +
        metrics/collector.py)."""
        stats = self.llm.executor.stats_history[-1] if \
            self.llm.executor.stats_history else None
        kv = self.llm.get_kv_cache_stats()
        lines = [
            f"tllm_tpu_total_tokens_generated {self.llm.executor.total_tokens_generated}",
            f"tllm_tpu_iterations {self.llm.executor.iteration}",
            f"tllm_tpu_kv_free_blocks {kv['free_blocks']}",
            f"tllm_tpu_kv_total_blocks {kv['num_blocks']}",
            f"tllm_tpu_kv_reused_blocks {kv['reused_blocks']}",
            f"tllm_tpu_kv_partial_reused_blocks "
            f"{kv.get('partial_reused_blocks', 0)}",
            f"tllm_tpu_kv_offloaded_blocks {kv.get('offloaded_blocks', 0)}",
            f"tllm_tpu_kv_onboarded_blocks {kv.get('onboarded_blocks', 0)}",
            f"tllm_tpu_active_sequences {kv['active_sequences']}",
        ]
        sp = self.llm.executor.spec_stats
        if sp.get("rounds"):
            lines += [
                f"tllm_tpu_spec_proposed_tokens {sp['proposed']}",
                f"tllm_tpu_spec_accepted_tokens {sp['accepted']}",
                f"tllm_tpu_spec_rounds {sp['rounds']}",
            ]
        if stats:
            lines.append(f"tllm_tpu_last_step_ms {stats.step_time_ms:.3f}")
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def perf_metrics(self, request):
        return web.json_response(self.llm.get_stats())

    async def kv_cache_events(self, request):
        """KV stats + stored/removed-block event stream (cursor:
        ?since_id=N).  ?full=1 additionally returns every currently
        matchable block hash — the resync snapshot for event-fed router
        views (reference kvCacheEventManager + serve/router.py:76-139)."""
        out = dict(self.llm.get_kv_cache_stats())
        since = int(request.query.get("since_id", 0))
        kv = getattr(self.llm, "kv_manager", None)
        # explicit cursors + process epoch: routers page with
        # next_since_id, resync on oldest_retained_id gaps or epoch change
        # (worker restart resets event ids) — ADVICE r4.  Cursor is
        # snapshotted BEFORE collecting events: an event appended between
        # the two calls then shows up as a harmless duplicate next poll
        # instead of being skipped forever.
        out["epoch"] = self._epoch
        if hasattr(kv, "event_cursor"):
            out["next_since_id"], out["oldest_retained_id"] = \
                kv.event_cursor()
        out["events"] = self.llm.get_kv_cache_events(since)
        out["block_size"] = getattr(kv, "block_size", 0)
        if request.query.get("full") and hasattr(kv, "reuse_block_hashes"):
            out["block_hashes"] = kv.reuse_block_hashes()
        return web.json_response(out)

    async def embeddings(self, request):
        """OpenAI embeddings API over encoder-class models (reference
        serves BERT embedding/reranker models the same way)."""
        if getattr(self.llm, "encoder", None) is None:
            return web.json_response(
                {"error": "model is not an encoder"}, status=400)
        body = await request.json()
        inputs = body.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        import asyncio
        vecs = await asyncio.to_thread(
            self.llm.embed, inputs, body.get("pooling", "cls"))
        return web.json_response({
            "object": "list",
            "model": body.get("model", self.model_name),
            "data": [{"object": "embedding", "index": i,
                      "embedding": [float(x) for x in v]}
                     for i, v in enumerate(vecs)],
        })

    async def prefix_match(self, request):
        """Exact cached-prefix probe for the KV-aware router: body
        {"prompt_token_ids": [...]} -> {"matched_tokens": N}."""
        body = await request.json()
        ids = body.get("prompt_token_ids") or []
        return web.json_response(
            {"matched_tokens": self.llm.match_kv_prefix(ids)})

    async def traces(self, request):
        """Per-request trace records (queue time, TTFT, e2e — reference
        OTLP span attributes, llmapi/tracing.py)."""
        return web.json_response(list(self.llm.executor.tracer.records))

    async def disagg_context(self, request: web.Request):
        """Disaggregated prefill phase (see serve/disagg_server.py)."""
        from tensorrt_llm_tpu.serve.disagg_server import disagg_context
        return await disagg_context(self, request)

    async def disagg_generate(self, request: web.Request):
        """Disaggregated decode phase (see serve/disagg_server.py)."""
        from tensorrt_llm_tpu.serve.disagg_server import disagg_generate
        return await disagg_generate(self, request)

    async def disagg_context_stream(self, request: web.Request):
        """Streamed prefill: chunked response of framed KV blocks emitted
        while prefill still computes (see serve/disagg_server.py)."""
        from tensorrt_llm_tpu.serve.disagg_server import disagg_context_stream
        return await disagg_context_stream(self, request)

    async def disagg_generate_streamed(self, request: web.Request):
        """Decode phase pulling streamed KV directly from the prefill
        worker (see serve/disagg_server.py)."""
        from tensorrt_llm_tpu.serve.disagg_server import (
            disagg_generate_streamed)
        return await disagg_generate_streamed(self, request)

    async def update_weights(self, request: web.Request):
        """RLHF weight hot-swap (reference serve/openai_server.py:290):
        body {"checkpoint_dir": "/path/to/hf/checkpoint"}."""
        try:
            body = await request.json()
            self.llm.update_weights(body["checkpoint_dir"])
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({"status": "ok"})

    async def release_memory(self, request: web.Request):
        """Page weights out of device HBM between RLHF rollouts (reference
        serve/openai_server.py /release_memory)."""
        try:
            self.llm.release_memory()
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": str(e)}, status=409)
        return web.json_response({"status": "ok"})

    async def resume_memory(self, request: web.Request):
        try:
            self.llm.resume_memory()
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({"status": "ok"})

    async def health_generate(self, request: web.Request):
        """Liveness probe that actually generates a token (reference
        /health_generate)."""
        import asyncio
        from tensorrt_llm_tpu.llmapi import SamplingParams
        try:
            fut = self.llm.generate_async(
                [1], SamplingParams(max_tokens=1, ignore_eos=True))
            await asyncio.get_event_loop().run_in_executor(
                None, fut.result, 30.0)
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": str(e)}, status=500)
        return web.json_response({"status": "ok"})

    async def version(self, request: web.Request):
        from tensorrt_llm_tpu import __version__
        return web.json_response({"version": __version__})

    async def steady_clock_offset(self, request: web.Request):
        """Clock-offset probe for disagg latency accounting (reference
        /steady_clock_offset): returns this server's monotonic + wall
        clocks so the router can correlate timestamps across servers."""
        return web.json_response({"monotonic": time.monotonic(),
                                  "wall": time.time()})

    # ------------------------------------------------------------------ completions
    async def completions(self, request: web.Request):
        try:
            body = CompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": str(e)}, status=400)
        prompts = body.prompt if isinstance(body.prompt, list) and \
            body.prompt and isinstance(body.prompt[0], (str, list)) else [body.prompt]
        if body.stream and body.n > 1:
            return web.json_response(
                {"error": "streaming with n > 1 is not supported"},
                status=400)
        if body.stream and len(prompts) > 1:
            # only one SSE stream can be returned: silently running the
            # other prompts to completion would waste device time
            return web.json_response(
                {"error": "streaming supports a single prompt per request"},
                status=400)
        sp = body.to_sampling_params()
        try:
            futures = [self.llm.generate_async(p, sp) for p in prompts]
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)

        if body.stream:
            return await self._stream_completion(request, body, futures[0])

        outs = await asyncio.gather(*[
            asyncio.to_thread(f.result) for f in futures])
        # n > 1 fans out to multiple outputs per prompt; choices flatten
        # prompt-major (OpenAI semantics)
        if body.echo:
            # OpenAI echo: the prompt text is prepended to each choice
            def full(out, o):
                p = out.prompt
                if p is None and self.llm.tokenizer is not None:
                    p = self.llm.tokenizer.decode(out.prompt_token_ids)
                return (p or "") + (o.text or "")
            texts = [full(out, o) for out in outs for o in out.outputs]
        else:
            texts = [o.text for out in outs for o in out.outputs]
        reasons = [o.finish_reason for out in outs for o in out.outputs]
        lp_objs = None
        if body.logprobs is not None:
            lp_objs = [self._completion_logprobs(out, o, body.echo)
                       for out in outs for o in out.outputs]
        p_toks = sum(len(o.prompt_token_ids) for o in outs)
        c_toks = sum(len(o.token_ids) for out in outs for o in out.outputs)
        return web.json_response(completion_response(
            body, texts, reasons,
            {"prompt_tokens": p_toks, "completion_tokens": c_toks,
             "total_tokens": p_toks + c_toks}, logprobs=lp_objs))

    def _tok_str(self, tid: int) -> str:
        tk = self.llm.tokenizer
        return tk.decode([tid]) if tk is not None else str(tid)

    def _completion_logprobs(self, out, o, echo: bool):
        """OpenAI text-completion logprobs object; with echo the prompt
        tokens lead (first entry has no logprob), mirroring the reference
        postprocess path."""
        tokens, tlps, tops = [], [], []

        def push(tid, d):
            tokens.append(self._tok_str(tid))
            tlps.append(None if d is None else d.get(tid))
            tops.append(None if d is None else
                        {self._tok_str(t): lp for t, lp in d.items()})
        if echo:
            pl = (out.prompt_logprobs
                  or [None] * len(out.prompt_token_ids))
            for tid, d in zip(out.prompt_token_ids, pl):
                push(tid, d)
        gl = o.logprobs or [None] * len(o.token_ids)
        for tid, d in zip(o.token_ids, gl):
            push(tid, d)
        return {"tokens": tokens, "token_logprobs": tlps,
                "top_logprobs": tops, "text_offset": []}

    def _chat_logprobs(self, o):
        """OpenAI chat logprobs object: per-token content entries."""
        content = []
        gl = o.logprobs or [None] * len(o.token_ids)
        for tid, d in zip(o.token_ids, gl):
            d = d or {}
            content.append({
                "token": self._tok_str(tid),
                "logprob": d.get(tid),
                "top_logprobs": [
                    {"token": self._tok_str(t), "logprob": lp}
                    for t, lp in sorted(d.items(), key=lambda kv: -kv[1])],
            })
        return {"content": content}


    @staticmethod
    def _stop_holdback(body) -> int:
        """Streaming with stop STRINGS: the final piece may retract a
        partial marker already decoded (the cumulative text SHRINKS when
        the stop finally matches), and SSE cannot un-send characters — so
        hold back longest-stop-1 chars until the stream finishes."""
        stop = getattr(body, "stop", None)
        if not stop:
            return 0
        stops = [stop] if isinstance(stop, str) else list(stop)
        return max((len(s) for s in stops), default=1) - 1

    async def _stream_completion(self, request, body, future):
        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        rid = random_id("cmpl")
        prev_len = 0
        hold = self._stop_holdback(body)

        it = iter(future)
        try:
            while True:
                out = await asyncio.to_thread(lambda: next(it, None))
                if out is None:
                    break
                text = out.outputs[0].text
                upto = (len(text) if out.finished
                        else max(prev_len, len(text) - hold))
                delta = text[prev_len:upto]
                prev_len = upto
                chunk = {
                    "id": rid, "object": "text_completion",
                    "created": int(time.time()), "model": body.model,
                    "choices": [{"index": 0, "text": delta,
                                 "finish_reason": out.outputs[0].finish_reason
                                 if out.finished else None}],
                }
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
                if out.finished:
                    break
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
        except (ConnectionResetError, asyncio.CancelledError):
            # client dropped mid-stream: stop generating for it instead of
            # decoding to max_tokens (reference abort-on-disconnect)
            future.cancel()
            raise
        return resp

    # ------------------------------------------------------------------ chat ------
    @staticmethod
    def _decode_image_part(part) -> "object":
        """OpenAI image_url content part -> HWC uint8 array.  Zero-egress
        deployment: data: URLs (base64) only (reference chat_utils.py
        multimodal content parsing)."""
        import base64
        import io

        url = part.get("image_url")
        if isinstance(url, dict):
            url = url.get("url")
        if not isinstance(url, str) or not url.startswith("data:"):
            raise ValueError(
                "image_url must be a data: URL (base64) — remote fetch is "
                "disabled on this server")
        b64 = url.split(",", 1)[1]
        from PIL import Image
        import numpy as np
        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        return np.asarray(img, dtype="uint8")

    def _extract_multimodal(self, messages):
        """Pull image_url parts out of structured message content.
        Returns (images, template_messages): images in request order, and
        messages with image parts replaced by {"type": "image"} markers
        (the form HF VLM chat templates expand into placeholder tokens)."""
        images = []
        msgs = []
        for m in messages:
            d = {"role": m.role, "content": m.content}
            if m.tool_calls:
                d["tool_calls"] = m.tool_calls
            if isinstance(m.content, list):
                parts = []
                for part in m.content:
                    if isinstance(part, dict) \
                            and part.get("type") == "image_url":
                        images.append(self._decode_image_part(part))
                        parts.append({"type": "image"})
                    else:
                        parts.append(part)
                d["content"] = parts
            msgs.append(d)
        return images, msgs

    def _apply_chat_template(self, messages, tools=None):
        tok = self.llm.tokenizer
        if messages and isinstance(messages[0], dict):
            msgs = messages
        else:
            msgs = []
            for m in messages:
                d = {"role": m.role, "content": m.content}
                if m.tool_calls:
                    d["tool_calls"] = m.tool_calls
                msgs.append(d)
        if tok is not None and getattr(tok, "chat_template", None):
            kwargs = dict(tokenize=False, add_generation_prompt=True)
            if tools:
                # HF chat templates accept tool definitions directly
                try:
                    return tok.apply_chat_template(msgs, tools=tools,
                                                   **kwargs)
                except TypeError:
                    pass
            return tok.apply_chat_template(msgs, **kwargs)
        # fallback template
        text = ""
        if tools:
            text += ("<|system|>\nYou may call these tools; reply with "
                     '<tool_call>\\n{"name": ..., "arguments": {...}}\\n'
                     "</tool_call> to invoke one:\n"
                     + json.dumps(tools) + "\n")
        for m in msgs:
            c = m["content"]
            if isinstance(c, list):
                c = "".join("<image>" if p.get("type") == "image"
                            else str(p.get("text", ""))
                            for p in c if isinstance(p, dict))
            text += f"<|{m['role']}|>\n{c}\n"
        return text + "<|assistant|>\n"

    def _make_tool_parser(self, body):
        """Parser instance for this request (None when tools are absent,
        parsing is disabled, or tool_choice forces a schema-guided call)."""
        if not body.tools or body.tool_choice == "none" \
                or body.forced_tool() is not None:
            return None
        return get_tool_parser(self.tool_parser_name)

    async def chat_completions(self, request: web.Request):
        try:
            body = ChatCompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": str(e)}, status=400)
        try:
            images, tmpl_msgs = self._extract_multimodal(body.messages)
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        prompt = self._apply_chat_template(tmpl_msgs, body.tools)
        if body.multi_modal_embeddings:
            # EPD: embeddings precomputed by an encode server
            try:
                prompt = {"prompt": prompt, "multi_modal_embeddings":
                          self._decode_mm_handle(body.multi_modal_embeddings)}
            except (ValueError, KeyError) as e:
                return web.json_response({"error": str(e)}, status=400)
        elif images:
            prompt = {"prompt": prompt,
                      "multi_modal_data": {"image": images}}
        sp = body.to_sampling_params()
        try:
            future = self.llm.generate_async(prompt, sp, streaming=body.stream)
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        parser = self._make_tool_parser(body)

        if body.stream:
            return await self._stream_chat(request, body, future, parser)

        out = await asyncio.to_thread(future.result)
        p = len(out.prompt_token_ids)
        c = sum(len(o.token_ids) for o in out.outputs)
        usage = {"prompt_tokens": p, "completion_tokens": c,
                 "total_tokens": p + c}

        def parse_one(o):
            text, calls, reasoning = o.text, [], None
            forced = body.forced_tool()
            if forced is not None:
                # schema-guided forced call: the completion is arguments
                from tensorrt_llm_tpu.serve.tool_parser import ToolCall
                calls = [ToolCall(name=forced["function"]["name"],
                                  arguments=text)]
                text = None
            elif parser is not None:
                ev = parser.parse_full(text)
                text, calls = ev.text, ev.calls
                reasoning = ev.reasoning or None
            if reasoning is None and self.reasoning_parser_name:
                from tensorrt_llm_tpu.serve.reasoning_parser import (
                    get_reasoning_parser)
                d = get_reasoning_parser(
                    self.reasoning_parser_name).parse_full(text or "")
                text, reasoning = d.content, d.reasoning or None
            return (text, o.finish_reason,
                    [c.to_openai(i) for i, c in enumerate(calls)] or None,
                    reasoning)

        first = parse_one(out.outputs[0])
        want_lp = bool(body.logprobs)
        extra = [chat_choice(j, *parse_one(o),
                             logprobs=(self._chat_logprobs(o) if want_lp
                                       else None))
                 for j, o in enumerate(out.outputs[1:], start=1)]
        return web.json_response(chat_response(
            body, first[0], first[1], usage, tool_calls=first[2],
            reasoning=first[3], extra_choices=extra,
            logprobs=(self._chat_logprobs(out.outputs[0]) if want_lp
                      else None)))

    async def _stream_chat(self, request, body, future, parser):
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        rid = random_id("chatcmpl")

        async def emit(delta, fr=None):
            await resp.write(
                f"data: {json.dumps(chat_chunk(rid, body.model, delta, fr))}\n\n".encode())

        await emit({"role": "assistant"})
        rparser = None
        if self.reasoning_parser_name:
            from tensorrt_llm_tpu.serve.reasoning_parser import (
                get_reasoning_parser)
            rparser = get_reasoning_parser(self.reasoning_parser_name)

        async def emit_text(seg, fr=None):
            """Route a content delta through the reasoning parser."""
            if rparser is None:
                if seg or fr:
                    await emit({"content": seg} if seg else {}, fr)
                return
            d = rparser.feed(seg)
            if fr:
                tail = rparser.flush()
                d.content += tail.content
                d.reasoning += tail.reasoning
            if d.reasoning:
                await emit({"reasoning_content": d.reasoning})
            if d.content or fr:
                await emit({"content": d.content} if d.content else {}, fr)

        it = iter(future)
        try:
            await self._pump_chat(it, emit, emit_text, parser,
                                  self._stop_holdback(body))
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
        except (ConnectionResetError, asyncio.CancelledError):
            # client dropped mid-stream: stop generating for it instead of
            # decoding to max_tokens (reference abort-on-disconnect)
            future.cancel()
            raise
        return resp

    async def _pump_chat(self, it, emit, emit_text, parser, hold=0):
        prev_len = 0
        n_calls = 0
        finish = None
        while True:
            out = await asyncio.to_thread(lambda: next(it, None))
            if out is None:
                break
            text = out.outputs[0].text
            upto = (len(text) if out.finished
                    else max(prev_len, len(text) - hold))
            delta = text[prev_len:upto]
            prev_len = upto
            fr = out.outputs[0].finish_reason if out.finished else None
            if parser is None:
                await emit_text(delta, fr)
            else:
                events = [parser.feed(delta)]
                if out.finished:
                    events.append(parser.flush())
                for ev in events:
                    if ev.text:
                        await emit_text(ev.text)
                    if ev.reasoning:
                        await emit({"reasoning_content": ev.reasoning})
                    for call in ev.calls:
                        await emit({"tool_calls": [call.to_openai(n_calls)]})
                        n_calls += 1
                if fr:
                    finish = "tool_calls" if n_calls else fr
                    # flush the reasoning parser's held-back buffer (it
                    # only releases partial-tag tails at end of stream),
                    # then send the terminal chunk
                    await emit_text("", finish)
            if out.finished:
                break

    # ------------------------------------------------------------- responses ----
    async def responses(self, request: web.Request):
        """OpenAI Responses API (reference serve/openai_server.py:273-279)."""
        try:
            body = ResponsesRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return web.json_response({"error": str(e)}, status=400)
        tools = body.chat_tools()
        prompt = self._apply_chat_template(body.to_messages(), tools)
        sp = body.to_sampling_params()
        try:
            future = self.llm.generate_async(prompt, sp, streaming=body.stream)
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        parser = get_tool_parser(self.tool_parser_name) if tools else None

        if not body.stream:
            out = await asyncio.to_thread(future.result)
            p, c = len(out.prompt_token_ids), len(out.outputs[0].token_ids)
            text = out.outputs[0].text
            calls, reasoning = [], None
            if parser is not None:
                ev = parser.parse_full(text)
                text, calls, reasoning = ev.text, ev.calls, \
                    (ev.reasoning or None)
            return web.json_response(responses_response(
                body.model, text,
                {"prompt_tokens": p, "completion_tokens": c,
                 "total_tokens": p + c},
                tool_calls=[cl.to_openai(i) for i, cl in enumerate(calls)],
                reasoning=reasoning))

        # streaming: response.created / output_text.delta / completed events
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        rid = random_id("resp")

        async def ev(etype, data):
            await resp.write(
                f"event: {etype}\ndata: {json.dumps(data)}\n\n".encode())

        await ev("response.created",
                 {"type": "response.created",
                  "response": {"id": rid, "object": "response",
                               "status": "in_progress",
                               "model": body.model}})
        it = iter(future)
        try:
            await self._pump_responses(it, body, parser, ev, rid)
        except (ConnectionResetError, asyncio.CancelledError):
            future.cancel()   # client dropped: abort generation
            raise
        await resp.write_eof()
        return resp

    async def _pump_responses(self, it, body, parser, ev, rid):
        prev_len = 0
        full = ""
        hold = self._stop_holdback(body)
        while True:
            out = await asyncio.to_thread(lambda: next(it, None))
            if out is None:
                break
            text = out.outputs[0].text
            upto = (len(text) if out.finished
                    else max(prev_len, len(text) - hold))
            delta, prev_len = text[prev_len:upto], upto
            full = text
            if delta:
                await ev("response.output_text.delta",
                         {"type": "response.output_text.delta",
                          "delta": delta})
            if out.finished:
                p = len(out.prompt_token_ids)
                c = len(out.outputs[0].token_ids)
                calls = []
                if parser is not None:
                    full, calls = parser.parse(full)
                final = responses_response(
                    body.model, full,
                    {"prompt_tokens": p, "completion_tokens": c,
                     "total_tokens": p + c},
                    tool_calls=[cl.to_openai(i)
                                for i, cl in enumerate(calls)])
                final["id"] = rid
                await ev("response.completed",
                         {"type": "response.completed", "response": final})
                break

    # ------------------------------------------------------------------ run -------
    def run(self, host: str = "0.0.0.0", port: int = 8000):
        logger.info("serving OpenAI API on %s:%d", host, port)
        web.run_app(self.app, host=host, port=port, print=None)
