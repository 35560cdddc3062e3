"""Disaggregated OpenAI server: separate context (prefill) and generation
(decode) pools.

Counterpart of the reference's `OpenAIDisaggServer`
(`serve/openai_disagg_server.py:82`) and its two-phase flow
(SURVEY.md §3.4): a completion request is (1) sent to a context server,
which prefills and returns the first token plus an opaque KV payload, then
(2) sent to a generation server which injects the KV and decodes.  The KV
plane is HTTP/DCN with the framed-bytes format of
`llmapi/disagg_params.payload_to_bytes` (the reference uses UCX/NIXL RDMA;
on TPU pods the same bytes ride DCN).

Routers: ROUND_ROBIN, LOAD_BASED (fewest active sequences — fed by each
server's /kv_cache_events, the reference's load router `serve/router.py:76`)
and KV_AWARE (longest cached prefix wins, load breaks ties — the reference's
KV-cache-aware router `serve/router.py:76-139`; instead of mirroring the
event stream into a radix view, each candidate answers an exact, side-effect-
free /prefix_match probe).
"""

from __future__ import annotations

import base64
import itertools
from typing import List, Optional

from aiohttp import ClientSession, web

from tensorrt_llm_tpu.utils import logger


class Router:
    """Pick a server for the next request."""

    def __init__(self, urls: List[str], policy: str = "round_robin"):
        assert urls, "router needs at least one server"
        self.urls = list(urls)
        self.policy = policy
        self._rr = itertools.cycle(self.urls)

    async def pick(self, session: ClientSession,
                   token_ids: Optional[List[int]] = None) -> str:
        if self.policy == "round_robin" or len(self.urls) == 1:
            return next(self._rr)
        # load: fewest active sequences right now (both remaining policies)
        loads = []
        for u in self.urls:
            try:
                async with session.get(f"{u}/kv_cache_events") as r:
                    stats = await r.json()
                loads.append((stats.get("active_sequences", 0), u))
            except Exception:  # noqa: BLE001 — skip unhealthy servers
                loads.append((float("inf"), u))
        healthy = [(l, u) for l, u in loads if l != float("inf")]
        if not healthy:
            raise web.HTTPServiceUnavailable(text="no healthy backend")
        if self.policy == "kv_aware" and token_ids:
            # longest cached prefix wins; load breaks ties
            scored = []
            for load, u in healthy:
                try:
                    async with session.post(
                            f"{u}/prefix_match",
                            json={"prompt_token_ids": list(token_ids)}) as r:
                        m = (await r.json()).get("matched_tokens", 0)
                except Exception:  # noqa: BLE001
                    m = 0
                scored.append((-m, load, u))
            scored.sort()
            return scored[0][2]
        healthy.sort()
        return healthy[0][1]


class OpenAIDisaggServer:
    def __init__(self, ctx_urls: List[str], gen_urls: List[str],
                 router_policy: str = "round_robin",
                 model_name: str = "tpu-llm"):
        self.ctx_router = Router(ctx_urls, router_policy)
        self.gen_router = Router(gen_urls, router_policy)
        self.model_name = model_name
        self.app = web.Application(client_max_size=1 << 30)
        self.app.add_routes([
            web.get("/health", self.health),
            web.post("/v1/completions", self.completions),
        ])

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def completions(self, request: web.Request):
        body = await request.json()
        async with ClientSession() as session:
            # 1) context phase (KV-aware: route to the prefill server that
            # already caches the longest prompt prefix)
            ctx_url = await self.ctx_router.pick(
                session, body.get("prompt_token_ids"))
            async with session.post(f"{ctx_url}/disagg/context",
                                    json=body) as r:
                if r.status != 200:
                    return web.json_response(await r.json(), status=r.status)
                ctx = await r.json()
            # 2) generation phase (KV payload forwarded verbatim)
            gen_url = await self.gen_router.pick(session)
            gen_body = dict(body)
            gen_body["first_gen_tokens"] = ctx["first_gen_tokens"]
            gen_body["kv_payload_b64"] = ctx["kv_payload_b64"]
            async with session.post(f"{gen_url}/disagg/generate",
                                    json=gen_body) as r:
                return web.json_response(await r.json(), status=r.status)

    def run(self, host: str = "0.0.0.0", port: int = 8000):
        logger.info("disagg server on %s:%d (ctx=%s gen=%s)", host, port,
                    self.ctx_router.urls, self.gen_router.urls)
        web.run_app(self.app, host=host, port=port)


# ---- worker-side endpoints (mixed into OpenAIServer) ---------------------------
async def disagg_context(server, request: web.Request):
    """Context-only phase on a prefill worker."""
    from tensorrt_llm_tpu.llmapi.disagg_params import payload_to_bytes
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    body = await request.json()
    ids = body.get("prompt_token_ids")
    if ids is None:
        ids = server.llm.tokenizer.encode(body["prompt"])
    sp = SamplingParams(temperature=body.get("temperature", 1.0),
                        ignore_eos=bool(body.get("ignore_eos", False)))
    import asyncio
    loop = asyncio.get_event_loop()
    out, dparams = await loop.run_in_executor(
        None, lambda: server.llm.generate_context_only(ids, sp))
    return web.json_response({
        "first_gen_tokens": dparams.first_gen_tokens,
        "kv_payload_b64": base64.b64encode(
            payload_to_bytes(dparams.kv_payload)).decode(),
    })


async def disagg_generate(server, request: web.Request):
    """Generation-only phase on a decode worker."""
    from tensorrt_llm_tpu.llmapi.disagg_params import (
        DisaggregatedParams, payload_from_bytes)
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    body = await request.json()
    ids = body.get("prompt_token_ids")
    if ids is None:
        ids = server.llm.tokenizer.encode(body["prompt"])
    dp = DisaggregatedParams(
        request_type="generation_only",
        first_gen_tokens=list(body["first_gen_tokens"]),
        kv_payload=payload_from_bytes(
            base64.b64decode(body["kv_payload_b64"])))
    sp = SamplingParams(
        max_tokens=int(body.get("max_tokens", 32)),
        temperature=body.get("temperature", 1.0),
        ignore_eos=bool(body.get("ignore_eos", False)))
    import asyncio
    loop = asyncio.get_event_loop()
    fut = server.llm.generate_async(ids, sp, disaggregated_params=dp)
    out = await loop.run_in_executor(None, lambda: fut.result(timeout=600))
    text = ""
    if server.llm.tokenizer is not None:
        text = server.llm.tokenizer.decode(out.outputs[0].token_ids)
    return web.json_response({
        "id": f"cmpl-{out.request_id}",
        "object": "text_completion",
        "model": server.model_name,
        "choices": [{"index": 0, "text": text,
                     "token_ids": out.outputs[0].token_ids,
                     "finish_reason": out.outputs[0].finish_reason}],
    })
