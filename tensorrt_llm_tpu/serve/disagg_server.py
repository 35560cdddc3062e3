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
KV-cache-aware router `serve/router.py:76-139`): each worker's
stored/removed KV event stream is mirrored into a local `KvView` by the
same load probe, so prefix scoring costs no extra network round trip; a
view that fell behind the bounded event history resyncs via
`/kv_cache_events?full=1` and falls back to an exact, side-effect-free
/prefix_match probe until the snapshot lands.

Cluster management (reference `serve/router.py:68` health checks,
`serve/metadata_server.py` + `serve/disagg_auto_scaling.py` worker
join/leave): each pool is a dynamic ServerPool — workers POST /register
and /unregister (or just die), a background health loop probes /health and
fences servers after consecutive failures, and fenced servers rejoin
automatically when they recover.  Conditional disaggregation (reference
`conditional_disagg_config`): short prompts, or prompts whose prefix is
already mostly cached on a generation server, skip the remote prefill hop
and run both phases on the generation server.
"""

from __future__ import annotations

import asyncio
import base64
import itertools
import time
from typing import Dict, List, Optional

from aiohttp import ClientSession, web

from tensorrt_llm_tpu.utils import logger


class ServerPool:
    """Dynamic worker-pool membership + health fencing (reference router
    health checks, serve/router.py:68 + disagg_auto_scaling worker
    tracking)."""

    def __init__(self, urls: Optional[List[str]] = None,
                 fail_threshold: int = 3):
        self.servers: Dict[str, dict] = {}
        self.fail_threshold = fail_threshold
        for u in urls or []:
            self.add(u)

    def add(self, url: str):
        url = url.rstrip("/")
        if url not in self.servers:
            self.servers[url] = {"healthy": True, "fails": 0,
                                 "joined": time.time()}
            logger.info("pool: %s joined", url)

    def remove(self, url: str):
        if self.servers.pop(url.rstrip("/"), None) is not None:
            logger.info("pool: %s left", url)

    @property
    def urls(self) -> List[str]:
        return list(self.servers)

    def healthy_urls(self) -> List[str]:
        return [u for u, s in self.servers.items() if s["healthy"]]

    def mark(self, url: str, ok: bool):
        s = self.servers.get(url)
        if s is None:
            return
        if ok:
            if not s["healthy"]:
                logger.info("pool: %s recovered", url)
            s["fails"] = 0
            s["healthy"] = True
        else:
            s["fails"] += 1
            if s["fails"] >= self.fail_threshold and s["healthy"]:
                s["healthy"] = False
                logger.warning("pool: %s fenced after %d failed health "
                               "checks", url, s["fails"])

    async def check_health(self, session: ClientSession,
                           timeout: float = 2.0):
        """One health sweep over every member (fenced ones too — that is
        how they rejoin)."""
        for u in self.urls:
            try:
                async with session.get(f"{u}/health",
                                       timeout=timeout) as r:
                    self.mark(u, r.status == 200)
            except Exception:  # noqa: BLE001
                self.mark(u, False)

    def snapshot(self) -> List[dict]:
        return [{"url": u, **{k: v for k, v in s.items()}}
                for u, s in self.servers.items()]


class KvView:
    """Event-fed mirror of one worker's matchable KV blocks (reference
    radix view, serve/router.py:76-139).  Chain hashes encode their whole
    prefix, so a flat SET + per-prompt chain walk replaces the radix tree;
    a cursor gap (bounded event history overran us) triggers a ?full=1
    snapshot resync on the next probe."""

    def __init__(self):
        self.blocks: set = set()
        self.cursor = 0          # next event id we expect
        self.block_size = 0
        self.need_full = True    # bootstrap with a snapshot
        self.epoch = None        # worker process identity

    def apply(self, resp: dict):
        ep = resp.get("epoch")
        if ep is not None and ep != self.epoch:
            if self.epoch is not None:
                # worker restarted: event ids reset below our cursor and
                # its cache is cold — drop the stale view entirely
                self.blocks.clear()
                self.cursor = 0
                self.need_full = True
            self.epoch = ep
        self.block_size = resp.get("block_size") or self.block_size
        if "block_hashes" in resp:
            self.blocks = set(resp["block_hashes"])
            self.need_full = False
        events = resp.get("events") or []
        oldest = resp.get("oldest_retained_id")
        if oldest is not None:
            # explicit gap signal: events below the retained floor are
            # gone; ids themselves may be legitimately non-contiguous
            # (DP manager namespacing) — never infer gaps from them
            if oldest > self.cursor and "block_hashes" not in resp:
                self.need_full = True
        else:
            for e in events:   # legacy servers: contiguity heuristic
                if e["id"] > self.cursor and "block_hashes" not in resp:
                    self.need_full = True
                break
        start = self.cursor
        seen = start
        for e in events:
            if e["type"] == "stored":
                self.blocks.add(e["block_hash"])
            elif e["type"] == "removed":
                self.blocks.discard(e["block_hash"])
            seen = max(seen, e["id"] + 1)
        nxt = resp.get("next_since_id")
        # with an explicit cursor, use it EXACTLY (not max with applied
        # ids): under DP namespacing a fast rank's ids can exceed the
        # aggregate cursor, and advancing past it would skip slow ranks'
        # future events.  Replayed duplicates are idempotent.
        self.cursor = max(start, nxt) if nxt is not None else seen

    def match(self, token_ids) -> int:
        if not self.block_size or not self.blocks:
            return 0
        from tensorrt_llm_tpu.runtime.kv_cache_manager import (
            prefix_chain_hashes)
        n = 0
        for h in prefix_chain_hashes(token_ids, self.block_size):
            if h not in self.blocks:
                break
            n += self.block_size
        return n


class Router:
    """Pick a server for the next request."""

    def __init__(self, urls, policy: str = "round_robin"):
        self.pool = urls if isinstance(urls, ServerPool) else ServerPool(urls)
        self.policy = policy
        self._rr = itertools.cycle([])
        self._rr_urls: List[str] = []
        self._views: Dict[str, KvView] = {}

    @property
    def urls(self) -> List[str]:
        return self.pool.urls

    def _candidates(self) -> List[str]:
        urls = self.pool.healthy_urls()
        if not urls:
            raise web.HTTPServiceUnavailable(text="no healthy backend")
        return urls

    async def pick(self, session: ClientSession,
                   token_ids: Optional[List[int]] = None) -> str:
        cands = self._candidates()
        if self.policy == "round_robin" or len(cands) == 1:
            if cands != self._rr_urls:  # membership changed: rebuild cycle
                self._rr_urls = cands
                self._rr = itertools.cycle(cands)
            return next(self._rr)
        # load: fewest active sequences right now (both remaining
        # policies) — probe every candidate CONCURRENTLY (sequential
        # awaits put O(N) network round trips on every request's TTFT).
        # The same single probe also drains each worker's KV event stream
        # into its local view, so kv_aware scoring adds NO extra RTT
        # (reference event-fed radix router, serve/router.py:76-139).
        import asyncio as _aio
        kv_aware = self.policy == "kv_aware" and token_ids

        async def probe(u):
            view = self._views.setdefault(u, KvView())
            q = f"?since_id={view.cursor}"
            if kv_aware and view.need_full:
                q += "&full=1"
            try:
                async with session.get(f"{u}/kv_cache_events{q}") as r:
                    stats = await r.json()
                self.pool.mark(u, True)
                view.apply(stats)
                return (stats.get("active_sequences", 0), u)
            except Exception:  # noqa: BLE001 — skip unhealthy servers
                self.pool.mark(u, False)
                return None
        loads = [x for x in await _aio.gather(*(probe(u) for u in cands))
                 if x is not None]
        if not loads:
            raise web.HTTPServiceUnavailable(text="no healthy backend")
        if kv_aware:
            # longest cached prefix wins; load breaks ties.  Views that
            # still need a snapshot fall back to the exact (but one extra
            # RTT) /prefix_match probe.
            async def score(load, u):
                view = self._views[u]
                if view.need_full:
                    return (-(await self.prefix_match(session, u,
                                                      token_ids)), load, u)
                return (-view.match(token_ids), load, u)
            scored = sorted(await _aio.gather(
                *(score(load, u) for load, u in loads)))
            return scored[0][2]
        loads.sort()
        return loads[0][1]

    @staticmethod
    async def prefix_match(session: ClientSession, url: str,
                           token_ids) -> int:
        try:
            async with session.post(
                    f"{url}/prefix_match",
                    json={"prompt_token_ids": list(token_ids)}) as r:
                return (await r.json()).get("matched_tokens", 0)
        except Exception:  # noqa: BLE001
            return 0


class OpenAIDisaggServer:
    def __init__(self, ctx_urls: List[str], gen_urls: List[str],
                 router_policy: str = "round_robin",
                 model_name: str = "tpu-llm",
                 health_interval: float = 5.0,
                 conditional_max_prompt: int = 0,
                 conditional_cached_fraction: float = 0.0,
                 stream_kv: bool = False):
        """conditional_max_prompt: prompts with at most this many tokens
        skip the remote prefill hop (0 = off).  conditional_cached_fraction:
        skip the hop when a generation server already caches at least this
        fraction of the prompt (0 = off) — reference conditional
        disaggregation.  stream_kv: the decode worker pulls chunk-wise KV
        frames directly from the prefill worker while prefill computes
        (reference ContextProgress layer-wise streaming) instead of the
        blocking two-phase whole-payload relay."""
        self.ctx_pool = ServerPool(ctx_urls)
        self.gen_pool = ServerPool(gen_urls)
        self.ctx_router = Router(self.ctx_pool, router_policy)
        self.gen_router = Router(self.gen_pool, router_policy)
        self.model_name = model_name
        self.health_interval = health_interval
        self.conditional_max_prompt = conditional_max_prompt
        self.conditional_cached_fraction = conditional_cached_fraction
        self.stream_kv = stream_kv
        self._health_task = None
        self._session = None   # shared worker-fleet connection pool
        self.app = web.Application(client_max_size=1 << 30)
        self.app.add_routes([
            web.get("/health", self.health),
            web.get("/cluster", self.cluster),
            web.post("/register", self.register),
            web.post("/unregister", self.unregister),
            web.post("/v1/completions", self.completions),
        ])
        self.app.on_startup.append(self._start_health_loop)
        self.app.on_cleanup.append(self._stop_health_loop)
        self.app.on_cleanup.append(self._close_session)

    async def _get_session(self) -> ClientSession:
        # one long-lived session: a fresh ClientSession per request pays
        # TCP setup to the ctx and gen workers on every completion
        if self._session is None or self._session.closed:
            self._session = ClientSession()
        return self._session

    async def _close_session(self, app=None):
        if self._session is not None and not self._session.closed:
            await self._session.close()

    # ------------------------------------------------------------ cluster ----
    async def _start_health_loop(self, app):
        if self.health_interval > 0:
            self._health_task = asyncio.ensure_future(self._health_loop())

    async def _stop_health_loop(self, app):
        if self._health_task is not None:
            self._health_task.cancel()

    async def _health_loop(self):
        async with ClientSession() as session:
            while True:
                await asyncio.sleep(self.health_interval)
                await self.ctx_pool.check_health(session)
                await self.gen_pool.check_health(session)

    def _pool(self, role: str) -> ServerPool:
        if role not in ("context", "generation", "ctx", "gen"):
            raise web.HTTPBadRequest(text=f"bad role {role!r}")
        return self.ctx_pool if role.startswith("c") else self.gen_pool

    async def register(self, request: web.Request):
        """Worker join (reference disagg_auto_scaling worker watch):
        body {"url": ..., "role": "context" | "generation"}."""
        body = await request.json()
        self._pool(body.get("role", "")).add(body["url"])
        return web.json_response({"status": "ok"})

    async def unregister(self, request: web.Request):
        body = await request.json()
        self._pool(body.get("role", "")).remove(body["url"])
        return web.json_response({"status": "ok"})

    async def cluster(self, request):
        return web.json_response({
            "context": self.ctx_pool.snapshot(),
            "generation": self.gen_pool.snapshot(),
        })

    async def health(self, request):
        return web.json_response({"status": "ok"})

    # ------------------------------------------------------------ serving ----
    async def _should_skip_prefill_hop(self, session, body) -> bool:
        """Conditional disaggregation: serve both phases on a generation
        server when the remote-prefill hop cannot pay for itself."""
        ids = body.get("prompt_token_ids")
        if ids is None:
            return False
        if self.conditional_max_prompt and \
                len(ids) <= self.conditional_max_prompt:
            return True
        if self.conditional_cached_fraction > 0:
            for u in self.gen_pool.healthy_urls():
                m = await Router.prefix_match(session, u, ids)
                if m >= self.conditional_cached_fraction * len(ids):
                    return True
        return False

    async def completions(self, request: web.Request):
        body = await request.json()
        session = await self._get_session()
        if await self._should_skip_prefill_hop(session, body):
            gen_url = await self.gen_router.pick(
                session, body.get("prompt_token_ids"))
            fwd = dict(body)
            ids = fwd.pop("prompt_token_ids", None)
            if ids is not None and "prompt" not in fwd:
                # /v1/completions has no prompt_token_ids field, but
                # its `prompt` accepts a flat token-id list
                fwd["prompt"] = list(ids)
            async with session.post(f"{gen_url}/v1/completions",
                                    json=fwd) as r:
                return web.json_response(await r.json(),
                                         status=r.status)
        if self.stream_kv:
            # streamed path: one request to the decode worker, which pulls
            # framed KV straight from the prefill worker as it computes
            ctx_url = await self.ctx_router.pick(
                session, body.get("prompt_token_ids"))
            gen_url = await self.gen_router.pick(session)
            fwd = dict(body)
            fwd["ctx_url"] = ctx_url
            async with session.post(f"{gen_url}/disagg/generate_streamed",
                                    json=fwd) as r:
                return web.json_response(await r.json(), status=r.status)
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
                    self.ctx_pool.urls, self.gen_pool.urls)
        web.run_app(self.app, host=host, port=port)



def _sampling_from_body(body, max_tokens_default=None):
    """Build SamplingParams from the disagg request body — forward the
    client's full sampling surface instead of silently dropping top_p/
    top_k/seed/stop/penalties (they must behave like a non-disagg server)."""
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    kw = {}
    for key in ("temperature", "top_p", "top_k", "min_p", "seed", "stop",
                "stop_token_ids", "presence_penalty", "frequency_penalty",
                "repetition_penalty", "logprobs", "min_tokens",
                "no_repeat_ngram_size", "logit_bias", "ignore_eos"):
        if body.get(key) is not None:
            kw[key] = body[key]
    if max_tokens_default is not None:
        kw["max_tokens"] = int(body.get("max_tokens", max_tokens_default))
    kw["ignore_eos"] = bool(body.get("ignore_eos", False))
    return SamplingParams(**kw)


# ---- worker-side endpoints (mixed into OpenAIServer) ---------------------------
async def disagg_context(server, request: web.Request):
    """Context-only phase on a prefill worker."""
    from tensorrt_llm_tpu.llmapi.disagg_params import payload_to_bytes
    from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams
    body = await request.json()
    ids = body.get("prompt_token_ids")
    if ids is None:
        ids = server.llm.tokenizer.encode(body["prompt"])
    sp = _sampling_from_body(body)
    import asyncio
    loop = asyncio.get_event_loop()
    out, dparams = await loop.run_in_executor(
        None, lambda: server.llm.generate_context_only(ids, sp))
    return web.json_response({
        "first_gen_tokens": dparams.first_gen_tokens,
        "kv_payload_b64": base64.b64encode(
            payload_to_bytes(dparams.kv_payload)).decode(),
    })


async def disagg_context_stream(server, request: web.Request):
    """Streamed context phase: a chunked binary response of
    length-prefixed KV frames, each emitted as soon as its prefill chunk
    finishes — transfer overlaps the remaining prefill compute (reference
    ContextProgress layer-wise streaming, cacheTransceiver.cpp:203)."""
    import asyncio

    from tensorrt_llm_tpu.llmapi.disagg_params import frame_to_bytes
    body = await request.json()
    ids = body.get("prompt_token_ids")
    if ids is None:
        ids = server.llm.tokenizer.encode(body["prompt"])
    sp = _sampling_from_body(body)
    fut, frames = server.llm.generate_context_only_streamed(list(ids), sp)
    resp = web.StreamResponse()
    resp.content_type = "application/octet-stream"
    await resp.prepare(request)
    loop = asyncio.get_event_loop()

    def next_frame():
        import queue as q_mod
        deadline = 600
        waited = 0.0
        while True:
            try:
                return frames.get(timeout=1.0)
            except q_mod.Empty:
                waited += 1.0
                err = getattr(fut.req, "error", None) or (
                    "prefill timed out" if waited >= deadline else None)
                if fut.req.is_finished and fut.req.kv_payload is None:
                    err = err or "prefill failed"
                if err:
                    return {"end": True, "error": str(err)}

    while True:
        frame = await loop.run_in_executor(None, next_frame)
        data = frame_to_bytes(frame)
        await resp.write(len(data).to_bytes(8, "little") + data)
        if frame.get("end") or frame.get("error"):
            break
    await resp.write_eof()
    return resp


async def disagg_generate_streamed(server, request: web.Request):
    """Generation phase that PULLS streamed KV frames directly from the
    prefill worker (body carries ctx_url) and injects them as they
    arrive; decode starts the moment the end frame lands — no whole-
    payload wait, no front-end relay hop."""
    import asyncio
    import queue as q_mod

    from aiohttp import ClientSession, ClientTimeout
    from tensorrt_llm_tpu.llmapi.disagg_params import (DisaggregatedParams,
                                                       frame_from_bytes)
    body = await request.json()
    ids = body.get("prompt_token_ids")
    if ids is None:
        ids = server.llm.tokenizer.encode(body["prompt"])
    ctx_url = body["ctx_url"]
    rx: "q_mod.Queue" = q_mod.Queue()
    dp = DisaggregatedParams(request_type="generation_only", kv_frames=rx)
    sp = _sampling_from_body(body, max_tokens_default=32)
    fut = server.llm.generate_async(list(ids), sp, disaggregated_params=dp)
    ctx_body = {k: v for k, v in body.items() if k != "ctx_url"}
    ctx_body["prompt_token_ids"] = list(ids)
    try:
        async with ClientSession(
                timeout=ClientTimeout(total=600)) as session:
            async with session.post(f"{ctx_url}/disagg/context_stream",
                                    json=ctx_body) as r:
                if r.status != 200:
                    raise RuntimeError(
                        f"ctx stream HTTP {r.status}: {await r.text()}")
                reader = r.content
                while True:
                    n = int.from_bytes(await reader.readexactly(8),
                                       "little")
                    frame = frame_from_bytes(await reader.readexactly(n))
                    if frame.get("error"):
                        rx.put({"error": frame["error"]})
                        raise RuntimeError(
                            f"ctx stream: {frame['error']}")
                    rx.put(frame)
                    if frame.get("end"):
                        break
    except Exception as e:  # noqa: BLE001 — unblock the executor first
        rx.put({"error": str(e)})
        return web.json_response({"error": str(e)}, status=502)
    loop = asyncio.get_event_loop()
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
    sp = _sampling_from_body(body, max_tokens_default=32)
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
