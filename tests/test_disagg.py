"""Disaggregated prefill/decode serving: KV transfer between two engines."""

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.llmapi.disagg_params import (
    DisaggregatedParams,
    payload_from_bytes,
    payload_to_bytes,
)
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=64, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position=128)


def mk_llm(seed=0, **kw):
    return LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
               max_seq_len=64, max_batch_size=8, kv_num_blocks=64,
               kv_block_size=8, seed=seed, **kw)


def test_disagg_matches_single_instance():
    """ctx engine prefills + transfers KV; gen engine decodes; output equals
    a single-instance greedy run token-for-token."""
    prompt = list(np.random.RandomState(3).randint(1, 60, 19))
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)

    ref = mk_llm(seed=4)
    try:
        want = ref.generate([list(prompt)], sp)[0].outputs[0].token_ids
    finally:
        ref.shutdown()

    ctx = mk_llm(seed=4)   # same weights: same seed
    gen = mk_llm(seed=4)
    try:
        out_ctx, dparams = ctx.generate_context_only(
            list(prompt), SamplingParams(temperature=0.0, ignore_eos=True))
        assert len(dparams.first_gen_tokens) == 1
        assert dparams.first_gen_tokens[0] == want[0]
        assert dparams.kv_payload is not None

        # wire round-trip (what the HTTP disagg path ships over DCN)
        blob = payload_to_bytes(dparams.kv_payload)
        dparams.kv_payload = payload_from_bytes(blob)

        # max_tokens counts all output tokens incl. the injected first one
        sp_gen = SamplingParams(max_tokens=8, temperature=0.0,
                                ignore_eos=True)
        fut = gen.generate_async(list(prompt), sp_gen,
                                 disaggregated_params=dparams)
        out = fut.result(timeout=120)
        got = out.outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        ctx.shutdown()
        gen.shutdown()


def test_disagg_ctx_pool_is_clean_after_transfer():
    ctx = mk_llm(seed=1)
    try:
        before = ctx.get_kv_cache_stats()
        _, dp = ctx.generate_context_only([1, 2, 3, 4, 5, 6, 7, 8, 9])
        import time
        time.sleep(0.3)
        after = ctx.get_kv_cache_stats()
        assert after["active_sequences"] == 0
        assert dp.kv_payload["num_tokens"] == 9
    finally:
        ctx.shutdown()


def test_payload_roundtrip_structures():
    kv = {"layers": [(np.ones((2, 2, 8, 16), np.float32),
                      np.zeros((2, 2, 8, 16), np.float32))] * 2,
          "num_tokens": 11, "block_size": 8}
    back = payload_from_bytes(payload_to_bytes(kv))
    assert back["num_tokens"] == 11 and back["block_size"] == 8
    assert len(back["layers"]) == 2
    np.testing.assert_array_equal(back["layers"][0][0], kv["layers"][0][0])


def test_disagg_http_two_phase():
    """HTTP flow: ctx worker /disagg/context -> gen worker /disagg/generate,
    greedy output equals a single-instance run."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    prompt = [int(x) for x in np.random.RandomState(6).randint(1, 60, 14)]
    ref = mk_llm(seed=9)
    try:
        want = ref.generate([list(prompt)], SamplingParams(
            max_tokens=6, temperature=0.0, ignore_eos=True)
        )[0].outputs[0].token_ids
    finally:
        ref.shutdown()

    ctx_llm, gen_llm = mk_llm(seed=9), mk_llm(seed=9)
    loop = asyncio.new_event_loop()
    try:
        ctx_tc = TestClient(TestServer(
            OpenAIServer(ctx_llm, "tiny").app, loop=loop), loop=loop)
        gen_tc = TestClient(TestServer(
            OpenAIServer(gen_llm, "tiny").app, loop=loop), loop=loop)
        loop.run_until_complete(ctx_tc.start_server())
        loop.run_until_complete(gen_tc.start_server())

        async def flow():
            r = await ctx_tc.post("/disagg/context", json={
                "prompt_token_ids": prompt, "temperature": 0.0,
                "ignore_eos": True})
            assert r.status == 200, await r.text()
            ctx = await r.json()
            r = await gen_tc.post("/disagg/generate", json={
                "prompt_token_ids": prompt,
                "first_gen_tokens": ctx["first_gen_tokens"],
                "kv_payload_b64": ctx["kv_payload_b64"],
                "max_tokens": 6, "temperature": 0.0, "ignore_eos": True})
            assert r.status == 200, await r.text()
            return await r.json()

        out = loop.run_until_complete(flow())
        assert out["choices"][0]["token_ids"] == want
        loop.run_until_complete(ctx_tc.close())
        loop.run_until_complete(gen_tc.close())
    finally:
        loop.close()
        ctx_llm.shutdown()
        gen_llm.shutdown()


def test_disagg_router_policies():
    import asyncio
    from tensorrt_llm_tpu.serve.disagg_server import Router

    r = Router(["a", "b"], "round_robin")
    loop = asyncio.new_event_loop()
    try:
        picks = [loop.run_until_complete(r.pick(None)) for _ in range(4)]
        assert picks == ["a", "b", "a", "b"]
    finally:
        loop.close()


def test_kv_aware_router_prefers_warm_server():
    """kv_aware policy routes to the server whose cache already holds the
    longest prompt prefix; exercised over real HTTP (/prefix_match +
    /kv_cache_events probes)."""
    import asyncio

    from aiohttp import ClientSession
    from aiohttp.test_utils import TestServer
    from tensorrt_llm_tpu.serve.disagg_server import Router
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    prompt = [int(x) for x in np.random.RandomState(3).randint(1, 60, 30)]
    llm_a, llm_b = mk_llm(seed=4), mk_llm(seed=4)
    loop = asyncio.new_event_loop()
    try:
        # warm server A's KV reuse index with the prompt
        llm_a.generate([list(prompt)], SamplingParams(
            max_tokens=4, temperature=0.0, ignore_eos=True))
        assert llm_a.match_kv_prefix(prompt) >= 16
        assert llm_b.match_kv_prefix(prompt) == 0

        sa = TestServer(OpenAIServer(llm_a, "a").app, loop=loop)
        sb = TestServer(OpenAIServer(llm_b, "b").app, loop=loop)
        loop.run_until_complete(sa.start_server())
        loop.run_until_complete(sb.start_server())
        ua, ub = str(sa.make_url("")), str(sb.make_url(""))

        async def route(urls):
            r = Router(urls, "kv_aware")
            async with ClientSession() as s:
                return await r.pick(s, prompt)

        # warm server wins regardless of listing order
        assert loop.run_until_complete(route([ub, ua])) == ua
        assert loop.run_until_complete(route([ua, ub])) == ua

        # without token ids it degrades to load-based (no crash)
        async def route_plain():
            r = Router([ua, ub], "kv_aware")
            async with ClientSession() as s:
                return await r.pick(s, None)
        assert loop.run_until_complete(route_plain()) in (ua, ub)

        loop.run_until_complete(sa.close())
        loop.run_until_complete(sb.close())
    finally:
        loop.close()
        llm_a.shutdown()
        llm_b.shutdown()


def test_kv_cache_event_stream():
    """Stored-block events stream with cursor paging and cross-process
    comparable hashes (same prompt => same event hashes on two engines)."""
    llm_a, llm_b = mk_llm(seed=4), mk_llm(seed=4)
    prompt = [int(x) for x in np.random.RandomState(5).randint(1, 60, 30)]
    try:
        sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
        llm_a.generate([list(prompt)], sp)
        llm_b.generate([list(prompt)], sp)
        ev_a = llm_a.get_kv_cache_events()
        ev_b = llm_b.get_kv_cache_events()
        assert ev_a and all(e["type"] == "stored" for e in ev_a)
        assert [e["block_hash"] for e in ev_a] == \
               [e["block_hash"] for e in ev_b]
        # cursor paging
        last = ev_a[-1]["id"]
        assert llm_a.get_kv_cache_events(last + 1) == []
        assert llm_a.get_kv_cache_events(last)[0]["id"] == last
    finally:
        llm_a.shutdown()
        llm_b.shutdown()


def test_disagg_across_tp_widths():
    """KV payload from a TP=2 prefill engine injects into a TP=4 decode
    engine (the reference's cacheSplitConcat.cu re-split across different
    TP widths): single-controller pools are logically global with the head
    axis mesh-sharded, so extract/inject carry full heads and the decode
    mesh re-shards on inject.  Greedy output must equal a single-instance
    run token-for-token."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    big = dict(TINY, num_heads=8, num_kv_heads=4, hidden_size=128)

    def mk(tp, seed=4):
        return LLM(model=ModelConfig(**big), skip_tokenizer_init=True,
                   max_seq_len=64, max_batch_size=8, kv_num_blocks=64,
                   kv_block_size=8, seed=seed, tensor_parallel_size=tp)

    prompt = list(np.random.RandomState(3).randint(1, 60, 19))
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    ref = mk(1)
    try:
        want = ref.generate([list(prompt)], sp)[0].outputs[0].token_ids
    finally:
        ref.shutdown()

    ctx = mk(2)
    gen = mk(4)
    try:
        out_ctx, dparams = ctx.generate_context_only(
            list(prompt), SamplingParams(temperature=0.0, ignore_eos=True))
        assert dparams.first_gen_tokens[0] == want[0]
        blob = payload_to_bytes(dparams.kv_payload)
        dparams.kv_payload = payload_from_bytes(blob)
        fut = gen.generate_async(list(prompt), sp,
                                 disaggregated_params=dparams)
        got = fut.result(timeout=180).outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        ctx.shutdown()
        gen.shutdown()


def test_kv_aware_router_event_view_no_probe(monkeypatch):
    """The event-fed KvView must (a) agree with exact /prefix_match
    scoring and (b) make routing decisions WITHOUT any per-request
    /prefix_match probe (VERDICT r3 #8; reference serve/router.py:76-139)."""
    import asyncio

    from aiohttp import ClientSession
    from aiohttp.test_utils import TestServer
    from tensorrt_llm_tpu.serve.disagg_server import Router
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    prompt = [int(x) for x in np.random.RandomState(7).randint(1, 60, 30)]
    llm_a, llm_b = mk_llm(seed=4), mk_llm(seed=4)
    loop = asyncio.new_event_loop()
    try:
        llm_a.generate([list(prompt)], SamplingParams(
            max_tokens=4, temperature=0.0, ignore_eos=True))
        exact = llm_a.match_kv_prefix(prompt)
        assert exact >= 16

        sa = TestServer(OpenAIServer(llm_a, "a").app, loop=loop)
        sb = TestServer(OpenAIServer(llm_b, "b").app, loop=loop)
        loop.run_until_complete(sa.start_server())
        loop.run_until_complete(sb.start_server())
        ua, ub = str(sa.make_url("")), str(sb.make_url(""))

        probes = []

        async def counting_probe(session, url, token_ids):
            probes.append(url)
            return 0
        monkeypatch.setattr(Router, "prefix_match",
                            staticmethod(counting_probe))

        r = Router([ub, ua], "kv_aware")

        async def route():
            async with ClientSession() as s:
                return await r.pick(s, prompt), await r.pick(s, prompt)
        first, second = loop.run_until_complete(route())
        # view bootstraps from the ?full=1 snapshot in the SAME probe that
        # reads load, so even the first pick needs no /prefix_match call
        assert first == ua and second == ua
        assert probes == []
        # view score agrees with the engine's exact device-tier match
        assert r._views[ua].match(prompt) == exact
        assert r._views[ub].match(prompt) == 0

        loop.run_until_complete(sa.close())
        loop.run_until_complete(sb.close())
    finally:
        loop.close()
        llm_a.shutdown()
        llm_b.shutdown()


def test_kv_view_removed_events():
    """Evicting every cached block must emit 'removed' events that empty an
    event-fed view (no stale routing toward a cold server)."""
    llm = mk_llm(seed=4)
    try:
        from tensorrt_llm_tpu.serve.disagg_server import KvView
        prompt = [int(x) for x in np.random.RandomState(9).randint(1, 60, 30)]
        llm.generate([list(prompt)], SamplingParams(
            max_tokens=4, temperature=0.0, ignore_eos=True))
        view = KvView()
        view.apply({"block_size": llm.kv_manager.block_size,
                    "events": llm.get_kv_cache_events(0),
                    "block_hashes": llm.kv_manager.reuse_block_hashes()})
        assert view.match(prompt) >= 16
        # churn the pool with disjoint prompts until the old blocks evict
        for i in range(40):
            p = [int(x) for x in
                 np.random.RandomState(100 + i).randint(60, 120, 30)]
            llm.generate([p], SamplingParams(max_tokens=2, temperature=0.0,
                                             ignore_eos=True))
            view.apply({"events": llm.get_kv_cache_events(view.cursor)})
            if llm.match_kv_prefix(prompt) == 0:
                break
        assert llm.match_kv_prefix(prompt) == 0
        view.apply({"events": llm.get_kv_cache_events(view.cursor)})
        assert view.match(prompt) == 0
    finally:
        llm.shutdown()


def test_kv_view_explicit_cursor_non_contiguous_ids():
    """DP managers namespace event ids as id*R+rank, so ids are legitimately
    non-contiguous.  With explicit next_since_id/oldest_retained_id cursors
    the view must NOT flag a gap (ADVICE r4: every DP event batch forced a
    full resync)."""
    from tensorrt_llm_tpu.serve.disagg_server import KvView
    view = KvView()
    view.apply({"epoch": "e1", "block_size": 8, "block_hashes": [],
                "next_since_id": 0, "oldest_retained_id": 0})
    assert not view.need_full
    # rank-0 events only (R=2): ids 0, 2, 4 — non-contiguous by design
    view.apply({"epoch": "e1",
                "events": [{"id": 0, "type": "stored", "block_hash": 11},
                           {"id": 2, "type": "stored", "block_hash": 22},
                           {"id": 4, "type": "stored", "block_hash": 33}],
                "next_since_id": 5, "oldest_retained_id": 0})
    assert not view.need_full
    assert view.cursor == 5
    assert view.blocks == {11, 22, 33}
    # cursor comes from next_since_id, never from applied ids: a fast
    # rank's ids may exceed the aggregate cursor
    view.apply({"epoch": "e1",
                "events": [{"id": 12, "type": "stored", "block_hash": 44}],
                "next_since_id": 7, "oldest_retained_id": 0})
    assert view.cursor == 7 and not view.need_full


def test_kv_view_gap_and_epoch_reset():
    from tensorrt_llm_tpu.serve.disagg_server import KvView
    view = KvView()
    view.apply({"epoch": "e1", "block_size": 8, "block_hashes": [5],
                "next_since_id": 3, "oldest_retained_id": 0})
    assert not view.need_full and view.blocks == {5}
    # bounded ring trimmed past our cursor -> resync required
    view.apply({"epoch": "e1", "events": [],
                "next_since_id": 900, "oldest_retained_id": 800})
    assert view.need_full
    view.apply({"epoch": "e1", "block_size": 8, "block_hashes": [5, 6],
                "next_since_id": 900, "oldest_retained_id": 800})
    assert not view.need_full and view.cursor == 900
    # worker restart: epoch changes, ids reset below the cursor — the view
    # must drop its state instead of advertising the dead worker's blocks
    view.apply({"epoch": "e2", "events": [],
                "next_since_id": 0, "oldest_retained_id": 0})
    assert view.need_full and view.blocks == set() and view.cursor == 0


def test_event_cursor_wire_fields():
    """/kv_cache_events must publish epoch + explicit cursors and the base
    manager's event_cursor must page without duplicates or gaps."""
    llm = mk_llm(seed=4)
    try:
        prompt = [int(x) for x in np.random.RandomState(3).randint(1, 60, 30)]
        llm.generate([list(prompt)], SamplingParams(
            max_tokens=4, temperature=0.0, ignore_eos=True))
        nxt, oldest = llm.kv_manager.event_cursor()
        assert oldest == 0
        evs = llm.get_kv_cache_events(0)
        assert evs and nxt == max(e["id"] for e in evs) + 1
        # paging from the cursor returns nothing new
        assert llm.get_kv_cache_events(nxt) == []
    finally:
        llm.shutdown()


def test_disagg_streamed_frames_overlap_prefill():
    """Chunk-wise streamed KV transfer (reference ContextProgress,
    cacheTransceiver.cpp:203): frames must be emitted WHILE later prefill
    chunks still compute (event-ordering assertion), and the streamed
    receive path must reproduce the whole-payload disagg output
    token-for-token over a serialization round-trip."""
    import queue as q_mod
    import time

    from tensorrt_llm_tpu.llmapi.disagg_params import (frame_from_bytes,
                                                       frame_to_bytes)

    prompt = [int(x) for x in np.random.RandomState(11).randint(1, 60, 40)]
    sp_gen = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)

    ref = mk_llm(seed=4)
    try:
        want = ref.generate([list(prompt)], sp_gen)[0].outputs[0].token_ids
    finally:
        ref.shutdown()

    # max_num_tokens=16 forces the 40-token prompt through 3 prefill chunks
    ctx = mk_llm(seed=4, max_num_tokens=16)
    gen = mk_llm(seed=4)
    try:
        fut, frames = ctx.generate_context_only_streamed(
            list(prompt), SamplingParams(temperature=0.0, ignore_eos=True))
        received = []
        first = frames.get(timeout=60)
        # event ordering: the first frame left the executor while prefill
        # of later chunks was still running (end_time set only at finish)
        overlap = fut.req.end_time is None
        received.append(first)
        while not received[-1].get("end"):
            received.append(frames.get(timeout=60))
        fut.result(timeout=60)
        assert overlap, "first frame arrived only after prefill finished"
        kv_frames = [f for f in received if not f.get("end")]
        end = received[-1]
        assert len(kv_frames) >= 2, "stream was not split across chunks"
        starts = [f["start_block"] for f in kv_frames]
        assert starts == sorted(starts) and starts[0] == 0
        assert end["first_gen_tokens"] == [want[0]]
        assert end["num_tokens"] == len(prompt)

        # ship over the wire and feed the decode server incrementally
        rx = q_mod.Queue()
        for f in received:
            rx.put(frame_from_bytes(frame_to_bytes(f)))
        dp = DisaggregatedParams(request_type="generation_only",
                                 kv_frames=rx)
        out = gen.generate_async(list(prompt), sp_gen,
                                 disaggregated_params=dp).result(timeout=120)
        got = out.outputs[0].token_ids
        assert got == want, (got, want)
    finally:
        ctx.shutdown()
        gen.shutdown()


def test_disagg_http_streamed():
    """HTTP streamed flow: gen worker pulls framed KV directly from the
    ctx worker's /disagg/context_stream while prefill computes; greedy
    output equals a single-instance run."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    prompt = [int(x) for x in np.random.RandomState(17).randint(1, 60, 40)]
    ref = mk_llm(seed=9)
    try:
        want = ref.generate([list(prompt)], SamplingParams(
            max_tokens=6, temperature=0.0, ignore_eos=True)
        )[0].outputs[0].token_ids
    finally:
        ref.shutdown()

    # small token budget on the ctx worker: multi-chunk prefill -> frames
    ctx_llm = mk_llm(seed=9, max_num_tokens=16)
    gen_llm = mk_llm(seed=9)
    loop = asyncio.new_event_loop()
    try:
        ctx_ts = TestServer(OpenAIServer(ctx_llm, "tiny").app, loop=loop)
        gen_tc = TestClient(TestServer(
            OpenAIServer(gen_llm, "tiny").app, loop=loop), loop=loop)
        loop.run_until_complete(ctx_ts.start_server())
        loop.run_until_complete(gen_tc.start_server())
        ctx_url = str(ctx_ts.make_url("")).rstrip("/")

        async def flow():
            r = await gen_tc.post("/disagg/generate_streamed", json={
                "prompt_token_ids": prompt, "ctx_url": ctx_url,
                "max_tokens": 6, "temperature": 0.0, "ignore_eos": True})
            assert r.status == 200, await r.text()
            return await r.json()

        out = loop.run_until_complete(flow())
        assert out["choices"][0]["token_ids"] == want
        loop.run_until_complete(gen_tc.close())
        loop.run_until_complete(ctx_ts.close())
    finally:
        loop.close()
        ctx_llm.shutdown()
        gen_llm.shutdown()
