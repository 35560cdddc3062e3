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
