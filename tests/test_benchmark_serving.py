"""HTTP-level serving benchmark (reference serve/scripts/benchmark_serving.py
analog): drive a live in-process OpenAI server and check the metric set."""

import asyncio
import json

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from tensorrt_llm_tpu.commands.benchmark_serving import (
    build_requests, compute_metrics, main, RequestResult, run_benchmark)
from tensorrt_llm_tpu.llmapi import LLM
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position=256)


def test_build_requests_synthetic_and_dataset(tmp_path):
    class A:
        dataset = None
        num_prompts = 5
        input_len = 16
        output_len = 8
        seed = 0
    reqs = build_requests(A())
    assert len(reqs) == 5 and len(reqs[0]["prompt"]) == 16
    ds = tmp_path / "d.jsonl"
    ds.write_text('{"input_ids": [1,2,3], "output_len": 4}\n'
                  '{"prompt": "hello world", "output_len": 2}\n')
    A.dataset = str(ds)
    A.num_prompts = 0
    reqs = build_requests(A())
    assert len(reqs) == 2
    assert reqs[0]["prompt"] == [1, 2, 3] and reqs[0]["output_len"] == 4
    assert reqs[1]["prompt"] == "hello world" and reqs[1]["prompt_len"] == 2


def test_compute_metrics_and_goodput():
    class A:
        goodput = "ttft:100,e2e:1000"
        max_concurrency = 4
        request_rate = float("inf")
    ok = RequestResult(success=True, prompt_len=10, output_tokens=5,
                       ttft=0.05, itl=[0.01] * 4, e2e=0.09)
    slow = RequestResult(success=True, prompt_len=10, output_tokens=5,
                         ttft=0.5, itl=[0.01] * 4, e2e=0.54)
    bad = RequestResult(success=False, error="boom")
    m = compute_metrics(A(), [ok, slow, bad], duration=1.0)
    assert m["completed"] == 2 and m["failed"] == 1
    assert m["output_token_throughput"] == 10.0
    assert m["total_token_throughput"] == 30.0
    assert m["request_goodput"] == 1.0  # only `ok` meets both SLOs, /1s
    assert m["ttft_ms"]["p99"] > m["ttft_ms"]["median"]
    assert "errors" in m


def test_benchmark_against_live_server(unused_tcp_port_factory=None):
    from aiohttp.test_utils import TestClient, TestServer
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    llm = LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
              max_seq_len=128, max_batch_size=8, kv_num_blocks=128,
              kv_block_size=8)
    server = OpenAIServer(llm, "tiny")
    loop = asyncio.new_event_loop()
    tc = TestClient(TestServer(server.app, loop=loop), loop=loop)
    loop.run_until_complete(tc.start_server())
    port = tc.server.port

    class A:
        base_url = f"http://127.0.0.1:{port}"
        endpoint = "/v1/completions"
        model = "tiny"
        dataset = None
        num_prompts = 6
        input_len = 8
        output_len = 5
        request_rate = 50.0
        burstiness = 1.0
        max_concurrency = 3
        temperature = 0.0
        goodput = None
        timeout = 120.0
        seed = 0

    m = loop.run_until_complete(run_benchmark(A()))
    loop.run_until_complete(tc.close())
    loop.close()
    llm.shutdown()

    assert m["completed"] == 6, m
    assert m["failed"] == 0
    # 5 output tokens per request, streamed one piece per token
    assert m["output_token_throughput"] > 0
    assert m["ttft_ms"]["mean"] > 0
    assert m["tpot_ms"] and m["itl_ms"] and m["e2e_ms"]
    assert json.dumps(m)  # JSON-serializable report
