"""Bench CLI: concurrency window honored, dataset input, latency mode,
percentile report shape (reference bench/dataclasses/reporting.py)."""

import json

import numpy as np
import pytest

from tensorrt_llm_tpu.commands.bench import (load_dataset, run_latency,
                                             run_throughput,
                                             synthetic_requests)
from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position=128)


@pytest.fixture(scope="module")
def llm():
    llm = LLM(model=ModelConfig(**TINY), skip_tokenizer_init=True,
              max_seq_len=64, max_batch_size=4, kv_num_blocks=128,
              kv_block_size=8)
    yield llm
    llm.shutdown()


def test_throughput_report_and_concurrency(llm):
    reqs = synthetic_requests(8, 6, 10, TINY["vocab_size"])
    # track max simultaneous in-flight via executor submission hook
    active = [0]
    peak = [0]
    orig = llm.generate_async

    def tracked(*a, **kw):
        fut = orig(*a, **kw)
        active[0] += 1
        peak[0] = max(peak[0], active[0])
        q = fut.req.out_queue

        class Wrap:
            def get(self, *ga, **gk):
                piece = q.__class__.get(q, *ga, **gk)
                if piece.finished:
                    active[0] -= 1
                return piece
        return fut
    llm.generate_async = tracked
    try:
        rep = run_throughput(llm, reqs, concurrency=3, warmup=False)
    finally:
        llm.generate_async = orig
    assert rep["output_tokens"] == 60
    assert rep["concurrency"] == 3
    assert rep["output_tokens_per_sec"] > 0
    assert rep["output_tokens_per_sec_per_chip"] > 0
    for key in ("ttft_ms", "tpot_ms", "itl_ms", "request_latency_ms"):
        stats = rep[key]
        assert stats is None or {"avg", "p50", "p99"} <= set(stats)
    # with window=3 and 10 requests the scheduler can never see >3 at once:
    # TTFT of late requests must not include the whole early batch's decode
    assert rep["ttft_ms"]["p99"] < rep["wall_s"] * 1e3


def test_concurrency_window_bounds_inflight(llm):
    """Direct check: submissions beyond the window wait for completions."""
    import threading
    reqs = synthetic_requests(8, 8, 6, TINY["vocab_size"])
    seen = []
    orig = llm.generate_async
    lock = threading.Lock()
    live = set()

    def tracked(prompt, sp=None, **kw):
        fut = orig(prompt, sp, **kw)
        with lock:
            live.add(fut.req.request_id)
            seen.append(len(live))
        res = fut.result

        def result(*a, **k):
            out = res(*a, **k)
            with lock:
                live.discard(fut.req.request_id)
            return out
        fut.result = result
        return fut
    llm.generate_async = tracked
    try:
        run_throughput(llm, reqs, concurrency=2, warmup=False)
    finally:
        llm.generate_async = orig
    assert max(seen) <= 2, seen


def test_latency_mode(llm):
    reqs = synthetic_requests(4, 5, 3, TINY["vocab_size"])
    rep = run_latency(llm, reqs, warmup=True)
    assert rep["mode"] == "latency"
    assert rep["num_requests"] == 3
    assert rep["tpot_ms"] and rep["tpot_ms"]["avg"] > 0
    assert rep["itl_ms"] and rep["itl_ms"]["p50"] > 0


def test_dataset_file(tmp_path, llm):
    path = tmp_path / "ds.jsonl"
    with open(path, "w") as f:
        for i in range(5):
            f.write(json.dumps({"input_ids": [1, 2, 3, 4 + i],
                                "output_tokens": 4}) + "\n")
    rows = load_dataset(str(path), None)
    assert len(rows) == 5 and rows[0] == ([1, 2, 3, 4], 4)
    rows2 = load_dataset(str(path), None, max_requests=2)
    assert len(rows2) == 2
    rep = run_throughput(llm, rows, concurrency=2, warmup=False)
    assert rep["output_tokens"] == 20


def test_gpt_oss_preset_config_path(tmp_path, monkeypatch):
    """The gpt-oss-20b preset rides the hf_config-dir path: validate the
    exact mechanism (config.json -> from_hf_config -> GptOss model ->
    bench run) at a downsized copy of the same config."""
    import json
    from tensorrt_llm_tpu.commands import bench

    small = dict(bench.MODEL_SHAPES["gpt-oss-20b"]["hf_config"])
    small.update(hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, num_key_value_heads=2, head_dim=32,
                 intermediate_size=64, num_local_experts=4,
                 num_experts_per_tok=2, vocab_size=256,
                 sliding_window=16, layer_types=["sliding_attention",
                                                 "full_attention"],
                 max_position_embeddings=256)
    small["rope_scaling"] = dict(small["rope_scaling"],
                                 original_max_position_embeddings=32)
    monkeypatch.setitem(bench.MODEL_SHAPES, "gpt-oss-20b",
                        {"quant_group_size": 32, "hf_config": small})
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main(["throughput", "--model", "gpt-oss-20b",
                    "--quant", "W4A16", "--isl", "8", "--osl", "8",
                    "--num-requests", "2", "--concurrency", "2",
                    "--max-batch-size", "2", "--max-seq-len", "64"])
    out = buf.getvalue()
    report = json.loads(out[out.index("{"):])
    assert report["output_tokens"] == 16
