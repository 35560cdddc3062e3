"""Async stop-string scan worker (reference postproc_worker.py:52 analog):
tokenizer work must leave the executor thread, stop-string requests must
ride fused decode chunks, and results must match the synchronous scan."""

import threading

import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256)


class RecordingTokenizer:
    """CharTokenizer that records which THREAD called decode."""
    eos_token_id = 0
    bos_token_id = None
    chat_template = None

    def __init__(self):
        self.decode_threads = set()

    def encode(self, text):
        return [max(1, ord(c) % 256) for c in text] or [1]

    def decode(self, ids, skip_special_tokens=True):
        self.decode_threads.add(threading.current_thread().name)
        return "".join(chr(i) if 0 < i < 128 else "?" for i in ids)


@pytest.fixture(scope="module")
def llm():
    llm = LLM(model=ModelConfig(**TINY), tokenizer=RecordingTokenizer(),
              max_seq_len=128, max_batch_size=8, kv_num_blocks=128,
              kv_block_size=8)
    yield llm
    llm.shutdown()


def _greedy(llm, prompt, **kw):
    return llm.generate(prompt, SamplingParams(
        max_tokens=24, temperature=0.0, ignore_eos=True, **kw))[0].outputs[0]


def test_async_scan_matches_sync(llm):
    """Final output of the async (worker) scan == synchronous scan."""
    probe = _greedy(llm, "hello")
    stop = probe.text[2:5]
    assert stop
    a = _greedy(llm, "hello", stop=[stop])
    ex = llm.executor
    # force the synchronous path and regenerate
    saved, ex._stop_scan = ex._stop_scan, None
    try:
        b = _greedy(llm, "hello", stop=[stop])
    finally:
        ex._stop_scan = saved
    assert a.finish_reason == b.finish_reason == "stop_string"
    assert a.text == b.text
    assert stop not in a.text


def test_no_decode_on_executor_thread(llm):
    probe = _greedy(llm, "world")
    stop = probe.text[1:4]
    llm.tokenizer.decode_threads.clear()
    out = _greedy(llm, "world", stop=[stop])
    assert out.finish_reason == "stop_string"
    assert not any("tllm-tpu-executor" in t
                   for t in llm.tokenizer.decode_threads), \
        llm.tokenizer.decode_threads


def test_stop_requests_ride_fused_decode(llm):
    """With the worker on, stop strings must not force k=1 decode."""
    sp = SamplingParams(max_tokens=16, ignore_eos=True, stop=["xyz"])
    assert not llm.executor._needs_host_controls(sp)
    saved, llm.executor._stop_scan = llm.executor._stop_scan, None
    try:
        assert llm.executor._needs_host_controls(sp)
    finally:
        llm.executor._stop_scan = saved


def test_stop_across_token_boundary(llm):
    """Each token is one char here, so any multi-char stop string spans
    token boundaries; the worker must still find it and truncate."""
    probe = _greedy(llm, "abc")
    stop = probe.text[3:7]
    out = _greedy(llm, "abc", stop=[stop])
    assert out.finish_reason == "stop_string"
    assert stop not in out.text
    # token list truncated in lockstep with the text
    assert len(out.token_ids) <= len(probe.token_ids)


def test_streaming_truncates_async_overshoot(llm):
    probe = _greedy(llm, "stream")
    stop = probe.text[2:5]
    fut = llm.generate_async("stream", SamplingParams(
        max_tokens=24, temperature=0.0, ignore_eos=True, stop=[stop]),
        streaming=True)
    final = None
    for out in fut:
        final = out
    assert final.finished
    assert stop not in final.outputs[0].text


def test_stop_beats_length_in_same_fused_chunk(llm):
    """A stop string completing EARLIER in the fused chunk in which the
    request also hits max_tokens must win (the synchronous scan checks
    every token) — finish_reason 'length' + leaked stop text is the ADVICE
    r4 divergence."""
    probe = _greedy(llm, "chunk")
    # stop completes at output token 5 (1 char per token); max_tokens puts
    # the LENGTH finish 2 tokens later, inside the same fused chunk (k<=4)
    stop = probe.text[2:5]
    assert stop
    sync_saved, sync = llm.executor._stop_scan, None
    outs = {}
    for mode in ("async", "sync"):
        if mode == "sync":
            llm.executor._stop_scan = sync
        try:
            outs[mode] = llm.generate("chunk", SamplingParams(
                max_tokens=7, temperature=0.0, ignore_eos=True,
                stop=[stop]))[0].outputs[0]
        finally:
            llm.executor._stop_scan = sync_saved
    a, b = outs["async"], outs["sync"]
    assert b.finish_reason == "stop_string"
    assert a.finish_reason == "stop_string", \
        f"async diverged: {a.finish_reason!r} text={a.text!r}"
    assert a.text == b.text and a.token_ids == b.token_ids
    assert stop not in a.text


def test_scan_respects_skip_special_tokens():
    """The scan must render text with the request's skip_special_tokens
    mode: a stop string spanning a special token only matches when the
    request keeps special tokens (ADVICE r4)."""
    import time
    from tensorrt_llm_tpu.runtime.postproc import StopScanWorker

    class SpecialTok:
        eos_token_id = 0
        supports_incremental_decode = False

        def decode(self, ids, skip_special_tokens=True):
            out = []
            for i in ids:
                if i == 99:          # the special token
                    if not skip_special_tokens:
                        out.append("<s>")
                else:
                    out.append(chr(i))
            return "".join(out)

    toks = [ord("a"), 99, ord("b")]
    w = StopScanWorker(SpecialTok())
    try:
        w.feed(1, ["a<s>b"], toks, skip_special_tokens=False)
        w.feed(2, ["a<s>b"], toks, skip_special_tokens=True)
        w.feed(3, ["ab"], toks, skip_special_tokens=True)
        assert w.flush()
        hits = w.poll()
        assert 1 in hits and hits[1][1] == "a<s>b"
        assert 2 not in hits
        assert 3 in hits
    finally:
        w.close()
