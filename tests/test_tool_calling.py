"""Tool-call parsing + /v1/responses (reference serve/tool_parser/,
serve/harmony_adapter.py, openai_server.py:273-279)."""

import json

import pytest

from tensorrt_llm_tpu.serve.tool_parser import (
    DeepSeekV31Parser, DeepSeekV32Parser, DeepSeekV3ToolParser,
    HarmonyParser, KimiK2ToolParser, Qwen3CoderParser, Qwen3ToolParser,
    get_tool_parser)


# ---------------------------------------------------------------- qwen3 ----
QWEN_ONE = ('I will check the weather.\n<tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "Tokyo"}}\n'
            '</tool_call>')
QWEN_TWO = (QWEN_ONE + '\n<tool_call>\n'
            '{"name": "get_time", "arguments": {"tz": "JST"}}\n'
            '</tool_call>')


def test_qwen3_single_call():
    text, calls = Qwen3ToolParser().parse(QWEN_ONE)
    assert text.strip() == "I will check the weather."
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Tokyo"}


def test_qwen3_multiple_calls():
    _, calls = Qwen3ToolParser().parse(QWEN_TWO)
    assert [c.name for c in calls] == ["get_weather", "get_time"]


def test_qwen3_no_call():
    text, calls = Qwen3ToolParser().parse("just words < not a tag >")
    assert calls == []
    assert text == "just words < not a tag >"


def test_qwen3_streaming_split_marker():
    """Begin/end markers split across arbitrary chunk boundaries."""
    p = Qwen3ToolParser()
    text_out, calls = "", []
    for i in range(0, len(QWEN_ONE), 3):  # 3-char chunks
        ev = p.feed(QWEN_ONE[i:i + 3])
        text_out += ev.text
        calls += ev.calls
    tail = p.flush()
    text_out += tail.text
    calls += tail.calls
    assert text_out.strip() == "I will check the weather."
    assert len(calls) == 1 and calls[0].name == "get_weather"
    # no partial marker ever leaked into the text
    assert "<tool_call" not in text_out


def test_qwen3_unterminated_block_flush():
    p = Qwen3ToolParser()
    p.feed('<tool_call>\n{"name": "f", "arguments": {}}')
    ev = p.flush()
    assert len(ev.calls) == 1 and ev.calls[0].name == "f"


# ------------------------------------------------------------- deepseek ----
DSV3 = ("Let me look that up.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>"
        "function<｜tool▁sep｜>get_weather\n```json\n"
        '{"location": "Paris"}\n```<｜tool▁call▁end｜>'
        "<｜tool▁calls▁end｜><｜end▁of▁sentence｜>")


def test_deepseek_parse():
    text, calls = DeepSeekV3ToolParser().parse(DSV3)
    assert text.strip() == "Let me look that up."
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"location": "Paris"}


def test_deepseek_streaming():
    p = DeepSeekV3ToolParser()
    text_out, calls = "", []
    for i in range(0, len(DSV3), 5):
        ev = p.feed(DSV3[i:i + 5])
        text_out += ev.text
        calls += ev.calls
    tail = p.flush()
    text_out, calls = text_out + tail.text, calls + tail.calls
    assert text_out.strip() == "Let me look that up."
    assert len(calls) == 1 and calls[0].name == "get_weather"
    assert "tool▁" not in text_out


# -------------------------------------------------------------- harmony ----
HARMONY = ("<|channel|>analysis<|message|>User wants weather; I should call "
           "the function.<|end|><|start|>assistant<|channel|>commentary "
           "to=functions.get_weather <|constrain|>json<|message|>"
           '{"city": "Oslo"}<|call|>')
HARMONY_FINAL = ("<|channel|>analysis<|message|>thinking...<|end|>"
                 "<|start|>assistant<|channel|>final<|message|>"
                 "The weather is sunny.<|return|>")


def test_harmony_tool_call():
    ev = HarmonyParser().parse_full(HARMONY)
    assert "call the function" in ev.reasoning
    assert ev.text == ""
    assert len(ev.calls) == 1
    assert ev.calls[0].name == "get_weather"
    assert json.loads(ev.calls[0].arguments) == {"city": "Oslo"}


def test_harmony_final_channel():
    ev = HarmonyParser().parse_full(HARMONY_FINAL)
    assert ev.reasoning == "thinking..."
    assert ev.text == "The weather is sunny."
    assert ev.calls == []


def test_harmony_streaming_chunked():
    p = HarmonyParser()
    text, reasoning, calls = "", "", []
    for i in range(0, len(HARMONY_FINAL), 4):
        ev = p.feed(HARMONY_FINAL[i:i + 4])
        text += ev.text
        reasoning += ev.reasoning
        calls += ev.calls
    tail = p.flush()
    text += tail.text
    reasoning += tail.reasoning
    assert text == "The weather is sunny."
    assert reasoning == "thinking..."
    assert "<|" not in text


def test_factory():
    assert isinstance(get_tool_parser("qwen3"), Qwen3ToolParser)
    assert isinstance(get_tool_parser("gpt_oss"), HarmonyParser)
    assert isinstance(get_tool_parser("deepseek_v31"), DeepSeekV31Parser)
    assert isinstance(get_tool_parser("deepseek_v32"), DeepSeekV32Parser)
    assert isinstance(get_tool_parser("kimi_k2"), KimiK2ToolParser)
    assert isinstance(get_tool_parser("qwen3_coder"), Qwen3CoderParser)
    assert get_tool_parser(None) is None
    with pytest.raises(ValueError):
        get_tool_parser("nope")


# --------------------------------------------------- deepseek v3.1/v3.2 ----
DSV31 = ("Checking.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>get_weather"
         '<｜tool▁sep｜>{"location": "Tokyo"}<｜tool▁call▁end｜>'
         "<｜tool▁call▁begin｜>get_time"
         '<｜tool▁sep｜>{"tz": "JST"}<｜tool▁call▁end｜>'
         "<｜tool▁calls▁end｜><｜end▁of▁sentence｜>")

DSV32_XML = ("On it.<｜DSML｜function_calls>"
             '<｜DSML｜invoke name="get_spot">'
             '<｜DSML｜parameter name="city" string="true">San Francisco'
             "</｜DSML｜parameter>"
             '<｜DSML｜parameter name="limit" string="false">3'
             "</｜DSML｜parameter>"
             "</｜DSML｜invoke></｜DSML｜function_calls>")

DSV32_JSON = ("<｜DSML｜function_calls>"
              '<｜DSML｜invoke name="get_spot">'
              '{"city": "Oslo"}'
              "</｜DSML｜invoke></｜DSML｜function_calls>")


def test_deepseek_v31_parse():
    text, calls = DeepSeekV31Parser().parse(DSV31)
    assert text.strip() == "Checking."
    assert [c.name for c in calls] == ["get_weather", "get_time"]
    assert json.loads(calls[0].arguments) == {"location": "Tokyo"}
    assert json.loads(calls[1].arguments) == {"tz": "JST"}


def test_deepseek_v32_xml_params():
    text, calls = DeepSeekV32Parser().parse(DSV32_XML)
    assert text.strip() == "On it."
    assert len(calls) == 1 and calls[0].name == "get_spot"
    assert json.loads(calls[0].arguments) == {"city": "San Francisco",
                                              "limit": 3}


def test_deepseek_v32_json_body():
    text, calls = DeepSeekV32Parser().parse(DSV32_JSON)
    assert text == ""
    assert len(calls) == 1 and calls[0].name == "get_spot"
    assert json.loads(calls[0].arguments) == {"city": "Oslo"}


def test_deepseek_v32_streaming():
    p = DeepSeekV32Parser()
    text, calls = "", []
    for i in range(0, len(DSV32_XML), 7):
        ev = p.feed(DSV32_XML[i:i + 7])
        text += ev.text
        calls += ev.calls
    tail = p.flush()
    text, calls = text + tail.text, calls + tail.calls
    assert text.strip() == "On it."
    assert len(calls) == 1 and "DSML" not in text


# ------------------------------------------------------------- kimi k2 ----
KIMI = ("Sure.<|tool_calls_section_begin|>"
        "<|tool_call_begin|>functions.search:0<|tool_call_argument_begin|>"
        '{"q": "tpu"}<|tool_call_end|>'
        "<|tool_call_begin|>functions.fetch:1<|tool_call_argument_begin|>"
        '{"url": "x"}<|tool_call_end|>'
        "<|tool_calls_section_end|>")


def test_kimi_k2_parse():
    text, calls = KimiK2ToolParser().parse(KIMI)
    assert text.strip() == "Sure."
    assert [c.name for c in calls] == ["search", "fetch"]
    assert json.loads(calls[0].arguments) == {"q": "tpu"}


def test_kimi_k2_streaming():
    p = KimiK2ToolParser()
    text, calls = "", []
    for i in range(0, len(KIMI), 6):
        ev = p.feed(KIMI[i:i + 6])
        text += ev.text
        calls += ev.calls
    tail = p.flush()
    text, calls = text + tail.text, calls + tail.calls
    assert text.strip() == "Sure."
    assert len(calls) == 2 and "tool_call" not in text


# --------------------------------------------------------- qwen3 coder ----
QCODER = ("Running it now.\n<tool_call>\n<function=execute_bash>\n"
          "<parameter=command>\npwd && ls\n</parameter>\n"
          "<parameter=timeout>\n30\n</parameter>\n"
          "</function>\n</tool_call>")


def test_qwen3_coder_parse():
    text, calls = Qwen3CoderParser().parse(QCODER)
    assert text.strip() == "Running it now."
    assert len(calls) == 1 and calls[0].name == "execute_bash"
    args = json.loads(calls[0].arguments)
    assert args["command"] == "pwd && ls"   # non-JSON value stays a string
    assert args["timeout"] == 30            # JSON-coercible value is typed


def test_qwen3_coder_streaming():
    p = Qwen3CoderParser()
    text, calls = "", []
    for i in range(0, len(QCODER), 9):
        ev = p.feed(QCODER[i:i + 9])
        text += ev.text
        calls += ev.calls
    tail = p.flush()
    text, calls = text + tail.text, calls + tail.calls
    assert text.strip() == "Running it now."
    assert len(calls) == 1 and calls[0].name == "execute_bash"


# ------------------------------------------------------- server level ------
TOOLS = [{"type": "function", "function": {
    "name": "get_weather", "description": "weather lookup",
    "parameters": {"type": "object",
                   "properties": {"city": {"type": "string"}},
                   "required": ["city"]}}}]


class ScriptedTokenizer:
    """decode() replays a fixed script so a random tiny model 'emits'
    tool-call markup deterministically."""
    eos_token_id = 0
    chat_template = None
    # decode() here is position-based (len(ids) -> script prefix), not
    # suffix-consistent like a real tokenizer — opt out of the
    # incremental streaming detokenizer
    supports_incremental_decode = False

    def __init__(self, script):
        self.script = script

    def encode(self, text):
        return [1 + (i % 100) for i in range(8)]

    def decode(self, ids, skip_special_tokens=True):
        # len(ids) grows as decode proceeds; map progress to script chars
        # (ceil so the 8th token reveals the whole script)
        per = -(-len(self.script) // 8)
        return self.script[:len(ids) * per]

    def apply_chat_template(self, msgs, tokenize=False,
                            add_generation_prompt=True, tools=None):
        return "\n".join(str(m.get("content")) for m in msgs)


@pytest.fixture(scope="module")
def tool_server():
    import asyncio
    from aiohttp.test_utils import TestClient, TestServer

    from tensorrt_llm_tpu.llmapi import LLM
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      max_position=256)
    llm = LLM(model=cfg, tokenizer=ScriptedTokenizer(QWEN_ONE),
              max_seq_len=128, max_batch_size=8, kv_num_blocks=128,
              kv_block_size=8)
    server = OpenAIServer(llm, "tiny", tool_parser="qwen3")
    loop = asyncio.new_event_loop()
    tc = TestClient(TestServer(server.app, loop=loop), loop=loop)
    loop.run_until_complete(tc.start_server())
    yield tc, loop
    loop.run_until_complete(tc.close())
    loop.close()
    llm.shutdown()


def test_chat_tool_calls_nonstreaming(tool_server):
    tc, loop = tool_server
    r = loop.run_until_complete(tc.post("/v1/chat/completions", json={
        "model": "tiny", "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 8, "ignore_eos": True, "tools": TOOLS}))
    assert r.status == 200
    body = loop.run_until_complete(r.json())
    msg = body["choices"][0]["message"]
    assert msg["tool_calls"][0]["function"]["name"] == "get_weather"
    assert json.loads(msg["tool_calls"][0]["function"]["arguments"]) == \
        {"city": "Tokyo"}
    assert body["choices"][0]["finish_reason"] == "tool_calls"


def test_chat_tool_calls_streaming(tool_server):
    tc, loop = tool_server

    async def run():
        r = await tc.post("/v1/chat/completions", json={
            "model": "tiny", "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 8, "ignore_eos": True, "stream": True,
            "tools": TOOLS})
        assert r.status == 200
        return (await r.read()).decode()

    text = loop.run_until_complete(run())
    datas = [json.loads(l[6:]) for l in text.splitlines()
             if l.startswith("data: ") and l != "data: [DONE]"]
    deltas = [d["choices"][0]["delta"] for d in datas]
    tc_deltas = [d for d in deltas if "tool_calls" in d]
    assert tc_deltas, f"no tool_calls delta in stream: {deltas}"
    assert tc_deltas[0]["tool_calls"][0]["function"]["name"] == "get_weather"
    finishes = [d["choices"][0].get("finish_reason") for d in datas]
    assert "tool_calls" in finishes
    # content deltas must never leak tool markup
    content = "".join(d.get("content", "") for d in deltas)
    assert "<tool_call" not in content


def test_chat_without_tools_unaffected(tool_server):
    tc, loop = tool_server
    r = loop.run_until_complete(tc.post("/v1/chat/completions", json={
        "model": "tiny", "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4, "ignore_eos": True}))
    body = loop.run_until_complete(r.json())
    msg = body["choices"][0]["message"]
    assert "tool_calls" not in msg  # parser only runs when tools present


def test_responses_api(tool_server):
    tc, loop = tool_server
    r = loop.run_until_complete(tc.post("/v1/responses", json={
        "model": "tiny", "input": "what's the weather",
        "max_output_tokens": 8, "ignore_eos": True}))
    assert r.status == 200
    body = loop.run_until_complete(r.json())
    assert body["object"] == "response"
    assert body["status"] == "completed"
    kinds = [o["type"] for o in body["output"]]
    assert "message" in kinds
    assert body["usage"]["output_tokens"] == 8


def test_responses_streaming(tool_server):
    tc, loop = tool_server

    async def run():
        r = await tc.post("/v1/responses", json={
            "model": "tiny", "input": "hello", "max_output_tokens": 6,
            "stream": True, "ignore_eos": True})
        assert r.status == 200
        return (await r.read()).decode()

    text = loop.run_until_complete(run())
    assert "response.created" in text
    assert "response.output_text.delta" in text
    assert "response.completed" in text


# ------------------------------------------------------ reasoning parser ----

R1_TEXT = "Let me think step by step.</think>The answer is 42."


def test_reasoning_parser_r1_at_start():
    from tensorrt_llm_tpu.serve.reasoning_parser import get_reasoning_parser
    d = get_reasoning_parser("deepseek-r1").parse_full(R1_TEXT)
    assert d.reasoning == "Let me think step by step."
    assert d.content == "The answer is 42."


def test_reasoning_parser_qwen3_tags():
    from tensorrt_llm_tpu.serve.reasoning_parser import get_reasoning_parser
    d = get_reasoning_parser("qwen3").parse_full(
        "pre <think>hidden</think> post")
    assert d.reasoning == "hidden"
    assert d.content == "pre  post"


def test_reasoning_parser_streaming_split_tags():
    """Tags split across arbitrary chunk boundaries never leak."""
    from tensorrt_llm_tpu.serve.reasoning_parser import get_reasoning_parser
    for chunk in (1, 3, 7):
        p = get_reasoning_parser("deepseek-r1")
        content = reasoning = ""
        for i in range(0, len(R1_TEXT), chunk):
            d = p.feed(R1_TEXT[i:i + chunk])
            content += d.content
            reasoning += d.reasoning
        tail = p.flush()
        content += tail.content
        reasoning += tail.reasoning
        assert content == "The answer is 42.", (chunk, content)
        assert reasoning == "Let me think step by step.", (chunk, reasoning)
        assert "</think" not in content + reasoning


def test_reasoning_parser_unterminated_flush():
    from tensorrt_llm_tpu.serve.reasoning_parser import get_reasoning_parser
    p = get_reasoning_parser("deepseek-r1")
    d1 = p.feed("still thinking")
    tail = p.flush()
    assert d1.reasoning + tail.reasoning == "still thinking"
    assert d1.content + tail.content == ""


@pytest.fixture(scope="module")
def reasoning_server():
    import asyncio
    from aiohttp.test_utils import TestClient, TestServer

    from tensorrt_llm_tpu.llmapi import LLM
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                      max_position=256)
    llm = LLM(model=cfg, tokenizer=ScriptedTokenizer(R1_TEXT),
              max_seq_len=128, max_batch_size=8, kv_num_blocks=128,
              kv_block_size=8)
    server = OpenAIServer(llm, "tiny", reasoning_parser="deepseek-r1")
    loop = asyncio.new_event_loop()
    tc = TestClient(TestServer(server.app, loop=loop), loop=loop)
    loop.run_until_complete(tc.start_server())
    yield tc, loop
    loop.run_until_complete(tc.close())
    loop.close()
    llm.shutdown()


def test_chat_reasoning_nonstreaming(reasoning_server):
    tc, loop = reasoning_server
    r = loop.run_until_complete(tc.post("/v1/chat/completions", json={
        "model": "tiny", "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 8, "ignore_eos": True}))
    assert r.status == 200
    body = loop.run_until_complete(r.json())
    msg = body["choices"][0]["message"]
    assert msg["reasoning_content"] == "Let me think step by step."
    assert msg["content"] == "The answer is 42."


def test_chat_reasoning_streaming(reasoning_server):
    tc, loop = reasoning_server

    async def run():
        r = await tc.post("/v1/chat/completions", json={
            "model": "tiny", "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 8, "ignore_eos": True, "stream": True})
        assert r.status == 200
        return (await r.read()).decode()

    text = loop.run_until_complete(run())
    datas = [json.loads(l[6:]) for l in text.splitlines()
             if l.startswith("data: ") and l != "data: [DONE]"]
    deltas = [d["choices"][0]["delta"] for d in datas]
    reasoning = "".join(d.get("reasoning_content", "") for d in deltas)
    content = "".join(d.get("content", "") for d in deltas)
    assert reasoning == "Let me think step by step."
    assert content == "The answer is 42."
    assert "</think" not in content


# ------------------------------------------------ multimodal chat parts ----

def test_chat_image_url_content_parts():
    """OpenAI image_url data: URLs decode into the multimodal prompt path
    (reference serve/chat_utils.py content-part parsing)."""
    import asyncio
    import base64
    import io

    import numpy as np
    from aiohttp.test_utils import TestClient, TestServer

    from tensorrt_llm_tpu.llmapi import LLM
    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig
    from tensorrt_llm_tpu.serve.openai_server import OpenAIServer

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    class MMTokenizer:
        eos_token_id = 0
        chat_template = None

        def encode(self, text):
            ids = []
            while text:
                if text.startswith("<image>"):
                    ids.append(60)
                    text = text[7:]
                else:
                    ids.append(1 + (ord(text[0]) % 50))
                    text = text[1:]
            return ids

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=128,
        architecture="LlavaLlamaModel", tie_word_embeddings=False,
        extra={"vision_tower_cfg": {"hidden_size": 16,
                                    "num_hidden_layers": 2,
                                    "num_attention_heads": 2,
                                    "intermediate_size": 32,
                                    "image_size": 28, "patch_size": 14},
               "mm_projector_cfg": {"mm_projector_type": "mlp_downsample"},
               "mm_hidden_size": 16,
               "image_token_index": 60})
    llm = LLM(model=cfg, tokenizer=MMTokenizer(), max_seq_len=128,
              max_batch_size=4, kv_num_blocks=64, kv_block_size=8, seed=0)
    server = OpenAIServer(llm, "tiny-vlm")
    loop = asyncio.new_event_loop()
    tc = TestClient(TestServer(server.app, loop=loop), loop=loop)
    loop.run_until_complete(tc.start_server())
    try:
        img = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (28, 28, 3),
                                             dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        data_url = ("data:image/png;base64,"
                    + base64.b64encode(buf.getvalue()).decode())

        body = {"model": "tiny-vlm", "max_tokens": 4, "ignore_eos": True,
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "hi"},
                    {"type": "image_url", "image_url": {"url": data_url}},
                ]}]}
        r = loop.run_until_complete(tc.post("/v1/chat/completions",
                                            json=body))
        assert r.status == 200, loop.run_until_complete(r.text())
        out = loop.run_until_complete(r.json())
        assert out["choices"][0]["message"]["content"]
        assert out["usage"]["completion_tokens"] == 4

        # remote URLs are rejected (zero-egress deployment)
        bad = dict(body)
        bad["messages"] = [{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": "https://example.com/x.png"}}]}]
        r2 = loop.run_until_complete(tc.post("/v1/chat/completions",
                                             json=bad))
        assert r2.status == 400
    finally:
        loop.run_until_complete(tc.close())
        loop.close()
        llm.shutdown()
