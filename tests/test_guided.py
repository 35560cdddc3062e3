"""Guided decoding (choice matcher) tests."""

import numpy as np
import pytest

from tensorrt_llm_tpu.llmapi import LLM, SamplingParams
from tensorrt_llm_tpu.llmapi.sampling_params import GuidedDecodingParams
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position=256)


class CharTokenizer:
    eos_token_id = 0
    bos_token_id = None
    chat_template = None

    def encode(self, text):
        return [max(1, ord(c) % 256) for c in text] or [1]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(i) if 0 < i < 128 else "" for i in ids)


@pytest.fixture(scope="module")
def llm():
    llm = LLM(model=ModelConfig(**TINY), tokenizer=CharTokenizer(),
              max_seq_len=128, max_batch_size=8, kv_num_blocks=128,
              kv_block_size=8)
    yield llm
    llm.shutdown()


def test_choice_constrained_output(llm):
    choices = ["yes", "no"]
    out = llm.generate(
        "anything",
        SamplingParams(max_tokens=10, temperature=1.0,
                       guided_decoding=GuidedDecodingParams(choice=choices)))[0]
    text = out.outputs[0].text
    assert text in choices, text
    assert out.outputs[0].finish_reason == "stop"


def test_choice_greedy(llm):
    choices = ["abc", "abd", "xyz"]
    out = llm.generate(
        "q", SamplingParams(max_tokens=10, temperature=0.0,
                            guided_decoding=GuidedDecodingParams(
                                choice=choices)))[0]
    assert out.outputs[0].text in choices


def test_unguided_unaffected(llm):
    out = llm.generate("hello", SamplingParams(max_tokens=5, ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 5


def test_regex_constrained_output(llm):
    """Regex DFA constraint (xgrammar-class capability rebuilt in
    runtime/regex_fsm.py): output must match the pattern exactly."""
    import re
    pattern = r"(yes|no) [0-9]{2}"
    out = llm.generate(
        "q", SamplingParams(max_tokens=12, temperature=1.0,
                            guided_decoding=GuidedDecodingParams(
                                regex=pattern)))[0]
    text = out.outputs[0].text
    assert re.fullmatch(pattern, text), text
    assert out.outputs[0].finish_reason == "stop"


def test_json_schema_constrained_output(llm):
    import json
    schema = {"type": "object",
              "properties": {"ok": {"type": "boolean"},
                             "n": {"type": "integer"}},
              "required": ["ok", "n"]}
    out = llm.generate(
        "q", SamplingParams(max_tokens=40, temperature=1.0,
                            guided_decoding=GuidedDecodingParams(
                                json=schema)))[0]
    obj = json.loads(out.outputs[0].text)
    assert isinstance(obj["ok"], bool) and isinstance(obj["n"], int), obj


def test_json_schema_optional_properties(llm):
    """Without `required`, properties are omissible (xgrammar semantics:
    every property optional) — but whatever IS emitted must parse and
    type-check against the schema."""
    import json
    schema = {"type": "object",
              "properties": {"ok": {"type": "boolean"},
                             "n": {"type": "integer"}}}
    for seed in range(3):
        out = llm.generate(
            "q", SamplingParams(max_tokens=40, temperature=1.0, seed=seed,
                                guided_decoding=GuidedDecodingParams(
                                    json=schema)))[0]
        obj = json.loads(out.outputs[0].text)
        assert set(obj) <= {"ok", "n"}, obj
        if "ok" in obj:
            assert isinstance(obj["ok"], bool), obj
        if "n" in obj:
            assert isinstance(obj["n"], int), obj


def test_json_object_constrained_output(llm):
    import json
    from tensorrt_llm_tpu.runtime.regex_fsm import DFA, json_schema_to_regex
    out = llm.generate(
        "q", SamplingParams(max_tokens=60, temperature=1.0, seed=1,
                            guided_decoding=GuidedDecodingParams(
                                json_object=True)))[0]
    text = out.outputs[0].text
    if out.outputs[0].finish_reason == "stop":
        json.loads(text)  # grammar-complete => valid JSON
    else:
        # max_tokens hit mid-grammar: the PREFIX must still be extendable
        # to a valid JSON value (every emitted token kept the DFA alive)
        dfa = DFA(json_schema_to_regex({}))
        assert dfa.walk(dfa.start, text) >= 0, text


def test_regex_enum_greedy(llm):
    out = llm.generate(
        "q", SamplingParams(max_tokens=10, temperature=0.0,
                            guided_decoding=GuidedDecodingParams(
                                regex=r"(red|green|blue)")))[0]
    assert out.outputs[0].text in ("red", "green", "blue")


def test_grammar_pda_context_free():
    """The PDA handles unbounded nesting — beyond any regex."""
    from tensorrt_llm_tpu.runtime.grammar_fsm import GrammarPDA
    pda = GrammarPDA('root ::= "(" root ")" | "x"')
    assert pda.matches("x")
    assert pda.matches("(x)")
    assert pda.matches("((((x))))")
    assert not pda.matches("((x)")
    assert not pda.matches("(x))")
    assert not pda.matches("")


def test_grammar_pda_gbnf_features():
    from tensorrt_llm_tpu.runtime.grammar_fsm import GrammarPDA
    g = r'''
    # a tiny JSON-ish object grammar
    root  ::= "{" (pair ("," pair)*)? "}"
    pair  ::= string ":" value
    string ::= "\"" [a-z]+ "\""
    value ::= string | number | root
    number ::= "-"? [0-9]+
    '''
    pda = GrammarPDA(g)
    assert pda.matches('{}')
    assert pda.matches('{"a":1}')
    assert pda.matches('{"a":-42,"b":"xy"}')
    assert pda.matches('{"a":{"b":{"c":7}}}')   # nesting
    assert not pda.matches('{"a":}')
    assert not pda.matches('{"a":1,}')
    assert not pda.matches('{"A":1}')           # uppercase not in class


def test_grammar_quantifiers():
    from tensorrt_llm_tpu.runtime.grammar_fsm import GrammarPDA
    pda = GrammarPDA('root ::= "a"{2,3} "b"+ "c"?')
    assert pda.matches("aab")
    assert pda.matches("aaabbbc")
    assert not pda.matches("ab")
    assert not pda.matches("aaaab")


def test_grammar_constrained_output(llm):
    """EBNF-guided generation: sampled text must parse under the grammar."""
    from tensorrt_llm_tpu.runtime.grammar_fsm import GrammarPDA
    g = 'root ::= "(" root ")" | "ok"'
    out = llm.generate(
        "q", SamplingParams(max_tokens=16, temperature=1.0,
                            guided_decoding=GuidedDecodingParams(
                                grammar=g)))[0]
    text = out.outputs[0].text
    assert GrammarPDA(g).matches(text), text
    assert out.outputs[0].finish_reason == "stop"


# --------------------------------------------------- structural tags --------
# xgrammar-style structural tags (reference GuidedDecodingParams
# .structural_tag): free text until a trigger, then begin+schema+end.

STAG = {
    "triggers": ["<f="],
    "structures": [{
        "begin": "<f=get>",
        "schema": {"type": "object",
                   "properties": {"q": {"type": "string"}},
                   "required": ["q"]},
        "end": "</f>",
    }],
}


def _stag_matcher():
    from tensorrt_llm_tpu.runtime.guided_decoder import StructuralTagMatcher
    return StructuralTagMatcher(STAG, CharTokenizer(), eos_token_id=0,
                                vocab_size=256)


def _feed_str(m, s):
    for ch in s:
        tid = max(1, ord(ch) % 256)
        assert m.advance(tid), (ch, s)


def test_structural_tag_free_until_trigger():
    m = _stag_matcher()
    assert m.allowed_tokens() is None          # free mode: no mask
    assert m.completed                          # may stop any time
    _feed_str(m, "let me call ")
    assert m.allowed_tokens() is None
    _feed_str(m, "<f=")                         # trigger emitted
    assert m.mode == "struct"
    assert not m.completed                      # structure must finish
    allowed = m.allowed_tokens()
    assert allowed is not None
    # inside the structure only the begin continuation is allowed
    ids = set(allowed.tolist())
    assert max(1, ord("g") % 256) in ids        # 'g' of "get>"
    assert max(1, ord("z") % 256) not in ids


def test_structural_tag_full_cycle_returns_to_free():
    m = _stag_matcher()
    _feed_str(m, 'calling <f=get>{"q":"tpu"}</f> done')
    assert m.mode == "free"
    assert m.completed
    # EOS allowed again in free mode
    assert m.advance(0)


def test_structural_tag_eos_inside_structure_rejected():
    m = _stag_matcher()
    _feed_str(m, "<f=get>")
    assert not m.advance(0)                     # EOS mid-structure


def test_structural_tag_e2e(llm):
    out = llm.generate(
        "do it",
        SamplingParams(max_tokens=60, temperature=1.0, seed=5,
                       guided_decoding=GuidedDecodingParams(
                           structural_tag=STAG)))[0]
    text = out.outputs[0].text
    # sampled text is free-form, but any trigger occurrence must be a
    # complete valid structure
    if "<f=" in text:
        import re
        assert re.search(r'<f=get>\{"q":"[^"]*"\}</f>', text), text


def test_structural_tag_via_response_format():
    from tensorrt_llm_tpu.serve.openai_protocol import (
        _guided_from_response_format)
    gp = _guided_from_response_format(dict(type="structural_tag", **STAG))
    assert gp is not None and gp.structural_tag["triggers"] == ["<f="]


def test_structural_tag_second_trigger_after_failed_first():
    """A single TOKEN containing a rejected trigger occurrence followed by
    a real trigger must still enter structure mode (the lenient restore
    rescans from the next character instead of bulk-appending)."""
    from tensorrt_llm_tpu.runtime.guided_decoder import StructuralTagMatcher

    class MultiTok(CharTokenizer):
        def decode(self, ids, skip_special_tokens=True):
            if list(ids) == [2]:
                return "<f=z then <f="   # bad trigger, then a real one
            return super().decode(ids, skip_special_tokens)

    m = StructuralTagMatcher(STAG, MultiTok(), eos_token_id=0,
                             vocab_size=256)
    assert m.advance(2)
    assert m.mode == "struct"
    assert not m.completed
    # masks now constrain: 'g' (of "get>") allowed, 'z' banned
    ids = set(m.allowed_tokens().tolist())
    assert max(1, ord("g") % 256) in ids
    assert max(1, ord("z") % 256) not in ids


def test_bad_guided_spec_fails_only_that_request(llm):
    """A malformed grammar spec is a per-request error: the request gets
    an error result and the executor keeps serving others."""
    bad = GuidedDecodingParams(structural_tag={"structures": [{"schema": {}}]})
    with pytest.raises(RuntimeError, match="guided decoding"):
        llm.generate("x", SamplingParams(max_tokens=4,
                                         guided_decoding=bad))
    # the loop survived: a normal request still works
    out = llm.generate("ok", SamplingParams(max_tokens=3, ignore_eos=True))
    assert len(out[0].outputs[0].token_ids) == 3


def test_empty_json_schema_is_valid():
    """json={} (any JSON value) must route to the JSON matcher, not fall
    through to NotImplementedError."""
    from tensorrt_llm_tpu.runtime.guided_decoder import (RegexMatcher,
                                                         create_matcher)
    m = create_matcher(GuidedDecodingParams(json={}), CharTokenizer(),
                       eos_token_id=0, vocab_size=256)
    assert isinstance(m, RegexMatcher)


def test_structural_tag_mask_allows_free_tail_tokens():
    """The struct-mode mask admits a token that closes the structure and
    continues with free text (advance() accepts it; a plain DFA mask would
    ban it and force ending exactly on the end string)."""
    from tensorrt_llm_tpu.runtime.guided_decoder import StructuralTagMatcher

    class MultiTok(CharTokenizer):
        def decode(self, ids, skip_special_tokens=True):
            if list(ids) == [3]:
                return '"}</f> and'      # closes the structure + free tail
            return super().decode(ids, skip_special_tokens)

    m = StructuralTagMatcher(STAG, MultiTok(), eos_token_id=0,
                             vocab_size=256)
    _feed_str(m, '<f=get>{"q":"tpu')
    assert m.mode == "struct"
    assert 3 in set(m.allowed_tokens().tolist())
    assert m.advance(3)                   # matcher accepts it too
    assert m.mode == "free"
