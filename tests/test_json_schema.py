"""JSON-Schema -> regex compiler completeness (VERDICT r2 next-round #4).

The reference gets full JSON-Schema guidance from xgrammar
(tensorrt_llm/_torch/pyexecutor/guided_decoder.py:156-161); these tests pin
the from-scratch compiler on the constructs real tool schemas use:
optional properties, anyOf/oneOf, $ref/$defs, numeric bounds, string
pattern/length, allOf, additionalProperties."""

import json

import pytest

from tensorrt_llm_tpu.runtime.regex_fsm import (
    DFA, _int_range_regex, json_schema_to_regex)


def compact(obj) -> str:
    return json.dumps(obj, separators=(",", ":"))


def check(schema, valid, invalid):
    dfa = DFA(json_schema_to_regex(schema))
    for v in valid:
        assert dfa.matches(compact(v)), (schema, v)
    for v in invalid:
        s = v if isinstance(v, str) else compact(v)
        assert not dfa.matches(s), (schema, v)


# ------------------------------------------------------------- optionals ----
def test_optional_properties_omittable():
    schema = {"type": "object",
              "properties": {"city": {"type": "string"},
                             "unit": {"type": "string",
                                      "enum": ["C", "F"]},
                             "days": {"type": "integer"}},
              "required": ["city"]}
    check(schema,
          valid=[{"city": "Oslo"},
                 {"city": "Oslo", "unit": "C"},
                 {"city": "Oslo", "days": 3},
                 {"city": "Oslo", "unit": "F", "days": 3}],
          invalid=[{}, {"unit": "C"},  # required missing
                   {"city": "Oslo", "unit": "K"},
                   '{"city":"Oslo",}'])


def test_all_optional_allows_empty_object():
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"},
                             "b": {"type": "boolean"}}}
    check(schema,
          valid=[{}, {"a": 1}, {"b": True}, {"a": 1, "b": False}],
          invalid=[{"b": True, "a": 1},  # declaration order is canonical
                   '{,}'])


def test_required_blocks_skipping_past():
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"},
                             "b": {"type": "integer"},
                             "c": {"type": "integer"}},
              "required": ["b"]}
    check(schema,
          valid=[{"b": 2}, {"a": 1, "b": 2}, {"b": 2, "c": 3},
                 {"a": 1, "b": 2, "c": 3}],
          invalid=[{"a": 1}, {"a": 1, "c": 3}, {"c": 3}])


# ----------------------------------------------------------- combinators ----
def test_anyof_alternation():
    schema = {"anyOf": [{"type": "string"}, {"type": "integer"}]}
    check(schema, valid=["hi", 42, -7], invalid=[True, 1.5])


def test_oneof_nested_objects():
    schema = {"oneOf": [
        {"type": "object", "properties": {"lat": {"type": "number"}},
         "required": ["lat"]},
        {"type": "object", "properties": {"zip": {"type": "string"}},
         "required": ["zip"]}]}
    check(schema, valid=[{"lat": 1.5}, {"zip": "90210"}],
          invalid=[{"lat": "x"}, {"zip": 90210}])


def test_allof_shallow_merge():
    schema = {"allOf": [
        {"type": "object", "properties": {"a": {"type": "integer"}},
         "required": ["a"]},
        {"properties": {"b": {"type": "string"}}, "required": ["b"]}]}
    check(schema, valid=[{"a": 1, "b": "x"}],
          invalid=[{"a": 1}, {"b": "x"}])


# ------------------------------------------------------------------ $ref ----
def test_ref_defs_expansion():
    schema = {"$defs": {"pt": {"type": "object",
                               "properties": {"x": {"type": "integer"},
                                              "y": {"type": "integer"}},
                               "required": ["x", "y"]}},
              "type": "object",
              "properties": {"start": {"$ref": "#/$defs/pt"},
                             "end": {"$ref": "#/$defs/pt"}},
              "required": ["start", "end"]}
    check(schema,
          valid=[{"start": {"x": 0, "y": 1}, "end": {"x": 2, "y": 3}}],
          invalid=[{"start": {"x": 0}, "end": {"x": 2, "y": 3}}])


def test_recursive_ref_terminates():
    # linked list: $ref to self — bounded expansion must terminate and
    # still accept shallow instances
    schema = {"$defs": {"node": {
        "type": "object",
        "properties": {"v": {"type": "integer"},
                       "next": {"$ref": "#/$defs/node"}},
        "required": ["v"]}},
        "$ref": "#/$defs/node"}
    dfa = DFA(json_schema_to_regex(schema, ref_depth=6))
    assert dfa.matches(compact({"v": 1}))
    assert dfa.matches(compact({"v": 1, "next": {"v": 2}}))


def test_legacy_definitions_pointer():
    schema = {"definitions": {"s": {"type": "string"}},
              "$ref": "#/definitions/s"}
    check(schema, valid=["ok"], invalid=[3])


# ------------------------------------------------------------- int bounds ---
@pytest.mark.parametrize("lo,hi", [(0, 10), (1, 9), (5, 5), (7, 123),
                                   (-3, 4), (-120, -7), (None, 42),
                                   (17, None), (None, -5), (-2, None)])
def test_int_range_regex_exhaustive(lo, hi):
    dfa = DFA(_int_range_regex(lo, hi))
    for n in range(-250, 251):
        want = (lo is None or n >= lo) and (hi is None or n <= hi)
        assert dfa.matches(str(n)) == want, (lo, hi, n)
    assert not dfa.matches("007")
    assert not dfa.matches("-0")


def test_integer_schema_bounds():
    schema = {"type": "integer", "minimum": 1, "maximum": 6}
    check(schema, valid=[1, 3, 6], invalid=[0, 7, -1, "01"])
    ex = {"type": "integer", "exclusiveMinimum": 0, "exclusiveMaximum": 10}
    check(ex, valid=[1, 9], invalid=[0, 10])


# ---------------------------------------------------------------- strings ---
def test_string_pattern():
    schema = {"type": "string", "pattern": "^[A-Z]{2}-[0-9]{4}$"}
    check(schema, valid=["AB-1234"], invalid=["ab-1234", "AB-12345", "AB"])


def test_string_length_bounds():
    schema = {"type": "string", "minLength": 2, "maxLength": 4}
    check(schema, valid=["ab", "abcd"], invalid=["a", "abcde"])


# ------------------------------------------------------ additionalProps -----
def test_additional_properties_schema():
    schema = {"type": "object",
              "additionalProperties": {"type": "integer"}}
    check(schema, valid=[{}, {"k": 1}, {"a": 1, "b": 2}],
          invalid=[{"k": "s"}])


# ------------------------------------------------------------- realistic ----
def test_real_function_calling_schema():
    # an OpenAI-style tool schema with optional params (the case VERDICT
    # r2 flags: forced tool_choice must work with optional args omitted)
    schema = {
        "type": "object",
        "properties": {
            "location": {"type": "string",
                         "description": "City and state"},
            "unit": {"type": "string", "enum": ["celsius", "fahrenheit"]},
            "num_days": {"type": "integer", "minimum": 1, "maximum": 14},
            "include_hourly": {"type": "boolean"},
        },
        "required": ["location"],
    }
    check(schema,
          valid=[{"location": "Paris"},
                 {"location": "Paris", "unit": "celsius"},
                 {"location": "Paris", "num_days": 14},
                 {"location": "Paris", "unit": "fahrenheit",
                  "num_days": 1, "include_hourly": True}],
          invalid=[{"unit": "celsius"},
                   {"location": "Paris", "num_days": 0},
                   {"location": "Paris", "num_days": 15}])


def test_prefix_items_tuple():
    schema = {"type": "array",
              "prefixItems": [{"type": "number"}, {"type": "number"}]}
    check(schema, valid=[[1.5, -2]], invalid=[[1.5], [1, 2, 3]])


def test_forced_tool_choice_with_optional_args_generable():
    """End-to-end-ish: the compiled DFA must admit a path to acceptance
    after only the required property — i.e. a guided generation can close
    the object without emitting optionals (the r2 deadlock case)."""
    schema = {"type": "object",
              "properties": {"q": {"type": "string"},
                             "page": {"type": "integer"},
                             "lang": {"type": "string"}},
              "required": ["q"]}
    dfa = DFA(json_schema_to_regex(schema))
    s = '{"q":"cats"}'
    state = 0
    for ch in s:
        state = dfa.step(state, ch)
        assert state >= 0, (ch, s)
    assert dfa.accepting[state]
