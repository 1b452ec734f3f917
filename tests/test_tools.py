"""Tool/function-calling unit tests (utils/tools.py + chat template
integration). Server-level end-to-end coverage lives in test_api_server.py."""

import json
import re

import pytest

from scalellm_tpu.utils.chat import Message, apply_chat_template
from scalellm_tpu.utils.tools import (
    guided_regex_for_tools,
    might_open_tool_call,
    parse_tool_calls,
    render_tools_block,
    tool_call_opener_pos,
    validate_tool_choice,
    validate_tools,
)

WEATHER = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get weather",
        "parameters": {
            "type": "object",
            "properties": {
                "city": {"type": "string"},
                "unit": {"type": "string", "enum": ["C", "F"]},
            },
            "required": ["city"],
        },
    },
}
TIME = {
    "type": "function",
    "function": {"name": "get_time", "parameters": {"type": "object"}},
}


# ---------------------------------------------------------------- validation


def test_validate_tools():
    assert validate_tools([WEATHER, TIME]) == [WEATHER, TIME]
    for bad in ([], [{"type": "function"}], [{"type": "retrieval"}], "x"):
        with pytest.raises(ValueError):
            validate_tools(bad)


def test_validate_tool_choice():
    assert validate_tool_choice(None, [WEATHER]) == "auto"
    assert validate_tool_choice("none", None) == "none"
    assert validate_tool_choice("required", [WEATHER]) == "required"
    named = {"type": "function", "function": {"name": "get_weather"}}
    assert validate_tool_choice(named, [WEATHER]) == named
    with pytest.raises(ValueError):
        validate_tool_choice("required", None)  # no tools
    with pytest.raises(ValueError):
        validate_tool_choice(
            {"type": "function", "function": {"name": "nope"}}, [WEATHER]
        )
    with pytest.raises(ValueError):
        validate_tool_choice("banana", [WEATHER])


# ------------------------------------------------------------------ parsing


def test_parse_hermes_format():
    text = 'Sure!<tool_call>{"name": "get_weather", "arguments": {"city": "Oslo"}}</tool_call>'
    content, calls = parse_tool_calls(text)
    assert content == "Sure!"
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Oslo"}


def test_parse_hermes_multiple():
    text = (
        '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
        '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>'
    )
    content, calls = parse_tool_calls(text)
    assert content is None
    assert [c.name for c in calls] == ["a", "b"]


def test_parse_mistral_format():
    text = '[TOOL_CALLS][{"name": "get_time", "arguments": {}}]'
    content, calls = parse_tool_calls(text)
    assert content is None
    assert calls[0].name == "get_time"


def test_parse_bare_json():
    text = '{"name": "get_weather", "arguments": {"city": "Paris", "unit": "C"}}'
    content, calls = parse_tool_calls(text)
    assert content is None
    assert calls[0].name == "get_weather"
    # llama3 uses "parameters" as the key
    content, calls = parse_tool_calls('{"name": "f", "parameters": {"a": 2}}')
    assert json.loads(calls[0].arguments) == {"a": 2}


def test_parse_plain_text_passthrough():
    for text in ("just words", '{"not_a_call": 1}', "<tool_call>garbage"):
        content, calls = parse_tool_calls(text)
        assert calls == []
        assert content == text


def test_opener_detection():
    assert tool_call_opener_pos("hello <tool_call>") == 6
    assert tool_call_opener_pos('{"name": "x"') == 0
    assert tool_call_opener_pos("plain") == -1
    assert might_open_tool_call("words <tool")
    assert might_open_tool_call("[TOOL_")
    assert not might_open_tool_call("words ")
    # bare-JSON prefixes only count at output start
    assert might_open_tool_call('{"n', at_start=True)
    assert might_open_tool_call('  [{"name"', at_start=True)
    assert not might_open_tool_call('{"n', at_start=False)
    assert not might_open_tool_call('{"other', at_start=True)


# ----------------------------------------------------------- guided forcing


def test_guided_regex_for_tools_matches_valid_calls():
    rx = re.compile(guided_regex_for_tools([WEATHER, TIME]))
    ok = '{"name": "get_weather", "arguments": {"city": "Oslo", "unit": "C"}}'
    assert rx.fullmatch(ok)
    assert rx.fullmatch('{"name": "get_time", "arguments": {}}')
    # wrong function name / wrong enum value must not match
    assert not rx.fullmatch('{"name": "rm_rf", "arguments": {}}')
    assert not rx.fullmatch(
        '{"name": "get_weather", "arguments": {"city": "Oslo", "unit": "K"}}'
    )


def test_guided_regex_named_tool_only():
    rx = re.compile(guided_regex_for_tools([WEATHER, TIME], name="get_time"))
    assert rx.fullmatch('{"name": "get_time", "arguments": {}}')
    assert not rx.fullmatch('{"name": "get_weather", "arguments": {"city": "x"}}')
    with pytest.raises(ValueError):
        guided_regex_for_tools([WEATHER], name="missing")


# ----------------------------------------------------------------- template


def test_coded_template_gets_tools_block():
    msgs = [Message("user", "what's the weather?")]
    out = apply_chat_template(msgs, model_type="llama", tools=[WEATHER])
    assert "get_weather" in out
    assert "what's the weather?" in out


def test_coded_template_flattens_tool_turns():
    msgs = [
        Message("user", "weather?"),
        Message(
            "assistant",
            None,
            tool_calls=[
                {
                    "id": "call_1",
                    "type": "function",
                    "function": {"name": "get_weather", "arguments": "{}"},
                }
            ],
        ),
        Message("tool", '{"temp": 5}', tool_call_id="call_1"),
    ]
    out = apply_chat_template(msgs, model_type="llama", tools=[WEATHER])
    assert "get_weather" in out
    assert '<tool_response>{"temp": 5}</tool_response>' in out


def test_jinja_template_receives_tools():
    tmpl = (
        "{% if tools %}TOOLS:{% for t in tools %}{{ t.function.name }};"
        "{% endfor %}{% endif %}"
        "{% for m in messages %}[{{ m.role }}]{{ m.content }}{% endfor %}"
    )
    out = apply_chat_template(
        [Message("user", "hi")], jinja_template=tmpl, tools=[WEATHER, TIME]
    )
    assert out == "TOOLS:get_weather;get_time;[user]hi"


def test_message_roundtrip():
    d = {
        "role": "assistant",
        "content": None,
        "tool_calls": [{"id": "x", "type": "function",
                        "function": {"name": "f", "arguments": "{}"}}],
    }
    assert Message.from_dict(d).to_dict() == d


def test_bare_prefix_tolerates_whitespace():
    # the FSM's JSON grammar allows a space after '{' — the stream hold-back
    # must keep buffering through it (regression: leaked '{ ' as content)
    assert might_open_tool_call("{ ", at_start=True)
    assert might_open_tool_call('{ "na', at_start=True)
    assert might_open_tool_call('[ { "name"', at_start=True)
    assert might_open_tool_call('{ "name" ', at_start=True)
    assert not might_open_tool_call('{ "nope', at_start=True)


def test_stream_tool_buffer_space_after_brace():
    from scalellm_tpu.utils.tools import StreamToolBuffer

    buf = StreamToolBuffer()
    text = '{ "name": "lookup", "arguments": { "q": "x"}}'
    evs = []
    for i, ch in enumerate(text):
        ev = buf.feed(ch, finished=(i == len(text) - 1))
        if ev is not None:
            evs.append(ev)
    assert len(evs) == 1 and evs[0][0] == "tool_calls"
    assert evs[0][2][0].name == "lookup"
