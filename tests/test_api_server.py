"""OpenAI server integration test: launch api_server as a subprocess, poll
/health, drive completions/chat incl. SSE streaming (mirrors the reference's
tests/openai/openai_server.py fixture + test_openai_chat.py)."""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

import tests.fixtures as fixtures


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    model_dir = str(tmp_path_factory.mktemp("tiny_llama_srv"))
    fixtures.make_tiny_llama(model_dir, tokenizer=True)
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "scalellm_tpu.serve.api_server",
            "--model", model_dir,
            "--port", str(port),
            "--host", "127.0.0.1",
            "--num-blocks", "300",
            "--block-size", "4",
            "--disable-warmup",
        ],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 120
    last_err = None
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode()
            proc.wait()
            raise RuntimeError(f"server died:\n{out}")
        try:
            with urllib.request.urlopen(base + "/health", timeout=2) as r:
                if r.status == 200:
                    break
        except Exception as e:
            last_err = e
            time.sleep(0.5)
    else:
        proc.kill()
        raise RuntimeError(f"server never became healthy: {last_err}")
    try:
        yield base
    finally:
        # finally: a setup failure must not orphan the server subprocess
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_models(server):
    with urllib.request.urlopen(server + "/v1/models", timeout=10) as r:
        body = json.loads(r.read())
    assert body["object"] == "list"
    assert len(body["data"]) == 1


def test_completion(server):
    status, body = _post(
        server,
        "/v1/completions",
        {"model": "m", "prompt": "hello", "max_tokens": 4,
         "temperature": 0.0, "ignore_eos": True},
    )
    assert status == 200
    assert body["object"] == "text_completion"
    assert len(body["choices"]) == 1
    assert body["usage"]["completion_tokens"] == 4
    assert body["choices"][0]["finish_reason"] == "length"


def test_completion_streaming(server):
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps(
            {"model": "m", "prompt": "abc", "max_tokens": 4,
             "temperature": 0.0, "ignore_eos": True, "stream": True}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers.get("Content-Type", "").startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                data = line[len("data: "):]
                if data == "[DONE]":
                    break
                chunks.append(json.loads(data))
    assert chunks, "no SSE chunks received"
    text = "".join(c["choices"][0]["text"] for c in chunks)
    assert len(text) > 0
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"

    # stream and non-stream must produce the same text (reference:
    # tests/async_engine_test.py equivalence check)
    status, body = _post(
        server,
        "/v1/completions",
        {"model": "m", "prompt": "abc", "max_tokens": 4,
         "temperature": 0.0, "ignore_eos": True},
    )
    assert body["choices"][0]["text"] == text


def test_chat_completion(server):
    status, body = _post(
        server,
        "/v1/chat/completions",
        {
            "model": "m",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4,
            "temperature": 0.0,
            "ignore_eos": True,
        },
    )
    assert status == 200
    assert body["object"] == "chat.completion"
    msg = body["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert body["usage"]["completion_tokens"] == 4


def test_validation_error(server):
    try:
        _post(server, "/v1/completions", {"model": "m", "prompt": "x", "max_tokens": 0})
        assert False, "expected HTTP error"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        body = json.loads(e.read())
        assert "max_tokens" in body["error"]["message"]


def test_metrics_endpoint(server):
    with urllib.request.urlopen(server + "/metrics", timeout=10) as r:
        text = r.read().decode()
    assert "# TYPE" in text


def test_concurrent_clients(server):
    """Several clients in flight at once exercise continuous batching through
    the full HTTP stack."""
    import concurrent.futures

    def one(i):
        status, body = _post(
            server,
            "/v1/completions",
            {"model": "m", "prompt": f"client {i} says", "max_tokens": 3,
             "temperature": 0.0, "ignore_eos": True},
        )
        assert status == 200
        return body["choices"][0]["text"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
        texts = list(pool.map(one, range(6)))
    assert len(texts) == 6
    assert all(len(t) > 0 for t in texts)


TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "description": "Get weather for a city",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string", "maxLength": 12}},
                "required": ["city"],
            },
        },
    }
]


def test_chat_tool_call_forced(server):
    """tool_choice='required' guides generation into a parseable call: the
    random-weight model MUST produce message.tool_calls."""
    status, body = _post(
        server,
        "/v1/chat/completions",
        {"model": "m", "messages": [{"role": "user", "content": "weather?"}],
         "max_tokens": 160, "temperature": 1.0,
         "tools": TOOLS, "tool_choice": "required"},
    )
    assert status == 200
    choice = body["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    calls = choice["message"]["tool_calls"]
    assert calls[0]["function"]["name"] == "get_weather"
    args = json.loads(calls[0]["function"]["arguments"])
    assert isinstance(args["city"], str)


def test_chat_tool_call_streaming(server):
    req = urllib.request.Request(
        server + "/v1/chat/completions",
        data=json.dumps(
            {"model": "m",
             "messages": [{"role": "user", "content": "weather?"}],
             "max_tokens": 160, "temperature": 1.0, "stream": True,
             "tools": TOOLS,
             "tool_choice": {"type": "function",
                             "function": {"name": "get_weather"}}}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    tool_deltas = []
    finishes = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                c = json.loads(line[len("data: "):])["choices"][0]
                if c["delta"].get("tool_calls"):
                    tool_deltas.extend(c["delta"]["tool_calls"])
                if c["finish_reason"]:
                    finishes.append(c["finish_reason"])
    assert finishes == ["tool_calls"]
    assert tool_deltas[0]["function"]["name"] == "get_weather"
    json.loads(tool_deltas[0]["function"]["arguments"])


def test_chat_tool_result_roundtrip(server):
    """Follow-up turn carrying assistant tool_calls + tool result renders
    through the template (no 4xx/5xx) and produces a normal answer."""
    status, body = _post(
        server,
        "/v1/chat/completions",
        {"model": "m", "max_tokens": 4, "temperature": 0.0,
         "tools": TOOLS,
         "messages": [
             {"role": "user", "content": "weather in Oslo?"},
             {"role": "assistant", "content": None, "tool_calls": [
                 {"id": "call_abc", "type": "function",
                  "function": {"name": "get_weather",
                               "arguments": "{\"city\": \"Oslo\"}"}}]},
             {"role": "tool", "tool_call_id": "call_abc",
              "content": "{\"temp\": -3}"},
         ]},
    )
    assert status == 200
    assert body["choices"][0]["message"]["content"]


def test_chat_tool_choice_invalid(server):
    status = None
    try:
        _post(
            server,
            "/v1/chat/completions",
            {"model": "m", "messages": [{"role": "user", "content": "x"}],
             "tools": TOOLS,
             "tool_choice": {"type": "function",
                             "function": {"name": "nope"}}},
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_oversized_prompt_rejected(server):
    """A request that can never fit in KV capacity fails fast (429), it must
    not park in the wait queue forever."""
    status = None
    try:
        _post(
            server,
            "/v1/completions",
            {"model": "m", "prompt": "x" * 490, "max_tokens": 800,
             "temperature": 0.0},
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 429
