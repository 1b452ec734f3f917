"""OpenAI server integration test: launch api_server as a subprocess, poll
/health, drive completions/chat incl. SSE streaming (mirrors the reference's
tests/openai/openai_server.py fixture + test_openai_chat.py)."""

import json
import os
import socket
import subprocess
import sys
import time
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
            "--num-blocks", "128",
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
