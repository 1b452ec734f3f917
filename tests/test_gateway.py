"""Gateway integration test: REST edge tier -> gRPC serving process
(mirrors the reference's Go gateway role, gateway/main.go:22-55 —
completion/chat/models proxying with SSE streaming)."""

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


def _post(url: str, body: dict, timeout: float = 180.0) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _post_sse(url: str, body: dict, timeout: float = 180.0):
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            chunks.append(json.loads(payload))
    return chunks


@pytest.fixture(scope="module")
def gateway(tmp_path_factory):
    model_dir = str(tmp_path_factory.mktemp("tiny_llama_gw"))
    fixtures.make_tiny_llama(model_dir, tokenizer=True)
    grpc_port, http_port = _free_port(), _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    server = subprocess.Popen(
        [
            sys.executable, "-m", "scalellm_tpu.serve.grpc_server",
            "--model", model_dir, "--port", str(grpc_port),
            "--host", "127.0.0.1",
            "--num-blocks", "128", "--block-size", "4", "--disable-warmup",
        ],
        env=env, cwd=cwd,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    gw = subprocess.Popen(
        [
            sys.executable, "-m", "scalellm_tpu.serve.gateway",
            "--grpc-server", f"127.0.0.1:{grpc_port}",
            "--http-server", f"127.0.0.1:{http_port}",
        ],
        env=env, cwd=cwd,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{http_port}"
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            for proc, name in ((server, "grpc server"), (gw, "gateway")):
                if proc.poll() is not None:
                    raise RuntimeError(
                        f"{name} died:\n{proc.stdout.read().decode()}"
                    )
            try:
                with urllib.request.urlopen(base + "/health", timeout=2) as r:
                    if r.status == 200:
                        break
            except Exception:
                time.sleep(1.0)
        else:
            raise RuntimeError("gateway never became healthy")
        yield base
    finally:
        # try/finally so a setup failure can't orphan the subprocesses
        # (a leaked server once wedged the shared TPU for 1.5h).
        for proc in (gw, server):
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()


def test_models_through_gateway(gateway):
    with urllib.request.urlopen(gateway + "/v1/models", timeout=30) as r:
        data = json.loads(r.read())
    assert data["object"] == "list"
    assert len(data["data"]) == 1


def test_completion_nonstream(gateway):
    resp = _post(
        gateway + "/v1/completions",
        {
            "model": "m", "prompt": "hello", "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True,
        },
    )
    assert resp["object"] == "text_completion"
    assert resp["choices"][0]["finish_reason"] == "length"
    assert resp["usage"]["completion_tokens"] == 4


def test_completion_stream_sse(gateway):
    chunks = _post_sse(
        gateway + "/v1/completions",
        {
            "model": "m", "prompt": "hello", "max_tokens": 4,
            "temperature": 0.0, "ignore_eos": True, "stream": True,
        },
    )
    assert chunks
    text = "".join(
        c["choices"][0]["text"] for c in chunks if c.get("choices")
    )
    assert len(text) > 0
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"


def test_chat_through_gateway(gateway):
    resp = _post(
        gateway + "/v1/chat/completions",
        {
            "model": "m",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0, "ignore_eos": True,
        },
    )
    assert resp["object"] == "chat.completion"
    assert resp["choices"][0]["message"]["role"] == "assistant"


def test_validation_rejected_at_edge(gateway):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(
            gateway + "/v1/completions",
            {"model": "m", "prompt": "x", "max_tokens": 0},
        )
    assert exc.value.code == 400


@pytest.fixture(scope="module")
def dp_gateway(tmp_path_factory):
    """Two engine replicas behind one routing gateway (data parallelism at
    the serve tier, SURVEY §2.7 DP row)."""
    model_dir = str(tmp_path_factory.mktemp("tiny_llama_dp"))
    fixtures.make_tiny_llama(model_dir, tokenizer=True)
    p1, p2, http_port = _free_port(), _free_port(), _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replicas = [
        subprocess.Popen(
            [
                sys.executable, "-m", "scalellm_tpu.serve.grpc_server",
                "--model", model_dir, "--port", str(p),
                "--host", "127.0.0.1",
                "--num-blocks", "128", "--block-size", "4",
                "--disable-warmup",
            ],
            env=env, cwd=cwd,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in (p1, p2)
    ]
    gw = subprocess.Popen(
        [
            sys.executable, "-m", "scalellm_tpu.serve.gateway",
            "--grpc-server", f"127.0.0.1:{p1},127.0.0.1:{p2}",
            "--http-server", f"127.0.0.1:{http_port}",
        ],
        env=env, cwd=cwd,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{http_port}"
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            for proc in replicas + [gw]:
                if proc.poll() is not None:
                    raise RuntimeError(
                        f"process died:\n{proc.stdout.read().decode()}"
                    )
            try:
                # healthy only proves ONE replica is up; wait until BOTH
                # answer through the stats endpoint
                with urllib.request.urlopen(
                    base + "/gateway/replicas", timeout=2
                ) as r:
                    stats = json.loads(r.read())["replicas"]
                _post(base + "/v1/completions",
                      {"model": "m", "prompt": "warm", "max_tokens": 1,
                       "temperature": 0.0, "ignore_eos": True}, timeout=60)
                break
            except Exception:
                time.sleep(1.0)
        else:
            raise RuntimeError("dp gateway never became ready")
        yield base, replicas
    finally:
        for proc in replicas + [gw]:
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()


def test_dp_routing_distributes(dp_gateway):
    base, _ = dp_gateway
    import concurrent.futures

    def one(i):
        return _post(
            base + "/v1/completions",
            {"model": "m", "prompt": f"dp req {i}", "max_tokens": 2,
             "temperature": 0.0, "ignore_eos": True},
            timeout=120,
        )

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, range(12)))
    assert all(r["choices"][0]["text"] for r in results)
    with urllib.request.urlopen(base + "/gateway/replicas", timeout=10) as r:
        stats = json.loads(r.read())["replicas"]
    served = [s["served"] for s in stats]
    assert sum(served) >= 12
    # least-loaded routing over concurrent requests must use both replicas
    assert all(s > 0 for s in served), served


def test_affinity_routing_prefers_same_replica(dp_gateway):
    """Identical prompts hash to one replica (prefix-cache affinity) while
    distinct prompts still spread."""
    base, _ = dp_gateway
    with urllib.request.urlopen(base + "/gateway/replicas", timeout=10) as r:
        before = {s["addr"]: s["served"] for s in json.loads(r.read())["replicas"]}
    for _ in range(4):
        _post(
            base + "/v1/completions",
            {"model": "m", "prompt": "affinity shared prefix prompt",
             "max_tokens": 2, "temperature": 0.0, "ignore_eos": True},
            timeout=120,
        )
    with urllib.request.urlopen(base + "/gateway/replicas", timeout=10) as r:
        after = {s["addr"]: s["served"] for s in json.loads(r.read())["replicas"]}
    deltas = sorted(after[a] - before[a] for a in after)
    # identical-prompt requests overwhelmingly land on ONE replica (a
    # transient UNAVAILABLE retry may move a single request)
    assert sum(deltas) == 4 and deltas[1] >= 3, deltas


def test_dp_failover(dp_gateway):
    base, replicas = dp_gateway
    # kill replica 0: the gateway must retry on the survivor
    replicas[0].terminate()
    replicas[0].wait(timeout=10)
    ok = 0
    for i in range(4):
        try:
            r = _post(
                base + "/v1/completions",
                {"model": "m", "prompt": f"failover {i}", "max_tokens": 2,
                 "temperature": 0.0, "ignore_eos": True},
                timeout=120,
            )
            if r["choices"][0]["text"]:
                ok += 1
        except urllib.error.HTTPError:
            pass  # first hit may 503 before the breaker trips
    assert ok >= 3
    # health stays OK on the surviving replica
    with urllib.request.urlopen(base + "/health", timeout=10) as r:
        assert r.status == 200


GW_TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "lookup",
            "parameters": {
                "type": "object",
                "properties": {"q": {"type": "string", "maxLength": 8}},
                "required": ["q"],
            },
        },
    }
]


def test_tool_call_through_gateway(gateway):
    """tools/tool_choice ride the proto (tools_json) to the serving tier;
    the forced call comes back as message.tool_calls."""
    r = _post(
        gateway + "/v1/chat/completions",
        {"model": "m", "messages": [{"role": "user", "content": "call it"}],
         "max_tokens": 120, "temperature": 1.0,
         "tools": GW_TOOLS, "tool_choice": "required"},
    )
    choice = r["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    call = choice["message"]["tool_calls"][0]
    assert call["function"]["name"] == "lookup"
    json.loads(call["function"]["arguments"])


def test_tool_call_streaming_through_gateway(gateway):
    chunks = _post_sse(
        gateway + "/v1/chat/completions",
        {"model": "m", "messages": [{"role": "user", "content": "call it"}],
         "max_tokens": 120, "temperature": 1.0, "stream": True,
         "tools": GW_TOOLS,
         "tool_choice": {"type": "function", "function": {"name": "lookup"}}},
    )
    tool_deltas = [
        tc
        for c in chunks
        for tc in c["choices"][0]["delta"].get("tool_calls", [])
    ]
    finishes = [
        c["choices"][0]["finish_reason"]
        for c in chunks
        if c["choices"][0]["finish_reason"]
    ]
    assert finishes == ["tool_calls"], chunks
    assert tool_deltas[0]["function"]["name"] == "lookup"
