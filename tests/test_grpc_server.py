"""gRPC server integration test (mirrors the reference's gRPC service
coverage: Completion.Complete streaming, Chat.Complete, Models.List)."""

import os
import socket
import subprocess
import sys
import time

import pytest

import tests.fixtures as fixtures


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def grpc_server(tmp_path_factory):
    model_dir = str(tmp_path_factory.mktemp("tiny_llama_grpc"))
    fixtures.make_tiny_llama(model_dir, tokenizer=True)
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "scalellm_tpu.serve.grpc_server",
            "--model", model_dir, "--port", str(port), "--host", "127.0.0.1",
            "--num-blocks", "128", "--block-size", "4", "--disable-warmup",
        ],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    import grpc

    addr = f"127.0.0.1:{port}"
    channel = grpc.insecure_channel(addr)
    deadline = time.time() + 120
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"server died:\n{proc.stdout.read().decode()}")
        try:
            grpc.channel_ready_future(channel).result(timeout=2)
            break
        except grpc.FutureTimeoutError:
            pass
    try:
        yield channel
    finally:
        # finally: a setup failure must not orphan the server subprocess
        channel.close()
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_models_list(grpc_server):
    from scalellm_tpu.serve.pb import llm_pb2

    stub = grpc_server.unary_unary(
        "/scalellm_tpu.Models/List",
        request_serializer=llm_pb2.ListModelsRequest.SerializeToString,
        response_deserializer=llm_pb2.ListModelsResponse.FromString,
    )
    resp = stub(llm_pb2.ListModelsRequest(), timeout=30)
    assert resp.object == "list"
    assert len(resp.data) == 1


def test_completion_stream(grpc_server):
    from scalellm_tpu.serve.pb import llm_pb2

    stub = grpc_server.unary_stream(
        "/scalellm_tpu.Completion/Complete",
        request_serializer=llm_pb2.CompletionRequest.SerializeToString,
        response_deserializer=llm_pb2.CompletionResponse.FromString,
    )
    req = llm_pb2.CompletionRequest(
        model="m", prompt="hello", stream=True,
        sampling=llm_pb2.SamplingParams(
            max_tokens=4, temperature=0.0, ignore_eos=True
        ),
    )
    chunks = list(stub(req, timeout=180))
    assert chunks
    text = "".join(c.choices[0].text for c in chunks if c.choices)
    assert len(text) > 0
    assert chunks[-1].choices[0].finish_reason == "length"


def test_chat_nonstream(grpc_server):
    from scalellm_tpu.serve.pb import llm_pb2

    stub = grpc_server.unary_stream(
        "/scalellm_tpu.Chat/Complete",
        request_serializer=llm_pb2.ChatRequest.SerializeToString,
        response_deserializer=llm_pb2.ChatResponse.FromString,
    )
    req = llm_pb2.ChatRequest(
        model="m",
        messages=[llm_pb2.ChatMessage(role="user", content="hi")],
        sampling=llm_pb2.SamplingParams(
            max_tokens=4, temperature=0.0, ignore_eos=True
        ),
    )
    resps = list(stub(req, timeout=180))
    assert len(resps) == 1
    assert resps[0].object == "chat.completion"
    assert resps[0].choices[0].message.role == "assistant"
    assert resps[0].usage.completion_tokens == 4


def test_invalid_params_abort(grpc_server):
    import grpc

    from scalellm_tpu.serve.pb import llm_pb2

    stub = grpc_server.unary_stream(
        "/scalellm_tpu.Completion/Complete",
        request_serializer=llm_pb2.CompletionRequest.SerializeToString,
        response_deserializer=llm_pb2.CompletionResponse.FromString,
    )
    req = llm_pb2.CompletionRequest(
        model="m", prompt="x",
        sampling=llm_pb2.SamplingParams(max_tokens=0),
    )
    with pytest.raises(grpc.RpcError) as exc:
        list(stub(req, timeout=60))
    assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT
