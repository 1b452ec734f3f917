"""Standalone REST -> gRPC gateway.

TPU-native counterpart of the reference's Go gateway (reference:
gateway/main.go:22-55 grpc-gateway reverse proxy, gateway/forwarder.go:16
ForwardResponseStream SSE forwarding, gateway/{completion,chat,models}
_handler.go): a separate process that exposes the OpenAI REST surface and
proxies every call to a scalellm_tpu gRPC server (serve/grpc_server.py),
streaming responses as server-sent events. Lets deployments front one or
more native gRPC serving processes with a stateless HTTP tier, exactly
like the reference's gateway binary.

Run:
  python -m scalellm_tpu.serve.gateway \
      --grpc-server 127.0.0.1:8500 --http-server 0.0.0.0:8080

The gateway performs full REST request validation (shared api_protocol
parsers) before the proxy hop, so malformed requests are rejected at the
edge without touching the serving tier.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
from typing import Optional, Union

import grpc
import grpc.aio

from scalellm_tpu.serve.api_protocol import (
    ChatCompletionRequest,
    CompletionRequest,
    ValidationError,
    error_json,
    status_to_http,
)
from scalellm_tpu.serve.http import HttpServer, Request, Response, SSEResponse
from scalellm_tpu.serve.pb import llm_pb2

logger = logging.getLogger(__name__)

_PRIORITY = {"high": 0, "normal": 1, "low": 2}


def _sampling_pb(body: Union[CompletionRequest, ChatCompletionRequest]) -> llm_pb2.SamplingParams:
    sp = llm_pb2.SamplingParams(
        max_tokens=body.max_tokens,
        n=body.n,
        frequency_penalty=body.frequency_penalty,
        presence_penalty=body.presence_penalty,
        repetition_penalty=body.repetition_penalty,
        temperature=body.temperature,
        top_p=body.top_p,
        top_k=body.top_k,
        ignore_eos=body.ignore_eos,
        skip_special_tokens=body.skip_special_tokens,
    )
    if isinstance(body, CompletionRequest):
        sp.echo = body.echo
        if body.best_of is not None:
            sp.best_of = body.best_of
        if body.logprobs is not None:
            sp.logprobs = True
            sp.top_logprobs = body.logprobs
    else:
        if body.logprobs:
            sp.logprobs = True
            sp.top_logprobs = body.top_logprobs
    if body.seed is not None:
        sp.seed = body.seed
    for s in body.stop or []:
        sp.stop.append(s)
    for t in body.stop_token_ids or []:
        sp.stop_token_ids.append(t)
    for tid, bias in (body.logit_bias or {}).items():
        sp.logit_bias[tid] = bias
    if body.guided_regex is not None:
        sp.guided_regex = body.guided_regex
    if body.guided_json is not None:
        gj = body.guided_json
        sp.guided_json = gj if isinstance(gj, str) else json.dumps(gj)
    for c in body.guided_choice or []:
        sp.guided_choice.append(c)
    return sp


def _usage_json(usage) -> Optional[dict]:
    if usage is None:
        return None
    return {
        "prompt_tokens": usage.prompt_tokens,
        "completion_tokens": usage.completion_tokens,
        "total_tokens": usage.total_tokens,
    }


def _completion_json(resp: llm_pb2.CompletionResponse) -> dict:
    choices = []
    for c in resp.choices:
        lp = None
        if len(c.logprobs):
            lp = {
                "tokens": [e.token for e in c.logprobs],
                "token_logprobs": [e.logprob for e in c.logprobs],
                "top_logprobs": [
                    {d.token: d.logprob for d in e.top_logprobs} or None
                    for e in c.logprobs
                ],
            }
        choices.append(
            {
                "index": c.index,
                "text": c.text,
                "logprobs": lp,
                "finish_reason": c.finish_reason if c.HasField("finish_reason") else None,
            }
        )
    out = {
        "id": resp.id,
        "object": resp.object,
        "created": resp.created,
        "model": resp.model,
        "choices": choices,
    }
    if resp.HasField("usage"):
        out["usage"] = _usage_json(resp.usage)
    return out


def _chat_json(resp: llm_pb2.ChatResponse, stream: bool) -> dict:
    choices = []
    for c in resp.choices:
        entry = {
            "index": c.index,
            "finish_reason": c.finish_reason if c.HasField("finish_reason") else None,
        }
        if stream:
            delta = {}
            if c.delta.role:
                delta["role"] = c.delta.role
            if c.delta.content:
                delta["content"] = c.delta.content
            entry["delta"] = delta
        else:
            entry["message"] = {"role": c.message.role, "content": c.message.content}
        choices.append(entry)
    out = {
        "id": resp.id,
        "object": resp.object,
        "created": resp.created,
        "model": resp.model,
        "choices": choices,
    }
    if resp.HasField("usage"):
        out["usage"] = _usage_json(resp.usage)
    return out


def _grpc_error_response(e: grpc.aio.AioRpcError) -> Response:
    code = e.code()
    status = {
        grpc.StatusCode.INVALID_ARGUMENT: 400,
        grpc.StatusCode.RESOURCE_EXHAUSTED: 429,
        grpc.StatusCode.UNAVAILABLE: 503,
        grpc.StatusCode.DEADLINE_EXCEEDED: 504,
    }.get(code, 500)
    return Response.json(error_json(e.details() or code.name), status)


class Gateway:
    """REST edge tier proxying to one gRPC serving process."""

    def __init__(self, grpc_addr: str):
        self._addr = grpc_addr
        self._channel = grpc.aio.insecure_channel(grpc_addr)
        # Generic stubs over the protoc message classes (no grpcio-tools
        # codegen, same approach as the server's generic handlers).
        self._complete = self._channel.unary_stream(
            "/scalellm_tpu.Completion/Complete",
            request_serializer=llm_pb2.CompletionRequest.SerializeToString,
            response_deserializer=llm_pb2.CompletionResponse.FromString,
        )
        self._chat = self._channel.unary_stream(
            "/scalellm_tpu.Chat/Complete",
            request_serializer=llm_pb2.ChatRequest.SerializeToString,
            response_deserializer=llm_pb2.ChatResponse.FromString,
        )
        self._models = self._channel.unary_unary(
            "/scalellm_tpu.Models/List",
            request_serializer=llm_pb2.ListModelsRequest.SerializeToString,
            response_deserializer=llm_pb2.ListModelsResponse.FromString,
        )
        self.http = HttpServer()
        self._routes()

    # ------------------------------------------------------------- streaming

    async def _forward_stream(self, call, sse: SSEResponse, to_json) -> None:
        """SSE forwarding of a server-streaming call (reference:
        gateway/forwarder.go:16 ForwardResponseStream)."""
        try:
            async for resp in call:
                await sse.send(json.dumps(to_json(resp)))
            await sse.done()
        except grpc.aio.AioRpcError as e:
            await sse.send(json.dumps(error_json(e.details() or e.code().name)))
            await sse.done()
        except Exception:
            logger.exception("stream forwarding error")
            await sse.aborted()

    # ---------------------------------------------------------------- routes

    def _routes(self) -> None:
        http = self.http

        @http.route("GET", "/health")
        async def health(req: Request):
            try:
                await asyncio.wait_for(self._models(llm_pb2.ListModelsRequest()), 5)
                return Response.text("OK")
            except Exception:
                return Response.text("upstream unavailable", 503)

        @http.route("GET", "/v1/models")
        async def models(req: Request):
            try:
                resp = await self._models(llm_pb2.ListModelsRequest())
            except grpc.aio.AioRpcError as e:
                return _grpc_error_response(e)
            return Response.json(
                {
                    "object": "list",
                    "data": [
                        {
                            "id": m.id,
                            "object": m.object,
                            "created": m.created,
                            "owned_by": m.owned_by,
                        }
                        for m in resp.data
                    ],
                }
            )

        @http.route("POST", "/v1/completions")
        async def completions(req: Request):
            try:
                body = CompletionRequest.from_json(req.json())
            except ValidationError as e:
                return Response.json(error_json(e.message), status_to_http(e.code))
            except Exception as e:
                return Response.json(error_json(f"invalid JSON: {e}"), 400)
            prompt = body.prompt if isinstance(body.prompt, str) else body.prompt[0]
            pb = llm_pb2.CompletionRequest(
                model=body.model,
                prompt=prompt,
                sampling=_sampling_pb(body),
                stream=body.stream,
                priority=_PRIORITY.get(body.priority, 1),
            )
            call = self._complete(pb)
            if body.stream:
                sse = SSEResponse()
                asyncio.get_running_loop().create_task(
                    self._forward_stream(call, sse, _completion_json)
                )
                return sse
            try:
                final = None
                async for resp in call:
                    final = resp
                if final is None:
                    return Response.json(error_json("empty upstream response"), 500)
                return Response.json(_completion_json(final))
            except grpc.aio.AioRpcError as e:
                return _grpc_error_response(e)

        @http.route("POST", "/v1/chat/completions")
        async def chat(req: Request):
            try:
                body = ChatCompletionRequest.from_json(req.json())
            except ValidationError as e:
                return Response.json(error_json(e.message), status_to_http(e.code))
            except Exception as e:
                return Response.json(error_json(f"invalid JSON: {e}"), 400)
            pb = llm_pb2.ChatRequest(
                model=body.model,
                messages=[
                    llm_pb2.ChatMessage(role=m["role"], content=m["content"])
                    for m in body.messages
                ],
                sampling=_sampling_pb(body),
                stream=body.stream,
                priority=_PRIORITY.get(body.priority, 1),
            )
            call = self._chat(pb)
            if body.stream:
                sse = SSEResponse()
                asyncio.get_running_loop().create_task(
                    self._forward_stream(
                        call, sse, lambda r: _chat_json(r, stream=True)
                    )
                )
                return sse
            try:
                final = None
                async for resp in call:
                    final = resp
                if final is None:
                    return Response.json(error_json("empty upstream response"), 500)
                return Response.json(_chat_json(final, stream=False))
            except grpc.aio.AioRpcError as e:
                return _grpc_error_response(e)

    # ------------------------------------------------------------------ main

    async def run(self, host: str, port: int) -> None:
        await self.http.start(host, port)
        logger.info("gateway %s:%d -> grpc %s", host, port, self._addr)
        await self.http.serve_forever()

    async def close(self) -> None:
        await self.http.stop()
        await self._channel.close()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--grpc-server", default="127.0.0.1:8888",
        help="gRPC server endpoint (reference: gateway/main.go grpc-server flag)",
    )
    p.add_argument("--http-server", default="0.0.0.0:8080", help="HTTP bind addr")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    host, _, port = args.http_server.rpartition(":")

    async def amain():
        # The grpc.aio channel must be created with the event loop running
        # (it binds to the current loop).
        gw = Gateway(args.grpc_server)
        await gw.run(host or "0.0.0.0", int(port))

    asyncio.run(amain())


if __name__ == "__main__":
    main()
