"""/v1/chat/completions handlers (reference: scalellm/serve/chat_handler.py)."""

from __future__ import annotations

import json
import uuid

from scalellm_tpu.llm_engine import AsyncLLMEngine
from scalellm_tpu.serve.api_protocol import ChatCompletionRequest, now
from scalellm_tpu.serve.http import Response, SSEResponse
from scalellm_tpu.utils.chat import Message


def _messages(req: ChatCompletionRequest):
    return [Message(m["role"], m["content"]) for m in req.messages]


def _logprobs_json(logprobs) -> dict | None:
    if not logprobs:
        return None
    content = []
    for lp in logprobs:
        content.append(
            {
                "token": lp.token,
                "logprob": lp.logprob,
                "top_logprobs": [
                    {"token": d.token, "logprob": d.logprob}
                    for d in (lp.top_logprobs or [])
                ],
            }
        )
    return {"content": content}


async def generate_chat_response(
    engine: AsyncLLMEngine, req: ChatCompletionRequest, model_name: str
) -> Response:
    sp = req.to_sampling_params()
    request_id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
    stream = await engine.schedule_chat_async(_messages(req), sp, priority=req.to_priority(), stream=False)
    choices = []
    usage = {}
    async for out in stream:
        if out.finished:
            for so in out.outputs:
                choices.append(
                    {
                        "index": so.index,
                        "message": {"role": "assistant", "content": so.text},
                        "logprobs": _logprobs_json(so.logprobs) if req.logprobs else None,
                        "finish_reason": so.finish_reason.to_api_string()
                        if so.finish_reason
                        else None,
                    }
                )
            if out.usage:
                usage = {
                    "prompt_tokens": out.usage.num_prompt_tokens,
                    "completion_tokens": out.usage.num_generated_tokens,
                    "total_tokens": out.usage.num_total_tokens,
                }
    return Response.json(
        {
            "id": request_id,
            "object": "chat.completion",
            "created": now(),
            "model": model_name,
            "choices": choices,
            "usage": usage,
        }
    )


async def generate_chat_stream(
    engine: AsyncLLMEngine, req: ChatCompletionRequest, model_name: str, sse: SSEResponse
) -> None:
    sp = req.to_sampling_params()
    request_id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
    try:
        stream = await engine.schedule_chat_async(_messages(req), sp, priority=req.to_priority(), stream=True)
        first = True
        async for out in stream:
            for so in out.outputs:
                delta = {"content": so.text}
                if first:
                    delta["role"] = "assistant"
                    first = False
                chunk = {
                    "id": request_id,
                    "object": "chat.completion.chunk",
                    "created": now(),
                    "model": model_name,
                    "choices": [
                        {
                            "index": so.index,
                            "delta": delta,
                            "finish_reason": so.finish_reason.to_api_string()
                            if so.finish_reason
                            else None,
                        }
                    ],
                }
                await sse.send(json.dumps(chunk))
        await sse.done()
    except Exception as e:
        await sse.send(json.dumps({"error": {"message": str(e)}}))
        await sse.done()
