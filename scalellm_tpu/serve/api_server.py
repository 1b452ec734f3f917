"""OpenAI-compatible API server.

TPU-native equivalent of the reference's FastAPI server
(reference: scalellm/serve/api_server.py:29-164): /v1/completions,
/v1/chat/completions (both with SSE streaming), /v1/models, /metrics,
/health — served by the stdlib-asyncio HttpServer in serve/http.py.

Run: python -m scalellm_tpu.serve.api_server --model <path> --port 8080
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import signal
import uuid
from typing import Optional

from scalellm_tpu.errors import ValidationError
from scalellm_tpu.llm_engine import AsyncLLMEngine
from scalellm_tpu.serve.api_protocol import (
    ChatCompletionRequest,
    CompletionRequest,
    error_json,
    now,
    status_to_http,
)
from scalellm_tpu.serve.chat_handler import (
    generate_chat_response,
    generate_chat_stream,
)
from scalellm_tpu.serve.completion_handler import (
    generate_completion_response,
    generate_completion_stream,
)
from scalellm_tpu.serve.http import HttpServer, Request, Response, SSEResponse
from scalellm_tpu.utils.metrics import export_prometheus

logger = logging.getLogger(__name__)


class ApiServer:
    def __init__(self, engine: AsyncLLMEngine, model_name: str):
        self.engine = engine
        self.model_name = model_name
        # LoRA adapters served alongside the base model; requests select
        # one with the OpenAI `model` field.
        self.lora_names = set(getattr(engine, "lora_names", []) or [])
        self.http = HttpServer()
        self._register()

    def _lora_of(self, body) -> "str | None":
        return body.model if body.model in self.lora_names else None

    def _register(self):
        http = self.http

        @http.route("GET", "/health")
        async def health(req: Request):
            return Response.text("OK")

        @http.route("GET", "/metrics")
        async def metrics(req: Request):
            return Response.text(export_prometheus(), content_type="text/plain; version=0.0.4")

        @http.route("GET", "/config")
        async def config(req: Request):
            """Engine/handler option introspection (the reference's /gflags
            analog, main.cpp:152)."""
            import dataclasses

            opts = dataclasses.asdict(self.engine._handler.options)
            eng = getattr(self.engine._handler, "engine", None)
            if eng is not None and hasattr(eng, "model_args"):
                # Effective model args + applied --model-args-override list
                # (the reference's /gflags + args_overrider.h introspection).
                ma = dataclasses.asdict(eng.model_args)
                ma.pop("raw", None)
                opts["model_args"] = ma
                opts["model_args_overrides_applied"] = getattr(
                    eng, "applied_model_args_overrides", []
                )
            return Response.json(opts)

        @http.route("POST", "/profile/start")
        async def profile_start(req: Request):
            """Start a jax.profiler trace (SURVEY §5: the TPU answer to the
            reference's stage-latency-only observability)."""
            import jax

            body = req.json() if req.body else {}
            log_dir = body.get("log_dir", "/tmp/scalellm_tpu_profile")
            jax.profiler.start_trace(log_dir)
            return Response.json({"status": "tracing", "log_dir": log_dir})

        @http.route("POST", "/profile/stop")
        async def profile_stop(req: Request):
            import jax

            jax.profiler.stop_trace()
            return Response.json({"status": "stopped"})

        @http.route("GET", "/v1/models")
        async def models(req: Request):
            return Response.json(
                {
                    "object": "list",
                    "data": [
                        {
                            "id": name,
                            "object": "model",
                            "created": now(),
                            "owned_by": "scalellm_tpu",
                        }
                        for name in [self.model_name, *sorted(self.lora_names)]
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
            try:
                if body.stream:
                    sse = SSEResponse()
                    asyncio.get_running_loop().create_task(
                        generate_completion_stream(
                            self.engine, body, self.model_name, sse,
                            lora=self._lora_of(body),
                        )
                    )
                    return sse
                return await generate_completion_response(
                    self.engine, body, self.model_name,
                    lora=self._lora_of(body),
                )
            except ValidationError as e:
                return Response.json(error_json(e.message), status_to_http(e.code))

        @http.route("POST", "/v1/chat/completions")
        async def chat(req: Request):
            try:
                body = ChatCompletionRequest.from_json(req.json())
            except ValidationError as e:
                return Response.json(error_json(e.message), status_to_http(e.code))
            except Exception as e:
                return Response.json(error_json(f"invalid JSON: {e}"), 400)
            try:
                if body.stream:
                    sse = SSEResponse()
                    asyncio.get_running_loop().create_task(
                        generate_chat_stream(
                            self.engine, body, self.model_name, sse,
                            lora=self._lora_of(body),
                        )
                    )
                    return sse
                return await generate_chat_response(
                    self.engine, body, self.model_name,
                    lora=self._lora_of(body),
                )
            except ValidationError as e:
                return Response.json(error_json(e.message), status_to_http(e.code))

    async def run(self, host: str, port: int):
        self.engine.start()
        await self.http.start(host, port)
        logger.info("listening on %s:%d", host, port)
        await self.http.serve_forever()


def build_arg_parser() -> argparse.ArgumentParser:
    """(reference: scalellm/serve/server_args.py)"""
    p = argparse.ArgumentParser(description="scalellm_tpu OpenAI-compatible server")
    p.add_argument("--model", type=str, required=True, help="model folder path")
    p.add_argument("--served-model-name", "--model-id", dest="model_id", type=str, default=None)
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--max-cache-size", type=int, default=0)
    p.add_argument("--max-memory-utilization", type=float, default=0.9)
    p.add_argument("--enable-prefix-cache", action="store_true", default=True)
    p.add_argument("--disable-prefix-cache", dest="enable_prefix_cache", action="store_false")
    p.add_argument("--enable-cuda-graph", action="store_true", default=True,
                   help="warm up jit bucket cache at init (name kept for parity)")
    p.add_argument("--disable-warmup", dest="enable_cuda_graph", action="store_false")
    p.add_argument("--max-tokens-per-batch", type=int, default=512)
    p.add_argument("--num-decode-steps", type=int, default=1,
                   help="decode micro-steps per dispatch (multi-step decode)")
    p.add_argument("--disable-async-scheduling", dest="enable_async_scheduling",
                   action="store_false", default=True,
                   help="disable pipelined (one step in flight) scheduling")
    p.add_argument("--lora-modules", nargs="+", default=None,
                   metavar="NAME=PATH",
                   help="LoRA adapters served alongside the base model; "
                   "requests select one via the OpenAI `model` field")
    p.add_argument("--max-seqs-per-batch", type=int, default=128)
    p.add_argument("--num-speculative-tokens", type=int, default=0)
    p.add_argument("--draft-model", type=str, default=None)
    p.add_argument("--num-handling-threads", type=int, default=4)
    p.add_argument("--tp-size", type=int, default=1)
    p.add_argument("--sequence-parallel", action="store_true", default=False,
                   help="Megatron SP over the tp axis (dense models)")
    p.add_argument("--num-blocks", type=int, default=0)
    p.add_argument("--kv-cache-dtype", type=str, default="auto", choices=["auto", "int8"])
    p.add_argument("--quantize", type=str, default="", choices=["", "int4", "int8"],
                   help="runtime weight quantization of dense checkpoints")
    p.add_argument("--warmup-mode", type=str, default="full", choices=["off", "fast", "full"],
                   help="full (default) = pre-compile every reachable bucket "
                        "(zero mid-serve compiles; the persistent compile "
                        "cache makes warm restarts near-instant)")
    p.add_argument("--model-args-override", action="append", default=[],
                   metavar="FIELD=VALUE",
                   help="override a loaded ModelArgs field (dotted paths "
                        "reach QuantArgs: quant_args.bits=8); repeatable. "
                        "Reference parity: args_overrider.h; shown at /config")
    # Multi-host pod serving (single-controller): host 0 runs this server +
    # scheduler; hosts 1..N run the follower loop in lockstep.
    p.add_argument("--coordinator", type=str, default=None,
                   help="jax.distributed coordinator address host:port")
    p.add_argument("--num-hosts", type=int, default=None)
    p.add_argument("--host-id", type=int, default=None)
    return p


def main(argv: Optional[list] = None):
    logging.basicConfig(level=logging.INFO)
    # This image's sitecustomize can programmatically force a TPU-tunnel
    # platform; honor an explicit JAX_PLATFORMS request (e.g. cpu for tests).
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_arg_parser().parse_args(argv)
    distributed = bool(args.coordinator)
    if distributed:
        from scalellm_tpu.parallel import multihost

        multihost.init_distributed(args.coordinator, args.num_hosts, args.host_id)
        import jax

        if jax.process_index() != 0:
            # Follower host: no HTTP — enter the per-step jits in lockstep
            # with host 0 until it broadcasts the stop header.
            from scalellm_tpu.engine.distributed import DistributedLLMEngine
            from scalellm_tpu.engine.llm_engine import EngineOptions

            eng = DistributedLLMEngine(EngineOptions(
                model_path=args.model,
                block_size=args.block_size,
                max_cache_size=args.max_cache_size,
                max_memory_utilization=args.max_memory_utilization,
                enable_prefix_cache=args.enable_prefix_cache,
                num_blocks=args.num_blocks,
                tp_size=args.tp_size,
                sequence_parallel=args.sequence_parallel,
                warmup=args.enable_cuda_graph,
                warmup_mode=args.warmup_mode,
                model_args_overrides=args.model_args_override,
                max_tokens_per_batch=args.max_tokens_per_batch,
                max_seqs_per_batch=args.max_seqs_per_batch,
                kv_cache_dtype=args.kv_cache_dtype,
                quantize=args.quantize,
            ))
            logger.info("host %d: entering follower loop", jax.process_index())
            eng.run_follower()
            return
    engine = AsyncLLMEngine(
        model=args.model,
        block_size=args.block_size,
        max_cache_size=args.max_cache_size,
        max_memory_utilization=args.max_memory_utilization,
        enable_prefix_cache=args.enable_prefix_cache,
        enable_cuda_graph=args.enable_cuda_graph,
        max_tokens_per_batch=args.max_tokens_per_batch,
        max_seqs_per_batch=args.max_seqs_per_batch,
        num_speculative_tokens=args.num_speculative_tokens,
        draft_model=args.draft_model,
        num_handling_threads=args.num_handling_threads,
        tp_size=args.tp_size,
        sequence_parallel=args.sequence_parallel,
        num_blocks=args.num_blocks,
        kv_cache_dtype=args.kv_cache_dtype,
        quantize=args.quantize,
        warmup_mode=args.warmup_mode,
        model_args_overrides=args.model_args_override,
        distributed=distributed,
        enable_async_scheduling=args.enable_async_scheduling,
        num_decode_steps=args.num_decode_steps,
        lora_modules=dict(m.split("=", 1) for m in args.lora_modules)
        if args.lora_modules else None,
    )
    model_name = args.model_id or args.model.rstrip("/").split("/")[-1]
    server = ApiServer(engine, model_name)

    loop = asyncio.new_event_loop()
    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            loop.add_signal_handler(sig, loop.stop)
        except NotImplementedError:
            pass
    try:
        loop.run_until_complete(server.run(args.host, args.port))
    except (KeyboardInterrupt, RuntimeError):
        pass
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
